#!/usr/bin/env python
"""Evaluation / render driver — parity with the reference's evaluate paths
(``train/maddpg-v2/evaluate.py:14-81`` model rollout + GIF;
``train/maddpg-v5/render.py``; ``train/mappo/inbox/render_formation.py``),
plus the hierarchical trick the reference only documents for the scripted
policy: a trained n-agent MAPPO actor expanded over n^L agents with
``--num-layer`` (``README.md:31-51``).

Examples:
    python eval.py --ckpt runs/<run>/ckpt --episodes 5 --gif eval.gif
    python eval.py --policy ezpolicy --num-agents 3 --num-layer 2
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

import gym_formation_tpu as ft
from gym_formation_tpu.algos import MAPPO, MAPPOConfig
from gym_formation_tpu.render import render_state, save_gif
from gym_formation_tpu.utils import restore_raw


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenario", default="formation_hd_env")
    p.add_argument("--num-agents", type=int, default=3, help="policy arity n")
    p.add_argument("--num-layer", type=int, default=1, help="BFS hierarchy depth")
    p.add_argument("--policy", choices=["ckpt", "ezpolicy"], default="ezpolicy")
    p.add_argument("--ckpt", default=None, help="checkpoint dir from train.py")
    p.add_argument("--episodes", type=int, default=3)
    p.add_argument("--episode-length", type=int, default=None)
    p.add_argument("--gif", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--discrete-action", action="store_true",
        help="checkpoint was trained with train.py --discrete-action "
        "(one-hot action env, logits actor)",
    )
    args = p.parse_args()

    n = args.num_agents
    total = n**args.num_layer
    if args.discrete_action and args.num_layer > 1:
        raise SystemExit(
            "--num-layer > 1 needs continuous velocity actions (the BFS "
            "hierarchy feeds target velocities to sub-groups); discrete "
            "policies can't be BFS-expanded"
        )
    kw = {}
    if args.episode_length is not None:
        name = "episode_length" if args.scenario == "formation_hd_env" else "world_length"
        kw[name] = args.episode_length
    env = ft.make_env(
        args.scenario, num_agents=total, benchmark=True, auto_reset=False,
        discrete_action=args.discrete_action, **kw
    )

    if args.policy == "ckpt":
        assert args.ckpt, "--ckpt required with --policy ckpt"
        # restore into a skeleton built from a same-arity MAPPO
        proto_env = ft.make_env(
            args.scenario, num_agents=n,
            discrete_action=args.discrete_action, **kw
        )
        algo = MAPPO(proto_env, MAPPOConfig(), num_envs=1)
        # raw restore: the checkpoint's env-batch shapes are unknown here and
        # only the policy params are needed
        raw = restore_raw(args.ckpt)
        ts_raw = raw[0] if isinstance(raw, (list, tuple)) else raw["ts"]
        actor_params = ts_raw["params"]["actor"]

        def base_policy(obs_batch):
            if args.discrete_action:
                from gym_formation_tpu.models.networks import onehot_from_logits

                return onehot_from_logits(algo.actor.apply(actor_params, obs_batch))
            mean, _ = algo.actor.apply(actor_params, obs_batch)
            # clip to the control range like the reference agents do
            # (maddpg-v1/agent.py:22); unbounded means explode through the
            # hierarchical tar_vel feedback when BFS-expanded
            return jnp.clip(mean, -1.0, 1.0)

    elif args.scenario == "formation_hd_env":
        base_policy = ft.ezpolicy_batched
    else:
        # ezpolicy parses the hd 6N-dim obs layout (reference
        # __init__.py:19-47); other scenarios get random actions
        print(f"note: ezpolicy is formation_hd-specific; using random actions "
              f"for {args.scenario}")
        rng_key = jax.random.PRNGKey(args.seed + 10_000)

        def base_policy(obs):
            return jax.random.uniform(
                rng_key, obs.shape[:-1] + (env.act_dim,), obs.dtype, -1.0, 1.0
            )

    def policy(obs):
        if args.discrete_action:
            return base_policy(obs)  # one-hots: no BFS velocity expansion
        if args.policy == "ckpt" or (
            args.num_layer > 1 and args.scenario == "formation_hd_env"
        ):
            return ft.bfs_actions(base_policy, obs, n)
        return base_policy(obs)

    step = jax.jit(lambda state, obs: env.step(state, policy(obs)))
    reset = jax.jit(env.reset)
    frames = []
    ep_rewards, ep_bench = [], []
    for ep in range(args.episodes):
        state, obs = reset(jax.random.PRNGKey(args.seed + ep))
        done, total_r, t = False, 0.0, 0
        while not done:
            state, out = step(state, obs)
            obs = out.obs
            total_r += float(out.reward[0])
            done = bool(out.done.all())
            t += 1
            if args.gif:
                frames.append(render_state(env.scenario, state, size=350))
        ep_rewards.append(total_r)
        ep_bench.append({k: float(np.asarray(v).mean()) for k, v in out.info.items()})
        print(f"episode {ep}: return={total_r:.2f} len={t} bench={ep_bench[-1]}")

    print(
        f"mean return over {args.episodes} episodes: "
        f"{np.mean(ep_rewards):.3f} ± {np.std(ep_rewards):.3f}"
    )
    if args.gif:
        out = save_gif(frames, args.gif)
        print(f"gif → {out}" if out else "imageio unavailable")


if __name__ == "__main__":
    main()
