#!/usr/bin/env python
"""Evaluation / render driver — parity with the reference's evaluate paths
(``train/maddpg-v2/evaluate.py:14-81`` model rollout + GIF;
``train/maddpg-v5/render.py``; ``train/mappo/inbox/render_formation.py``),
plus the hierarchical trick the reference only documents for the scripted
policy: a trained n-agent actor expanded over n^L agents with ``--num-layer``
(``README.md:31-51``).

Any of the 13 training algorithms' checkpoints can be evaluated: pass the
``--algo`` it was trained with and the registry restores the right actor
(recurrent families thread their GRU carries through the episode).

Examples:
    python eval.py --algo mappo --ckpt runs/<run>/ckpt --episodes 5 --gif out.gif
    python eval.py --algo rmappo --ckpt runs/<run>/ckpt
    python eval.py --algo qmix --ckpt runs/<run>/ckpt --gif qmix.gif
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
from gym_formation_tpu.algos.registry import (
    ALGO_NAMES,
    DISCRETE_ONLY,
    RECURRENT,
    eval_policy,
    make_algo,
)
from gym_formation_tpu.render import (
    render_state,
    render_state_per_agent,
    save_gif,
    tile_images,
)
from gym_formation_tpu.utils import enable_compilation_cache, restore_raw

enable_compilation_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenario", default="formation_hd_env")
    p.add_argument("--num-agents", type=int, default=3, help="policy arity n")
    p.add_argument("--num-layer", type=int, default=1, help="BFS hierarchy depth")
    p.add_argument("--policy", choices=["ckpt", "ezpolicy"], default="ezpolicy")
    p.add_argument(
        "--algo", choices=list(ALGO_NAMES), default="mappo",
        help="algorithm the checkpoint was trained with (--policy ckpt)",
    )
    p.add_argument("--ckpt", default=None, help="checkpoint dir from train.py")
    p.add_argument("--episodes", type=int, default=3)
    p.add_argument("--episode-length", type=int, default=None)
    p.add_argument("--gif", default=None)
    p.add_argument(
        "--per-agent-view", action="store_true",
        help="one camera per agent, tiled into each GIF frame (the "
        "reference's shared_viewer=False mode, environment.py:329-341)",
    )
    p.add_argument(
        "--no-clip", action="store_true",
        help="don't clip continuous checkpoint actions to the ±1 control "
        "range: the clip matches reference agents (maddpg-v1/agent.py:22), "
        "but a policy trained on the unclipped env (mappo default) is only "
        "reproduced faithfully without it",
    )
    p.add_argument(
        "--stochastic", action="store_true",
        help="sample the policy distribution instead of its mode (mappo "
        "ckpts only) — evaluates the behavior policy that earns the "
        "training reward, which for wide-σ regimes differs materially "
        "from the greedy mean (RESULTS.md r5 N=243)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--discrete-action", action="store_true",
        help="checkpoint was trained with train.py --discrete-action "
        "(one-hot action env; implied for qmix/vdn variants)",
    )
    args = p.parse_args()

    n = args.num_agents
    total = n**args.num_layer
    discrete = args.discrete_action or (
        args.policy == "ckpt" and args.algo in DISCRETE_ONLY
    )
    if discrete and args.num_layer > 1:
        raise SystemExit(
            "--num-layer > 1 needs continuous velocity actions (the BFS "
            "hierarchy feeds target velocities to sub-groups); discrete "
            "policies can't be BFS-expanded"
        )
    if args.discrete_action and args.policy != "ckpt":
        raise SystemExit(
            "--discrete-action only applies to trained checkpoints "
            "(--policy ckpt): the scripted policies emit 2-dim velocities, "
            "not 5-way one-hots"
        )
    if args.stochastic and (args.policy != "ckpt" or args.num_layer > 1):
        raise SystemExit(
            "--stochastic applies to direct (--num-layer 1) mappo "
            "checkpoint evals: the BFS expansion feeds deterministic "
            "meta-velocities"
        )
    if args.num_layer > 1 and args.policy == "ckpt" and args.algo != "mappo":
        raise SystemExit(
            "--num-layer > 1 with a checkpoint requires a shared stateless "
            "actor (mappo): per-agent stacked actors have no meta-agent "
            "assignment and recurrent actors have no per-group hidden state"
        )
    kw = {}
    if args.episode_length is not None:
        name = "episode_length" if args.scenario == "formation_hd_env" else "world_length"
        kw[name] = args.episode_length
    env = ft.make_env(
        args.scenario, num_agents=total, benchmark=True, auto_reset=False,
        discrete_action=discrete, **kw
    )

    carry0 = None
    if args.policy == "ckpt":
        assert args.ckpt, "--ckpt required with --policy ckpt"
        # skeleton from a same-arity algo; only the actor params are consumed,
        # so the checkpoint's env-batch/buffer shapes don't matter
        proto_env = ft.make_env(
            args.scenario, num_agents=n, discrete_action=discrete, **kw
        )
        algo = make_algo(args.algo, proto_env, num_envs=1)
        raw = restore_raw(args.ckpt)
        ts_raw = raw[0] if isinstance(raw, (list, tuple)) else raw["ts"]
        # batch dim 1: the single-env loop wraps obs as [1, N, do]
        ckpt_policy, carry0 = eval_policy(
            args.algo, algo, ts_raw, batch_size=1,
            clip_continuous=not args.no_clip,
            stochastic=args.stochastic,
        )

        def base_policy(obs_batch):
            # stateless shared-actor path used by the BFS expansion
            a, _ = ckpt_policy(obs_batch[None], None)
            return a[0]

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

    use_bfs = args.num_layer > 1 and args.scenario == "formation_hd_env"

    if args.policy == "ckpt" and not use_bfs:
        # registry policy (handles recurrent carries); [N,do] → [1,N,do]
        def step_body(state, obs, carry):
            actions, carry = ckpt_policy(obs[None], carry)
            state, out = env.step(state, actions[0])
            return state, out, carry

    else:
        def step_body(state, obs, carry):
            if use_bfs:
                actions = ft.bfs_actions(base_policy, obs, n)
            else:
                actions = base_policy(obs)
            state, out = env.step(state, actions)
            return state, out, carry

    step = jax.jit(step_body)
    reset = jax.jit(env.reset)
    frames = []
    ep_rewards, ep_bench = [], []
    for ep in range(args.episodes):
        state, obs = reset(jax.random.PRNGKey(args.seed + ep))
        carry = carry0
        done, total_r, t = False, 0.0, 0
        while not done:
            state, out, carry = step(state, obs, carry)
            obs = out.obs
            total_r += float(out.reward[0])
            done = bool(out.done.all())
            t += 1
            if args.gif:
                if args.per_agent_view:
                    frames.append(
                        tile_images(
                            np.stack(
                                render_state_per_agent(
                                    env.scenario, state, size=233
                                )
                            )
                        )
                    )
                else:
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
