#!/usr/bin/env python
"""Training CLI — the consolidated replacement for the reference's trainer zoo
entry points (``train/maddpg-v1/main.py``, ``train/mappo/train_formation.py``,
``train/maddpg-v5/train.py``).

Examples:
    python train.py --algo mappo --scenario formation_hd_env --num-agents 3 \\
        --num-envs 128 --iters 500
    python train.py --algo maddpg --num-agents 3 --num-envs 32 --iters 200
    python train.py --algo rmappo --restore --run-dir runs/my_run
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

import gym_formation_tpu as ft
from gym_formation_tpu.algos import (
    MADDPG,
    MADDPGConfig,
    MAPPO,
    MAPPOConfig,
    MASAC,
    MASACConfig,
    MATD3,
    MATD3Config,
    QMix,
    QMixConfig,
    RMADDPG,
    RMADDPGConfig,
    RMAPPO,
    RMAPPOConfig,
    RMASAC,
    RMASACConfig,
    RQMix,
    RQMixConfig,
)
from gym_formation_tpu.utils import (
    MetricsLogger,
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)

EPISODIC = ("rmaddpg", "rmatd3", "rmasac", "rqmix", "rvdn")
ONPOLICY = ("mappo", "rmappo")


def build(args, env):
    """Return (algo, cfg, state) where state is the full training tuple."""
    from gym_formation_tpu.utils.config import load_config

    lr = [f"lr={args.lr}"] if args.lr else []
    lr2 = [f"lr_actor={args.lr}", f"lr_critic={args.lr}"] if args.lr else []
    sets = list(args.set or [])

    def cfg_of(cls, base, extra=()):
        # defaults <- --config yaml <- implied flags <- --set key=value
        return load_config(cls, args.config, [*base, *extra, *sets])

    key = jax.random.PRNGKey(args.seed)
    if args.algo == "mappo":
        algo = MAPPO(env, cfg_of(MAPPOConfig, lr), num_envs=args.num_envs)
    elif args.algo == "rmappo":
        algo = RMAPPO(env, cfg_of(RMAPPOConfig, lr), num_envs=args.num_envs)
    elif args.algo in ("maddpg", "ddpg"):
        algo = MADDPG(
            env,
            cfg_of(MADDPGConfig, lr2, [f"centralized={args.algo == 'maddpg'}"]),
            num_envs=args.num_envs,
        )
    elif args.algo == "matd3":
        algo = MATD3(env, cfg_of(MATD3Config, lr2), num_envs=args.num_envs)
    elif args.algo == "masac":
        algo = MASAC(env, cfg_of(MASACConfig, lr), num_envs=args.num_envs)
    elif args.algo in ("rmaddpg", "rmatd3"):
        algo = RMADDPG(
            env,
            cfg_of(RMADDPGConfig, lr2, [f"twin={args.algo == 'rmatd3'}"]),
            num_envs=args.num_envs,
        )
    elif args.algo == "rmasac":
        algo = RMASAC(env, cfg_of(RMASACConfig, lr), num_envs=args.num_envs)
    elif args.algo in ("rqmix", "rvdn"):
        algo = RQMix(
            env, cfg_of(RQMixConfig, [], [f"mixer={args.algo[1:]}", *lr]),
            num_envs=args.num_envs,
        )
    else:  # qmix / vdn (MLP variants)
        algo = QMix(
            env, cfg_of(QMixConfig, [], [f"mixer={args.algo}", *lr]),
            num_envs=args.num_envs,
        )
    return algo, algo.cfg, list(algo.init(key))


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--algo",
        choices=[
            "mappo", "rmappo", "maddpg", "ddpg", "matd3", "masac",
            "qmix", "vdn", "rmaddpg", "rmatd3", "rmasac", "rqmix", "rvdn",
        ],
        default="mappo",
    )
    p.add_argument("--scenario", default="formation_hd_env")
    p.add_argument("--num-agents", type=int, default=3)
    p.add_argument("--num-envs", type=int, default=128)
    p.add_argument("--iters", type=int, default=500)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--episode-length", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument(
        "--set", action="append", metavar="KEY=VALUE", default=[],
        help="override any field of the algorithm's config dataclass, "
        "repeatable (e.g. --set entropy_coef=0.001 --set ppo_epochs=5); "
        "unknown keys are rejected with the valid field list",
    )
    p.add_argument(
        "--config", default=None,
        help="YAML file of config overrides (the v4 parameters.yaml path); "
        "--set takes precedence",
    )
    p.add_argument(
        "--discrete-action", action="store_true",
        help="5-way discrete action env (implied for qmix/vdn variants); "
        "maddpg/ddpg/matd3 switch to the logits actor + gumbel-softmax "
        "update (the reference v2 discrete path), mappo to a categorical "
        "head (onpolicy's ACTLayer discrete branch)",
    )
    p.add_argument("--run-dir", default=None)
    p.add_argument("--save-every", type=int, default=100)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument(
        "--restore", action="store_true",
        help="resume from the latest checkpoint in --run-dir: restores the "
        "FULL training tuple (train state, buffers, env state) and continues "
        "the iteration counter (reference v4 auto-restore behavior)",
    )
    args = p.parse_args()

    if args.discrete_action and args.algo not in (
        "maddpg", "ddpg", "matd3", "masac", "mappo", "rmappo",
        "qmix", "vdn", "rqmix", "rvdn",  # discrete already implied: no-op
    ):
        raise SystemExit(
            "--discrete-action is supported by maddpg/ddpg/matd3/masac (the "
            "gumbel-softmax paths) and mappo/rmappo (categorical heads); "
            "qmix/vdn variants are discrete by default"
        )

    kw = {}
    if args.episode_length is not None:
        # every scenario exposes a length kwarg (hd names it episode_length,
        # the others world_length per their reference signatures)
        name = "episode_length" if args.scenario == "formation_hd_env" else "world_length"
        kw[name] = args.episode_length
    env = ft.make_env(
        args.scenario,
        num_agents=args.num_agents,
        discrete_action=(
            args.discrete_action or args.algo in ("qmix", "vdn", "rqmix", "rvdn")
        ),
        **kw,
    )

    run_dir = args.run_dir or os.path.join(
        "runs", f"{args.algo}_{args.scenario}_N{args.num_agents}_{int(time.time())}"
    )
    ckpt_dir = os.path.join(run_dir, "ckpt")

    algo, cfg, state = build(args, env)
    if args.algo in ONPOLICY:
        steps_per_iter = cfg.rollout_len * args.num_envs
    elif args.algo in EPISODIC:
        steps_per_iter = cfg.episodes_per_iter * args.num_envs * env.world_length
    else:
        steps_per_iter = cfg.steps_per_iter * args.num_envs

    start = 0
    if args.restore:
        step = latest_step(ckpt_dir)
        if step is None:
            raise SystemExit(
                f"--restore: no checkpoint found under {ckpt_dir} "
                "(pass the --run-dir of the run to resume)"
            )
        state = list(restore_checkpoint(ckpt_dir, tuple(state), step))
        start = step
        print(f"restored checkpoint at iteration {step} from {ckpt_dir}")

    logger = MetricsLogger(run_dir)
    key = jax.random.PRNGKey(args.seed)
    for i in range(start, start + args.iters):
        *state, m = algo.train_step(*state, jax.random.fold_in(key, i))
        if (i - start) % args.log_every == 0:
            m = {k: float(v) for k, v in m.items()}
            logger.log((i + 1) * steps_per_iter, m)
            print(f"iter {i}: {m}")
        if args.save_every and (i + 1 - start) % args.save_every == 0:
            save_checkpoint(ckpt_dir, i + 1, tuple(state), max_to_keep=2)

    logger.plot("mean_step_reward")
    logger.close()
    print(f"done → {run_dir}")


if __name__ == "__main__":
    main()
