#!/usr/bin/env python
"""Training CLI — the consolidated replacement for the reference's trainer zoo
entry points (``train/maddpg-v1/main.py``, ``train/mappo/train_formation.py``).

Examples:
    python train.py --algo mappo --scenario formation_hd_env --num-agents 3 \\
        --num-envs 128 --iters 500
    python train.py --algo maddpg --num-agents 3 --num-envs 32 --iters 200
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
    RMAPPO,
    RMAPPOConfig,
    RMADDPG,
    RMADDPGConfig,
    RQMix,
    RQMixConfig,
    RMASAC,
    RMASACConfig,
)
from gym_formation_tpu.utils import (
    MetricsLogger,
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)


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
    p.add_argument("--run-dir", default=None)
    p.add_argument("--save-every", type=int, default=100)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument(
        "--restore", action="store_true",
        help="resume from the latest checkpoint in --run-dir (the reference "
        "v4 auto-restore behavior, maddpg-v4/train.py:35-36)",
    )
    args = p.parse_args()

    kw = {}
    if args.episode_length is not None and args.scenario == "formation_hd_env":
        kw["episode_length"] = args.episode_length
    env = ft.make_env(args.scenario, num_agents=args.num_agents, **kw)
    run_dir = args.run_dir or os.path.join(
        "runs", f"{args.algo}_{args.scenario}_N{args.num_agents}_{int(time.time())}"
    )
    logger = MetricsLogger(run_dir)
    key = jax.random.PRNGKey(args.seed)

    if args.algo in ("mappo", "rmappo"):
        if args.algo == "mappo":
            cfg = MAPPOConfig(**({"lr": args.lr} if args.lr else {}))
            algo = MAPPO(env, cfg, num_envs=args.num_envs)
            state_tuple = algo.init(key)
        else:
            cfg = RMAPPOConfig(**({"lr": args.lr} if args.lr else {}))
            algo = RMAPPO(env, cfg, num_envs=args.num_envs)
            state_tuple = algo.init(key)
        ts, *rest = state_tuple
        if args.restore and latest_step(os.path.join(run_dir, "ckpt")):
            ts = restore_checkpoint(os.path.join(run_dir, "ckpt"), {"ts": ts})["ts"]
            print(f"restored checkpoint step {latest_step(os.path.join(run_dir, 'ckpt'))}")
        steps_per_iter = cfg.rollout_len * args.num_envs
        for i in range(args.iters):
            ts, *rest, m = algo.train_step(ts, *rest, jax.random.fold_in(key, i))
            if i % args.log_every == 0:
                m = {k: float(v) for k, v in m.items()}
                logger.log((i + 1) * steps_per_iter, m)
                print(f"iter {i}: {m}")
            if args.save_every and (i + 1) % args.save_every == 0:
                save_checkpoint(os.path.join(run_dir, "ckpt"), i + 1, {"ts": ts})
    else:
        if args.algo in ("maddpg", "ddpg"):
            cfg = MADDPGConfig(
                centralized=args.algo == "maddpg",
                **({"lr_actor": args.lr, "lr_critic": args.lr} if args.lr else {}),
            )
            algo = MADDPG(env, cfg, num_envs=args.num_envs)
        elif args.algo == "matd3":
            cfg = MATD3Config(
                **({"lr_actor": args.lr, "lr_critic": args.lr} if args.lr else {})
            )
            algo = MATD3(env, cfg, num_envs=args.num_envs)
        elif args.algo == "masac":
            cfg = MASACConfig(**({"lr": args.lr} if args.lr else {}))
            algo = MASAC(env, cfg, num_envs=args.num_envs)
        elif args.algo in ("rmaddpg", "rmatd3"):
            cfg = RMADDPGConfig(
                twin=args.algo == "rmatd3",
                **({"lr_actor": args.lr, "lr_critic": args.lr} if args.lr else {}),
            )
            algo = RMADDPG(env, cfg, num_envs=args.num_envs)
        elif args.algo == "rmasac":
            cfg = RMASACConfig(**({"lr": args.lr} if args.lr else {}))
            algo = RMASAC(env, cfg, num_envs=args.num_envs)
        elif args.algo in ("rqmix", "rvdn"):
            env = ft.FormationEnv(env.scenario, discrete_action=True)
            cfg = RQMixConfig(
                mixer=args.algo[1:], **({"lr": args.lr} if args.lr else {})
            )
            algo = RQMix(env, cfg, num_envs=args.num_envs)
        else:  # qmix / vdn (MLP variants) need the discrete action head
            env = ft.FormationEnv(env.scenario, discrete_action=True)
            cfg = QMixConfig(
                mixer=args.algo, **({"lr": args.lr} if args.lr else {})
            )
            algo = QMix(env, cfg, num_envs=args.num_envs)
        episodic = args.algo in ("rmaddpg", "rmatd3", "rmasac", "rqmix", "rvdn")
        if episodic:
            ts, buf = algo.init(key)
            steps_per_iter = cfg.episodes_per_iter * args.num_envs * env.world_length
        else:
            ts, buf, es, obs = algo.init(key)
            steps_per_iter = cfg.steps_per_iter * args.num_envs
        if args.restore and latest_step(os.path.join(run_dir, "ckpt")):
            ts = restore_checkpoint(os.path.join(run_dir, "ckpt"), {"ts": ts})["ts"]
            print(f"restored checkpoint step {latest_step(os.path.join(run_dir, 'ckpt'))}")
        for i in range(args.iters):
            if episodic:
                ts, buf, m = algo.train_step(ts, buf, jax.random.fold_in(key, i))
            else:
                ts, buf, es, obs, m = algo.train_step(
                    ts, buf, es, obs, jax.random.fold_in(key, i)
                )
            if i % args.log_every == 0:
                m = {k: float(v) for k, v in m.items()}
                logger.log((i + 1) * steps_per_iter, m)
                print(f"iter {i}: {m}")
            if args.save_every and (i + 1) % args.save_every == 0:
                save_checkpoint(os.path.join(run_dir, "ckpt"), i + 1, {"ts": ts})

    logger.plot("mean_step_reward")
    logger.close()
    print(f"done → {run_dir}")


if __name__ == "__main__":
    main()
