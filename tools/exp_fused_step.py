#!/usr/bin/env python
"""In-process A/B of the N=243 bfs_state rollout paths on TPU:

  a) step-by-step scan, row-major reward kernel   (round-3 shipping path)
  b) step-by-step scan, transposed sym reward kernel
  c) fused physics+reward step, stats='post'
  d) fused physics+reward step, stats='pre' (off-by-one plane sharing)

One process, same seeds, value-fetched windows (CLAUDE.md measurement rules).

Usage: python tools/exp_fused_step.py -B 2048 --chunk 64 --iters 12
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import gym_formation_tpu as ft
from gym_formation_tpu.core.physics import set_reward_impl
from gym_formation_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", "--batch", type=int, default=2048)
    ap.add_argument("--num-agents", type=int, default=243)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--tile", type=int, default=16, help="fused-step tile")
    args = ap.parse_args()

    B, T, N = args.batch, args.chunk, args.num_agents
    env = ft.make_env("formation_hd_env", num_agents=N)

    def bfs_policy(state, key):
        return ft.bfs_actions_from_state(
            ft.ezpolicy_batched, env.scenario, state, 3
        )

    state0 = jax.jit(jax.vmap(lambda k: env.reset(k)[0]))(
        jax.random.split(jax.random.PRNGKey(0), B)
    )

    def measure(tag, run):
        st, s = run(state0, jax.random.PRNGKey(1))
        sv = float(s)
        assert math.isfinite(sv), (tag, sv)
        t0 = time.perf_counter()
        for i in range(args.iters):
            st, s = run(st, jax.random.PRNGKey(2 + i))
        sv = float(s)
        dt = time.perf_counter() - t0
        assert math.isfinite(sv), (tag, sv)
        print(
            f"{tag:42s}: {dt / args.iters / T * 1e3:.3f} ms/step"
            f"  ({args.iters * B * T / dt / 1e6:.3f} M env-steps/s)",
            flush=True,
        )

    def step_path(state, key):
        keys = jax.random.split(key, B)
        state, rsum = jax.vmap(
            lambda s, k: ft.rollout_statepolicy_rewardsum(
                env, bfs_policy, s, k, T
            )
        )(state, keys)
        return state, rsum.sum()

    def fused_path(stats):
        def run(state, key):
            keys = jax.random.split(key, B)
            state, rewards = ft.rollout_statepolicy_fused(
                env, bfs_policy, state, keys, T, stats=stats, tile=args.tile
            )
            return state, rewards.sum()

        return run

    fused_post = jax.jit(fused_path("post"))
    fused_pre = jax.jit(fused_path("pre"))

    def fused_bfs(state, key):
        keys = jax.random.split(key, B)
        state, rewards = ft.rollout_statepolicy_fused(
            env, None, state, keys, T,
            stats="pre", tile=args.tile, policy="bfs_ez",
        )
        return state, rewards.sum()

    fused_bfs = jax.jit(fused_bfs)

    for r in range(args.repeat):
        # fresh jit wrapper per impl flip: a cached trace would keep the
        # previously dispatched reward kernel baked in
        set_reward_impl("rowmajor")
        measure(
            f"round{r} step path, rowmajor reward",
            jax.jit(lambda s, k: step_path(s, k)),
        )
        set_reward_impl("sym")
        measure(
            f"round{r} step path, sym reward",
            jax.jit(lambda s, k: step_path(s, k)),
        )
        measure(f"round{r} fused step, stats=post", fused_post)
        measure(f"round{r} fused step, stats=pre", fused_pre)
        measure(f"round{r} fused step, pre + in-kernel bfs", fused_bfs)
        set_reward_impl("auto")


if __name__ == "__main__":
    main()
