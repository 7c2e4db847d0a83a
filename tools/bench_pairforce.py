#!/usr/bin/env python
"""A/B the pair-force kernel implementations (XLA / dense Pallas / culled
Pallas) in isolation and inside the full N=243 bfs_state rollout.

Honest timing per CLAUDE.md: every timed window pipelines >=16 executions and
closes with a host value fetch of a quantity data-dependent on the whole run,
plus a finiteness assert.

Usage:
    python tools/bench_pairforce.py --mode kernel --num-agents 243 -B 1024
    python tools/bench_pairforce.py --mode rollout --num-agents 243 -B 2048
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
from gym_formation_tpu.core import physics
from gym_formation_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def bench_kernel(args):
    env = ft.make_env("formation_hd_env", num_agents=args.num_agents)
    cfg = env.cfg
    B, E = args.batch, cfg.n_entities
    # spread matches the reset distribution (uniform +-1)
    pos = jax.random.uniform(
        jax.random.PRNGKey(0), (B, E, 2), jnp.float32, -1.0, 1.0
    )

    results = {}
    variants = [args.only] if args.only else ["xla", "dense", "sym", "cull"]
    for name in variants:
        physics.set_pallas_mode("off" if name == "xla" else "on")
        physics.set_pallas_impl(name if name in ("cull", "sym") else "dense")

        # one small jitted program (fast remote compile); iterations are
        # pipelined from the host and chained through a data dependency so
        # nothing is dead-code-eliminated, closed by a host value fetch
        @jax.jit
        def run(q):
            f = jax.vmap(lambda e: physics.collision_forces(e, cfg))(q)
            return q + 1e-6 * f, f.sum()

        q, s = run(pos)
        sv = float(s)
        assert math.isfinite(sv), (name, sv)
        iters = args.iters
        t0 = time.perf_counter()
        for _ in range(iters):
            q, s = run(q)
        sv = float(s)
        dt = time.perf_counter() - t0
        assert math.isfinite(sv), (name, sv)
        ms = dt / iters * 1e3
        results[name] = ms
        print(f"{name:>6}: {ms:.3f} ms/call  (B={B}, E={E})", flush=True)
    physics.set_pallas_mode("auto")
    physics.set_pallas_impl("auto")
    return results


def bench_rollout(args):
    env = ft.make_env("formation_hd_env", num_agents=args.num_agents)
    B, T = args.batch, args.chunk
    n_per_layer = 3

    results = {}
    variants = (
        [args.only]
        if args.only in ("dense", "cull", "sym")
        else ["dense", "sym"]
    )
    for name in variants:
        physics.set_pallas_mode("auto")
        physics.set_pallas_impl(name)

        def policy(state, key):
            return ft.bfs_actions_from_state(
                ft.ezpolicy_batched, env.scenario, state, n_per_layer
            )

        @jax.jit
        def run_chunk(state, key):
            keys = jax.random.split(key, B)
            state, rsum = jax.vmap(
                lambda s, k: ft.rollout_statepolicy_rewardsum(env, policy, s, k, T)
            )(state, keys)
            return state, rsum.sum()

        state = jax.jit(jax.vmap(lambda k: env.reset(k)[0]))(
            jax.random.split(jax.random.PRNGKey(0), B)
        )
        state, r = run_chunk(state, jax.random.PRNGKey(1))
        rv = float(r)
        assert math.isfinite(rv), (name, rv)
        iters = args.iters
        t0 = time.perf_counter()
        for i in range(iters):
            state, r = run_chunk(state, jax.random.PRNGKey(2 + i))
        rv = float(r)
        dt = time.perf_counter() - t0
        assert math.isfinite(rv), (name, rv)
        sps = iters * B * T / dt
        results[name] = sps
        print(
            f"{name:>6}: {sps/1e6:.3f} M env-steps/s "
            f"({dt/iters*1e3:.1f} ms/chunk, B={B}, T={T}, N={args.num_agents})"
        )
    physics.set_pallas_impl("auto")
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["kernel", "rollout"], default="kernel")
    p.add_argument("--num-agents", type=int, default=243)
    p.add_argument("-B", "--batch", type=int, default=1024)
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument(
        "--only", choices=["xla", "dense", "cull", "sym"], default=None,
        help="run a single variant (one remote compile per process)",
    )
    args = p.parse_args()
    (bench_kernel if args.mode == "kernel" else bench_rollout)(args)


if __name__ == "__main__":
    main()
