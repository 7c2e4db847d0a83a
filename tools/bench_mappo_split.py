#!/usr/bin/env python
"""Split-time the MAPPO train iteration: collection scan vs PPO update.

Grounds the VERDICT r2 item-4 work (closing the bench-vs-training gap at
small N): before fusing anything, measure where the 16.9 ms/iter actually
goes.  Honest timing per CLAUDE.md: pipelined windows closed by a host
value fetch of a run-dependent quantity, finiteness asserted.

Usage: python tools/bench_mappo_split.py [-n 3] [-B 1024] [--iters 32]
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
from gym_formation_tpu.algos import MAPPO, MAPPOConfig
from gym_formation_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def timed(tag, fn, state, iters, fetch):
    out = fn(state)  # warmup/compile
    v = float(fetch(out))
    assert math.isfinite(v), (tag, v)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out if isinstance(out, type(state)) else state)
    v = float(fetch(out))
    dt = time.perf_counter() - t0
    assert math.isfinite(v), (tag, v)
    print(f"{tag:>28}: {dt / iters * 1e3:8.2f} ms/iter", flush=True)
    return dt / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-n", "--num-agents", type=int, default=3)
    p.add_argument("-B", "--num-envs", type=int, default=1024)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--fused", action="store_true",
                   help="fused-collection kernel (ops/pallas/fused_collect)")
    p.add_argument("--fused-update", action="store_true",
                   help="fused PPO-grad kernel (ops/pallas/fused_ppo_grad)")
    args = p.parse_args()

    env = ft.make_env("formation_hd_env", num_agents=args.num_agents)
    algo = MAPPO(
        env,
        MAPPOConfig(
            fused_collect=args.fused, fused_update=args.fused_update
        ),
        num_envs=args.num_envs,
    )
    ts, es, obs = algo.init(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(1)

    # full train_step (chained through its own outputs; donate the carry —
    # without it the wrapper holds two generations of the [T·B, ...]
    # trajectory-scale buffers and OOMs at N=243 B>=1024)
    from functools import partial as _partial

    @_partial(jax.jit, donate_argnums=(0,))
    def full(carry):
        ts, es, obs = carry
        ts, es, obs, m = algo.train_step(ts, es, obs, key)
        return (ts, es, obs, m["v_loss"])

    o = full((ts, es, obs))  # donates the init tuple
    v = float(o[3])
    assert math.isfinite(v)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        o = full(o[:3])
    v = float(o[3])
    dt_full = (time.perf_counter() - t0) / args.iters
    assert math.isfinite(v)
    print(f"{'full train_step':>28}: {dt_full * 1e3:8.2f} ms/iter", flush=True)

    # collection only — fresh tuple (the full phase donated the first one);
    # mirror the path train_step actually resolved (structured_obs auto-on
    # at N>=32 replaces both scan and fused collect)
    ts, es, obs = algo.init(jax.random.PRNGKey(0))
    if algo.structured_obs:
        collect_fn = algo._collect_structured
    elif algo.fused_collect:
        collect_fn = algo._collect_fused
    else:
        collect_fn = algo._collect

    @_partial(jax.jit, donate_argnums=(0,))
    def collect(carry):
        es, obs = carry
        es2, obs2, traj, bench, last_v = collect_fn(ts, es, obs, key)
        return (es2, obs2, traj["reward"].sum() + last_v.sum())

    r = collect((es, obs))  # donates the fresh tuple
    v = float(r[2])
    assert math.isfinite(v)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        r = collect((r[0], r[1]))
    v = float(r[2])
    dt_col = (time.perf_counter() - t0) / args.iters
    assert math.isfinite(v)
    print(f"{'collect scan only':>28}: {dt_col * 1e3:8.2f} ms/iter", flush=True)

    print(
        f"{'implied update+GAE':>28}: {(dt_full - dt_col) * 1e3:8.2f} ms/iter",
        flush=True,
    )


if __name__ == "__main__":
    main()
