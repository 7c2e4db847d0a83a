#!/usr/bin/env python
"""Isolated A/B timing of the hd reward-stats kernels at the N=243 density.

Round-4: compares the row-major kernel (ops/pallas/reward.py) against the
transposed-lane triangle kernel (ops/pallas/reward_sym.py) in ONE process
(tunnel-neighbor load makes cross-process numbers vary ~2x — CLAUDE.md).

Usage: python tools/exp_reward_kernel.py -B 2048
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gym_formation_tpu.ops.pallas.reward import hd_reward_stats_batched
from gym_formation_tpu.ops.pallas.reward_sym import hd_reward_stats_sym
from gym_formation_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def time_variant(name, fn, apos, ishape, iters):
    @jax.jit
    def run(a):
        haus, ncoll = fn(a, ishape)
        return a + 1e-6 * haus[:, None, None], haus.sum() + ncoll.sum()

    a, s = run(apos)
    sv = float(s)
    assert math.isfinite(sv)
    t0 = time.perf_counter()
    for _ in range(iters):
        a, s = run(a)
    sv = float(s)
    dt = time.perf_counter() - t0
    assert math.isfinite(sv)
    print(f"{name:>44s}: {dt / iters * 1e3:.3f} ms/call")
    return dt / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", "--batch", type=int, default=2048)
    ap.add_argument("-N", "--num-agents", type=int, default=243)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--repeat", type=int, default=2, help="A/B rounds")
    args = ap.parse_args()

    B, N = args.batch, args.num_agents
    key = jax.random.PRNGKey(0)
    apos = jax.random.uniform(key, (B, N, 2), jnp.float32, -1.0, 1.0)
    ishape = jax.random.uniform(key, (B, N, 2), jnp.float32, -0.5, 0.5)

    variants = [
        (
            "rowmajor (reward.py)",
            lambda a, s: hd_reward_stats_batched(a, s, thresh=0.03),
        ),
        (
            "sym tile=32 (reward_sym.py)",
            lambda a, s: hd_reward_stats_sym(a, s, thresh=0.03),
        ),
        (
            "sym tile=16",
            lambda a, s: hd_reward_stats_sym(a, s, thresh=0.03, tile=16),
        ),
    ]
    print(f"B={B} N={N} iters={args.iters}")
    for r in range(args.repeat):
        for name, fn in variants:
            time_variant(name, fn, apos, ishape, args.iters)


if __name__ == "__main__":
    main()
