#!/usr/bin/env python
"""Isolated timing of the fused hd reward-stats kernel at the N=243 density.

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
from gym_formation_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", "--batch", type=int, default=2048)
    ap.add_argument("-N", "--num-agents", type=int, default=243)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    B, N = args.batch, args.num_agents
    key = jax.random.PRNGKey(0)
    apos = jax.random.uniform(key, (B, N, 2), jnp.float32, -1.0, 1.0)
    ishape = jax.random.uniform(key, (B, N, 2), jnp.float32, -0.5, 0.5)

    @jax.jit
    def run(a):
        haus, ncoll = hd_reward_stats_batched(a, ishape, thresh=0.09)
        return a + 1e-6 * haus[:, None, None], haus.sum() + ncoll.sum()

    a, s = run(apos)
    sv = float(s)
    assert math.isfinite(sv)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        a, s = run(a)
    sv = float(s)
    dt = time.perf_counter() - t0
    assert math.isfinite(sv)
    print(f"reward kernel B={B} N={N}: {dt / args.iters * 1e3:.3f} ms/call")


if __name__ == "__main__":
    main()
