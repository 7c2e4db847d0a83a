#!/usr/bin/env python
"""Which formulation of the MLP-tail matmul is fastest on this chip?

The r5 update decomposition (tools/bench_mappo_split.py --decomp) shows the
N=243 PPO update is ~97% actor fwd+bwd, and the MXU probe
(tools/vpu_ceiling.py --mxu) shows its [M·243, 64] @ [64, 64] tail shape
reaching only ~1.7 (f32) / 2.5 (bf16) TFLOP/s against a 100 TFLOP/s
square-matmul chip peak — the K=N=64 shape under-fills the 128×128 systolic
array and XLA may route it to the VPU entirely.  This experiment times the
same contraction in several formulations to find (or rule out) a faster one:

  a. rows64:   x[R, 64] @ w[64, 64]                  (the production shape)
  b. rows64T:  (w.T @ x.T).T                         (lanes on the R axis)
  c. bf16:     bf16 operands, f32 accumulation
  d. dual:     x[R, 64] @ w2[64, 128] — TWO stacked 64-wide layers' kernels
               in one call (fills the MXU's N axis; usable in the real model
               only where two independent 64-out matmuls share an input)
  e. relu-fused: relu(x @ w + b) (does the epilogue change the lowering?)
  f. square:   x[R, 128] @ w[128, 128] rate for reference at equal R

Honest timing per CLAUDE.md: pipelined calls closed by a host value fetch,
finiteness asserted; 3 interleaved rounds.
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gym_formation_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def timeit(fn, args_, flops, reps, pipeline):
    out = fn(*args_)
    v = float(jnp.asarray(out).ravel()[0])
    assert math.isfinite(v), v
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(pipeline):
            out = fn(*args_)
        v = float(jnp.asarray(out).ravel()[0])
        dt = (time.perf_counter() - t0) / pipeline
        assert math.isfinite(v), v
        best = dt if best is None else min(best, dt)
    return best, flops / best / 1e12


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=1024 * 243)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--pipeline", type=int, default=8)
    args = p.parse_args()
    R = args.rows
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (R, 64), jnp.float32)
    w = jax.random.normal(key, (64, 64), jnp.float32)
    b = jax.random.normal(key, (64,), jnp.float32)
    w2 = jax.random.normal(key, (64, 128), jnp.float32)
    x128 = jax.random.normal(key, (R, 128), jnp.float32)
    wsq = jax.random.normal(key, (128, 128), jnp.float32)
    fl = 2.0 * R * 64 * 64

    cases = [
        ("a_rows64_f32", jax.jit(lambda x, w: (x @ w).sum()), (x, w), fl),
        (
            "b_rows64T_f32",
            jax.jit(lambda x, w: (w.T @ x.T).sum()),
            (x, w),
            fl,
        ),
        (
            "c_rows64_bf16",
            jax.jit(
                lambda x, w: jnp.dot(
                    x.astype(jnp.bfloat16),
                    w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ).sum()
            ),
            (x, w),
            fl,
        ),
        ("d_dual128_f32", jax.jit(lambda x, w2: (x @ w2).sum()), (x, w2), 2 * fl),
        (
            "d_dual128_bf16",
            jax.jit(
                lambda x, w2: jnp.dot(
                    x.astype(jnp.bfloat16),
                    w2.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ).sum()
            ),
            (x, w2),
            2 * fl,
        ),
        (
            "e_relu_fused_f32",
            jax.jit(lambda x, w: jax.nn.relu(x @ w + b).sum()),
            (x, w),
            fl,
        ),
        (
            "f_square128_f32",
            jax.jit(lambda x, w: (x @ w).sum()),
            (x128, wsq),
            2 * fl,
        ),
        (
            "f_square128_bf16",
            jax.jit(
                lambda x, w: jnp.dot(
                    x.astype(jnp.bfloat16),
                    w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ).sum()
            ),
            (x128, wsq),
            2 * fl,
        ),
    ]
    # 3 interleaved rounds so tunnel-neighbor load hits all variants equally
    results = {name: [] for name, *_ in cases}
    for _ in range(3):
        for name, fn, a, flops in cases:
            dt, tf = timeit(fn, a, flops, args.reps, args.pipeline)
            results[name].append((dt * 1e3, tf))
    print(f"rows={R}")
    for name, vals in results.items():
        best = max(v[1] for v in vals)
        ms = min(v[0] for v in vals)
        print(f"{name:>18}: {ms:7.3f} ms  {best:6.2f} TFLOP/s  "
              f"(rounds: {', '.join(f'{v[1]:.2f}' for v in vals)})")


if __name__ == "__main__":
    main()
