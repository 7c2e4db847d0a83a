#!/usr/bin/env python
"""Which formulation of the MLP-tail matmul is fastest on this chip?

The r5 update decomposition (tools/bench_mappo_split.py --decomp) shows the
N=243 PPO update is ~97% actor fwd+bwd, and its MLP tail contracts
[M·243, 64] @ [64, 64] — a K=N=64 shape that under-fills the 128×128
systolic array.  This experiment times the same contraction in several
formulations to find (or rule out) a faster one.

Measurement note (the first cut of this tool got this wrong): each timed
call must run MANY matmuls inside ONE dispatch — a data-dependent
``fori_loop`` chain — because the tunnel's per-execution round trip is
~26-37 ms (CLAUDE.md) and an 8-call pipeline of single matmuls measures
RPC amortization, not compute (observed: every variant "took" 3.4 ms).

Variants (each a 64-matmul chain per dispatch, scaled to avoid overflow):

  a. rows64 f32:   y <- (y[R,64] @ w[64,64]) * s          (production shape)
  c. rows64 bf16:  same, bf16 operands end-to-end
  d. dual128:      y <- ((y @ w2[64,128]) @ w2b[128,64]) * s  — fills the
                   MXU's N axis; usable where two 64-wide layers chain
  f. square128:    y[R,128] @ w[128,128] reference at equal rows
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

INNER = 64  # matmuls per dispatch


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


def chain(matmul_body):
    """64-deep data-dependent chain in one jit."""

    def fn(*ops):
        y = ops[0]

        def body(_, y):
            return matmul_body(y, *ops[1:])

        return jax.lax.fori_loop(0, INNER, body, y).sum()

    return jax.jit(fn)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=1024 * 243)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--pipeline", type=int, default=4)
    args = p.parse_args()
    R = args.rows
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (R, 64), jnp.float32)
    w = jax.random.normal(key, (64, 64), jnp.float32) * 0.1
    w2 = jax.random.normal(key, (64, 128), jnp.float32) * 0.1
    w2b = jax.random.normal(key, (128, 64), jnp.float32) * 0.1
    x128 = jax.random.normal(key, (R, 128), jnp.float32)
    wsq = jax.random.normal(key, (128, 128), jnp.float32) * 0.08
    fl = INNER * 2.0 * R * 64 * 64

    cases = [
        ("a_rows64_f32", chain(lambda y, w: (y @ w) * 0.2), (x, w), fl),
        (
            "c_rows64_bf16",
            chain(
                lambda y, w: (
                    jnp.dot(y, w, preferred_element_type=jnp.float32)
                    .astype(jnp.bfloat16) * 0.2
                )
            ),
            (x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)),
            fl,
        ),
        (
            "d_dual128_f32",
            chain(lambda y, w2, w2b: ((y @ w2) @ w2b) * 0.05),
            (x, w2, w2b),
            2 * fl,  # two matmuls of 2·R·64·128 = 4x a single 64³... per body
        ),
        (
            "d_dual128_bf16",
            chain(
                lambda y, w2, w2b: (
                    jnp.dot(
                        jnp.dot(y, w2, preferred_element_type=jnp.float32)
                        .astype(jnp.bfloat16),
                        w2b, preferred_element_type=jnp.float32,
                    ).astype(jnp.bfloat16) * 0.05
                )
            ),
            (x.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
             w2b.astype(jnp.bfloat16)),
            2 * fl,
        ),
        ("f_square128_f32", chain(lambda y, w: (y @ w) * 0.1), (x128, wsq),
         2 * fl),
        (
            "f_square128_bf16",
            chain(
                lambda y, w: (
                    jnp.dot(y, w, preferred_element_type=jnp.float32)
                    .astype(jnp.bfloat16) * 0.1
                )
            ),
            (x128.astype(jnp.bfloat16), wsq.astype(jnp.bfloat16)),
            2 * fl,
        ),
    ]
    # dual128 body = y@w2 ([R,64]x[64,128]) + (..)@w2b ([R,128]x[128,64])
    # = 2·R·64·128·2 FLOP = 2× the single-64³-matmul body; same per-FLOP basis
    results = {name: [] for name, *_ in cases}
    for _ in range(3):  # interleaved rounds: tunnel noise hits all equally
        for name, fn, a, flops in cases:
            dt, tf = timeit(fn, a, flops, args.reps, args.pipeline)
            results[name].append((dt * 1e3, tf))
    print(f"rows={R} inner={INNER}")
    for name, vals in results.items():
        best = max(v[1] for v in vals)
        ms = min(v[0] for v in vals)
        print(f"{name:>18}: {ms:8.2f} ms/dispatch  {best:6.2f} TFLOP/s  "
              f"(rounds: {', '.join(f'{v[1]:.2f}' for v in vals)})")


if __name__ == "__main__":
    main()
