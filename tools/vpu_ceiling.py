#!/usr/bin/env python
"""Measure the achievable VPU f32 rate on this chip for the op mixes the
pair kernels actually run (VERDICT r3 task 2).

Three Pallas microkernels, timed with value-fetched windows:

1. ``fma``      — pure dependent-chain FMA on [512, 128] f32 vregs: the
                  hardware's elementwise multiply-add ceiling.
2. ``mix``      — the exact transcendental chain of the pair-force kernel
                  (rsqrt / exp / log1p / abs / max plus FMAs) on flat vregs.
3. ``pairlike`` — a self-contained replica of one triangle-kernel cell:
                  build the [T, T, 128] pair plane from two [T, 128] refs by
                  sublane broadcast, run the mix, reduce rows and columns —
                  the achievable ceiling for the production shape.

Each kernel reports element-throughput and an "op-slot" rate (1 slot = one
VPU ALU issue; transcendentals counted as 1 slot each, which makes the
reported rate a LOWER bound on utilization if the hardware needs several
cycles per transcendental).  The punchline feeds RESULTS.md's measured-
ceilings table and replaces the unmeasured "~49 TFLOP/s f32 vector peak"
constant in roofline.py.

Usage:  python tools/vpu_ceiling.py            # TPU (default backend)
        env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/vpu_ceiling.py --interpret --reps 2 --inner 8
"""

import argparse
import functools
import json
import math
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _fma_kernel(x_ref, o_ref, *, inner, unroll):
    v = x_ref[:, :]
    a = v * 0.999999 + 1e-7  # distinct per-cell values (x differs per block)
    b = v * 1e-6

    def body(_, v):
        # unrolled chain: Mosaic fuses the consecutive elementwise ops, so v
        # round-trips VMEM once per `unroll` FMAs instead of once per FMA —
        # without this the probe measures VMEM load/store, not the ALUs
        for _ in range(unroll):
            v = v * a + b
        return v

    o_ref[:, :] = jax.lax.fori_loop(0, inner, body, v)


def _mix_kernel(x_ref, o_ref, *, inner, k, invk, cf, dmin):
    """Per iteration: the full pair-force scalar chain on flat vregs, with a
    dependence through the accumulator so nothing hoists."""
    xi = x_ref[:, :]
    xj = xi * 0.5 + 0.01

    def body(_, carry):
        xi, acc = carry
        dx = xi - xj
        s = jnp.maximum(dx * dx + dx * dx, 1e-24)
        r = jax.lax.rsqrt(s)
        dist = s * r
        z = (dmin - dist) * invk
        u = jnp.exp(-jnp.abs(z))
        pen = (jnp.maximum(z, 0.0) + jnp.log1p(u)) * k
        coef = (cf * pen) * r
        acc = acc + coef * dx
        return xi + acc * 1e-12, acc

    _, acc = jax.lax.fori_loop(0, inner, body, (xi, jnp.zeros_like(xi)))
    o_ref[:, :] = acc


def _pairlike_kernel(x_ref, y_ref, fx_ref, fy_ref, *, inner, tile, k, invk, cf, dmin):
    """One triangle-kernel cell per iteration: [T,128] x [T,128] -> [T,T,128]
    pair plane -> mix -> row+col force reductions.  Matches
    pairforce_sym._kernel_loop's pair_block + accumulation structure."""
    xi = x_ref[:, :]  # [T, BL]
    yi = y_ref[:, :]

    def body(_, carry):
        xi_c, yi_c, fx, fy = carry
        dx = xi_c[:, None, :] - (xi_c * 0.7)[None, :, :]  # [T, T, BL]
        dy = yi_c[:, None, :] - (yi_c * 0.7)[None, :, :]
        s = jnp.maximum(dx * dx + dy * dy, 1e-24)
        r = jax.lax.rsqrt(s)
        dist = s * r
        z = (dmin - dist) * invk
        u = jnp.exp(-jnp.abs(z))
        pen = (jnp.maximum(z, 0.0) + jnp.log1p(u)) * k
        coef = (cf * pen) * r
        fxc = coef * dx
        fyc = coef * dy
        fx = fx + jnp.sum(fxc, axis=1) - jnp.sum(fxc, axis=0)
        fy = fy + jnp.sum(fyc, axis=1) - jnp.sum(fyc, axis=0)
        return xi_c + fx * 1e-12, yi_c + fy * 1e-12, fx, fy

    _, _, fx, fy = jax.lax.fori_loop(
        0, inner, body, (xi, yi, jnp.zeros_like(xi), jnp.zeros_like(yi))
    )
    fx_ref[:, :] = fx
    fy_ref[:, :] = fy


def _time_calls(fn, args, reps, pipeline):
    out = fn(*args)
    v = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    assert math.isfinite(v), v
    t0 = time.perf_counter()
    for _ in range(reps):
        for _ in range(pipeline):
            out = fn(*args)
            args = (out[0] if isinstance(out, tuple) else out,) + tuple(args[1:])
    v = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / (reps * pipeline)
    assert math.isfinite(v), v
    return dt


def _mxu_probes(args):
    """MXU ceiling at the N=243 update's ACTUAL contraction shapes
    (VERDICT r4 task 2b): the epoch's dominant matmuls are

    1. the [N, N-1] 0/1-triangle contraction  einsum('ik,mkh->mih')
       (structured_obs prefix sums, models/structured_obs.py) — batched
       [243, 242] @ [242, 64] over the sample axis;
    2. the MLP tail  [M·243, 64] @ [64, 64] — a skinny-K shape that can
       occupy at most 64/128 of the systolic array's K dimension;
    3. a [4096]³ square matmul — the chip's practical peak for reference.

    Each probed in f32 and bf16 (f32 accumulation), value-fetched timing.
    Every dispatch runs an INNER-deep data-dependent chain of the matmul --
    the tunnel's per-execution round trip is ~26-37 ms (CLAUDE.md), so a
    single matmul per dispatch measures RPC amortization, not compute
    (the first cut of this probe fell to exactly that).
    The implied-TFLOP/s column against the epoch probe of
    tools/bench_mappo_split.py --decomp is the update's MFU denominator.
    """
    results = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    M = args.mxu_m
    N, H = 243, 64
    INNER = 16
    key = jax.random.PRNGKey(0)

    def timeit(fn, a, flops):
        out = fn(*a)
        v = float(jnp.asarray(out).ravel()[0])
        assert math.isfinite(v), v
        t0 = time.perf_counter()
        for _ in range(args.reps * args.pipeline):
            out = fn(*a)
        v = float(jnp.asarray(out).ravel()[0])
        dt = (time.perf_counter() - t0) / (args.reps * args.pipeline)
        assert math.isfinite(v), v
        return {"ms": round(dt * 1e3, 3), "tflops_per_s": round(flops / dt / 1e12, 2)}

    def chain(body):
        def fn(*ops):
            return jax.lax.fori_loop(
                0, INNER, lambda i, y: body(y, *ops[1:]), ops[0]
            ).sum()

        return jax.jit(fn)

    for dt_name, dt_ty in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        tri = jnp.tril(jnp.ones((N, N - 1), dt_ty), -1)
        d = (jax.random.normal(key, (M, N - 1, H)) * 0.1).astype(dt_ty)

        def tri_body(y, t, _ty=dt_ty):
            p = jnp.einsum(
                "ik,mkh->mih", t, y, preferred_element_type=jnp.float32
            )
            return (p[:, : N - 1, :] * 0.008).astype(_ty)

        results[f"triangle_{dt_name}"] = timeit(
            chain(tri_body), (d, tri), INNER * 2.0 * M * N * (N - 1) * H
        )

        rows = M * N // 8  # the tail sees M*243 rows; probe a slice
        xt = (jax.random.normal(key, (rows, H)) * 0.5).astype(dt_ty)
        wt = (jax.random.normal(key, (H, H)) * 0.1).astype(dt_ty)

        def tail_body(y, w, _ty=dt_ty):
            return (
                jnp.dot(y, w, preferred_element_type=jnp.float32) * 0.3
            ).astype(_ty)

        results[f"tail64_{dt_name}"] = timeit(
            chain(tail_body), (xt, wt), INNER * 2.0 * rows * H * H
        )

        n = 4096
        a = (jax.random.normal(key, (n, n)) * 0.5).astype(dt_ty)
        b = (jax.random.normal(key, (n, n)) * (1.0 / 48.0)).astype(dt_ty)

        def sq_body(y, w, _ty=dt_ty):
            return jnp.dot(
                y, w, preferred_element_type=jnp.float32
            ).astype(_ty)

        results[f"square4096_{dt_name}"] = timeit(
            chain(sq_body), (a, b), INNER * 2.0 * n**3
        )

    results["note"] = (
        "triangle/tail at the N=243 B=1024 update shapes (M=%d, %d-deep "
        "in-dispatch chains); compare tflops_per_s against the epoch probe "
        "of bench_mappo_split --decomp for the update MFU" % (M, INNER)
    )
    print(json.dumps(results, indent=1, default=float))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=512, help="sublane rows per flat block")
    p.add_argument("--grid", type=int, default=64, help="grid cells per call")
    p.add_argument("--inner", type=int, default=512, help="fori_loop iterations")
    p.add_argument("--unroll", type=int, default=16, help="FMAs per VMEM round trip in the fma probe")
    p.add_argument("--tile", type=int, default=32, help="pairlike tile (production: 32)")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--pipeline", type=int, default=8, help="calls per fetch")
    p.add_argument("--interpret", action="store_true")
    p.add_argument("--mxu", action="store_true",
                   help="probe the MXU at the N=243 update's matmul shapes "
                   "instead of the VPU mixes (VERDICT r4 task 2b)")
    p.add_argument("--mxu-m", type=int, default=8192,
                   help="sample-batch axis for the MXU probes")
    args = p.parse_args()

    if args.mxu:
        return _mxu_probes(args)

    R, G, I, T = args.rows, args.grid, args.inner, args.tile
    k, invk, cf, dmin = 1e-3, 1e3, 100.0, 0.06
    results = {"backend": jax.default_backend(), "device": str(jax.devices()[0])}

    # ---- pure FMA ----------------------------------------------------------
    x = jax.random.uniform(jax.random.PRNGKey(0), (G * R, LANE), jnp.float32, 0.5, 1.0)
    spec = pl.BlockSpec((R, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    fma = jax.jit(
        pl.pallas_call(
            functools.partial(_fma_kernel, inner=I, unroll=args.unroll),
            grid=(G,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((G * R, LANE), jnp.float32),
            interpret=args.interpret,
        )
    )
    dt = _time_calls(fma, (x,), args.reps, args.pipeline)
    elems = G * R * LANE * I * args.unroll
    results["fma"] = {
        "ms": round(dt * 1e3, 3),
        "elems_per_s": elems / dt,
        "fma_flops_per_s": 2.0 * elems / dt,  # 1 FMA = 2 FLOP convention
        "fma_slots_per_s": elems / dt,  # 1 FMA = 1 VPU issue slot
        "unroll": args.unroll,
    }

    # ---- transcendental mix ------------------------------------------------
    # slots/elem/iter: dx1 mul1 fma1 max1 rsqrt1 mul1 sub1 mul1 neg1 abs1
    # exp1 log1p1 max1 add1 mul1 mul1 mul1 fma(acc)1 fma(dep)1 = 19
    MIX = 19
    mix = jax.jit(
        pl.pallas_call(
            functools.partial(_mix_kernel, inner=I, k=k, invk=invk, cf=cf, dmin=dmin),
            grid=(G,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((G * R, LANE), jnp.float32),
            interpret=args.interpret,
        )
    )
    dt = _time_calls(mix, (x,), args.reps, args.pipeline)
    elems = G * R * LANE * I
    results["mix"] = {
        "ms": round(dt * 1e3, 3),
        "elems_per_s": elems / dt,
        "slots_per_elem": MIX,
        "slots_per_s": MIX * elems / dt,
    }

    # ---- pairlike (production shape) ---------------------------------------
    # per PAIR element (T*T*BL) per iter: dx1 dy1 mul1 fma1 max1 rsqrt1 mul1
    # sub1 mul1 neg1 abs1 exp1 log1p1 max1 add1 mul1 mul1 mul1 fxc1 fyc1
    # + 4 reduction adds (row+col for fx,fy) = 25 ; plus O(T*BL) carry fmas
    PAIR = 25
    gi = max(1, G // 8)
    xp = jax.random.uniform(jax.random.PRNGKey(1), (gi * T, LANE), jnp.float32, -0.5, 0.5)
    yp = jax.random.uniform(jax.random.PRNGKey(2), (gi * T, LANE), jnp.float32, -0.5, 0.5)
    pspec = pl.BlockSpec((T, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pair = jax.jit(
        pl.pallas_call(
            functools.partial(
                _pairlike_kernel, inner=I, tile=T, k=k, invk=invk, cf=cf, dmin=dmin
            ),
            grid=(gi,),
            in_specs=[pspec, pspec],
            out_specs=[pspec, pspec],
            out_shape=[
                jax.ShapeDtypeStruct((gi * T, LANE), jnp.float32),
                jax.ShapeDtypeStruct((gi * T, LANE), jnp.float32),
            ],
            interpret=args.interpret,
        )
    )

    def pair_fn(xp, yp):
        return pair(xp, yp)

    dt = _time_calls(jax.jit(pair_fn), (xp, yp), args.reps, args.pipeline)
    pair_elems = gi * T * T * LANE * I
    results["pairlike"] = {
        "ms": round(dt * 1e3, 3),
        "pair_slots_per_s": pair_elems / dt,
        "slots_per_pair": PAIR,
        "op_slots_per_s": PAIR * pair_elems / dt,
    }

    # summary in TFLOP-ish units (slots/s; 1 slot = 1 ALU issue)
    results["summary_tslots_per_s"] = {
        "fma": round(results["fma"]["fma_slots_per_s"] / 1e12, 3),
        "fma_as_2flop": round(results["fma"]["fma_flops_per_s"] / 1e12, 3),
        "mix": round(results["mix"]["slots_per_s"] / 1e12, 3),
        "pairlike": round(results["pairlike"]["op_slots_per_s"] / 1e12, 3),
        "pairlike_pairs_per_s_G": round(
            results["pairlike"]["pair_slots_per_s"] / 1e9, 2
        ),
    }
    print(json.dumps(results, indent=1, default=float))


if __name__ == "__main__":
    sys.exit(main())
