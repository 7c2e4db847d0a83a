"""Whole-rollout fused kernel for the formation_hd + ezpolicy workload.

The XLA path executes each env step as ~25 small kernels (policy, physics,
reward, reset machinery), and at N=3 every one of them is latency-bound —
the measured rollout runs ~20x above its HBM speed-of-light.  This kernel
runs the ENTIRE T-step rollout for a block of envs inside one Pallas
program: state lives in vectors over the batch-lane axis for the whole
chunk, and only the chunk-boundary state plus one reward accumulator ever
touch HBM.

Semantics fused (all cited against the step-by-step path they replace):

* ezpolicy from state quantities — identical actions to the obs-consuming
  policy (`models/scripted.py`; the obs tensor is interface overhead, the
  same argument as `rollout_statepolicy`).
* point-mass physics among the N agents (`core/physics.py`: action force,
  softplus contact forces, damped Euler; landmarks are non-collide/static
  in this scenario so they drop out of the dynamics entirely).
* Hausdorff + velocity + collision reward, shared across agents
  (`envs/formation_hd.py:reward`, reference ``formation_hd_env.py:61-75``).
* time-limit done + auto-reset with in-kernel PRNG
  (`env.py:step`; reset draw order matches ``formation_hd_env.py:77-95``
  but uses the TPU core PRNG, so post-reset trajectories are a different —
  equally valid — sample of the same MDP than the jax.random path).

Layout: struct-of-arrays over the batch.  Every per-agent scalar is a row
of a ``[rows, B]`` f32 plane; the batch axis maps onto VPU lanes; the
小 agent/vertex axes are unrolled or reduced across sublanes.  Landmark
positions are NOT carried: after ``pre_obs`` they are always
``ideal_shape + centroid(agents)``, so the wrapper reconstructs them at
chunk boundaries.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

LANE = 128


class SoAState(NamedTuple):
    """Transposed rollout state: [rows, B] planes (see module docstring)."""

    ap: Array  # [2N, B] agent pos (x rows then y rows)
    av: Array  # [2N, B] agent vel
    ishape: Array  # [2N, B] ideal shape (centered)
    ivel: Array  # [2, B] ideal velocity
    t: Array  # [1, B] int32 step counter


def _argmin_first(slices):
    """(val, idx) elementwise argmin over a small static list; ties -> lowest
    index (matches jnp.argmin / the reference's ranked walk)."""
    best, idx = slices[0], jnp.zeros_like(slices[0], jnp.int32)
    for i, v in enumerate(slices[1:], start=1):
        take = v < best
        best = jnp.where(take, v, best)
        idx = jnp.where(take, i, idx)
    return best, idx


def _argmax_last(slices):
    """Elementwise argmax index; ties -> HIGHEST index (mirrors argsort's
    stable ranking putting the last-ranked among equal maxima at the highest
    index — see models/scripted.py)."""
    best, idx = slices[0], jnp.zeros_like(slices[0], jnp.int32)
    for i, v in enumerate(slices[1:], start=1):
        take = v >= best
        best = jnp.where(take, v, best)
        idx = jnp.where(take, i, idx)
    return idx


def _softplus(z):
    """Stable log(1+exp(z)), the contact penetration (core/physics.py)."""
    return jnp.maximum(z, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(z)))


def _hash_u32(x):
    """murmur3 finalizer: avalanche a uint32 counter into random bits."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _uniform_pm1(seed, it, lane, rows):
    """Uniform [-1, 1) f32, shape [rows, B]: counter-based hash RNG keyed by
    (seed, loop iteration, row, global lane).  Pure jnp so the identical
    stream runs on TPU and in interpret mode (pltpu.prng_* has no CPU
    lowering).  ``lane``: [1, B] global env indices."""
    row = jax.lax.broadcasted_iota(jnp.uint32, (rows, 1), 0)
    ctr = (
        seed.astype(jnp.uint32) * jnp.uint32(2654435761)
        ^ it.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        ^ row * jnp.uint32(0x27D4EB2F)
    )
    bits = _hash_u32(ctr + lane.astype(jnp.uint32))
    # Mosaic has no uint32->f32 cast; the top-24 bits fit int32 exactly
    u01 = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return u01 * 2.0 - 1.0


def _rollout_kernel(
    seed_ref,
    ap_ref,
    av_ref,
    is_ref,
    iv_ref,
    t_ref,
    ap_out,
    av_out,
    is_out,
    iv_out,
    t_out,
    rew_ref,
    *,
    n: int,
    T: int,
    ep_len: int,
    sensitivity: float,
    agent_size: float,
    coll_factor: float,
    contact_force: float,
    contact_margin: float,
    damping: float,
    dt: float,
):
    seed = seed_ref[0]
    block = ap_ref.shape[-1]
    # global env index per lane: distinct RNG stream per env
    lane = (
        jax.lax.broadcasted_iota(jnp.uint32, (1, block), 1)
        + jnp.uint32(pl.program_id(0) * block)
    )

    ap = ap_ref[:, :]
    av = av_ref[:, :]
    ish = is_ref[:, :]
    iv = iv_ref[:, :]
    t = t_ref[:, :]

    coll_thresh = 2.0 * agent_size * coll_factor

    def step(it, carry):
        ap, av, ish, iv, t, racc = carry
        apx, apy = ap[:n], ap[n:]
        avx, avy = av[:n], av[n:]
        isx, isy = ish[:n], ish[n:]
        ivx, ivy = iv[0], iv[1]

        # ---- ezpolicy (models/scripted.py, vectorized over agents) -------
        cx = apx - jnp.mean(apx, axis=0, keepdims=True)  # centered agents
        cy = apy - jnp.mean(apy, axis=0, keepdims=True)
        # d[a, v]: agent a to ideal vertex v (shared by all agents' policies)
        dav = [
            [
                jnp.sqrt((cx[a] - isx[v]) ** 2 + (cy[a] - isy[v]) ** 2)
                for v in range(n)
            ]
            for a in range(n)
        ]
        closest = [  # per vertex: nearest agent (first-index ties)
            _argmin_first([dav[a][v] for a in range(n)])[1] for v in range(n)
        ]
        actx, acty = [], []
        for i in range(n):
            d_self = [dav[i][v] for v in range(n)]
            far = _argmax_last(d_self)
            inf = jnp.float32(np.inf)
            masked = [
                jnp.where((closest[v] == i) | (far == v), d_self[v], inf)
                for v in range(n)
            ]
            _, pick = _argmin_first(masked)
            vx = sum(jnp.where(pick == v, isx[v], 0.0) for v in range(n))
            vy = sum(jnp.where(pick == v, isy[v], 0.0) for v in range(n))
            ax = jnp.clip(0.5 * (vx - cx[i]), -1.0, 1.0)
            ay = jnp.clip(0.5 * (vy - cy[i]), -1.0, 1.0)
            # settled: ||ideal_shape - cur||_F with cur rows in the agent's
            # others-then-self order (the reference quirk, scripted.py)
            others = [a for a in range(n) if a != i] + [i]
            sq = sum(
                (isx[k] - cx[others[k]]) ** 2 + (isy[k] - cy[others[k]]) ** 2
                for k in range(n)
            )
            coef = jnp.where(sq < 0.01 * 0.01, 1.0, 0.3)
            actx.append(ax + ivx * coef)
            acty.append(ay + ivy * coef)

        # ---- physics among agents (core/physics.py; act_coef = 1) --------
        fx = [sensitivity * a for a in actx]
        fy = [sensitivity * a for a in acty]
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                dx = apx[i] - apx[j]
                dy = apy[i] - apy[j]
                dist = jnp.sqrt(dx * dx + dy * dy)
                pen = (
                    _softplus(-(dist - 2.0 * agent_size) / contact_margin)
                    * contact_margin
                )
                coef = contact_force * pen / jnp.maximum(dist, 1e-12)
                fx[i] = fx[i] + coef * dx
                fy[i] = fy[i] + coef * dy
        navx = avx * (1.0 - damping) + jnp.stack(fx) * dt  # mass = 1
        navy = avy * (1.0 - damping) + jnp.stack(fy) * dt
        napx = apx + navx * dt
        napy = apy + navy * dt

        # ---- reward on the stepped state (envs/formation_hd.py) ----------
        ncx = napx - jnp.mean(napx, axis=0, keepdims=True)
        ncy = napy - jnp.mean(napy, axis=0, keepdims=True)
        d2 = [
            [
                jnp.sqrt((ncx[a] - isx[v]) ** 2 + (ncy[a] - isy[v]) ** 2)
                for v in range(n)
            ]
            for a in range(n)
        ]
        row_min = [functools.reduce(jnp.minimum, d2[a]) for a in range(n)]
        col_min = [
            functools.reduce(jnp.minimum, [d2[a][v] for a in range(n)])
            for v in range(n)
        ]
        haus = jnp.maximum(
            functools.reduce(jnp.maximum, row_min),
            functools.reduce(jnp.maximum, col_min),
        )
        dvx = ivx - jnp.mean(navx, axis=0)
        dvy = ivy - jnp.mean(navy, axis=0)
        shared = -haus - jnp.sqrt(dvx * dvx + dvy * dvy)
        ncoll = jnp.zeros_like(shared)
        for i in range(n):
            for j in range(i + 1, n):
                dx = napx[i] - napx[j]
                dy = napy[i] - napy[j]
                hit = dx * dx + dy * dy < coll_thresh * coll_thresh
                ncoll = ncoll + 2.0 * hit.astype(jnp.float32)  # both agents
        # rewards [N] are all = sum of individual rewards (shared_reward);
        # accumulate their total: n * (n*shared - ncoll)
        racc = racc + n * (n * shared - ncoll)

        # ---- time limit + auto reset (env.py:step) ------------------------
        nt = t + 1
        done = (nt >= ep_len).astype(jnp.float32)  # [1, B]
        rnd = _uniform_pm1(seed, it, lane, 4 * n + 2)  # draws every step
        r_ap = rnd[: 2 * n]
        r_lp = rnd[2 * n : 4 * n]
        r_ish = jnp.concatenate(
            [
                r_lp[:n] - jnp.mean(r_lp[:n], axis=0, keepdims=True),
                r_lp[n:] - jnp.mean(r_lp[n:], axis=0, keepdims=True),
            ]
        )
        r_iv = rnd[4 * n :]
        nap = jnp.concatenate([napx, napy])
        nav = jnp.concatenate([navx, navy])
        ap = done * r_ap + (1.0 - done) * nap
        av = (1.0 - done) * nav
        ish = done * r_ish + (1.0 - done) * ish
        iv = done * r_iv + (1.0 - done) * iv
        t = jnp.where(nt >= ep_len, 0, nt)
        return ap, av, ish, iv, t, racc

    racc = jnp.zeros_like(ap[:1])
    ap, av, ish, iv, t, racc = jax.lax.fori_loop(
        0, T, step, (ap, av, ish, iv, t, racc)
    )
    ap_out[:, :] = ap
    av_out[:, :] = av
    is_out[:, :] = ish
    iv_out[:, :] = iv
    t_out[:, :] = t
    rew_ref[:, :] = racc


def fused_rollout_hd(
    soa: SoAState,
    seed: Array,
    *,
    length: int,
    ep_len: int,
    n: int,
    sensitivity: float = 5.0,
    agent_size: float = 0.03,
    coll_factor: float = 0.5,
    contact_force: float = 100.0,
    contact_margin: float = 1e-3,
    damping: float = 0.25,
    dt: float = 0.1,
    block: int = 512,
    interpret: bool = False,
):
    """Run ``length`` fused env steps.  Returns (SoAState', reward_sum [B])
    where reward_sum matches ``vmap(rollout)(...).reward.sum()`` of the
    step-by-step path (same trajectories until the first auto-reset; a
    different PRNG stream after).
    """
    B = soa.ap.shape[-1]
    assert B % block == 0, (B, block)
    grid = (B // block,)
    # index_map takes the grid index plus the prefetched scalar ref
    bspec = lambda r: pl.BlockSpec((r, block), lambda b, seed: (0, b))
    kern = functools.partial(
        _rollout_kernel,
        n=n,
        T=length,
        ep_len=ep_len,
        sensitivity=sensitivity,
        agent_size=agent_size,
        coll_factor=coll_factor,
        contact_force=contact_force,
        contact_margin=contact_margin,
        damping=damping,
        dt=dt,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[bspec(2 * n), bspec(2 * n), bspec(2 * n), bspec(2), bspec(1)],
            out_specs=[
                bspec(2 * n),
                bspec(2 * n),
                bspec(2 * n),
                bspec(2),
                bspec(1),
                bspec(1),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((2 * n, B), jnp.float32),
            jax.ShapeDtypeStruct((2 * n, B), jnp.float32),
            jax.ShapeDtypeStruct((2 * n, B), jnp.float32),
            jax.ShapeDtypeStruct((2, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        soa.ap,
        soa.av,
        soa.ishape,
        soa.ivel,
        soa.t,
    )
    ap, av, ish, iv, t, rew = out
    return SoAState(ap, av, ish, iv, t), rew[0]


def state_to_soa(state) -> SoAState:
    """Batched EnvState [B, ...] -> SoAState planes [rows, B]."""
    n = state.ideal_shape.shape[-2]
    tr = lambda a: jnp.concatenate([a[..., 0].T, a[..., 1].T])  # [B,R,2]->[2R,B]
    return SoAState(
        ap=tr(state.pos[:, :n]).astype(jnp.float32),
        av=tr(state.vel[:, :n]).astype(jnp.float32),
        ishape=tr(state.ideal_shape).astype(jnp.float32),
        ivel=jnp.stack([state.ideal_vel[:, 0], state.ideal_vel[:, 1]]).astype(
            jnp.float32
        ),
        t=state.t[None, :].astype(jnp.int32),
    )


def soa_to_state(soa: SoAState, template):
    """SoAState -> batched EnvState, landmarks reconstructed as
    ``ideal_shape + centroid(agents)`` (the post-``pre_obs`` invariant)."""
    n = soa.ap.shape[0] // 2
    B = soa.ap.shape[-1]
    untr = lambda a: jnp.stack([a[:n].T, a[n:].T], axis=-1)  # [2R,B]->[B,R,2]
    apos = untr(soa.ap)
    ishape = untr(soa.ishape)
    lpos = ishape + apos.mean(axis=1, keepdims=True)
    return template.replace(
        pos=jnp.concatenate([apos, lpos], axis=1).astype(template.pos.dtype),
        vel=jnp.concatenate(
            [untr(soa.av), jnp.zeros_like(lpos)], axis=1
        ).astype(template.vel.dtype),
        ideal_shape=ishape.astype(template.ideal_shape.dtype),
        ideal_vel=jnp.stack([soa.ivel[0], soa.ivel[1]], axis=-1).astype(
            template.ideal_vel.dtype
        ),
        t=soa.t[0].astype(jnp.int32),
    )
