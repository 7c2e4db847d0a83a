"""Symmetric upper-triangle pair-force kernel (Pallas/TPU).

Newton's-third-law specialization of :mod:`.pairforce` for the common case
where every participating entity collides, is movable, and shares one mass and
one radius — exactly the colliding subset the hd scenarios present after
:func:`gym_formation_tpu.core.physics._collide_subset` (243 identical agents
at N=243).  Under those conditions the reference's mass-ratio split
(``core.py:314-318``) degenerates to ``F_on_i += F_ij`` / ``F_on_j -= F_ij``
with a *symmetric* scalar coefficient, so each unordered pair needs evaluating
once, not twice.

Design vs the dense kernel:

- **Transposed lane layout** ``[E, B]``: the env batch rides the 128-wide lane
  dimension, so pair tiles can shrink to ``tile x tile`` in the entity plane
  (32x32 by default) with full vector-unit utilization.  The row-major dense
  kernel cannot tile columns below 128 lanes without wasting the VPU.
- **Triangle grid skip**: cells with ``j < i`` are skipped entirely via
  ``pl.when`` — at 32x32 tiles over the padded 256-entity plane that drops
  28/64 cells, and only the 8 diagonal cells pay half-masked lanes.  Net pair
  evaluations: ~56% of the dense kernel's.
- **Scalar contact radius**: uniform size means ``dist_min`` is one constant —
  no ``[E, E]`` coefficient tables are loaded at all.
- **Force accumulators in VMEM scratch** ``[E, B_lane]``: each computed cell
  adds its row-tile sums and subtracts its column-tile sums; the result is
  written to HBM once per batch tile.

Padding entities sit at distinct far-away sentinel positions, so their
penetration is exactly 0.0 (the softplus underflows) and no validity mask is
needed beyond the strict upper-triangle predicate.

Physics semantics identical to
:func:`gym_formation_tpu.core.physics._collision_forces_xla` (reference
``core.py:288-322``); requires ``nan_guard`` like the dense kernel.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.types import WorldCfg

Array = jnp.ndarray

LANE = 128

# Degree-7 polynomial for log1p(u) on u in [0, 1] (Chebyshev-fit, max abs err
# ~4e-8 — three orders below the kernel's f32-vs-f64 band).  Replaces the
# second transcendental in the stable-softplus chain with 7 FMAs when
# ``poly=True``.
_LOG1P_COEFFS = None


def _log1p_poly_coeffs() -> np.ndarray:
    global _LOG1P_COEFFS
    if _LOG1P_COEFFS is None:
        cheb = np.polynomial.chebyshev.Chebyshev.fit(
            *(lambda u: (u, np.log1p(u)))(np.linspace(0.0, 1.0, 4001)), deg=7
        )
        _LOG1P_COEFFS = cheb.convert(kind=np.polynomial.Polynomial).coef.astype(
            np.float32
        )
    return _LOG1P_COEFFS


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def sym_applicable(cfg: WorldCfg) -> bool:
    """True when the uniform-symmetric specialization is exact for ``cfg``:
    every entity collides, is movable, and shares one mass and one size."""
    return bool(
        np.all(cfg.collide)
        and np.all(cfg.movable)
        and np.all(np.asarray(cfg.mass) == cfg.mass[0])
        and np.all(np.asarray(cfg.size) == cfg.size[0])
    )


def _kernel(
    x_ref, y_ref, fx_ref, fy_ref, accx, accy, *, tile, nt, k, invk, cf, dmin, poly
):
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when((i == 0) & (j == 0))
    def _init():
        accx[:, :] = jnp.zeros_like(accx)
        accy[:, :] = jnp.zeros_like(accy)

    @pl.when(j >= i)
    def _compute():
        ri = pl.multiple_of(i * tile, tile)
        rj = pl.multiple_of(j * tile, tile)
        xi = x_ref[pl.ds(ri, tile), :]  # [T, BL]
        yi = y_ref[pl.ds(ri, tile), :]
        xj = x_ref[pl.ds(rj, tile), :]
        yj = y_ref[pl.ds(rj, tile), :]
        dx = xi[:, None, :] - xj[None, :, :]  # [T, T, BL]
        dy = yi[:, None, :] - yj[None, :, :]
        s = jnp.maximum(dx * dx + dy * dy, 1e-24)
        r = jax.lax.rsqrt(s)
        dist = s * r
        # stable softplus: logaddexp(0, z) = max(z, 0) + log1p(exp(-|z|))
        z = (dmin - dist) * invk
        u = jnp.exp(-jnp.abs(z))
        if poly:
            c = _log1p_poly_coeffs()
            l1p = jnp.float32(c[-1])
            for cc in c[-2::-1]:
                l1p = l1p * u + jnp.float32(cc)
        else:
            l1p = jnp.log1p(u)
        pen = (jnp.maximum(z, 0.0) + l1p) * k
        coef = (cf * pen) * r
        # strict upper triangle: each unordered pair once, self excluded
        gr = jax.lax.broadcasted_iota(jnp.int32, (tile, tile, 1), 0) + ri
        gc = jax.lax.broadcasted_iota(jnp.int32, (tile, tile, 1), 1) + rj
        coef = jnp.where(gc > gr, coef, 0.0)
        fxc = coef * dx
        fyc = coef * dy
        accx[pl.ds(ri, tile), :] = accx[pl.ds(ri, tile), :] + jnp.sum(fxc, axis=1)
        accy[pl.ds(ri, tile), :] = accy[pl.ds(ri, tile), :] + jnp.sum(fyc, axis=1)
        accx[pl.ds(rj, tile), :] = accx[pl.ds(rj, tile), :] - jnp.sum(fxc, axis=0)
        accy[pl.ds(rj, tile), :] = accy[pl.ds(rj, tile), :] - jnp.sum(fyc, axis=0)

    @pl.when((i == nt - 1) & (j == nt - 1))
    def _flush():
        fx_ref[:, :] = accx[:, :]
        fy_ref[:, :] = accy[:, :]


def _kernel_loop(
    x_ref, y_ref, fx_ref, fy_ref, accx, accy, *, tile, nt, k, invk, cf, dmin, poly
):
    """Variant with the column sweep as an in-kernel ``fori_loop``: one grid
    cell per row tile, row-force accumulation in registers, triangle skipping
    by loop bounds (no spent grid iterations)."""
    del poly
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        accx[:, :] = jnp.zeros_like(accx)
        accy[:, :] = jnp.zeros_like(accy)

    ri = pl.multiple_of(i * tile, tile)
    xi = x_ref[pl.ds(ri, tile), :]  # [T, BL]
    yi = y_ref[pl.ds(ri, tile), :]
    bl = x_ref.shape[1]

    def pair_block(xj, yj):
        dx = xi[:, None, :] - xj[None, :, :]  # [T, T, BL]
        dy = yi[:, None, :] - yj[None, :, :]
        s = jnp.maximum(dx * dx + dy * dy, 1e-24)
        r = jax.lax.rsqrt(s)
        dist = s * r
        z = (dmin - dist) * invk
        pen = (jnp.maximum(z, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(z)))) * k
        return (cf * pen) * r, dx, dy

    # diagonal block: strict upper triangle of the tile (self excluded, each
    # unordered pair once) — the only place the triangle mask is needed
    coef, dx, dy = pair_block(xi, yi)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (tile, tile, 1), 1)
        > jax.lax.broadcasted_iota(jnp.int32, (tile, tile, 1), 0)
    )
    coef = jnp.where(tri, coef, 0.0)
    fxc = coef * dx
    fyc = coef * dy
    accx[pl.ds(ri, tile), :] = (
        accx[pl.ds(ri, tile), :] - jnp.sum(fxc, axis=0)
    )
    accy[pl.ds(ri, tile), :] = (
        accy[pl.ds(ri, tile), :] - jnp.sum(fyc, axis=0)
    )
    fx0 = jnp.sum(fxc, axis=1)
    fy0 = jnp.sum(fyc, axis=1)

    def body(j, row):
        fx_row, fy_row = row
        rj = j * tile
        xj = x_ref[pl.ds(rj, tile), :]
        yj = y_ref[pl.ds(rj, tile), :]
        coef, dx, dy = pair_block(xj, yj)  # whole block is strict-upper
        fxc = coef * dx
        fyc = coef * dy
        accx[pl.ds(rj, tile), :] = accx[pl.ds(rj, tile), :] - jnp.sum(fxc, axis=0)
        accy[pl.ds(rj, tile), :] = accy[pl.ds(rj, tile), :] - jnp.sum(fyc, axis=0)
        return fx_row + jnp.sum(fxc, axis=1), fy_row + jnp.sum(fyc, axis=1)

    fx_row, fy_row = jax.lax.fori_loop(i + 1, nt, body, (fx0, fy0))
    accx[pl.ds(ri, tile), :] = accx[pl.ds(ri, tile), :] + fx_row
    accy[pl.ds(ri, tile), :] = accy[pl.ds(ri, tile), :] + fy_row

    @pl.when(i == nt - 1)
    def _flush():
        fx_ref[:, :] = accx[:, :]
        fy_ref[:, :] = accy[:, :]


def collision_forces_sym(
    pos: Array,
    cfg: WorldCfg,
    tile: int = 32,
    poly: bool = False,
    loop: bool = True,
    interpret: bool = False,
) -> Array:
    """Symmetric batched collision forces: pos [B, E, 2] -> force [B, E, 2].

    Exact only when :func:`sym_applicable` holds (checked); callers outside
    that envelope must use :func:`.pairforce.collision_forces_batched`.
    """
    assert cfg.nan_guard, "pallas pair-force path requires nan_guard"
    assert sym_applicable(cfg), "sym kernel requires uniform colliding entities"
    B, E, _ = pos.shape
    Ep = _round_up(E, tile)
    Bp = _round_up(B, LANE)
    # distinct far-away sentinels park the padded entity rows out of contact
    sent = (jnp.arange(Ep, dtype=jnp.float32) >= E) * (
        1e4 * (1.0 + jnp.arange(Ep, dtype=jnp.float32))
    )
    x = jnp.zeros((Bp, Ep), jnp.float32).at[:B, :E].set(pos[..., 0]) + sent[None, :]
    y = jnp.zeros((Bp, Ep), jnp.float32).at[:B, :E].set(pos[..., 1]) + sent[None, :]
    xt = x.T  # [Ep, Bp] — envs on lanes
    yt = y.T
    fx, fy = _sym_call(xt, yt, cfg, tile=tile, poly=poly, loop=loop, interpret=interpret)
    return jnp.stack([fx[:E, :B].T, fy[:E, :B].T], axis=-1).astype(pos.dtype)


def _sym_call(xt, yt, cfg, *, tile, poly=False, loop=True, interpret=False):
    """Raw kernel on transposed [Ep, Bp] planes -> (fx, fy) [Ep, Bp]."""
    Ep, Bp = xt.shape
    nt = Ep // tile
    kernel = functools.partial(
        _kernel_loop if loop else _kernel,
        tile=tile,
        nt=nt,
        k=float(cfg.contact_margin),
        invk=float(1.0 / cfg.contact_margin),
        cf=float(cfg.contact_force),
        dmin=float(2.0 * cfg.size[0]),
        poly=poly,
    )
    if loop:
        grid = (Bp // LANE, nt)
        io_spec = pl.BlockSpec(
            (Ep, LANE), lambda b, i: (0, b), memory_space=pltpu.VMEM
        )
    else:
        grid = (Bp // LANE, nt, nt)
        io_spec = pl.BlockSpec(
            (Ep, LANE), lambda b, i, j: (0, b), memory_space=pltpu.VMEM
        )
    fx, fy = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[io_spec, io_spec],
        out_specs=[io_spec, io_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Ep, Bp), jnp.float32),
            jax.ShapeDtypeStruct((Ep, Bp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Ep, LANE), jnp.float32),
            pltpu.VMEM((Ep, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(xt, yt)
    return fx, fy
