"""Spatially-culled pairwise collision-force kernel (Pallas/TPU).

The dense kernel (:mod:`.pairforce`) evaluates the softplus penetration for
every entity pair, but the contact model is *exactly* zero beyond a tiny
radius: ``pen = k * softplus(-(dist - dmin)/k)`` with ``k = contact_margin``
underflows to ``0.0f`` once ``exp(-(dist - dmin)/k)`` underflows, i.e. for
``dist > dmin + 104 k`` (``exp(z) == 0.0f`` for ``z < -103.98``).  At the
N=243 density (~500 entities in a ±1 world, cutoff ≈ 0.16) the vast majority
of pairs contribute nothing — the dense kernel spends its whole budget on
transcendentals that are provably zero.

This kernel culls at tile granularity, exactly:

1. entities are sorted per env by a 2-D Morton key (jit-side, XLA argsort),
   so spatially-near entities land in the same tile;
2. the layout is transposed — entities on the sublane axis, envs on the lane
   axis (``[Ep, Bp]``) — so entity tiles can be as small as 8 while keeping
   legal (8k, 128)-shaped blocks; small tiles mean tight bounding boxes and
   a high cull rate.  Entities at the same Morton rank occupy similar world
   positions in every env, so the any-over-the-128-env-lanes predicate stays
   nearly as tight as a single env's;
3. each (row-tile × col-tile) grid cell computes per-env bounding boxes of
   its two entity tiles from the loaded coordinates and **skips all pair
   math** (``pl.when``) when no env's boxes are within the underflow cutoff
   — a skipped tile's pairs would each have contributed exactly ``+0.0``,
   so culling is bit-neutral for the in-kernel accumulation order;
4. pair coefficients (contact radius, mass ratio, masks) are computed on the
   fly from gathered per-entity vectors — a static [Ep, Ep] table would be
   permuted per env after the sort.  ``collide=False`` is folded into a
   sentinel size (-1e4 → penetration exactly 0), the ``movable_i`` receiver
   gate is applied outside the kernel, and the (mov_i | mov_j) pair
   condition reduces to mov_i once the receiver gate is out (reference
   semantics: ``core.py:288-322``).

Correctness does not depend on the sort (the predicate uses real coordinate
bounds); the sort only buys cull rate.  Numerics match the dense kernel up to
summation order (the per-entity reduction runs in Morton order instead of
index order) — parity vs the f64 oracle is asserted at the same tolerance in
``tests/test_pallas.py``.

Batch is padded to the 128-lane width, so B < 128 pays padding waste — this
kernel targets large-batch rollout/training configs.
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
# exp(z) underflows to exactly 0.0f below z = -103.98; pairs beyond
# dmin + CUTOFF_K * margin therefore have penetration exactly 0.0f
CUTOFF_K = 104.0
_PAD_SIZE = -1.0e4  # sentinel size: folds collide=False / padding into pen=0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _spread16(v: Array) -> Array:
    """Spread the low 16 bits of ``v`` onto even bit positions (Morton)."""
    v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
    v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
    v = (v | (v << 2)) & jnp.uint32(0x33333333)
    v = (v | (v << 1)) & jnp.uint32(0x55555555)
    return v


def morton_order(pos: Array) -> Array:
    """Per-env Morton (Z-curve) sort order of entities.  pos [B, E, 2] →
    order [B, E] (int32).  Quantization range is a correctness-free choice
    (it only affects cull rate); ±4 covers any reachable formation state."""
    q = jnp.clip((pos + 4.0) * (65535.0 / 8.0), 0.0, 65535.0).astype(jnp.uint32)
    key = _spread16(q[..., 0]) | (_spread16(q[..., 1]) << 1)
    return jnp.argsort(key, axis=-1).astype(jnp.int32)


def _kernel(
    x_row, y_row, sz_row, minv_row,
    x_col, y_col, sz_col, wm_col, om_col,
    fx_ref, fy_ref,
    *, k, cf, cutoff,
):
    """One (env-tile, row-tile, col-tile) cell.

    Row refs are [Tr, Bt]; col refs are [Tc, Bt]; Bt = 128 env lanes.
    Outputs [Tr, Bt] are revisited across the (fastest-varying) col-tile
    grid axis and accumulated.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        fx_ref[:, :] = jnp.zeros_like(fx_ref)
        fy_ref[:, :] = jnp.zeros_like(fy_ref)

    xi, yi = x_row[:, :], y_row[:, :]  # [Tr, Bt]
    xj, yj = x_col[:, :], y_col[:, :]  # [Tc, Bt]
    # per-env-lane tile bounding boxes from the actual loaded coordinates
    # (sort-agnostic); compute the cell if ANY env's boxes are within cutoff
    near_x = (jnp.min(xj, 0) <= jnp.max(xi, 0) + cutoff) & (
        jnp.max(xj, 0) >= jnp.min(xi, 0) - cutoff
    )
    near_y = (jnp.min(yj, 0) <= jnp.max(yi, 0) + cutoff) & (
        jnp.max(yj, 0) >= jnp.min(yi, 0) - cutoff
    )
    si, vi = sz_row[:, :], minv_row[:, :]
    sj, wj, oj = sz_col[:, :], wm_col[:, :], om_col[:, :]

    @pl.when(jnp.any(near_x & near_y))
    def _compute():
        dx = xi[:, None, :] - xj[None, :, :]  # [Tr, Tc, Bt]
        dy = yi[:, None, :] - yj[None, :, :]
        dist = jnp.sqrt(dx * dx + dy * dy)
        dmin = si[:, None, :] + sj[None, :, :]
        # logaddexp(0, z) = max(z, 0) + log1p(exp(-|z|)), stable softplus
        z = -(dist - dmin) / k
        pen = (jnp.maximum(z, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(z)))) * k
        # mass ratio: m_j/m_i when j movable, 1 otherwise
        ratio = wj[None, :, :] * vi[:, None, :] + oj[None, :, :]
        coef = ratio * (cf * pen / jnp.maximum(dist, 1e-12))
        fx_ref[:, :] += jnp.sum(coef * dx, axis=1)
        fy_ref[:, :] += jnp.sum(coef * dy, axis=1)


def collision_forces_culled(
    pos: Array,
    cfg: WorldCfg,
    row_tile: int = 32,
    col_tile: int = 32,
    interpret: bool = False,
) -> Array:
    """Spatially-culled batched collision forces: pos [B, E, 2] → [B, E, 2].

    Same contact model as :func:`.pairforce.collision_forces_batched`
    (reference ``core.py:288-322``); differs only in per-entity summation
    order (Morton instead of index order).
    """
    assert cfg.nan_guard, "pallas pair-force path requires nan_guard"
    B, E, _ = pos.shape
    Ep = _round_up(E, max(row_tile, col_tile))
    Bp = _round_up(B, LANE)

    order = morton_order(pos)  # [B, E]
    take = lambda v: jnp.take_along_axis(v, order, axis=-1)
    xs = take(pos[..., 0].astype(jnp.float32))
    ys = take(pos[..., 1].astype(jnp.float32))

    collide = np.asarray(cfg.collide)
    movable = np.asarray(cfg.movable, np.float32)
    size_eff = np.where(collide, np.asarray(cfg.size, np.float32), _PAD_SIZE)
    mass = np.asarray(cfg.mass, np.float32)
    gat = lambda t: jnp.asarray(t)[order]  # [B, E] per-entity attrs, sorted
    sz = gat(size_eff)
    minv = gat((1.0 / mass).astype(np.float32))
    wm = gat((movable * mass).astype(np.float32))  # m_j if movable else 0
    om = gat((1.0 - movable).astype(np.float32))  # 1 if immovable else 0
    mov = gat(movable)

    # Pad coordinates so the cull predicate stays tight: entity-pad lanes
    # copy the env's Morton-max entity (boxes don't inflate); batch-pad env
    # lanes get an entity-indexed ramp (only same-tile boxes ever overlap).
    # The sentinel size makes every pad pair contribute exactly 0 anyway.
    ramp = jnp.broadcast_to(10.0 * jnp.arange(Ep, dtype=jnp.float32), (Bp, Ep))

    def pad_coord(v):
        return ramp.at[:B, :E].set(v).at[:B, E:].set(v[:, -1:])

    def pad_attr(v, fill):
        out = jnp.full((Bp, Ep), fill, jnp.float32)
        return out.at[:B, :E].set(v)

    # transpose to [Ep, Bp]: entities on sublanes, envs on lanes
    tr = lambda a: a.T
    xs_t, ys_t = tr(pad_coord(xs)), tr(pad_coord(ys))
    sz_t = tr(pad_attr(sz, _PAD_SIZE))
    minv_t = tr(pad_attr(minv, 1.0))
    wm_t = tr(pad_attr(wm, 0.0))
    om_t = tr(pad_attr(om, 1.0))

    cutoff = float(2.0 * np.max(np.where(collide, cfg.size, 0.0)) +
                   CUTOFF_K * cfg.contact_margin)
    grid = (Bp // LANE, Ep // row_tile, Ep // col_tile)
    kernel = functools.partial(
        _kernel,
        k=float(cfg.contact_margin),
        cf=float(cfg.contact_force),
        cutoff=cutoff,
    )
    row_spec = lambda: pl.BlockSpec(
        (row_tile, LANE), lambda b, i, j: (i, b), memory_space=pltpu.VMEM
    )
    col_spec = lambda: pl.BlockSpec(
        (col_tile, LANE), lambda b, i, j: (j, b), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (row_tile, LANE), lambda b, i, j: (i, b), memory_space=pltpu.VMEM
    )
    fx, fy = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec(), row_spec(), row_spec(), row_spec(),
                  col_spec(), col_spec(), col_spec(), col_spec(), col_spec()],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Ep, Bp), jnp.float32),
            jax.ShapeDtypeStruct((Ep, Bp), jnp.float32),
        ],
        interpret=interpret,
    )(xs_t, ys_t, sz_t, minv_t, xs_t, ys_t, sz_t, wm_t, om_t)

    # back to [B, E]; receiver gate (core.py:319-321); unsort to entity order
    fx = fx.T[:B, :E] * mov
    fy = fy.T[:B, :E] * mov
    inv = jnp.argsort(order, axis=-1)
    f = jnp.stack([fx, fy], axis=-1)
    return jnp.take_along_axis(f, inv[..., None], axis=1).astype(pos.dtype)
