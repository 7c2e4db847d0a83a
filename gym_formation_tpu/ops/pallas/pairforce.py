"""Fused pairwise collision-force kernel (Pallas/TPU).

At N=243 agents (E=486 entities) the XLA path materializes the [B, E, E]
contact-weight matrix in HBM (~1 GB per 1024-env step) between its producer
(the exp/log penetration chain) and its two reducing consumers.  This kernel
fuses the whole pipeline per (batch-tile × row-tile): distances, penetration,
masking/mass-ratio and both reductions happen in VMEM; only [B, E] vectors
cross HBM.

Layout: positions as separate x/y planes [B, E] (lane-friendly), static pair
coefficient matrix ``pairc[i,j] = mask_ij * (m_j/m_i | 1)`` and ``dist_min``
precomputed from the WorldCfg, entity axis padded to a multiple of 128.

Physics semantics identical to
:func:`gym_formation_tpu.core.physics.collision_forces` (reference
``core.py:288-322``); used only with ``nan_guard`` (the padded lanes rely on
the guarded divide).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.types import WorldCfg

Array = jnp.ndarray

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _static_tables(cfg: WorldCfg) -> Tuple[np.ndarray, np.ndarray, int]:
    """(pairc [Ep,Ep], dist_min [Ep,Ep], Ep) — mask+ratio and contact radii,
    zero-padded to the lane-aligned entity count."""
    e = cfg.n_entities
    ep = _round_up(e, LANE)
    collide = cfg.collide
    movable = cfg.movable
    mass = cfg.mass
    pair_ok = (
        collide[:, None]
        & collide[None, :]
        & (movable[:, None] | movable[None, :])
        & ~np.eye(e, dtype=bool)
    )
    ratio = np.where(movable[None, :], mass[None, :] / mass[:, None], 1.0)
    pairc = np.zeros((ep, ep), np.float32)
    pairc[:e, :e] = np.where(pair_ok & movable[:, None], ratio, 0.0)
    dist_min = np.zeros((ep, ep), np.float32)
    dist_min[:e, :e] = cfg.size[:, None] + cfg.size[None, :]
    return pairc, dist_min, ep


def _kernel(x_ref, y_ref, pairc_ref, dmin_ref, fx_ref, fy_ref, *, row_tile, k, cf):
    """One (batch-tile, row-tile) cell: forces on ``row_tile`` entities from
    ALL entities, for ``Bt`` envs."""
    i = pl.program_id(1)
    xj = x_ref[:, :]  # [Bt, Ep]
    yj = y_ref[:, :]
    start = pl.multiple_of(i * row_tile, row_tile)
    xi = x_ref[:, pl.ds(start, row_tile)]  # [Bt, Ti]
    yi = y_ref[:, pl.ds(start, row_tile)]
    dx = xi[:, :, None] - xj[:, None, :]  # [Bt, Ti, Ep]
    dy = yi[:, :, None] - yj[:, None, :]
    dist = jnp.sqrt(dx * dx + dy * dy)
    dmin = dmin_ref[:, :][None, :, :]  # read block, then broadcast
    pairc = pairc_ref[:, :][None, :, :]
    # logaddexp(0, z) = max(z, 0) + log1p(exp(-|z|)), stable softplus
    z = -(dist - dmin) / k
    pen = (jnp.maximum(z, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(z)))) * k
    coef = pairc * (cf * pen / jnp.maximum(dist, 1e-12))
    fx_ref[:, :] = jnp.sum(coef * dx, axis=-1)
    fy_ref[:, :] = jnp.sum(coef * dy, axis=-1)


def collision_forces_batched(
    pos: Array,
    cfg: WorldCfg,
    batch_tile: int = 8,
    row_tile: int = 128,
    interpret: bool = False,
) -> Array:
    """Fused batched collision forces: pos [B, E, 2] → force [B, E, 2]."""
    assert cfg.nan_guard, "pallas pair-force path requires nan_guard"
    B, E, _ = pos.shape
    pairc, dist_min, Ep = _static_tables(cfg)
    Bp = _round_up(B, batch_tile)
    x = jnp.zeros((Bp, Ep), jnp.float32).at[:B, :E].set(pos[..., 0])
    y = jnp.zeros((Bp, Ep), jnp.float32).at[:B, :E].set(pos[..., 1])

    grid = (Bp // batch_tile, Ep // row_tile)
    kernel = functools.partial(
        _kernel,
        row_tile=row_tile,
        k=float(cfg.contact_margin),
        cf=float(cfg.contact_force),
    )
    fx, fy = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch_tile, Ep), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, Ep), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, Ep), lambda b, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, Ep), lambda b, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((batch_tile, row_tile), lambda b, i: (b, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, row_tile), lambda b, i: (b, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Ep), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Ep), jnp.float32),
        ],
        interpret=interpret,
    )(x, y, jnp.asarray(pairc), jnp.asarray(dist_min))
    return jnp.stack([fx[:B, :E], fy[:B, :E]], axis=-1).astype(pos.dtype)
