"""Fused Hausdorff + collision reward statistics (Pallas/TPU).

At N=243 the XLA reward path materializes two [B, N, N] distance matrices in
HBM per step (agent-vertex for the Hausdorff term, agent-agent for the
collision count — ~480 MB each at B=2048), and after the pair-force kernel
they are the dominant HBM traffic of the rollout.  This kernel computes all
three reductions the reward needs — per-agent min distance to a vertex,
per-vertex min distance to an agent, per-agent collision count — in VMEM
tiles; only [B, N] vectors cross HBM.

Semantics identical to the XLA formulas in ``envs/formation_hd.py:reward``
(reference ``formation_hd_env.py:61-75``): the caller takes
``max(row_min.max(), col_min.max())`` for the symmetric Hausdorff distance
and subtracts the per-agent collision count.  Agents are centered in-kernel
(``ops/distances.py:center``); the collision threshold is
``(s_i + s_j) * collision_factor`` with self excluded.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

LANE = 128
_FAR = 1e9  # pad coordinate: far from everything, collides with nothing


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    ax_ref,
    ay_ref,
    sx_ref,
    sy_ref,
    rowmin_ref,
    colmin_ref,
    ncoll_ref,
    *,
    n: int,
    row_tile: int,
    thresh: float,
):
    i = pl.program_id(1)
    ax = ax_ref[:, :]  # [Bt, Np] agent x (uncentered, padded with _FAR)
    ay = ay_ref[:, :]
    # centroid over the n REAL agents (pad lanes excluded by mask)
    lanes = jax.lax.broadcasted_iota(jnp.int32, ax.shape, 1)
    real = lanes < n
    cx = jnp.sum(jnp.where(real, ax, 0.0), axis=1, keepdims=True) / n
    cy = jnp.sum(jnp.where(real, ay, 0.0), axis=1, keepdims=True) / n
    axc = ax - cx  # pad lanes stay ~_FAR: never a minimum
    ayc = ay - cy

    start = pl.multiple_of(i * row_tile, row_tile)
    # Mosaic rejects dynamic_slice on values: slice the refs, then center
    ax_i = ax_ref[:, pl.ds(start, row_tile)]  # [Bt, Ti]
    ay_i = ay_ref[:, pl.ds(start, row_tile)]
    axc_i = ax_i - cx
    ayc_i = ay_i - cy

    # agent(row tile) x vertex SQUARED distances for the Hausdorff
    # reductions: sqrt is monotone, so min/max commute with it exactly —
    # the wrapper applies one sqrt to the reduced [B] result instead of
    # this kernel paying Ti*Np sqrts per cell.  Bit-identical.
    sx = sx_ref[:, :]  # [Bt, Np] ideal-shape x (already centered), pad -_FAR
    sy = sy_ref[:, :]
    dxv = axc_i[:, :, None] - sx[:, None, :]
    dyv = ayc_i[:, :, None] - sy[:, None, :]
    dav = dxv * dxv + dyv * dyv  # [Bt, Ti, Np] squared distances
    rowmin_ref[:, :] = jnp.min(dav, axis=-1)  # pad vertices at -_FAR: huge

    # col_min accumulates across row tiles (TPU grid runs sequentially)
    lanes_i = (
        jax.lax.broadcasted_iota(jnp.int32, axc_i.shape, 1) + i * row_tile
    )
    # f32 mask before the minor-dim insert: Mosaic only reshapes 32-bit types
    pad_row = (lanes_i >= n).astype(jnp.float32)  # [Bt, Ti]
    tile_min = jnp.min(
        dav + pad_row[:, :, None] * jnp.float32(_FAR), axis=1
    )  # [Bt, Np]: min over the REAL agents of this row tile

    @pl.when(i == 0)
    def _init():
        colmin_ref[:, :] = tile_min

    @pl.when(i > 0)
    def _acc():
        colmin_ref[:, :] = jnp.minimum(colmin_ref[:, :], tile_min)

    # agent-agent collision counts (translation-invariant: raw positions)
    dxa = ax_i[:, :, None] - ax[:, None, :]
    dya = ay_i[:, :, None] - ay[:, None, :]
    d2 = dxa * dxa + dya * dya  # pad partners ~_FAR apart: never collide
    hits = (d2 < thresh * thresh).astype(jnp.float32)
    # self-distance is 0 < thresh: subtract the diagonal hit
    ncoll_ref[:, :] = jnp.sum(hits, axis=-1) - 1.0


def hd_reward_stats_batched(
    apos: Array,
    ishape: Array,
    *,
    thresh: float,
    batch_tile: int = 8,
    row_tile: int = 128,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """(hausdorff [B], per-agent collision count [B, N]) for the
    formation_hd reward.  ``apos`` [B, N, 2] raw agent positions, ``ishape``
    [B, N, 2] centered ideal shape."""
    B, N, _ = apos.shape
    Np = _round_up(N, LANE)
    Bp = _round_up(B, batch_tile)
    pad = lambda a, fill: jnp.full((Bp, Np), fill, jnp.float32).at[:B, :N].set(a)
    ax = pad(apos[..., 0], _FAR)
    ay = pad(apos[..., 1], _FAR)
    sx = pad(ishape[..., 0], -_FAR)
    sy = pad(ishape[..., 1], -_FAR)

    grid = (Bp // batch_tile, Np // row_tile)
    kernel = functools.partial(
        _kernel, n=N, row_tile=row_tile, thresh=float(thresh)
    )
    bspec = lambda: pl.BlockSpec(
        (batch_tile, Np), lambda b, i: (b, 0), memory_space=pltpu.VMEM
    )
    rowmin, colmin, ncoll = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec(), bspec(), bspec(), bspec()],
        out_specs=[
            pl.BlockSpec(
                (batch_tile, row_tile), lambda b, i: (b, i),
                memory_space=pltpu.VMEM,
            ),
            bspec(),
            pl.BlockSpec(
                (batch_tile, row_tile), lambda b, i: (b, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Np), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Np), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Np), jnp.float32),
        ],
        interpret=interpret,
    )(ax, ay, sx, sy)
    # the kernel reduces SQUARED distances; one sqrt per env here replaces
    # Ti*Np in-kernel sqrts (monotone: bit-identical result)
    haus = jnp.sqrt(
        jnp.maximum(rowmin[:B, :N].max(axis=1), colmin[:B, :N].max(axis=1))
    )
    return haus, ncoll[:B, :N]
