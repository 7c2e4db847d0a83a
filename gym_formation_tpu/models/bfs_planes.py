"""Plane-form hierarchical BFS + ezpolicy for arity-3 trees (batch on lanes).

The standard expansion (:mod:`.bfs`) vmaps per-env logic over the batch, so
every tensor is ``[B, G, n, ..., 2]`` — a 2-wide minor dimension that wastes
126 of 128 TPU lanes in every op and leaves the policy HBM-/launch-bound
(measured ~0.6 ms of the N=243 rollout step).  This module re-expresses the
ENTIRE expansion as operations on ``[rows, B]`` planes (envs ride the lane
axis) with every gather/scatter a tiny selection matmul built from iota:

- centroid pyramid: ``P^(k)[g] = mean of P^(k+1)[3g..3g+2]`` via a
  ``[3^k, 3^(k+1)]`` 0/1 reduction matrix,
- member extraction / interleave: ``(c == 3g+i)`` selection matrices,
- the 3-agent ezpolicy argmin/tie-break logic unrolled statically.

Written Pallas-compatible on purpose (no dynamic gathers, no captured
array constants, static Python loops): the same function runs as XLA for
parity tests and inside the fused step kernel
(:mod:`..ops.pallas.fused_step`) where all five levels stay VMEM-resident.

Semantics follow :func:`.bfs._expand` + :func:`.scripted.ezpolicy`
(reference ``formation_gym/__init__.py:19-99``) with two 1-ulp-class
deviations, both covered by the parity tests' tolerance: block means are
hierarchical (mean of child means — exact for equal blocks up to f32
rounding) and vertex comparisons use squared distances (monotone with the
reference's norms; equality can differ only when two f32 square roots
collide).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _reduce3(x: Array, G: int) -> Array:
    """[3G, B] -> [G, B]: mean over consecutive row triples (selection
    matmul; exact 0/1 sums, one divide — mirrors np.mean's sum/m)."""
    sel = (_iota2((G, 3 * G), 1) // 3 == _iota2((G, 3 * G), 0)).astype(x.dtype)
    return jnp.dot(sel, x, preferred_element_type=x.dtype) / 3.0


def _pick3(x: Array, i: int, G: int) -> Array:
    """[3G, B] -> [G, B]: rows ``3g + i``."""
    sel = (_iota2((G, 3 * G), 1) == 3 * _iota2((G, 3 * G), 0) + i).astype(
        x.dtype
    )
    return jnp.dot(sel, x, preferred_element_type=x.dtype)


def _interleave3(parts, G: int) -> Array:
    """3 x [G, B] -> [3G, B] with row ``3g + i`` = parts[i][g]."""
    out = None
    for i, p in enumerate(parts):
        sel = (
            _iota2((3 * G, G), 0) == 3 * _iota2((3 * G, G), 1) + i
        ).astype(p.dtype)
        t = jnp.dot(sel, p, preferred_element_type=p.dtype)
        out = t if out is None else out + t
    return out


# settled-norm row pairing per member (reference ``__init__.py:31-33`` builds
# cur as [others ascending, self last], so vertex v pairs with agent
# _SETTLED_PERM[i][v] in member i's frame)
_SETTLED_PERM = ((1, 2, 0), (0, 2, 1), (0, 1, 2))


def bfs_ez_planes(px, py, sx, sy, rvx, rvy, L: int):
    """Arity-3 BFS expansion of ezpolicy on ``[N, B]`` planes.

    Args:
      px, py: agent positions (any common frame — only centroid differences
        are used).  Rows beyond ``3**L`` (padding) are ignored by every
        selection and return zero action.
      sx, sy: centered ideal-shape planes, same layout.
      rvx, rvy: [B] (or [1, B]) root commanded velocity.
      L: number of layers (``3**L`` agents).

    Returns ``(ax, ay)`` action planes, rows ``3g+i`` in BFS leaf order
    (= agent order), matching :func:`.bfs.bfs_actions_from_state` driven by
    :func:`.scripted.ezpolicy_batched` to f32 reduction tolerance.
    """
    N = 3**L
    B = px.shape[-1]
    dt = px.dtype
    rvx = rvx.reshape(1, B).astype(dt)
    rvy = rvy.reshape(1, B).astype(dt)

    # centroid pyramids: P[k] has 3^k rows, k = 1..L (P[L] = the leaves)
    Px = {L: px[:N]}
    Py = {L: py[:N]}
    Sx = {L: sx[:N]}
    Sy = {L: sy[:N]}
    for k in range(L - 1, 0, -1):
        g = 3**k
        Px[k] = _reduce3(Px[k + 1], g)
        Py[k] = _reduce3(Py[k + 1], g)
        Sx[k] = _reduce3(Sx[k + 1], g)
        Sy[k] = _reduce3(Sy[k + 1], g)

    pvx, pvy = rvx, rvy  # [G, B] parent commanded velocity, G = 3^l
    for l in range(L):
        G = 3**l
        cx, cy = Px[l + 1], Py[l + 1]  # [3G, B] block centroids
        tx, ty = Sx[l + 1], Sy[l + 1]  # [3G, B] block targets
        # group means == the parent pyramid level (mean of the 3 children)
        if l == 0:
            # [1, B]: broadcasts over the root group's 3 rows directly
            mx = jnp.mean(cx, axis=0, keepdims=True)
            my = jnp.mean(cy, axis=0, keepdims=True)
            mtx = jnp.mean(tx, axis=0, keepdims=True)
            mty = jnp.mean(ty, axis=0, keepdims=True)
        else:
            # repeat each group's mean row over its 3 members
            rep = (
                _iota2((3 * G, G), 0) // 3 == _iota2((3 * G, G), 1)
            ).astype(dt)
            mx = jnp.dot(rep, Px[l], preferred_element_type=dt)
            my = jnp.dot(rep, Py[l], preferred_element_type=dt)
            mtx = jnp.dot(rep, Sx[l], preferred_element_type=dt)
            mty = jnp.dot(rep, Sy[l], preferred_element_type=dt)
        cxh, cyh = cx - mx, cy - my  # Ĉ: centered member centroids
        txh, tyh = tx - mtx, ty - mty  # T̂: centered member targets
        Ax = [_pick3(cxh, i, G) for i in range(3)]
        Ay = [_pick3(cyh, i, G) for i in range(3)]
        Tx = [_pick3(txh, i, G) for i in range(3)]
        Ty = [_pick3(tyh, i, G) for i in range(3)]
        # squared agent-vertex distances D[a][v]: [G, B] each
        D = [
            [
                (Ax[a] - Tx[v]) ** 2 + (Ay[a] - Ty[v]) ** 2
                for v in range(3)
            ]
            for a in range(3)
        ]
        big = jnp.asarray(3.4e38, dt)
        outs_x, outs_y = [], []
        scale_lvl = float(L - l)
        for i in range(3):
            j, kk = [a for a in range(3) if a != i]
            # ok[v]: self strictly closest (others come first in the
            # reference's cur ordering, so ties go to them)
            ok = [
                (D[i][v] < D[j][v]) & (D[i][v] < D[kk][v]) for v in range(3)
            ]
            # fallback: highest vertex index among maximal self-distances
            # (reference: idx == argsort(d_self)[-1])
            d0, d1, d2 = D[i][0], D[i][1], D[i][2]
            far2 = (d2 >= d0) & (d2 >= d1)
            far1 = ~far2 & (d1 >= d0)
            far0 = ~far2 & ~far1
            ok = [ok[0] | far0, ok[1] | far1, ok[2] | far2]
            m = [jnp.where(ok[v], D[i][v], big) for v in range(3)]
            p0 = (m[0] <= m[1]) & (m[0] <= m[2])
            p1 = ~p0 & (m[1] <= m[2])
            p2 = ~p0 & ~p1
            pk = [p0.astype(dt), p1.astype(dt), p2.astype(dt)]
            vx_ = pk[0] * Tx[0] + pk[1] * Tx[1] + pk[2] * Tx[2]
            vy_ = pk[0] * Ty[0] + pk[1] * Ty[1] + pk[2] * Ty[2]
            # settled: Frobenius norm of (T̂ - cur) in member-i row pairing
            perm = _SETTLED_PERM[i]
            err = sum(
                (Tx[v] - Ax[perm[v]]) ** 2 + (Ty[v] - Ay[perm[v]]) ** 2
                for v in range(3)
            )
            scale = jnp.where(err < 1e-4, 1.0, 0.3).astype(dt)
            ax_i = jnp.clip(0.5 * (vx_ - Ax[i]), -1.0, 1.0) + pvx * scale
            ay_i = jnp.clip(0.5 * (vy_ - Ay[i]), -1.0, 1.0) + pvy * scale
            outs_x.append(ax_i * scale_lvl)
            outs_y.append(ay_i * scale_lvl)
        pvx = _interleave3(outs_x, G)
        pvy = _interleave3(outs_y, G)
    return pvx, pvy
