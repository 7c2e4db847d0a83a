"""Fused PPO-update gradient kernel.

Measured on v5e at the 4096-env MAPPO config, the XLA update takes
~9.5 ms/iteration while its entire matmul content runs in 2.5 ms — the
other ~7 ms is elementwise chains, transposes, reductions and intermediate
HBM traffic spread over hundreds of small kernels.  This kernel computes
the complete PPO loss gradient (actor + critic, `algos/mappo.py:_loss`) in
ONE Pallas program per epoch: the 64-hidden MLP forward AND hand-derived
backward run on the MXU per sample-chunk with weights and gradient
accumulators VMEM-resident; only the trajectory chunks stream from HBM.

Semantics gradient-matched to ``jax.grad(MAPPO._loss)`` (shared-policy
continuous path): clipped-ratio policy loss with ±20 log-ratio clamp,
state-independent Gaussian log-std (entropy/soft_bound chain handled by
the XLA caller — see ``algos/mappo.py:_update_fused``), clipped +
Huberized value loss.  Parity: tests/test_fused_ppo_grad.py compares every
gradient leaf against jax.grad on random data.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jnp.ndarray

_LOG_2PI = float(np.log(2.0 * np.pi))


def _mm(a, b, ca, cb):
    """dot_general contracting axis ``ca`` of a with ``cb`` of b, f32 MXU."""
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())), preferred_element_type=jnp.float32
    )


def _grad_kernel(
    # data chunks (chunk rows each)
    obsa_ref, act_ref, lpo_ref, adv_ref,  # actor rows: [Ca, ...]
    obsc_ref, vold_ref, tgt_ref,  # critic rows: [Cc, ...]
    # params (VMEM-resident for all chunks)
    aw1_ref, ab1_ref, aw2_ref, ab2_ref, aw3_ref, ab3_ref, als_ref,
    cw1_ref, cb1_ref, cw2_ref, cb2_ref, cw3_ref, cb3_ref,
    # grad accumulators + metric sums
    daw1_ref, dab1_ref, daw2_ref, dab2_ref, daw3_ref, dab3_ref, dals_ref,
    dcw1_ref, dcb1_ref, dcw2_ref, dcb2_ref, dcw3_ref, dcb3_ref,
    met_ref,
    *,
    n_rows_a: int,  # total actor rows M·N (loss normalizer)
    n_rows_c: int,  # total critic rows M
    act_dim: int,
    clip_eps: float,
    huber_delta: float,
    value_coef: float,
):
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        for r in (daw1_ref, dab1_ref, daw2_ref, dab2_ref, daw3_ref, dab3_ref,
                  dals_ref, dcw1_ref, dcb1_ref, dcw2_ref, dcb2_ref, dcw3_ref,
                  dcb3_ref, met_ref):
            r[...] = jnp.zeros_like(r)

    relu = lambda x: jnp.maximum(x, 0.0)

    # ---------------- actor forward ----------------
    x = obsa_ref[:, :]  # [Ca, do]
    aw1, ab1 = aw1_ref[:, :], ab1_ref[:, :]
    aw2, ab2 = aw2_ref[:, :], ab2_ref[:, :]
    aw3, ab3 = aw3_ref[:, :], ab3_ref[:, :]
    als = als_ref[:, :]  # [1, act_dim] bounded log_std
    h1 = relu(_mm(x, aw1, 1, 0) + ab1)  # [Ca, 64]
    h2 = relu(_mm(h1, aw2, 1, 0) + ab2)  # [Ca, 64]
    mu = _mm(h2, aw3, 1, 0) + ab3  # [Ca, A]

    act = act_ref[:, :]  # [Ca, A]
    inv_std = jnp.exp(-als)
    z = (act - mu) * inv_std  # [Ca, A]
    logp = (
        -0.5 * jnp.sum(z * z, axis=1, keepdims=True)
        - jnp.sum(als)
        - 0.5 * act_dim * _LOG_2PI
    )  # [Ca, 1]
    lpo = lpo_ref[:, :]  # [Ca, 1]
    delta = logp - lpo
    # log-ratio clamp ±20 (mappo.py:_loss); gradient passes inside the clamp
    in_clamp = (jnp.abs(delta) < 20.0).astype(jnp.float32)
    ratio = jnp.exp(jnp.clip(delta, -20.0, 20.0))
    adv = adv_ref[:, :]  # [Ca, 1]
    t1 = ratio * adv
    rclip = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps)
    t2 = rclip * adv
    # jnp.minimum JVP: grad to t1 where t1 < t2, to t2 otherwise (ties → t2)
    take1 = (t1 < t2).astype(jnp.float32)
    in_rclip = ((ratio > 1.0 - clip_eps) & (ratio < 1.0 + clip_eps)).astype(
        jnp.float32
    )
    inv_ma = 1.0 / n_rows_a
    # d(pg_loss)/d(ratio); pg_loss = -mean(min(t1, t2))
    dratio = -(take1 + (1.0 - take1) * in_rclip) * adv * inv_ma
    dlogp = dratio * ratio * in_clamp  # [Ca, 1]

    g_mu = dlogp * (z * inv_std)  # dlogp/dmu = z/σ → [Ca, A]
    # d logp / d ls_d = z_d² − 1 (per-sample); accumulate over chunk
    dals_ref[...] += jnp.sum(dlogp * (z * z - 1.0), axis=0, keepdims=True)

    # actor backward
    daw3_ref[...] += _mm(h2, g_mu, 0, 0)  # [64, A]
    dab3_ref[...] += jnp.sum(g_mu, axis=0, keepdims=True)
    g2 = _mm(g_mu, aw3, 1, 1) * (h2 > 0)  # [Ca, 64]
    daw2_ref[...] += _mm(h1, g2, 0, 0)
    dab2_ref[...] += jnp.sum(g2, axis=0, keepdims=True)
    g1 = _mm(g2, aw2, 1, 1) * (h1 > 0)
    daw1_ref[...] += _mm(x, g1, 0, 0)
    dab1_ref[...] += jnp.sum(g1, axis=0, keepdims=True)

    # ---------------- critic ----------------
    xc = obsc_ref[:, :]  # [Cc, N·do]
    cw1, cb1 = cw1_ref[:, :], cb1_ref[:, :]
    cw2, cb2 = cw2_ref[:, :], cb2_ref[:, :]
    cw3, cb3 = cw3_ref[:, :], cb3_ref[:, :]
    k1 = relu(_mm(xc, cw1, 1, 0) + cb1)
    k2 = relu(_mm(k1, cw2, 1, 0) + cb2)
    v = _mm(k2, cw3, 1, 0) + cb3  # [Cc, 1]

    vold = vold_ref[:, :]
    tgt = tgt_ref[:, :]
    dv_raw = v - vold
    in_vclip = (jnp.abs(dv_raw) < clip_eps).astype(jnp.float32)
    vclip = vold + jnp.clip(dv_raw, -clip_eps, clip_eps)
    e1 = v - tgt
    e2 = vclip - tgt

    def huber(e):
        a = jnp.abs(e)
        return jnp.where(
            a <= huber_delta, 0.5 * e * e, huber_delta * (a - 0.5 * huber_delta)
        )

    def dhuber(e):
        return jnp.clip(e, -huber_delta, huber_delta)

    l1, l2 = huber(e1), huber(e2)
    # jnp.maximum JVP: grad to l1 where l1 > l2, else to l2 (ties → l2)
    take_l1 = (l1 > l2).astype(jnp.float32)
    inv_mc = 1.0 / n_rows_c
    dv = (
        (take_l1 * dhuber(e1) + (1.0 - take_l1) * dhuber(e2) * in_vclip)
        * value_coef
        * inv_mc
    )  # [Cc, 1]

    dcw3_ref[...] += _mm(k2, dv, 0, 0)
    dcb3_ref[...] += jnp.sum(dv, axis=0, keepdims=True)
    q2 = _mm(dv, cw3, 1, 1) * (k2 > 0)
    dcw2_ref[...] += _mm(k1, q2, 0, 0)
    dcb2_ref[...] += jnp.sum(q2, axis=0, keepdims=True)
    q1 = _mm(q2, cw2, 1, 1) * (k1 > 0)
    dcw1_ref[...] += _mm(xc, q1, 0, 0)
    dcb1_ref[...] += jnp.sum(q1, axis=0, keepdims=True)

    # ---------------- metrics (sums; caller divides) ----------------
    pg_sum = -jnp.sum(jnp.minimum(t1, t2), keepdims=True).reshape(1, 1)
    v_sum = jnp.sum(jnp.maximum(l1, l2), keepdims=True).reshape(1, 1)
    kl_sum = jnp.sum(lpo - logp, keepdims=True).reshape(1, 1)
    met_ref[...] += jnp.concatenate([pg_sum, v_sum, kl_sum], axis=1)


def _pick_chunk(m: int, target: int = 800) -> int:
    """Largest divisor of ``m`` that is ≤ target and a multiple of 8.

    The target bounds live VMEM: fwd+bwd activations for a chunk are
    ~N·chunk·64·4 bytes × ~6 simultaneously-live planes, and the scoped
    VMEM stack limit is 16 MB (measured OOM at chunk=4096, N=3: 56 MB)."""
    best = 8
    for c in range(8, min(m, target) + 1, 8):
        if m % c == 0:
            best = c
    return best


def fused_ppo_grads(
    data: Dict[str, Array],
    actor_ops: Tuple[Array, ...],
    critic_ops: Tuple[Array, ...],
    *,
    n_agents: int,
    act_dim: int,
    clip_eps: float,
    huber_delta: float,
    value_coef: float,
    interpret: bool = False,
):
    """One epoch's PPO gradients.

    Args:
      data: flat batch ``{"obs" [M,N,do], "action" [M,N,A], "logp" [M,N],
        "adv" [M] or [M,N], "value" [M], "target" [M]}`` (mappo.py layout).
      actor_ops / critic_ops: weight tuples ``(w1 [do,64], b1 [1,64], w2,
        b2, w3 [64,A], b3 [1,A], log_std_bounded [1,A])`` / ``(w1 [N·do,64],
        b1, w2, b2, w3 [64,1], b3 [1,1])`` — natural [in, out] layout.

    Returns ``(grads_tuple_actor, grads_tuple_critic, metric_sums [3])``
    where gradients mirror the input tuples (log_std gradient EXCLUDES the
    entropy term — the caller adds ``-entropy_coef`` per dim and chains
    soft_bound).
    """
    data = {k: jnp.asarray(v, jnp.float32) for k, v in data.items()}
    M, N, do = data["obs"].shape
    assert N == n_agents
    Ma = M * N
    obs_a = data["obs"].reshape(Ma, do)
    obs_c = data["obs"].reshape(M, N * do)
    act = data["action"].reshape(Ma, act_dim)
    lpo = data["logp"].reshape(Ma, 1)
    adv = data["adv"]
    if adv.ndim == 1:
        adv = jnp.broadcast_to(adv[:, None], (M, N))
    adv = adv.reshape(Ma, 1)
    vold = data["value"].reshape(M, 1)
    tgt = data["target"].reshape(M, 1)

    chunk = _pick_chunk(M)
    grid = (M // chunk,)
    ca = chunk * N

    row_spec = lambda r, w: pl.BlockSpec((r, w), lambda i: (i, 0))
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0))

    a_shapes = [a.shape for a in actor_ops]
    c_shapes = [c.shape for c in critic_ops[:6]]

    kern = functools.partial(
        _grad_kernel,
        n_rows_a=Ma,
        n_rows_c=M,
        act_dim=act_dim,
        clip_eps=clip_eps,
        huber_delta=huber_delta,
        value_coef=value_coef,
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            row_spec(ca, do), row_spec(ca, act_dim), row_spec(ca, 1),
            row_spec(ca, 1),
            row_spec(chunk, N * do), row_spec(chunk, 1), row_spec(chunk, 1),
        ]
        + [full(a) for a in actor_ops]
        + [full(c) for c in critic_ops],
        out_specs=[pl.BlockSpec(s, lambda i: (0, 0)) for s in a_shapes]
        + [pl.BlockSpec(s, lambda i: (0, 0)) for s in c_shapes]
        + [pl.BlockSpec((1, 3), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct(s, jnp.float32) for s in a_shapes]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in c_shapes]
        + [jax.ShapeDtypeStruct((1, 3), jnp.float32)],
        interpret=interpret,
    )(
        obs_a, act, lpo, adv, obs_c, vold, tgt,
        *actor_ops, *critic_ops,
    )
    g_actor = tuple(out[: len(actor_ops)])
    g_critic = tuple(out[len(actor_ops) : len(actor_ops) + 6])
    met = out[-1][0]
    return g_actor, g_critic, met
