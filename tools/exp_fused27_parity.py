#!/usr/bin/env python
"""On-TPU same-seed parity anchor for the n=27 fused rollout kernel.

VERDICT r3 weak #6: the n=27 row of the fused-kernel envelope table was
TPU-measured but never correctness-anchored (the unrolled O(n^2) interpret
path needs ~300 s for even a B=4, T=8 run on the 2-vCPU host — measured).
This tool runs the anchor on the real chip: same initial states, fused
kernel vs the step-by-step XLA path over a horizon sweep.

Measured finding (recorded in RESULTS.md): the single-step error is pure
f32 rounding (1.2e-7), then grows ~10x per ~5 steps through the stiff
contact force (contact_force=100, margin=1e-3: a Lyapunov amplifier) until
trajectories macroscopically decorrelate between T=10 and T=20 —
  T=1: 1.2e-7   T=2: 2.4e-7   T=5: 3.2e-6   T=10: 4.7e-5   T=20: 2.6e-1
The same growth forced the n=9 interpret test's 3e-4 band.  The anchor
therefore asserts at T=10 (pre-chaotic, 27x denser contact regime than the
interpret-tested n=9) — divergence past that horizon is sensitivity of the
dynamics, not kernel error.

Usage: python tools/exp_fused27_parity.py   (TPU; ~2 min after compile)
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import gym_formation_tpu as ft
from gym_formation_tpu.ops.pallas.fused_rollout import (
    fused_rollout_hd,
    soa_to_state,
    state_to_soa,
)
from gym_formation_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main(n=27, B=512):
    env = ft.make_env("formation_hd_env", num_agents=n)
    state, obs = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), B)
    )
    pol = lambda o, k: ft.ezpolicy_batched(o)
    errs = {}
    for T in (1, 2, 5, 10, 20):
        (st_s, _), outs = jax.jit(
            lambda s, o, k: jax.vmap(
                lambda ss, oo, kk: ft.rollout(env, pol, ss, oo, kk, T)
            )(s, o, k)
        )(state, obs, jax.random.split(jax.random.PRNGKey(1), B))
        soa, r_f = jax.jit(
            lambda soa: fused_rollout_hd(
                soa, 7, length=T, ep_len=env.world_length, n=n, block=B
            )
        )(state_to_soa(state))
        st_f = soa_to_state(soa, state)
        r_std = outs.reward.sum(axis=(1, 2))
        assert math.isfinite(float(jnp.asarray(r_f).sum()))
        pe = float(
            jnp.abs(jnp.asarray(st_f.pos) - st_s.pos.astype(jnp.float32)).max()
        )
        re = float(
            jnp.abs(r_f - r_std).max() / jnp.abs(r_std).max()
        )
        errs[T] = (pe, re)
        print(f"T={T:3d}: max|pos| err {pe:.3e}, reward rel err {re:.3e}",
              flush=True)
    pe10, re10 = errs[10]
    assert pe10 < 1e-3 and re10 < 1e-4, (pe10, re10)
    assert errs[1][0] < 1e-5, errs[1]  # single step: f32 rounding only
    print(
        "PASS: fused n=27 kernel matches the step path on-chip at the "
        "pre-chaotic horizon (T=10); growth beyond is contact-force "
        "sensitivity, not kernel error"
    )


if __name__ == "__main__":
    main()
