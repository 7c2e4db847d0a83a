#!/usr/bin/env python
"""A/B the symmetric upper-triangle pair-force kernel vs the dense kernel at
the N=243 BASELINE density (hd colliding subset, E=243).

Honest timing per CLAUDE.md: >=32 pipelined executions chained through a data
dependency, closed by a host value fetch, finiteness-asserted.

Usage: python tools/exp_pair_sym.py -B 1024 [--variants dense,sym32p,...]
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import gym_formation_tpu as ft
from gym_formation_tpu.core import physics
from gym_formation_tpu.ops.pallas.pairforce import collision_forces_batched
from gym_formation_tpu.ops.pallas.pairforce_sym import collision_forces_sym
from gym_formation_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", "--batch", type=int, default=1024)
    ap.add_argument("--num-agents", type=int, default=243)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--variants", default="dense,sym32,sym32p,sym64p")
    args = ap.parse_args()

    env = ft.make_env("formation_hd_env", num_agents=args.num_agents)
    sub = physics._collide_subset(env.cfg)
    sub_cfg = sub[3]
    B, E = args.batch, sub_cfg.n_entities
    pos = jax.random.uniform(jax.random.PRNGKey(0), (B, E, 2), jnp.float32, -1.0, 1.0)

    variants = {
        "dense": lambda p: collision_forces_batched(p, sub_cfg),
        "sym32": lambda p: collision_forces_sym(p, sub_cfg, tile=32, poly=False, loop=False),
        "sym32p": lambda p: collision_forces_sym(p, sub_cfg, tile=32, poly=True, loop=False),
        "sym64": lambda p: collision_forces_sym(p, sub_cfg, tile=64, poly=False, loop=False),
        "sym64p": lambda p: collision_forces_sym(p, sub_cfg, tile=64, poly=True, loop=False),
        "sym16": lambda p: collision_forces_sym(p, sub_cfg, tile=16, poly=False, loop=False),
        "sym16p": lambda p: collision_forces_sym(p, sub_cfg, tile=16, poly=True, loop=False),
        "loop16": lambda p: collision_forces_sym(p, sub_cfg, tile=16, loop=True),
        "loop32": lambda p: collision_forces_sym(p, sub_cfg, tile=32, loop=True),
        "loop64": lambda p: collision_forces_sym(p, sub_cfg, tile=64, loop=True),
        "loop8": lambda p: collision_forces_sym(p, sub_cfg, tile=8, loop=True),
    }

    def raw32(p):
        # kernel minus the pad/transpose wrapper: isolates the layout cost.
        # p arrives [B, E, 2]; fake the transposed layout with a reshape-only
        # view of the same byte count (timing probe — values are unchecked).
        from gym_formation_tpu.ops.pallas import pairforce_sym as ps

        Ep = ps._round_up(E, 32)
        Bp = ps._round_up(B, ps.LANE)
        xt = jnp.zeros((Ep, Bp), jnp.float32) + p[0, 0, 0]
        yt = jnp.zeros((Ep, Bp), jnp.float32) + p[0, 0, 1]
        fx, fy = ps._sym_call(xt, yt, sub_cfg, tile=32, loop=True, interpret=False)
        return jnp.stack([fx[:E, :B].T, fy[:E, :B].T], axis=-1)

    variants["raw32"] = raw32

    ref = None
    for name in args.variants.split(","):
        fn = variants[name]

        @jax.jit
        def run(q, fn=fn):
            f = fn(q)
            return q + 1e-6 * f, f.sum()

        q, s = run(pos)
        sv = float(s)
        assert math.isfinite(sv), (name, sv)
        if ref is None:
            ref = float(jnp.max(jnp.abs(run(pos)[0])))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            q, s = run(q)
        sv = float(s)  # host fetch closes the window
        dt = time.perf_counter() - t0
        assert math.isfinite(sv), (name, sv)
        print(
            f"{name:8s} B={B} E={E}: {dt / args.iters * 1e3:7.3f} ms/call"
            f"  (check {sv:.4e})"
        )


if __name__ == "__main__":
    main()
