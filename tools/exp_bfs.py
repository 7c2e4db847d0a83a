#!/usr/bin/env python
"""Isolated timing of the hierarchical BFS policy expansion at N=243.

Measures `bfs_actions_from_state` (5 levels x ezpolicy) alone, pipelined and
value-fetched, to size the policy component of the N=243 rollout step.

Usage: python tools/exp_bfs.py -B 2048
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
from gym_formation_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", "--batch", type=int, default=2048)
    ap.add_argument("--num-agents", type=int, default=243)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()

    B, N = args.batch, args.num_agents
    env = ft.make_env("formation_hd_env", num_agents=N)
    state = jax.jit(jax.vmap(lambda k: env.reset(k)[0]))(
        jax.random.split(jax.random.PRNGKey(0), B)
    )

    @jax.jit
    def run(st):
        acts = jax.vmap(
            lambda s: ft.bfs_actions_from_state(
                ft.ezpolicy_batched, env.scenario, s, 3
            )
        )(st)
        # feed actions back into positions: data dependence without physics
        st = st.replace(
            pos=st.pos.at[:, :N].add(acts.astype(st.pos.dtype) * 1e-3)
        )
        return st, acts.sum()

    st, s = run(state)
    sv = float(s)
    assert math.isfinite(sv)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        st, s = run(st)
    sv = float(s)
    dt = time.perf_counter() - t0
    assert math.isfinite(sv)
    print(
        f"bfs_actions_from_state B={B} N={N}: "
        f"{dt / args.iters * 1e3:.3f} ms/call"
    )


if __name__ == "__main__":
    main()
