#!/usr/bin/env python
"""Roofline-style estimate for the headline rollout: measured value-fetched
throughput against XLA's compiled cost analysis (the reference has no
quantitative perf instrumentation at all, SURVEY §6).

Honesty caveats, learned the hard way: the only trustworthy number this
tool prints is `steps_per_s` (value-fetched pipelined timing).  XLA's cost
analysis counts the scan BODY once rather than T times and its "bytes
accessed" counts fused operand accesses rather than HBM traffic, so both
are labeled estimates/bounds and must not be quoted as utilization.  For
the real speed-of-light analysis of the headline workload see the fused
rollout kernel discussion in RESULTS.md.

    python tools/roofline.py --num-agents 243 --num-envs 8192 --policy bfs_state
    python tools/roofline.py --num-agents 3 --num-envs 4096 --policy ezpolicy

Peak numbers default to one TPU v5e chip: 819 GB/s HBM, and for the
VPU-bound physics/reward mix the MEASURED achievable rate from
tools/vpu_ceiling.py — ~1.6e12 f32 op-slots/s (pure-FMA chain 1.55 T
slots/s = 3.1 TFLOP/s; the rsqrt/exp/log1p production mix 1.6 T slots/s;
the exact pair-kernel replica 64 G pairs/s at 25 slots/pair).  The old
"~49 TFLOP/s f32 vector" default was the bf16 MXU peak divided by 4 — a
number no VPU-bound kernel can see; VERDICT r3 flagged the 50x
inconsistency and vpu_ceiling.py resolved it by measurement.
Override with --peak-flops/--peak-bw for other chips.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import gym_formation_tpu as ft


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenario", default="formation_hd_env")
    p.add_argument("--num-agents", type=int, default=243)
    p.add_argument("--num-envs", type=int, default=8192)
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--policy", choices=["ezpolicy", "bfs_state", "random"],
                   default="bfs_state")
    p.add_argument("--pallas", choices=["auto", "on", "off"], default="auto")
    p.add_argument("--peak-bw", type=float, default=8.19e11,
                   help="peak HBM bytes/s (v5e: 819 GB/s)")
    p.add_argument("--peak-flops", type=float, default=1.6e12,
                   help="achievable f32 op-slots/s for the dominant unit "
                   "(v5e VPU mix, MEASURED by tools/vpu_ceiling.py: ~1.6e12; "
                   "use 1.97e14 for bf16 MXU work)")
    args = p.parse_args()

    from gym_formation_tpu.core.physics import set_pallas_mode

    set_pallas_mode(args.pallas)
    env = ft.make_env(args.scenario, num_agents=args.num_agents)
    B, T = args.num_envs, args.chunk

    if args.policy == "bfs_state":
        import numpy as np

        n_per_layer = args.num_agents
        for cand in range(2, args.num_agents + 1):
            L = round(np.log(args.num_agents) / np.log(cand))
            if cand**max(L, 1) == args.num_agents:
                n_per_layer = cand
                break

        def policy(state, key):
            return ft.bfs_actions_from_state(
                ft.ezpolicy_batched, env.scenario, state, n_per_layer
            )

        def run_chunk(state, key):
            keys = jax.random.split(key, B)
            state, rsum = jax.vmap(
                lambda s, k: ft.rollout_statepolicy_rewardsum(
                    env, policy, s, k, T
                )
            )(state, keys)
            return state, rsum.sum()

        reset = jax.jit(jax.vmap(lambda k: env.reset(k)[0]))
        carry = (reset(jax.random.split(jax.random.PRNGKey(0), B)),)
    else:
        if args.policy == "ezpolicy":
            policy = lambda obs, key: ft.ezpolicy_batched(obs)
        else:
            policy = lambda obs, key: jax.random.uniform(
                key, obs.shape[:-1] + (env.act_dim,), jnp.float32, -1.0, 1.0
            )

        def run_chunk(state, obs, key):
            keys = jax.random.split(key, B)
            (state, obs), outs = jax.vmap(
                lambda s, o, k: ft.rollout(env, policy, s, o, k, T)
            )(state, obs, keys)
            return state, obs, outs.reward.sum()

        reset = jax.jit(jax.vmap(env.reset))
        carry = reset(jax.random.split(jax.random.PRNGKey(0), B))

    lowered = jax.jit(run_chunk).lower(*carry, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns one dict per device
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))

    out = compiled(*carry, jax.random.PRNGKey(1))
    # value-fetch, not block_until_ready: on the remote-TPU tunnel a faulted
    # execution's buffers report ready without raising — only a host fetch
    # proves the computation ran (see bench.py).
    float(jax.device_get(out[-1]))
    t0 = time.perf_counter()
    for i in range(args.iters):
        out = compiled(*(out[:-1] if len(out) > 1 else out), jax.random.PRNGKey(2 + i))
    rv = float(jax.device_get(out[-1]))
    dt = (time.perf_counter() - t0) / args.iters
    import math

    assert math.isfinite(rv), f"non-finite reward from timed run: {rv}"

    steps = B * T
    fl = flops / dt
    # "bytes accessed" from XLA cost analysis counts every fused operand
    # access, NOT actual HBM traffic (fusion-internal reads stay in
    # registers/VMEM) — dividing it by wall time produced >2000x "HBM
    # utilization" nonsense in an earlier revision.  Report it only as an
    # upper bound on traffic; utilization is quoted for FLOPs alone, and
    # even that uses XLA's *estimate* of the op count.
    print(
        json.dumps(
            {
                "config": f"{args.scenario} N={args.num_agents} B={B} "
                f"T={T} policy={args.policy} pallas={args.pallas}",
                "steps_per_s": round(steps / dt, 1),
                "ms_per_chunk": round(dt * 1e3, 2),
                "xla_est_flops_per_step_scanbody_once": round(flops / steps, 1),
                "xla_op_bytes_per_step_upper_bound": round(
                    bytes_accessed / steps, 1
                ),
                "achieved_GFLOPs_est": round(fl / 1e9, 1),
                "flop_utilization_est_unreliable": round(fl / args.peak_flops, 3),
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
