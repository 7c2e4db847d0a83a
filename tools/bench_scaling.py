#!/usr/bin/env python
"""Weak-scaling efficiency harness: env-steps/s vs mesh size.

Fixes a per-device env count and sweeps data-parallel mesh sizes 1..D,
reporting throughput and efficiency vs the 1-device run.  On real hardware
the mesh spans chips/hosts over ICI/DCN; in CI it runs on virtual CPU devices
(``--force-cpu-devices N``) to validate the mechanism (the reference has no
multi-node test story at all — SURVEY §4/§5).

    python tools/bench_scaling.py --force-cpu-devices 8 --envs-per-device 64
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenario", default="formation_hd_env")
    p.add_argument("--num-agents", type=int, default=3)
    p.add_argument("--envs-per-device", type=int, default=512)
    p.add_argument("--chunk", type=int, default=128)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--force-cpu-devices", type=int, default=0)
    args = p.parse_args()

    if args.force_cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_cpu_devices}"
        )
    import jax

    if args.force_cpu_devices:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import gym_formation_tpu as ft
    from gym_formation_tpu.parallel import make_mesh, shard_batch

    env = ft.make_env(args.scenario, num_agents=args.num_agents)

    def policy(obs, key):
        return jax.random.uniform(
            key, obs.shape[:-1] + (env.act_dim,), jnp.float32, -1.0, 1.0
        )

    def throughput(n_dev: int) -> float:
        B = args.envs_per_device * n_dev
        mesh = make_mesh(devices=jax.devices()[:n_dev])

        @jax.jit
        def run_chunk(state, obs, key):
            keys = jax.random.split(key, B)
            (state, obs), outs = jax.vmap(
                lambda s, o, k: ft.rollout(env, policy, s, o, k, args.chunk)
            )(state, obs, keys)
            return state, obs, outs.reward.sum()

        state, obs = jax.jit(jax.vmap(env.reset))(
            jax.random.split(jax.random.PRNGKey(0), B)
        )
        state = shard_batch(state, mesh)
        obs = shard_batch(obs, mesh)
        state, obs, r = run_chunk(state, obs, jax.random.PRNGKey(1))
        r.block_until_ready()
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, obs, r = run_chunk(state, obs, jax.random.PRNGKey(2 + i))
        r.block_until_ready()
        return B * args.chunk * args.iters / (time.perf_counter() - t0)

    n_devices = len(jax.devices())
    sweep = sorted({1, 2, n_devices // 2, n_devices} - {0})
    results = []
    base = None
    for d in sweep:
        if d > n_devices:
            continue
        rate = throughput(d)
        if base is None:
            base = rate
        eff = rate / (base * d)
        results.append(
            {"devices": d, "steps_per_s": round(rate, 1), "efficiency": round(eff, 3)}
        )
        print(json.dumps(results[-1]))
    print(
        json.dumps(
            {
                "metric": f"weak-scaling efficiency at {n_devices} devices",
                "value": results[-1]["efficiency"],
                "unit": "fraction",
                "sweep": results,
            }
        )
    )


if __name__ == "__main__":
    main()
