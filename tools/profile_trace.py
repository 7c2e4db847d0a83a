#!/usr/bin/env python
"""Capture a jax.profiler trace of the headline rollout for TensorBoard.

Aux-subsystem demonstration (SURVEY §5 "tracing/profiling"): replaces the
reference's wall-clock FPS prints with a real hardware trace.

    python tools/profile_trace.py --out /tmp/jaxtrace
    tensorboard --logdir /tmp/jaxtrace
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import gym_formation_tpu as ft
from gym_formation_tpu.utils import trace


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/jaxtrace")
    p.add_argument("--scenario", default="formation_hd_env")
    p.add_argument("--num-agents", type=int, default=3)
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--chunk", type=int, default=64)
    args = p.parse_args()

    env = ft.make_env(args.scenario, num_agents=args.num_agents)
    B, T = args.num_envs, args.chunk
    policy = lambda obs, key: ft.ezpolicy_batched(obs)

    @jax.jit
    def run_chunk(state, obs, key):
        keys = jax.random.split(key, B)
        (state, obs), outs = jax.vmap(
            lambda s, o, k: ft.rollout(env, policy, s, o, k, T)
        )(state, obs, keys)
        return state, obs, outs.reward.sum()

    state, obs = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), B)
    )
    state, obs, r = run_chunk(state, obs, jax.random.PRNGKey(1))
    float(jax.device_get(r))  # compile outside the trace; value fetch proves execution
    with trace(args.out):
        state, obs, r = run_chunk(state, obs, jax.random.PRNGKey(2))
        float(jax.device_get(r))
    print(f"trace written → {args.out} (view with tensorboard --logdir)")


if __name__ == "__main__":
    main()
