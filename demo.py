#!/usr/bin/env python
"""Smoke/demo driver — the rebuild of the reference's ``test.py``
(``/root/reference/test.py:6-29``): run a scenario with the scripted ezpolicy
through hierarchical BFS expansion (or random actions), with the total agent
count ``num_agents ** num_layer``, optionally saving a GIF.

Examples:
    python demo.py -s formation_hd_env -n 3 --num-layer 2 --steps 100 --gif demo.gif
    python demo.py -s formation_hd_env -n 3 -r
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

import gym_formation_tpu as ft
from gym_formation_tpu.render import render_state, save_gif


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--scenario", default="formation_hd_env")
    p.add_argument("-n", "--num-agents", type=int, default=3)
    p.add_argument("-r", "--random", action="store_true", help="random actions")
    p.add_argument("--num-layer", type=int, default=1)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--gif", default=None, help="write a GIF here")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    total_agents = args.num_agents**args.num_layer
    env = ft.make_env(args.scenario, num_agents=total_agents, auto_reset=False)
    key = jax.random.PRNGKey(args.seed)
    reset = jax.jit(env.reset)
    state, obs = reset(key)

    @jax.jit
    def step_bfs(state, obs):
        return env.step(state, ft.bfs_actions(ft.ezpolicy_batched, obs, args.num_agents))

    @jax.jit
    def step_random(state, obs, k):
        return env.step(state, env.sample_actions(k))

    frames = []
    rewards = []
    for t in range(args.steps):
        if args.random:
            key, k = jax.random.split(key)
            state, out = step_random(state, obs, k)
        else:
            state, out = step_bfs(state, obs)
        obs = out.obs
        rewards.append(float(out.reward[0]))
        if args.gif:
            frames.append(render_state(env.scenario, state, size=350))
        if bool(out.done.all()):
            state, obs = reset(jax.random.fold_in(key, t))
    print(
        f"{args.scenario}: {total_agents} agents, {args.steps} steps — "
        f"reward first/last: {rewards[0]:.3f} / {rewards[-1]:.3f}"
    )
    if args.gif:
        out = save_gif(frames, args.gif)
        print(f"gif → {out}" if out else "imageio unavailable; no gif written")


if __name__ == "__main__":
    main()
