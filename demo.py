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
from gym_formation_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def run_interactive(env, args, key):
    """Human-in-the-loop stepping: arrow keys drive agent 0, the remaining
    agents run the scripted ezpolicy — the reference's interactive surface
    (``/root/reference/policy.py:13-52`` bound through ``test.py:14-29``),
    rebuilt on matplotlib.

    The interactive 5-slot move vector decodes with the reference's one-hot
    semantics (``environment.py:208-214``: u = [a[1]−a[2], a[3]−a[4]],
    including the left-key→+x MPE quirk).  Runs headless (Agg backend) for
    smoke tests; with a display it opens a live window.
    """
    import matplotlib
    import matplotlib.pyplot as plt

    from gym_formation_tpu.policy import InteractivePolicy

    interactive_backend = matplotlib.get_backend().lower() != "agg" and bool(
        os.environ.get("DISPLAY") or sys.platform == "darwin"
    )
    if not interactive_backend:
        matplotlib.use("Agg")
        print("no display: running the interactive loop headless (Agg)")

    pol, fig = InteractivePolicy.with_display(dim_c=0)
    ax = fig.add_subplot(111)
    ax.set_axis_off()
    fig.suptitle("arrow keys drive agent 0 (red); others: ezpolicy")

    reset = jax.jit(env.reset)
    state, obs = reset(key)

    @jax.jit
    def step_with_human(state, obs, u0):
        acts = ft.ezpolicy_batched(obs).at[0].set(u0)
        return env.step(state, acts)

    im = ax.imshow(np.asarray(render_state(env.scenario, state, size=350)))
    if interactive_backend:
        plt.ion()
        plt.show(block=False)
    for t in range(args.steps):
        a = pol.action()
        u0 = np.asarray([a[1] - a[2], a[3] - a[4]], np.float32)
        state, out = step_with_human(state, obs, u0)
        obs = out.obs
        im.set_data(np.asarray(render_state(env.scenario, state, size=350)))
        fig.canvas.draw_idle()
        # pause services the GUI event loop → key events reach the policy
        plt.pause(0.05 if interactive_backend else 0.001)
        if bool(out.done.all()):
            state, obs = reset(jax.random.fold_in(key, t))
    plt.close(fig)
    print(f"interactive session done ({args.steps} steps)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--scenario", default="formation_hd_env")
    p.add_argument("-n", "--num-agents", type=int, default=3)
    p.add_argument("-r", "--random", action="store_true", help="random actions")
    p.add_argument("--num-layer", type=int, default=1)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--gif", default=None, help="write a GIF here")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--interactive", action="store_true",
        help="live matplotlib window: arrow keys drive agent 0, the rest run "
        "ezpolicy (the reference's test.py + InteractivePolicy loop)",
    )
    args = p.parse_args()

    total_agents = args.num_agents**args.num_layer
    env = ft.make_env(args.scenario, num_agents=total_agents, auto_reset=False)
    key = jax.random.PRNGKey(args.seed)
    if args.interactive:
        run_interactive(env, args, key)
        return
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
