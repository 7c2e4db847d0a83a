"""Headless rgb_array renderer + GIF export.

Replaces the reference's pyglet/OpenGL immediate-mode viewer
(``/root/reference/formation_gym/rendering.py:44-344`` and the render
orchestration of ``environment.py:243-393``) with a pure-numpy rasterizer: no
display or GL context needed, works over SSH/CI, and vectorizes over pixels.
Camera behavior matches the reference: centered on the agents' centroid with
``cam_range = 2`` (``environment.py:6-7,363-369``).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..core.types import EnvState
from ..envs.scenario import Scenario

CAM_RANGE = 2.0
AGENT_COLOR = np.array([0.35, 0.35, 0.85])  # envs/formation_hd_env.py:80
LANDMARK_COLOR = np.array([0.25, 0.25, 0.25])  # envs/formation_hd_env.py:88
OBSTACLE_COLOR = np.array([0.25, 0.25, 0.25])
TARGET_COLOR = np.array([0.0, 0.6, 0.0])  # envs/formation_hd_obs_env.py:113
BACKGROUND = np.array([1.0, 1.0, 1.0])


def render_state(
    scenario: Scenario,
    state: EnvState,
    size: int = 700,
    cam_range: float = CAM_RANGE,
    center: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Rasterize one env state to [size, size, 3] uint8.

    Entity radii and colors mirror the reference geoms (alpha-blended agents,
    solid landmarks — ``environment.py:287-311``).  ``center`` overrides the
    default shared camera (agents' centroid, ``environment.py:363-369``).
    """
    cfg = scenario.cfg
    pos = np.asarray(state.pos, np.float64)
    n = cfg.n_agents
    center = pos[:n].mean(axis=0) if center is None else np.asarray(center)
    lo = center - cam_range
    scale = size / (2 * cam_range)

    img = np.ones((size, size, 3), np.float64)
    yy, xx = np.mgrid[0:size, 0:size]
    # world coords per pixel (y axis up)
    wx = lo[0] + (xx + 0.5) / scale
    wy = lo[1] + (size - 1 - yy + 0.5) / scale

    num_targets = getattr(scenario, "num_targets", cfg.n_landmarks)
    order = list(range(n, cfg.n_entities)) + list(range(n))  # landmarks under agents
    for i in order:
        r = float(cfg.size[i])
        mask = (wx - pos[i, 0]) ** 2 + (wy - pos[i, 1]) ** 2 <= r * r
        if i < n:
            color, alpha = AGENT_COLOR, 0.5
        elif i - n < num_targets:
            color, alpha = (
                (TARGET_COLOR, 1.0)
                if scenario.name == "formation_hd_obs_env"
                else (LANDMARK_COLOR, 1.0)
            )
        else:
            color, alpha = OBSTACLE_COLOR, 1.0
        img[mask] = (1 - alpha) * img[mask] + alpha * color
    return (img * 255).astype(np.uint8)


def render_state_per_agent(
    scenario: Scenario,
    state: EnvState,
    size: int = 700,
    cam_range: float = CAM_RANGE,
) -> List[np.ndarray]:
    """One frame per agent, each camera centered on its own agent — the
    reference's ``shared_viewer=False`` mode (one ``Viewer`` per agent,
    ``environment.py:329-341``; camera at ``agents[i].state.p_pos``,
    ``:363-370``).  Tile with :func:`tile_images` for a single canvas."""
    pos = np.asarray(state.pos, np.float64)
    return [
        render_state(scenario, state, size, cam_range, center=pos[i])
        for i in range(scenario.cfg.n_agents)
    ]


def save_gif(frames: List[np.ndarray], path: str, fps: int = 20) -> Optional[str]:
    """Write frames to a GIF (the maddpg-v2 ``evaluate.py:14-81`` GIF path).
    Returns the path, or None if imageio is unavailable."""
    try:
        import imageio
    except Exception:
        return None
    imageio.mimsave(path, frames, fps=fps)
    return path


def tile_images(img_nhwc: np.ndarray) -> np.ndarray:
    """Tile N frames into one near-square [H*h, W*w, c] image — the vec-env
    render path of the reference (``train/maddpg-v4/utils.py:271-290``,
    used by ``wrapper.py:102-130``); blank-pads to fill the grid."""
    img_nhwc = np.asarray(img_nhwc)
    n, h, w, c = img_nhwc.shape
    H = int(np.ceil(np.sqrt(n)))
    W = int(np.ceil(n / H))
    pad = np.zeros((H * W - n, h, w, c), img_nhwc.dtype)
    grid = np.concatenate([img_nhwc, pad]).reshape(H, W, h, w, c)
    return grid.transpose(0, 2, 1, 3, 4).reshape(H * h, W * w, c)
