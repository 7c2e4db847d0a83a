"""Interactive keyboard policy.

Rebuild of the reference's pyglet-based ``InteractivePolicy``
(``/root/reference/formation_gym/policy.py:13-52``): arrow keys drive one
agent with the 5-slot move vector ``[noop, left, right, down, up]`` plus zero
comm.  This version binds to a matplotlib figure (works in more environments
than pyglet GL) and degrades to a scripted no-op when no display exists, so
it can be unit-tested headlessly.
"""

from __future__ import annotations

import numpy as np


class Policy:
    def action(self, obs):
        raise NotImplementedError


class InteractivePolicy(Policy):
    """Arrow-key teleoperation of a single agent.

    ``action(obs)`` returns the same layout the reference emits
    (``policy.py:29-43``): a 5-dim one-hot-style move vector concatenated with
    ``dim_c`` zeros of comm.
    """

    def __init__(self, dim_c: int = 2, fig=None):
        self.dim_c = dim_c
        # move state: left, right, up, down (reference policy.py:18)
        self.move = [False, False, False, False]
        self._fig = fig
        if fig is not None:
            fig.canvas.mpl_connect("key_press_event", self._on_press)
            fig.canvas.mpl_connect("key_release_event", self._on_release)

    @classmethod
    def with_display(cls, dim_c: int = 2):
        """Open a matplotlib window bound to this policy (needs a display)."""
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(5, 5))
        return cls(dim_c, fig=fig), fig

    # key handlers mirror reference key_press/key_release (policy.py:45-52)
    def _set(self, key, value):
        idx = {"left": 0, "right": 1, "up": 2, "down": 3}.get(key)
        if idx is not None:
            self.move[idx] = value

    def _on_press(self, event):
        self._set(event.key, True)

    def _on_release(self, event):
        self._set(event.key, False)

    def action(self, obs=None) -> np.ndarray:
        u = np.zeros(5)
        if self.move[0]:
            u[1] += 1.0
        if self.move[1]:
            u[2] += 1.0
        if self.move[3]:
            u[3] += 1.0
        if self.move[2]:
            u[4] += 1.0
        if not any(self.move):
            u[0] += 1.0
        return np.concatenate([u, np.zeros(self.dim_c)])
