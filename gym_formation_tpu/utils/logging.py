"""Metrics logging: JSONL always, tensorboard when available, matplotlib
return curves on demand.

Covers the reference's observability surface (SURVEY §5): tensorboardX
scalars (``maddpg-v2/main.py:47,107-108``), json scalar export
(``maddpg-v2/main.py:117``), and maddpg-v1's matplotlib return-curve png
(``maddpg-v1/runner.py:57-61``).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, run_dir: str, use_tensorboard: bool = True):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(run_dir, "tb"))
            except Exception:
                self._tb = None
        self._history: Dict[str, list] = {}
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        row = {"step": int(step), "wall": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            v = float(v)
            row[k] = v
            self._history.setdefault(k, []).append((step, v))
            if self._tb is not None:
                self._tb.add_scalar(k, v, step)
        self._jsonl.write(json.dumps(row) + "\n")
        self._jsonl.flush()

    def plot(self, key: str = "mean_step_reward", fname: Optional[str] = None) -> None:
        """Save a return curve png (the maddpg-v1 style training plot)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        if key not in self._history:
            return
        xs, ys = zip(*self._history[key])
        plt.figure(figsize=(6, 4))
        plt.plot(xs, ys)
        plt.xlabel("step")
        plt.ylabel(key)
        plt.tight_layout()
        plt.savefig(fname or os.path.join(self.run_dir, f"{key}.png"))
        plt.close()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
