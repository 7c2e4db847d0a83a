"""Metrics logging: JSONL always, tensorboard when available, matplotlib
return curves on demand.

Covers the reference's observability surface (SURVEY §5): tensorboardX
scalars (``maddpg-v2/main.py:47,107-108``), json scalar export
(``maddpg-v2/main.py:117``), maddpg-v1's matplotlib return-curve png
(``maddpg-v1/runner.py:57-61``), and the wandb switch
(``mappo/train_formation.py:98-109``, ``maddpg-v5/config.py:25-26``) —
enabled with ``use_wandb=True`` (or env ``GFT_WANDB=1``), import-guarded so
a missing/offline wandb degrades to JSONL+TB.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(
        self,
        run_dir: str,
        use_tensorboard: bool = True,
        use_wandb: Optional[bool] = None,
        wandb_kwargs: Optional[dict] = None,
    ):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        jsonl_path = os.path.join(run_dir, "metrics.jsonl")
        # reload prior history so a resumed run's plot() keeps the full curve
        self._history: Dict[str, list] = {}
        if os.path.exists(jsonl_path):
            try:
                with open(jsonl_path) as f:
                    for line in f:
                        row = json.loads(line)
                        for k, v in row.items():
                            if k in ("step", "wall"):
                                continue
                            self._history.setdefault(k, []).append((row["step"], v))
            except Exception:
                pass
        self._jsonl = open(jsonl_path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(run_dir, "tb"))
            except Exception:
                self._tb = None
        self._wandb = None
        if use_wandb is None:
            use_wandb = os.environ.get("GFT_WANDB", "") not in ("", "0")
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    dir=run_dir,
                    **(wandb_kwargs or {"project": "gym-formation-tpu"}),
                )
            except Exception:
                self._wandb = None
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        row = {"step": int(step), "wall": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            v = float(v)
            row[k] = v
            self._history.setdefault(k, []).append((step, v))
            if self._tb is not None:
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(metrics, step=int(step))
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
        if self._wandb is not None:
            self._wandb.finish()
