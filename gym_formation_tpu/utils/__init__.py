from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .logging import MetricsLogger

__all__ = [
    "latest_step",
    "restore_checkpoint",
    "save_checkpoint",
    "MetricsLogger",
]
