from .checkpoint import latest_step, restore_checkpoint, restore_raw, save_checkpoint
from .compile_cache import enable_compilation_cache
from .config import from_dict, load_config, save_config, to_dict
from .logging import MetricsLogger
from .profiling import Throughput, assert_finite, named_scope, trace

__all__ = [
    "enable_compilation_cache",
    "latest_step",
    "restore_checkpoint",
    "restore_raw",
    "save_checkpoint",
    "from_dict",
    "load_config",
    "save_config",
    "to_dict",
    "MetricsLogger",
    "Throughput",
    "assert_finite",
    "named_scope",
    "trace",
]
