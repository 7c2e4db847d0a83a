from .exact import host_reset, state_from_numpy

__all__ = ["host_reset", "state_from_numpy"]
