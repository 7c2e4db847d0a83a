from .pairforce import collision_forces_batched

__all__ = ["collision_forces_batched"]
