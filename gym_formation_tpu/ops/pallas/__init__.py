from .pairforce import collision_forces_batched
from .pairforce_cull import collision_forces_culled, morton_order

__all__ = ["collision_forces_batched", "collision_forces_culled", "morton_order"]
