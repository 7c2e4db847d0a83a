from .pairforce import collision_forces_batched
from .pairforce_cull import collision_forces_culled, morton_order
from .pairforce_sym import collision_forces_sym, sym_applicable

# Heavier kernels (whole-rollout / whole-collection / PPO-grad) are imported
# from their modules directly by their call sites — importing them here would
# pull jax.experimental.pallas into every `import gym_formation_tpu`.
__all__ = [
    "collision_forces_batched",
    "collision_forces_culled",
    "collision_forces_sym",
    "morton_order",
    "sym_applicable",
]
