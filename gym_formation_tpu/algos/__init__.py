from .mappo import MAPPO, MAPPOConfig, MAPPOState, ValueNorm
from .maddpg import MADDPG, MADDPGConfig, MADDPGState, ReplayBuffer

__all__ = [
    "MAPPO",
    "MAPPOConfig",
    "MAPPOState",
    "ValueNorm",
    "MADDPG",
    "MADDPGConfig",
    "MADDPGState",
    "ReplayBuffer",
]
