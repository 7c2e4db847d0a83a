from .mappo import MAPPO, MAPPOConfig, MAPPOState, ValueNorm
from .maddpg import MADDPG, MADDPGConfig, MADDPGState, ReplayBuffer
from .matd3 import MATD3, MATD3Config
from .masac import MASAC, MASACConfig, MASACState
from .qmix import QMix, QMixConfig, QMixState
from .rmappo import RMAPPO, RMAPPOConfig, RunnerCarry
from .rmaddpg import RMADDPG, RMADDPGConfig, EpisodeBuffer
from .rqmix import RQMix, RQMixConfig
from .rmasac import RMASAC, RMASACConfig

__all__ = [
    "MAPPO",
    "MAPPOConfig",
    "MAPPOState",
    "ValueNorm",
    "MADDPG",
    "MADDPGConfig",
    "MADDPGState",
    "ReplayBuffer",
    "MATD3",
    "MATD3Config",
    "MASAC",
    "MASACConfig",
    "MASACState",
    "QMix",
    "QMixConfig",
    "QMixState",
    "RMAPPO",
    "RMAPPOConfig",
    "RunnerCarry",
    "RMADDPG",
    "RMADDPGConfig",
    "EpisodeBuffer",
    "RQMix",
    "RQMixConfig",
    "RMASAC",
    "RMASACConfig",
]
