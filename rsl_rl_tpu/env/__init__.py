"""Environment contract and built-in JAX-native environments."""

from rsl_rl_tpu.env.brax_env import BraxVecEnv
from rsl_rl_tpu.env.cartpole import CartPoleSwingUp
from rsl_rl_tpu.env.hopper import Hopper
from rsl_rl_tpu.env.host_env import GymVecEnv, HostVecEnv
from rsl_rl_tpu.env.mjx_env import MJXEnv
from rsl_rl_tpu.env.mujoco_host import MuJoCoHostEnv, MuJoCoNLinkEnv
from rsl_rl_tpu.env.nlink import (
    DomainRandomizedNLink,
    NLinkPendulum,
    PartiallyObservableNLink,
)
from rsl_rl_tpu.env.pendulum import (
    PartiallyObservablePendulum,
    Pendulum,
    PrivilegedPendulum,
)
from rsl_rl_tpu.env.reacher import Reacher
from rsl_rl_tpu.env.sparse import SparseGoalReach
from rsl_rl_tpu.env.toy import PointMass
from rsl_rl_tpu.env.vec_env import EnvState, VecEnv

__all__ = [
    "VecEnv",
    "EnvState",
    "Pendulum",
    "PartiallyObservablePendulum",
    "PrivilegedPendulum",
    "CartPoleSwingUp",
    "PointMass",
    "HostVecEnv",
    "GymVecEnv",
    "MJXEnv",
    "MuJoCoHostEnv",
    "MuJoCoNLinkEnv",
    "NLinkPendulum",
    "DomainRandomizedNLink",
    "PartiallyObservableNLink",
    "Hopper",
    "SparseGoalReach",
    "BraxVecEnv",
    "Reacher",
]
