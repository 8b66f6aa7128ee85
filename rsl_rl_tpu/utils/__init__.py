"""Utility layer: resolvers, registry, writers, checkpointing, git snapshot."""

from rsl_rl_tpu.utils.config import load_train_cfg
from rsl_rl_tpu.utils.registry import register, registered, resolve
from rsl_rl_tpu.utils.resolvers import (
    resolve_nn_activation,
    resolve_obs_groups,
    resolve_optimizer,
    string_to_callable,
)
from rsl_rl_tpu.utils.trajectories import (
    split_and_pad_trajectories,
    unpad_trajectories,
)

__all__ = [
    "load_train_cfg",
    "register",
    "registered",
    "resolve",
    "resolve_nn_activation",
    "resolve_obs_groups",
    "resolve_optimizer",
    "string_to_callable",
    "split_and_pad_trajectories",
    "unpad_trajectories",
]
