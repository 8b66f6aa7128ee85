"""Rollout storage: immutable scan-output pytrees and minibatch indexing."""

from rsl_rl_tpu.storage.rollout import (
    Rollout,
    ff_minibatch_indices,
    recurrent_minibatch_starts,
    slice_envs,
    take_flat,
)

__all__ = [
    "Rollout",
    "ff_minibatch_indices",
    "recurrent_minibatch_starts",
    "slice_envs",
    "take_flat",
]
