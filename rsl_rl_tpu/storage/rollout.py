"""Rollout storage as an immutable scan-output pytree.

The reference ``RolloutStorage`` pre-allocates mutable ``[T, N, ...]`` device
buffers and copies one transition per step
(reference: rsl_rl/storage/rollout_storage.py:14-122). In the TPU-native
design the rollout *is* the stacked output of the collection ``lax.scan`` —
same memory layout, no copies, no overflow guard needed.

Minibatch generation mirrors the reference's three generators:

- feedforward: one epoch-shared permutation applied as a single packed-row
  gather, then contiguous slices per minibatch (reference
  rollout_storage.py:160-203; implemented in rsl_rl_tpu/algorithms/ppo.py),
- recurrent: contiguous env slices per minibatch, trajectory replay handled by
  the policy's sequence scan (reference rollout_storage.py:206-260),
- distillation: sequential time-major replay (reference
  rollout_storage.py:152-157) — handled directly in the distillation update.

Unlike the reference, recurrent rollouts only store the *window-start* policy
carry (``carry0``): the reference's per-step hidden snapshots are only ever
read at trajectory starts, and trajectories starting mid-window begin from a
zero (reset) state that the replay scan reproduces via done-masked resets.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Rollout:
    """One collection window of transitions, time-major ``[T, N, ...]``.

    ``rewards`` already includes intrinsic RND reward and the timeout value
    bootstrap (reference ppo.py:142-164). ``privileged_actions`` is only
    populated for distillation (reference rollout_storage.py:57-59).
    """

    obs: dict[str, jax.Array]
    actions: jax.Array
    rewards: jax.Array
    dones: jax.Array
    values: jax.Array | None = None
    log_probs: jax.Array | None = None
    mu: jax.Array | None = None
    sigma: jax.Array | None = None
    privileged_actions: jax.Array | None = None
    carry0: Any = None  # policy carry entering step 0 (recurrent only)

    @property
    def num_steps(self) -> int:
        return self.dones.shape[0]

    @property
    def num_envs(self) -> int:
        return self.dones.shape[1]

    def replay_resets(self) -> jax.Array:
        """``resets[t] = dones[t-1]`` (resets[0]=False) for BPTT replay."""
        return jnp.concatenate(
            [jnp.zeros_like(self.dones[:1]), self.dones[:-1]], axis=0
        )


def recurrent_minibatch_starts(
    num_envs: int, num_mini_batches: int, num_epochs: int
) -> jax.Array:
    """Contiguous env-slice start offsets, ``[num_epochs * num_mini_batches]``
    (reference rollout_storage.py:213-218)."""
    mb = num_envs // num_mini_batches
    starts = jnp.arange(num_mini_batches, dtype=jnp.int32) * mb
    return jnp.tile(starts, (num_epochs,))


def slice_envs(tree: Any, start: jax.Array, size: int, axis: int = 1) -> Any:
    """Dynamic env-axis slice of a time-major tree (recurrent minibatches)."""
    return jax.tree.map(
        lambda x: jax.lax.dynamic_slice_in_dim(x, start, size, axis=axis), tree
    )
