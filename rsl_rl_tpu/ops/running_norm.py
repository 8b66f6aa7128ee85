"""Running-moment normalization as explicit pytree state.

Functional counterpart of the reference's ``EmpiricalNormalization`` and
``EmpiricalDiscountedVariationNormalization`` modules
(reference: rsl_rl/networks/normalization.py:14-130). Instead of mutable
registered buffers, the statistics live in a ``RunningNormState`` pytree that
is threaded through the jitted train step, so updates compose with ``lax.scan``
and shard transparently under a device mesh (a global batch mean under data
parallelism performs the cross-device sync the reference never does —
documented deviation, strictly an improvement).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningNormState:
    """State of an empirical mean/variance normalizer.

    Attributes:
        mean: Running mean, shape ``shape``.
        var: Running (biased) variance, shape ``shape``.
        count: Total number of samples folded in (float32; exact up to 2^24).
        until: Freeze threshold — updates stop once ``count >= until``
            (so ``0`` freezes immediately, as in the reference); ``None``
            means never freeze (reference ``until=None``).
    """

    mean: jax.Array
    var: jax.Array
    count: jax.Array
    until: float | None = struct.field(pytree_node=False, default=None)
    eps: float = struct.field(pytree_node=False, default=1e-2)

    @property
    def std(self) -> jax.Array:
        return jnp.sqrt(self.var)


def init_running_norm(
    shape: int | Sequence[int], eps: float = 1e-2, until: float | None = None
) -> RunningNormState:
    """Create a fresh normalizer state (mean 0, var 1, count 0).

    Mirrors ``EmpiricalNormalization.__init__``
    (reference: rsl_rl/networks/normalization.py:17-34).
    """
    if isinstance(shape, int):
        shape = (shape,)
    shape = tuple(shape)
    return RunningNormState(
        mean=jnp.zeros(shape, jnp.float32),
        var=jnp.ones(shape, jnp.float32),
        count=jnp.zeros((), jnp.float32),
        until=None if until is None else float(until),
        eps=eps,
    )


def normalize(state: RunningNormState, x: jax.Array) -> jax.Array:
    """``(x - mean) / (std + eps)`` (reference: normalization.py:44-47)."""
    return (x - state.mean) / (state.std + state.eps)


def denormalize(state: RunningNormState, y: jax.Array) -> jax.Array:
    """Inverse transform (reference: normalization.py:68-72)."""
    return y * (state.std + state.eps) + state.mean


def update_running_norm(state: RunningNormState, x: jax.Array) -> RunningNormState:
    """Fold a batch of samples into the running moments.

    Batch-mean based update identical to ``EmpiricalNormalization.update``
    (reference: rsl_rl/networks/normalization.py:49-66): with batch size ``B``
    and new total ``n``, ``rate = B / n`` and

    ``mean' = mean + rate * (mean_x - mean)``
    ``var'  = var + rate * (var_x - var + delta_mean * (mean_x - mean'))``

    The freeze check uses the count *before* the update, as in the reference
    (``if self.count >= self.until: return`` precedes the increment).
    ``x`` may have arbitrary leading batch dims; they are all reduced.
    """
    feat_ndim = state.mean.ndim
    batch_axes = tuple(range(x.ndim - feat_ndim))
    count_x = jnp.asarray(1, jnp.float32)
    for ax in batch_axes:
        count_x = count_x * x.shape[ax]

    # static None -> never frozen; otherwise the reference's pre-update
    # count check (count >= until, so until=0 freezes from the start)
    frozen = False if state.until is None else state.count >= state.until

    new_count = state.count + count_x
    rate = count_x / new_count
    mean_x = jnp.mean(x, axis=batch_axes)
    var_x = jnp.var(x, axis=batch_axes)  # biased, like torch.var(unbiased=False)
    delta_mean = mean_x - state.mean
    new_mean = state.mean + rate * delta_mean
    new_var = state.var + rate * (var_x - state.var + delta_mean * (mean_x - new_mean))

    return state.replace(
        mean=jnp.where(frozen, state.mean, new_mean),
        var=jnp.where(frozen, state.var, new_var),
        count=jnp.where(frozen, state.count, new_count),
    )


@struct.dataclass
class DiscountedVariationNormState:
    """State for reward normalization by the std of the discounted return.

    Functional version of ``EmpiricalDiscountedVariationNormalization``
    (reference: rsl_rl/networks/normalization.py:75-130): a per-env discounted
    reward accumulator ``avg = gamma * avg + r`` feeds a scalar running
    normalizer whose std divides the reward.
    """

    emp: RunningNormState
    avg: jax.Array  # [num_envs] discounted reward accumulator
    gamma: float = struct.field(pytree_node=False, default=0.99)


def init_discounted_variation_norm(
    num_envs: int, gamma: float = 0.99, eps: float = 1e-2, until: float | None = None
) -> DiscountedVariationNormState:
    return DiscountedVariationNormState(
        emp=init_running_norm((), eps=eps, until=until),
        avg=jnp.zeros((num_envs,), jnp.float32),
        gamma=gamma,
    )


def normalize_reward(
    state: DiscountedVariationNormState, rew: jax.Array, update: bool = True
) -> tuple[DiscountedVariationNormState, jax.Array]:
    """Update the discounted average + moments, then scale the reward.

    Matches the reference forward pass (normalization.py:92-101): in training
    mode the accumulator and moments update first, then the reward is divided
    by the current std when it is positive (no mean subtraction, no eps).
    The reference initializes ``avg`` lazily to the first reward; starting from
    zero is equivalent since ``gamma * 0 + r == r``.
    """
    if update:
        avg = state.avg * state.gamma + rew
        emp = update_running_norm(state.emp, avg)
        state = state.replace(emp=emp, avg=avg)
    std = state.emp.std
    scaled = rew / jnp.where(std > 0, std, 1.0)
    return state, jnp.where(std > 0, scaled, rew)
