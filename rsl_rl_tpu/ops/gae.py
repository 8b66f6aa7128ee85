"""Generalized Advantage Estimation as a reverse `lax.scan`.

The reference computes returns with a reverse Python loop over the rollout
window mutating buffers in place (reference:
rsl_rl/storage/rollout_storage.py:127-149). On TPU that loop is literally a
scan with the advantage as carry, compiled into a single fused XLA while-loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(
    rewards: jax.Array,
    values: jax.Array,
    dones: jax.Array,
    last_values: jax.Array,
    gamma: float,
    lam: float,
    normalize_advantage: bool = True,
    eps: float = 1e-8,
) -> tuple[jax.Array, jax.Array]:
    """Compute per-step returns and advantages over a rollout window.

    Semantics are identical to ``RolloutStorage.compute_returns``
    (reference: rsl_rl/storage/rollout_storage.py:127-149):

    - ``delta_t = r_t + (1 - done_t) * gamma * V_{t+1} - V_t``
    - ``A_t = delta_t + (1 - done_t) * gamma * lam * A_{t+1}``
    - ``R_t = A_t + V_t``
    - optional whitening of advantages over the whole window with the
      *unbiased* std (torch ``Tensor.std()`` default), ``eps=1e-8``.

    ``dones`` includes timeouts; their value bootstrap is folded into the
    rewards beforehand (reference: rsl_rl/algorithms/ppo.py:160-164).

    Args:
        rewards: ``[T, N]`` rewards (including intrinsic + timeout bootstrap).
        values: ``[T, N]`` value estimates at each step.
        dones: ``[T, N]`` done flags (bool or float).
        last_values: ``[N]`` value estimate of the post-rollout observation.
        gamma: Discount factor.
        lam: GAE lambda.
        normalize_advantage: Whiten advantages over the full window.

    Returns:
        ``(returns, advantages)``, both ``[T, N]``. When
        ``normalize_advantage`` is set, ``advantages`` is whitened while
        ``returns`` stays raw — exactly like the reference, where
        ``returns`` is stored before normalization.
    """
    dones = dones.astype(values.dtype)
    next_values = jnp.concatenate([values[1:], last_values[None]], axis=0)

    # A_t = delta_t + c_t * A_{t+1} is a first-order linear recurrence; solve
    # it with a parallel prefix (log2(T) stages on [T, N] blocks) instead of T
    # sequential scan steps — the classic TPU-friendly formulation.
    not_terminal = 1.0 - dones
    delta = rewards + not_terminal * gamma * next_values - values
    coeff = not_terminal * (gamma * lam)

    def combine(later, earlier):
        # compose affine suffix operators x -> c*x + d with the earlier step
        # outermost: (c_e, d_e) o (c_l, d_l) = (c_e*c_l, d_e + c_e*d_l).
        # Under reverse=True, associative_scan feeds the later-index
        # accumulation as the FIRST positional argument (verified numerically
        # in tests/test_ops.py against the reference loop).
        c_l, d_l = later
        c_e, d_e = earlier
        return c_e * c_l, d_e + c_e * d_l

    _, advantages = jax.lax.associative_scan(
        combine, (coeff, delta), reverse=True, axis=0
    )
    returns = advantages + values
    if normalize_advantage:
        advantages = whiten(advantages, eps=eps)
    return returns, advantages


def whiten(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """``(x - mean) / (std + eps)`` with unbiased std, over all elements.

    Matches the reference's advantage normalization
    (rollout_storage.py:144-149), which uses ``torch.Tensor.std()``
    (Bessel-corrected).
    """
    mean = jnp.mean(x)
    std = jnp.std(x, ddof=1)
    return (x - mean) / (std + eps)
