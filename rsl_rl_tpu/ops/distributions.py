"""Diagonal-Gaussian policy distribution math.

Pure-function replacement for ``torch.distributions.Normal`` as used by the
reference policy modules (reference: rsl_rl/modules/actor_critic.py:105-171).
All functions operate on arrays of shape ``[..., A]`` (mean/std) and reduce the
action dimension, returning ``[...]`` shaped results, matching the reference's
``.sum(dim=-1)`` convention for log-prob and entropy.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def sample(key: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    """Draw a reparameterized sample ``mean + std * eps``."""
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def log_prob(mean: jax.Array, std: jax.Array, value: jax.Array) -> jax.Array:
    """Log-density of ``value``, summed over the trailing action dimension.

    Matches ``Normal(mean, std).log_prob(value).sum(dim=-1)``
    (reference: rsl_rl/modules/actor_critic.py:170-171).
    """
    z = (value - mean) / std
    per_dim = -0.5 * jnp.square(z) - jnp.log(std) - _LOG_SQRT_2PI
    return jnp.sum(per_dim, axis=-1)


def entropy(std: jax.Array) -> jax.Array:
    """Entropy summed over the trailing action dimension.

    Matches ``Normal(...).entropy().sum(dim=-1)``
    (reference: rsl_rl/modules/actor_critic.py:113-115).
    """
    per_dim = 0.5 + _LOG_SQRT_2PI + jnp.log(std)
    return jnp.sum(per_dim, axis=-1)


def kl_divergence(
    old_mean: jax.Array,
    old_std: jax.Array,
    new_mean: jax.Array,
    new_std: jax.Array,
    eps: float = 1.0e-5,
) -> jax.Array:
    """Analytic Gaussian KL(old || new), summed over the action dimension.

    Reproduces the exact expression used for the adaptive-KL learning-rate
    schedule (reference: rsl_rl/algorithms/ppo.py:262-269), including its
    ``+ 1e-5`` stabilizer inside the log:

    ``sum(log(sigma_new / sigma_old + eps)
         + (sigma_old^2 + (mu_old - mu_new)^2) / (2 sigma_new^2) - 0.5)``
    """
    per_dim = (
        jnp.log(new_std / old_std + eps)
        + (jnp.square(old_std) + jnp.square(old_mean - new_mean)) / (2.0 * jnp.square(new_std))
        - 0.5
    )
    return jnp.sum(per_dim, axis=-1)
