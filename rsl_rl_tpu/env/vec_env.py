"""JAX-native vectorized environment contract.

TPU-native counterpart of the reference ``VecEnv`` ABC
(reference: rsl_rl/env/vec_env.py:13-98). The reference contract is stateful
(``env.step`` mutates internal buffers); here the environment is a pure state
machine so the whole rollout can live inside one jitted ``lax.scan``:

- ``reset(key) -> (state, obs)``
- ``step(state, actions) -> (state, obs, rewards, dones, extras)``

Observations are a dict of named groups (the TensorDict analog); ``extras``
follows the reference protocol: ``extras["time_outs"]`` distinguishes
time-limit truncations (used for value bootstrapping,
reference ppo.py:160-164) and ``extras["log"]`` carries per-env scalar metrics
that the runner means per iteration (reference vec_env.py:85-97).

Environments auto-reset: when ``dones[i]`` is set, the returned obs for env
``i`` is the first observation of a fresh episode (matching the synchronized
semantics of Isaac-style simulators the reference targets).

For environments that cannot be expressed in JAX, wrap them in a host-side
adapter and use the runner's unjitted collection path (see
``rsl_rl_tpu/env/host_env.py``).
"""

from __future__ import annotations

import abc
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EnvState:
    """Base environment state pytree.

    Concrete envs extend this with their physics state. All leaves carry a
    leading ``num_envs`` axis so the state shards cleanly along the data-mesh
    axis.

    Attributes:
        rng: Per-env PRNG key, shape ``[num_envs, 2]`` (uint32 key data).
        episode_length: Current episode step counts, ``[num_envs]`` int32
            (the ``episode_length_buf`` analog, reference vec_env.py:35-36).
    """

    rng: jax.Array
    episode_length: jax.Array


def as_episode_length(value) -> int | jax.Array:
    """Normalize a ``max_episode_length`` config value.

    The reference contract allows a scalar *or a per-env tensor*
    (reference vec_env.py:30-36); plain ints stay ints (static shapes), any
    sequence/array becomes an ``[num_envs]`` int32 array that broadcasts
    against ``episode_length`` in the timeout comparison.
    """
    if isinstance(value, int):
        return value
    return jnp.asarray(value, jnp.int32)


class VecEnv(abc.ABC):
    """Abstract JAX vectorized environment."""

    num_envs: int
    num_actions: int
    #: scalar, or a per-env ``[num_envs]`` int32 array
    #: (reference vec_env.py:30-36 allows both)
    max_episode_length: int | jax.Array
    cfg: Any = None

    @abc.abstractmethod
    def reset(self, key: jax.Array) -> tuple[EnvState, dict[str, jax.Array]]:
        """Initialize all envs. Returns ``(state, obs_dict)``."""

    @abc.abstractmethod
    def step(
        self, state: EnvState, actions: jax.Array
    ) -> tuple[EnvState, dict[str, jax.Array], jax.Array, jax.Array, dict]:
        """Step all envs synchronously.

        Args:
            state: Current env state.
            actions: ``[num_envs, num_actions]``.

        Returns:
            ``(state, obs_dict, rewards [N], dones [N] bool, extras)`` where
            ``extras`` may contain ``"time_outs"`` (``[N]`` bool) and
            ``"log"`` (dict of ``[N]`` arrays or scalars).
        """

    def randomize_episode_length(self, state: EnvState, key: jax.Array) -> EnvState:
        """Scatter initial episode lengths for exploration
        (``init_at_random_ep_len``, reference on_policy_runner.py:66-69).

        Supports per-env limits: each env draws uniformly in
        ``[0, max_episode_length_i)``.
        """
        maxlen = jnp.broadcast_to(
            jnp.asarray(self.max_episode_length, jnp.int32), (self.num_envs,)
        )
        # randint keeps exact integer bounds for per-env limits (a float32
        # uniform*maxlen detour can round up to maxlen for limits >~2^24)
        lengths = jax.random.randint(key, (self.num_envs,), 0, maxlen)
        return state.replace(episode_length=lengths)
