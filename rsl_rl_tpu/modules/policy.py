"""Shared policy-module protocol and state pytrees.

All four policy classes (``ActorCritic``, ``ActorCriticRecurrent``,
``StudentTeacher``, ``StudentTeacherRecurrent``) follow the same duck-typed
protocol, mirroring the reference's module contract (SURVEY.md §1 L2) but with
all mutable state hoisted into explicit pytrees:

- ``PolicyState`` holds trainable ``params`` and non-trainable ``norm``
  normalizer states (plus ``aux`` for frozen sub-networks like the teacher).
- Recurrent hidden state is a *carry* pytree (``{"actor": ..., "critic": ...}``)
  created by ``initial_carry`` and threaded through the rollout scan —
  never stored on the module.

Every method is a pure function of ``(state, inputs)``; the module object only
holds static configuration and flax module definitions.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PolicyState:
    """All learnable + statistical state of a policy module.

    Attributes:
        params: Trainable parameter pytree (what the optimizer updates).
        norm: Observation-normalizer states keyed by role (may hold ``None``
            entries when normalization is disabled).
        aux: Non-trainable parameters (e.g. the frozen teacher network and its
            normalizer for distillation policies). Saved in checkpoints,
            excluded from optimization.
    """

    params: Any
    norm: Any
    aux: Any = None


def concat_obs(obs: dict[str, jax.Array], groups: list[str]) -> jax.Array:
    """Concatenate the observation groups of one obs set along the last axis.

    Equivalent of ``get_actor_obs``/``get_critic_obs``
    (reference: rsl_rl/modules/actor_critic.py:158-168).
    """
    if len(groups) == 1:
        return obs[groups[0]]
    return jnp.concatenate([obs[g] for g in groups], axis=-1)


def obs_set_dim(obs: dict[str, jax.Array], groups: list[str]) -> int:
    """Total feature dimension of an obs set; validates 1D observations."""
    dim = 0
    for g in groups:
        if len(obs[g].shape) != 2:
            raise AssertionError("Policy modules only support 1D observations per env.")
        dim += obs[g].shape[-1]
    return dim


def dummy_obs_like(obs: dict[str, jax.Array]) -> dict[str, jax.Array]:
    """A batch-1 zero observation dict with the same group shapes."""
    return {k: jnp.zeros((1,) + tuple(v.shape[1:]), jnp.float32) for k, v in obs.items()}


def check_state_compatible(current: Any, loaded: Any, what: str = "policy state") -> None:
    """Validate that a loaded pytree matches the current one structurally.

    The equivalent of torch's strict ``load_state_dict`` checking
    (the reference raises on key/shape mismatch). Raises ``ValueError``
    naming the offending leaves instead of failing later inside XLA.
    """
    cur_paths = {
        jax.tree_util.keystr(p): jnp.shape(v)
        for p, v in jax.tree_util.tree_flatten_with_path(current)[0]
    }
    new_paths = {
        jax.tree_util.keystr(p): jnp.shape(v)
        for p, v in jax.tree_util.tree_flatten_with_path(loaded)[0]
    }
    missing = sorted(set(cur_paths) - set(new_paths))
    unexpected = sorted(set(new_paths) - set(cur_paths))
    mismatched = sorted(
        f"{k}: expected {cur_paths[k]}, got {new_paths[k]}"
        for k in set(cur_paths) & set(new_paths)
        if cur_paths[k] != new_paths[k]
    )
    if missing or unexpected or mismatched:
        raise ValueError(
            f"Loaded {what} is incompatible with the current model configuration.\n"
            + (f"  missing keys: {missing[:8]}\n" if missing else "")
            + (f"  unexpected keys: {unexpected[:8]}\n" if unexpected else "")
            + (f"  shape mismatches: {mismatched[:8]}\n" if mismatched else "")
        )
