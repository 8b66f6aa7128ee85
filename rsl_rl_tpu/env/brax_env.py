"""Brax adapter: run Brax physics environments under the VecEnv contract.

Brax envs are already pure JAX state machines, so this wrapper is thin: it
vmaps a single-env Brax environment over ``num_envs``, adds time-limit
truncation with ``extras["time_outs"]`` and per-env auto-reset, and exposes
the obs as the ``"policy"`` group (downstream counterpart of the reference's
Isaac-style simulators; reference README.md:6-10).

Requires the ``brax`` package (import-gated; the rest of the framework does
not depend on it).

Usage::

    import brax.envs

    env = BraxVecEnv(brax.envs.get_environment("ant"), num_envs=4096,
                     episode_length=1000)
    runner = OnPolicyRunner(env, train_cfg, log_dir)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from rsl_rl_tpu.env.vec_env import VecEnv
from rsl_rl_tpu.utils.registry import register

try:  # pragma: no cover - exercised only when brax is installed
    import brax.envs  # noqa: F401

    _HAS_BRAX = True
except ImportError:  # pragma: no cover
    _HAS_BRAX = False


@struct.dataclass
class BraxState:
    rng: jax.Array  # [N] per-env PRNG keys
    episode_length: jax.Array  # [N] int32
    brax: Any  # vmapped brax State (leading axis N)


@register("env")
class BraxVecEnv(VecEnv):
    """Vectorized Brax environment with auto-reset and timeout extras."""

    def __init__(
        self,
        brax_env,
        num_envs: int,
        episode_length: int,
        cfg: dict | None = None,
    ):
        if not _HAS_BRAX:
            raise ImportError("BraxVecEnv requires the 'brax' package (pip install brax).")
        self.brax_env = brax_env
        self.num_envs = num_envs
        self.max_episode_length = episode_length
        self.num_actions = brax_env.action_size
        self.cfg = cfg or {}
        self.step_dt = float(getattr(brax_env, "dt", 0.0)) or None

    def _obs(self, state: BraxState) -> dict[str, jax.Array]:
        return {"policy": state.brax.obs}

    def reset(self, key: jax.Array):
        keys = jax.random.split(key, self.num_envs + 1)
        brax_state = jax.vmap(self.brax_env.reset)(jax.random.split(keys[0], self.num_envs))
        state = BraxState(
            rng=keys[1:],
            episode_length=jnp.zeros((self.num_envs,), jnp.int32),
            brax=brax_state,
        )
        return state, self._obs(state)

    def step(self, state: BraxState, actions: jax.Array):
        brax_state = jax.vmap(self.brax_env.step)(state.brax, actions)
        rew = brax_state.reward.astype(jnp.float32)
        terminal = brax_state.done.astype(bool)

        episode_length = state.episode_length + 1
        time_out = episode_length >= self.max_episode_length
        done = terminal | time_out

        # auto-reset done envs with fresh per-env keys
        keys = jax.vmap(jax.random.split, in_axes=0, out_axes=1)(state.rng)
        new_rng, reset_keys = keys[0], keys[1]
        fresh = jax.vmap(self.brax_env.reset)(reset_keys)
        brax_state = jax.tree.map(
            lambda f, s: jnp.where(done.reshape((-1,) + (1,) * (s.ndim - 1)), f, s)
            if hasattr(s, "ndim") and s.ndim >= 1
            else s,
            fresh,
            brax_state,
        )

        state = BraxState(
            rng=new_rng,
            episode_length=jnp.where(done, 0, episode_length),
            brax=brax_state,
        )
        extras = {
            "time_outs": time_out & ~terminal,
            "log": dict(brax_state.metrics) if brax_state.metrics else {},
        }
        return state, self._obs(state), rew, done, extras
