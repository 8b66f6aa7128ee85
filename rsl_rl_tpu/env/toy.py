"""Tiny analytically-solvable test environments.

Used by the integration tests (SURVEY.md §4.2): simple enough that PPO must
visibly improve within a few hundred iterations on CPU, with multi-group
observations and genuine terminal states (not just timeouts) to exercise the
full ``VecEnv`` contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from rsl_rl_tpu.env.vec_env import VecEnv, as_episode_length
from rsl_rl_tpu.utils.registry import register


@struct.dataclass
class PointMassState:
    rng: jax.Array
    episode_length: jax.Array
    x: jax.Array  # [N] position
    v: jax.Array  # [N] velocity


@register("env")
class PointMass(VecEnv):
    """1-D point mass: drive position and velocity to zero.

    Observations come in two groups — ``"policy"`` sees ``[x, v]`` and
    ``"privileged"`` additionally sees the last action — so tests can exercise
    distinct actor/critic/teacher obs sets. Episodes terminate early when the
    mass leaves ``|x| > bound`` (a true terminal state) or by time limit
    (a timeout, bootstrapped).
    """

    num_actions = 1
    dt = 0.1
    bound = 5.0

    def __init__(self, num_envs: int, max_episode_length: int = 100, cfg: dict | None = None):
        self.num_envs = num_envs
        self.max_episode_length = as_episode_length(max_episode_length)
        self.step_dt = self.dt
        self.cfg = cfg or {}

    def _obs(self, state: PointMassState, last_action: jax.Array | None = None):
        if last_action is None:
            last_action = jnp.zeros((self.num_envs,))
        policy = jnp.stack([state.x, state.v], axis=-1)
        privileged = jnp.stack([state.x, state.v, last_action], axis=-1)
        return {"policy": policy, "privileged": privileged}

    def reset(self, key: jax.Array):
        keys = jax.random.split(key, self.num_envs + 1)
        x = jax.random.uniform(keys[0], (self.num_envs,), minval=-2.0, maxval=2.0)
        state = PointMassState(
            rng=keys[1:],
            episode_length=jnp.zeros((self.num_envs,), jnp.int32),
            x=x,
            v=jnp.zeros((self.num_envs,)),
        )
        return state, self._obs(state)

    def step(self, state: PointMassState, actions: jax.Array):
        a = jnp.clip(actions[:, 0], -1.0, 1.0)
        v = state.v + a * self.dt
        x = state.x + v * self.dt
        reward = -(x**2 + 0.1 * v**2 + 0.01 * a**2)

        episode_length = state.episode_length + 1
        time_out = episode_length >= self.max_episode_length
        terminal = jnp.abs(x) > self.bound
        done = time_out | terminal

        keys = jax.vmap(jax.random.split, in_axes=0, out_axes=1)(state.rng)
        new_rng, reset_keys = keys[0], keys[1]
        reset_x = jax.vmap(
            lambda k: jax.random.uniform(k, (), minval=-2.0, maxval=2.0)
        )(reset_keys)

        state = PointMassState(
            rng=new_rng,
            episode_length=jnp.where(done, 0, episode_length),
            x=jnp.where(done, reset_x, x),
            v=jnp.where(done, 0.0, v),
        )
        extras = {
            "time_outs": time_out & ~terminal,
            "log": {"pointmass/abs_x": jnp.abs(x)},
        }
        return state, self._obs(state, jnp.where(done, 0.0, a)), reward, done, extras


def point_mass_symmetry(obs=None, actions=None, env=None):
    """Symmetry augmentation for :class:`PointMass`: the dynamics and reward
    are invariant under mirroring ``(x, v, a) -> (-x, -v, -a)``.

    Follows the reference augmentation-function contract
    (reference config/example_config.yaml:63-76): returns the original batch
    stacked with its mirrored copy along the leading axis, for whichever of
    ``obs``/``actions`` is provided. JAX-traceable, so it runs inside the
    jitted PPO update.
    """
    obs_aug = None
    if obs is not None:
        obs_aug = {k: jnp.concatenate([v, -v], axis=0) for k, v in obs.items()}
    actions_aug = None
    if actions is not None:
        actions_aug = jnp.concatenate([actions, -actions], axis=0)
    return obs_aug, actions_aug
