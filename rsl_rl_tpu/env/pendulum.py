"""Pure-JAX vectorized Pendulum swing-up environment.

Dynamics and reward match Gymnasium's ``Pendulum-v1`` so learning curves are
comparable against the reference library driving the same task through torch
(BASELINE.md benchmark config #1). Episodes terminate only by time limit, so
every done is also a timeout (``extras["time_outs"] == dones``), exercising
the reference's bootstrap-on-timeout path (reference ppo.py:160-164).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from rsl_rl_tpu.env.vec_env import VecEnv, as_episode_length
from rsl_rl_tpu.utils.registry import register


@struct.dataclass
class PendulumState:
    rng: jax.Array
    episode_length: jax.Array  # [N] int32
    theta: jax.Array  # [N] angle
    theta_dot: jax.Array  # [N] angular velocity


@register("env")
class Pendulum(VecEnv):
    """Classic pendulum swing-up, vectorized over ``num_envs``."""

    num_actions = 1

    # Gymnasium Pendulum-v1 constants
    max_speed = 8.0
    max_torque = 2.0
    dt = 0.05
    g = 10.0
    m = 1.0
    length = 1.0

    def __init__(self, num_envs: int, max_episode_length: int = 200, cfg: dict | None = None):
        self.num_envs = num_envs
        self.max_episode_length = as_episode_length(max_episode_length)
        self.step_dt = self.dt
        self.cfg = cfg or {}

    def _obs(self, state: PendulumState) -> dict[str, jax.Array]:
        obs = jnp.stack(
            [jnp.cos(state.theta), jnp.sin(state.theta), state.theta_dot], axis=-1
        )
        return {"policy": obs}

    def _sample_init(self, key: jax.Array, n: int) -> tuple[jax.Array, jax.Array]:
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (n,), minval=-jnp.pi, maxval=jnp.pi)
        theta_dot = jax.random.uniform(k2, (n,), minval=-1.0, maxval=1.0)
        return theta, theta_dot

    def reset(self, key: jax.Array):
        keys = jax.random.split(key, self.num_envs + 1)
        theta, theta_dot = self._sample_init(keys[0], self.num_envs)
        state = PendulumState(
            rng=keys[1:],
            episode_length=jnp.zeros((self.num_envs,), jnp.int32),
            theta=theta,
            theta_dot=theta_dot,
        )
        return state, self._obs(state)

    def step(self, state: PendulumState, actions: jax.Array):
        u = jnp.clip(actions[:, 0], -self.max_torque, self.max_torque)
        theta, theta_dot = state.theta, state.theta_dot

        angle_norm = ((theta + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        costs = angle_norm**2 + 0.1 * theta_dot**2 + 0.001 * u**2

        new_theta_dot = theta_dot + (
            3.0 * self.g / (2.0 * self.length) * jnp.sin(theta)
            + 3.0 / (self.m * self.length**2) * u
        ) * self.dt
        new_theta_dot = jnp.clip(new_theta_dot, -self.max_speed, self.max_speed)
        new_theta = theta + new_theta_dot * self.dt

        episode_length = state.episode_length + 1
        time_out = episode_length >= self.max_episode_length
        done = time_out  # no terminal states, only truncation

        # auto-reset done envs with per-env keys
        keys = jax.vmap(jax.random.split, in_axes=0, out_axes=1)(state.rng)
        new_rng, reset_keys = keys[0], keys[1]
        reset_theta, reset_theta_dot = jax.vmap(
            lambda k: tuple(x[0] for x in self._sample_init(k, 1))
        )(reset_keys)

        state = PendulumState(
            rng=new_rng,
            episode_length=jnp.where(done, 0, episode_length),
            theta=jnp.where(done, reset_theta, new_theta),
            theta_dot=jnp.where(done, reset_theta_dot, new_theta_dot),
        )
        extras = {"time_outs": time_out, "log": {"pendulum/abs_angle": jnp.abs(angle_norm)}}
        return state, self._obs(state), -costs, done, extras


@register("env")
class PartiallyObservablePendulum(Pendulum):
    """Pendulum without velocity observation: ``[cos(theta), sin(theta)]``.

    The optimal policy needs to infer angular velocity from history, so this
    env separates recurrent from feedforward policies — the benchmark analog
    of BASELINE.md config #2 given that MJX is unavailable in this image.
    """

    def _obs(self, state: PendulumState) -> dict[str, jax.Array]:
        obs = jnp.stack([jnp.cos(state.theta), jnp.sin(state.theta)], axis=-1)
        return {"policy": obs}


@register("env")
class PrivilegedPendulum(Pendulum):
    """Teacher-student pendulum: two observation groups.

    ``"policy"`` is partially observable (``[cos, sin]`` — what the deployed
    student senses); ``"privileged"`` adds the angular velocity
    (``[cos, sin, theta_dot]`` — what a simulation-only teacher sees). The
    canonical privileged-distillation setup the reference's StudentTeacher
    classes target (reference modules/student_teacher.py:15, obs-set
    separation via obs_groups).
    """

    def _obs(self, state: PendulumState) -> dict[str, jax.Array]:
        cos, sin = jnp.cos(state.theta), jnp.sin(state.theta)
        return {
            "policy": jnp.stack([cos, sin], axis=-1),
            "privileged": jnp.stack([cos, sin, state.theta_dot], axis=-1),
        }
