"""Two-joint planar reacher: drive the arm tip to a random target.

A robotics-flavored multi-action env (the in-tree stand-in for arm tasks the
reference is used for downstream): two torque-controlled revolute joints,
dense negative-distance reward with action penalty, target resampled each
episode. Exercises multi-dimensional actions and multi-group observations
(``"policy"`` sees joints + target; ``"privileged"`` additionally sees joint
velocities exactly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from rsl_rl_tpu.env.vec_env import VecEnv, as_episode_length
from rsl_rl_tpu.utils.registry import register


@struct.dataclass
class ReacherState:
    rng: jax.Array
    episode_length: jax.Array
    q: jax.Array  # [N, 2] joint angles
    qd: jax.Array  # [N, 2] joint velocities
    target: jax.Array  # [N, 2] target xy


@register("env")
class Reacher(VecEnv):
    """Planar 2-link reacher with torque control."""

    num_actions = 2
    dt = 0.05
    damping = 0.9
    link = (0.5, 0.5)
    max_torque = 1.0

    def __init__(self, num_envs: int, max_episode_length: int = 150, cfg: dict | None = None):
        self.num_envs = num_envs
        self.max_episode_length = as_episode_length(max_episode_length)
        self.step_dt = self.dt
        self.cfg = cfg or {}

    def _tip(self, q: jax.Array) -> jax.Array:
        l1, l2 = self.link
        x = l1 * jnp.cos(q[:, 0]) + l2 * jnp.cos(q[:, 0] + q[:, 1])
        y = l1 * jnp.sin(q[:, 0]) + l2 * jnp.sin(q[:, 0] + q[:, 1])
        return jnp.stack([x, y], axis=-1)

    def _obs(self, state: ReacherState) -> dict[str, jax.Array]:
        tip = self._tip(state.q)
        policy = jnp.concatenate(
            [jnp.cos(state.q), jnp.sin(state.q), state.qd * 0.1, state.target - tip],
            axis=-1,
        )
        privileged = jnp.concatenate([policy, state.qd], axis=-1)
        return {"policy": policy, "privileged": privileged}

    def _sample(self, key: jax.Array, n: int):
        kq, kt = jax.random.split(key)
        q = jax.random.uniform(kq, (n, 2), minval=-jnp.pi, maxval=jnp.pi)
        radius = jax.random.uniform(kt, (n, 1), minval=0.3, maxval=0.9)
        angle = jax.random.uniform(jax.random.fold_in(kt, 1), (n, 1), minval=-jnp.pi, maxval=jnp.pi)
        target = jnp.concatenate([radius * jnp.cos(angle), radius * jnp.sin(angle)], axis=-1)
        return q, target

    def reset(self, key: jax.Array):
        keys = jax.random.split(key, self.num_envs + 1)
        q, target = self._sample(keys[0], self.num_envs)
        state = ReacherState(
            rng=keys[1:],
            episode_length=jnp.zeros((self.num_envs,), jnp.int32),
            q=q,
            qd=jnp.zeros((self.num_envs, 2)),
            target=target,
        )
        return state, self._obs(state)

    def step(self, state: ReacherState, actions: jax.Array):
        tau = jnp.clip(actions, -self.max_torque, self.max_torque)
        qd = state.qd * self.damping + tau * self.dt * 10.0
        q = state.q + qd * self.dt

        tip = self._tip(q)
        dist = jnp.linalg.norm(tip - state.target, axis=-1)
        reward = -dist - 0.01 * jnp.sum(jnp.square(tau), axis=-1)

        episode_length = state.episode_length + 1
        time_out = episode_length >= self.max_episode_length
        done = time_out  # fixed-horizon task

        keys = jax.vmap(jax.random.split, in_axes=0, out_axes=1)(state.rng)
        new_rng, reset_keys = keys[0], keys[1]
        reset_q, reset_target = jax.vmap(
            lambda k: tuple(x[0] for x in self._sample(k, 1))
        )(reset_keys)

        state = ReacherState(
            rng=new_rng,
            episode_length=jnp.where(done, 0, episode_length),
            q=jnp.where(done[:, None], reset_q, q),
            qd=jnp.where(done[:, None], 0.0, qd),
            target=jnp.where(done[:, None], reset_target, state.target),
        )
        extras = {
            "time_outs": time_out,
            "log": {"reacher/tip_distance": dist},
        }
        return state, self._obs(state), reward, done, extras
