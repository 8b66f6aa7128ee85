"""Pure-JAX cart-pole swing-up environment (continuous action).

A harder benchmark than Pendulum: the pole starts hanging down, the agent
applies a horizontal force to the cart, and reward favors an upright pole with
the cart centered. Episodes terminate early when the cart leaves the track
(a true terminal state), otherwise truncate at the time limit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from rsl_rl_tpu.env.vec_env import VecEnv, as_episode_length
from rsl_rl_tpu.utils.registry import register


@struct.dataclass
class CartPoleState:
    rng: jax.Array
    episode_length: jax.Array
    x: jax.Array
    x_dot: jax.Array
    theta: jax.Array  # 0 = upright
    theta_dot: jax.Array


@register("env")
class CartPoleSwingUp(VecEnv):
    num_actions = 1

    gravity = 9.8
    cart_mass = 1.0
    pole_mass = 0.1
    pole_half_length = 0.5
    force_mag = 10.0
    dt = 0.02
    x_limit = 2.4

    def __init__(self, num_envs: int, max_episode_length: int = 500, cfg: dict | None = None):
        self.num_envs = num_envs
        self.max_episode_length = as_episode_length(max_episode_length)
        self.step_dt = self.dt
        self.cfg = cfg or {}

    def _obs(self, s: CartPoleState) -> dict[str, jax.Array]:
        obs = jnp.stack(
            [s.x, s.x_dot, jnp.cos(s.theta), jnp.sin(s.theta), s.theta_dot], axis=-1
        )
        return {"policy": obs}

    def _sample_init(self, key: jax.Array, n: int):
        k1, k2 = jax.random.split(key)
        x = jax.random.uniform(k1, (n,), minval=-0.5, maxval=0.5)
        theta = jnp.pi + jax.random.uniform(k2, (n,), minval=-0.1, maxval=0.1)
        return x, theta

    def reset(self, key: jax.Array):
        keys = jax.random.split(key, self.num_envs + 1)
        x, theta = self._sample_init(keys[0], self.num_envs)
        zeros = jnp.zeros((self.num_envs,))
        state = CartPoleState(
            rng=keys[1:],
            episode_length=jnp.zeros((self.num_envs,), jnp.int32),
            x=x, x_dot=zeros, theta=theta, theta_dot=zeros,
        )
        return state, self._obs(state)

    def step(self, state: CartPoleState, actions: jax.Array):
        force = jnp.clip(actions[:, 0], -1.0, 1.0) * self.force_mag
        total_mass = self.cart_mass + self.pole_mass
        ml = self.pole_mass * self.pole_half_length

        cos_t = jnp.cos(state.theta)
        sin_t = jnp.sin(state.theta)
        temp = (force + ml * state.theta_dot**2 * sin_t) / total_mass
        theta_acc = (self.gravity * sin_t - cos_t * temp) / (
            self.pole_half_length * (4.0 / 3.0 - self.pole_mass * cos_t**2 / total_mass)
        )
        x_acc = temp - ml * theta_acc * cos_t / total_mass

        x = state.x + self.dt * state.x_dot
        x_dot = state.x_dot + self.dt * x_acc
        theta = state.theta + self.dt * state.theta_dot
        theta_dot = state.theta_dot + self.dt * theta_acc

        upright = jnp.cos(theta)
        reward = upright - 0.1 * jnp.abs(x) - 0.01 * jnp.square(force / self.force_mag)

        episode_length = state.episode_length + 1
        time_out = episode_length >= self.max_episode_length
        terminal = jnp.abs(x) > self.x_limit
        done = time_out | terminal
        reward = jnp.where(terminal, reward - 10.0, reward)

        keys = jax.vmap(jax.random.split, in_axes=0, out_axes=1)(state.rng)
        new_rng, reset_keys = keys[0], keys[1]
        reset_x, reset_theta = jax.vmap(
            lambda k: tuple(v[0] for v in self._sample_init(k, 1))
        )(reset_keys)

        state = CartPoleState(
            rng=new_rng,
            episode_length=jnp.where(done, 0, episode_length),
            x=jnp.where(done, reset_x, x),
            x_dot=jnp.where(done, 0.0, x_dot),
            theta=jnp.where(done, reset_theta, theta),
            theta_dot=jnp.where(done, 0.0, theta_dot),
        )
        extras = {
            "time_outs": time_out & ~terminal,
            "log": {"cartpole/upright": upright, "cartpole/abs_x": jnp.abs(x)},
        }
        return state, self._obs(state), reward, done, extras
