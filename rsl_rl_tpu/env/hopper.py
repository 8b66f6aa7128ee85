"""Vertical hopper with spring-damper ground contact (pure JAX).

The in-tree envs so far cover smooth dynamics (``NLinkPendulum`` — dense
manipulator-equation solves); this env adds the other defining feature of
the rigid-body simulators the reference targets (reference README.md:6-10 —
Isaac Lab, MuJoCo Playground): **contact**. A point-mass body rides a
massless springy leg; when the foot is on the ground the leg acts as a
stiff spring-damper (MJX's soft-contact penalty model), and the agent
injects energy by thrusting along the leg *during stance only*. Hopping
requires discovering the contact-phase timing — thrust in flight is wasted.

Dynamics (vertical axis only, per env):

    contact  = z < l0                        (foot touches ground)
    F_leg    = [k (l0 − z) − c ż + thrust]   if contact else 0  (clipped ≥ 0,
                                             a unilateral contact force)
    z̈       = F_leg/m − g

Stiff contact (k=2000) integrated with semi-implicit Euler over 10 substeps
— the stiffness/substep ratio is what makes contact workloads expensive,
reproduced here deliberately.

Reward: normalized instantaneous height above rest length (paid every step,
so time spent compressed in stance scores negative — hopping high and long
maximizes return) minus a thrust cost. Episodes end by time limit only
(every done is a timeout — exercises the bootstrap path,
reference ppo.py:160-164).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from rsl_rl_tpu.env.vec_env import VecEnv, as_episode_length
from rsl_rl_tpu.utils.registry import register


@struct.dataclass
class HopperState:
    rng: jax.Array
    episode_length: jax.Array  # [N] int32
    z: jax.Array  # [N] body height (foot at z - l0 when compressed... foot = z)
    v: jax.Array  # [N] vertical velocity


@register("env")
class Hopper(VecEnv):
    """1-DoF vertical hopper: learn stance-phase thrust timing to bounce."""

    num_actions = 1

    g = 9.81
    mass = 1.0
    l0 = 1.0  # rest leg length == contact threshold height
    k = 2000.0  # leg spring stiffness (stiff => substeps)
    c = 4.0  # leg damping
    max_thrust = 40.0
    dt = 0.02
    n_substeps = 10
    z_max = 3.0  # normalization scale for the reward

    def __init__(
        self, num_envs: int, max_episode_length: int = 200, cfg: dict | None = None
    ):
        self.num_envs = num_envs
        self.max_episode_length = as_episode_length(max_episode_length)
        self.step_dt = self.dt
        self.cfg = cfg or {}

    # ------------------------------------------------------------- dynamics

    def _substep(self, z, v, thrust, h):
        contact = z < self.l0
        f_leg = self.k * (self.l0 - z) - self.c * v + thrust
        # unilateral: the ground can only push, and only during contact
        f = jnp.where(contact, jnp.maximum(f_leg, 0.0), 0.0)
        v = v + h * (f / self.mass - self.g)
        z = jnp.maximum(z + h * v, 0.1)  # hard floor guard for the body
        return z, v

    # ------------------------------------------------------------- contract

    def _obs(self, state: HopperState) -> dict[str, jax.Array]:
        contact = (state.z < self.l0).astype(jnp.float32)
        obs = jnp.stack(
            [state.z / self.z_max, 0.1 * state.v, contact], axis=-1
        )
        return {"policy": obs}

    def _sample_init(self, key: jax.Array, n: int):
        z = self.l0 + jax.random.uniform(key, (n,), minval=0.0, maxval=0.3)
        v = jnp.zeros((n,))
        return z, v

    def reset(self, key: jax.Array):
        keys = jax.random.split(key, self.num_envs + 1)
        z, v = self._sample_init(keys[0], self.num_envs)
        state = HopperState(
            rng=keys[1:],
            episode_length=jnp.zeros((self.num_envs,), jnp.int32),
            z=z,
            v=v,
        )
        return state, self._obs(state)

    def step(self, state: HopperState, actions: jax.Array):
        thrust = jnp.clip(actions[:, 0], 0.0, 1.0) * self.max_thrust
        z, v = state.z, state.v
        h = self.dt / self.n_substeps
        for _ in range(self.n_substeps):
            z, v = self._substep(z, v, thrust, h)

        # apex-seeking reward: pay for height above rest, charge for thrust
        reward = (z - self.l0) / (self.z_max - self.l0) - 0.02 * (
            thrust / self.max_thrust
        ) ** 2

        episode_length = state.episode_length + 1
        time_out = episode_length >= self.max_episode_length
        done = time_out  # time-limit truncation only

        keys = jax.vmap(jax.random.split, in_axes=0, out_axes=1)(state.rng)
        new_rng, reset_keys = keys[0], keys[1]
        reset_z, reset_v = jax.vmap(
            lambda kk: tuple(x[0] for x in self._sample_init(kk, 1))
        )(reset_keys)

        state = HopperState(
            rng=new_rng,
            episode_length=jnp.where(done, 0, episode_length),
            z=jnp.where(done, reset_z, z),
            v=jnp.where(done, reset_v, v),
        )
        extras = {
            "time_outs": time_out,
            "log": {"hopper/height": z, "hopper/contact": (z < self.l0).astype(jnp.float32)},
        }
        return state, self._obs(state), reward, done, extras
