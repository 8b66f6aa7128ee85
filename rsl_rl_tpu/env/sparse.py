"""Sparse-reward exploration environment for RND benchmarking.

The BASELINE config list includes "PPO + RND intrinsic reward (curiosity) on a
sparse-reward task" (BASELINE.md config #3). This is the in-tree JAX analog: a
2-D point mass that earns reward ONLY inside a small goal region far from the
start. Plain PPO has no gradient signal until an episode stumbles into the
goal; RND's novelty bonus densifies exploration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from rsl_rl_tpu.env.vec_env import VecEnv, as_episode_length
from rsl_rl_tpu.utils.registry import register


@struct.dataclass
class SparseGoalState:
    rng: jax.Array
    episode_length: jax.Array
    pos: jax.Array  # [N, 2]
    vel: jax.Array  # [N, 2]


@register("env")
class SparseGoalReach(VecEnv):
    """2-D point mass; +1 only within ``goal_radius`` of ``goal``.

    Observations: ``"policy"`` = [pos, vel] (4-D). Reaching the goal
    terminates the episode (a true terminal); otherwise episodes truncate at
    the time limit. Start states are drawn near the origin; the goal sits at
    ``(goal_dist, goal_dist)``.
    """

    num_actions = 2
    dt = 0.1
    damping = 0.95

    def __init__(
        self,
        num_envs: int,
        max_episode_length: int = 120,
        goal_dist: float = 3.0,
        goal_radius: float = 0.5,
        cfg: dict | None = None,
    ):
        self.num_envs = num_envs
        self.max_episode_length = as_episode_length(max_episode_length)
        self.goal = jnp.array([goal_dist, goal_dist], jnp.float32)
        self.goal_radius = goal_radius
        self.step_dt = self.dt
        self.cfg = cfg or {}

    def _obs(self, state: SparseGoalState) -> dict[str, jax.Array]:
        return {"policy": jnp.concatenate([state.pos, state.vel], axis=-1)}

    def _sample_start(self, key: jax.Array, n: int) -> jax.Array:
        return jax.random.uniform(key, (n, 2), minval=-0.5, maxval=0.5)

    def reset(self, key: jax.Array):
        keys = jax.random.split(key, self.num_envs + 1)
        state = SparseGoalState(
            rng=keys[1:],
            episode_length=jnp.zeros((self.num_envs,), jnp.int32),
            pos=self._sample_start(keys[0], self.num_envs),
            vel=jnp.zeros((self.num_envs, 2)),
        )
        return state, self._obs(state)

    def step(self, state: SparseGoalState, actions: jax.Array):
        a = jnp.clip(actions, -1.0, 1.0)
        vel = state.vel * self.damping + a * self.dt
        pos = state.pos + vel * self.dt

        dist = jnp.linalg.norm(pos - self.goal, axis=-1)
        reached = dist < self.goal_radius
        reward = reached.astype(jnp.float32)  # sparse: 1 at the goal, else 0

        episode_length = state.episode_length + 1
        time_out = episode_length >= self.max_episode_length
        done = reached | time_out

        keys = jax.vmap(jax.random.split, in_axes=0, out_axes=1)(state.rng)
        new_rng, reset_keys = keys[0], keys[1]
        reset_pos = jax.vmap(lambda k: self._sample_start(k, 1)[0])(reset_keys)

        state = SparseGoalState(
            rng=new_rng,
            episode_length=jnp.where(done, 0, episode_length),
            pos=jnp.where(done[:, None], reset_pos, pos),
            vel=jnp.where(done[:, None], 0.0, vel),
        )
        extras = {
            "time_outs": time_out & ~reached,
            "log": {"sparse_goal/success": reached.astype(jnp.float32)},
        }
        return state, self._obs(state), reward, done, extras
