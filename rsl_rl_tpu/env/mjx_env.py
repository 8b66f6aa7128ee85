"""MuJoCo-MJX adapter: run MJX physics inside the jitted rollout scan.

The reference library is positioned as the trainer for GPU-resident simulators
(Isaac Lab, MuJoCo Playground — reference README.md:6-10); the environment
itself always lives downstream. This adapter is the TPU-native analog for
MuJoCo models: it wraps an ``mjx.Model`` as a :class:`~rsl_rl_tpu.env.VecEnv`,
so physics steps, reward/observation computation and auto-resets all trace
into the same XLA program as the policy (no host round-trips, shards along the
data mesh like any other JAX env).

Requires the ``mujoco-mjx`` package (import-gated; the rest of the framework
does not depend on it).

Usage::

    import mujoco

    model = mujoco.MjModel.from_xml_path("humanoid.xml")
    env = MJXEnv(
        model,
        num_envs=4096,
        episode_length=1000,
        obs_fn=lambda mx, d: {"policy": jnp.concatenate([d.qpos, d.qvel])},
        reward_fn=lambda mx, d, action: d.qvel[0],            # forward speed
        done_fn=lambda mx, d: d.qpos[2] < 0.3,                # fallen over
        reset_noise_scale=0.01,
    )
    runner = OnPolicyRunner(env, train_cfg, log_dir)
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from rsl_rl_tpu.env.vec_env import VecEnv
from rsl_rl_tpu.utils.registry import register

try:  # pragma: no cover - exercised only when mujoco-mjx is installed
    from mujoco import mjx

    _HAS_MJX = True
except ImportError:  # pragma: no cover
    mjx = None
    _HAS_MJX = False


@struct.dataclass
class MJXState:
    rng: jax.Array  # [N] per-env PRNG keys
    episode_length: jax.Array  # [N] int32
    data: Any  # batched mjx.Data (leading axis N)


@register("env")
class MJXEnv(VecEnv):
    """Vectorized MJX physics environment.

    Args:
        mj_model: A ``mujoco.MjModel`` (host model; put on device here).
        num_envs: Number of parallel environments.
        episode_length: Time-limit truncation horizon.
        obs_fn: ``(mjx_model, data) -> dict[str, [D] array]`` for ONE env
            (vmapped internally). Must return the same group names every call.
        reward_fn: ``(mjx_model, data, action) -> scalar`` for one env.
        done_fn: Optional ``(mjx_model, data) -> bool`` terminal predicate for
            one env (time-limit truncation is handled separately and reported
            via ``extras["time_outs"]``).
        reset_noise_scale: Uniform noise added to the model's keyframe/neutral
            ``qpos``/``qvel`` on (auto-)reset.
        action_scale: Actions are multiplied by this before being applied as
            ``data.ctrl``.
        cfg: Arbitrary user config carried for API parity.
    """

    def __init__(
        self,
        mj_model,
        num_envs: int,
        episode_length: int,
        obs_fn: Callable,
        reward_fn: Callable,
        done_fn: Callable | None = None,
        reset_noise_scale: float = 0.01,
        action_scale: float = 1.0,
        cfg: dict | None = None,
    ):
        if not _HAS_MJX:
            raise ImportError(
                "MJXEnv requires the 'mujoco-mjx' package (pip install mujoco-mjx)."
            )
        self.num_envs = num_envs
        self.max_episode_length = episode_length
        self.cfg = cfg or {}
        self.model = mjx.put_model(mj_model)
        self.num_actions = int(mj_model.nu)
        self.obs_fn = obs_fn
        self.reward_fn = reward_fn
        self.done_fn = done_fn
        self.reset_noise_scale = reset_noise_scale
        self.action_scale = action_scale
        self.step_dt = float(mj_model.opt.timestep)

    # ------------------------------------------------------------- internals

    def _init_one(self, key: jax.Array):
        """Fresh mjx.Data for one env with noise-perturbed initial state."""
        k_pos, k_vel = jax.random.split(key)
        data = mjx.make_data(self.model)
        qpos = data.qpos + self.reset_noise_scale * jax.random.uniform(
            k_pos, data.qpos.shape, minval=-1.0, maxval=1.0
        )
        qvel = data.qvel + self.reset_noise_scale * jax.random.uniform(
            k_vel, data.qvel.shape, minval=-1.0, maxval=1.0
        )
        data = data.replace(qpos=qpos, qvel=qvel)
        return mjx.forward(self.model, data)

    def _obs(self, state: MJXState) -> dict[str, jax.Array]:
        return jax.vmap(lambda d: self.obs_fn(self.model, d))(state.data)

    # -------------------------------------------------------------- contract

    def reset(self, key: jax.Array):
        # num_envs + 1 splits: keys[0] seeds init noise, keys[1:] become the
        # carried per-env streams — carrying the SAME keys that _init_one
        # already consumed would make the first auto-reset's noise draws
        # collide with the initial perturbations (the sibling envs reserve
        # streams the same way)
        keys = jax.random.split(key, self.num_envs + 1)
        data = jax.vmap(self._init_one)(jax.random.split(keys[0], self.num_envs))
        state = MJXState(
            rng=keys[1:],
            episode_length=jnp.zeros((self.num_envs,), jnp.int32),
            data=data,
        )
        return state, self._obs(state)

    def step(self, state: MJXState, actions: jax.Array):
        def step_one(d, a):
            d = d.replace(ctrl=a * self.action_scale)
            return mjx.step(self.model, d)

        data = jax.vmap(step_one)(state.data, actions)
        rew = jax.vmap(lambda d, a: self.reward_fn(self.model, d, a))(data, actions)

        episode_length = state.episode_length + 1
        time_out = episode_length >= self.max_episode_length
        if self.done_fn is not None:
            terminal = jax.vmap(lambda d: self.done_fn(self.model, d))(data)
        else:
            terminal = jnp.zeros_like(time_out)
        done = terminal | time_out

        # auto-reset done envs (fresh per-env keys, noise-perturbed init)
        keys = jax.vmap(jax.random.split, in_axes=0, out_axes=1)(state.rng)
        new_rng, reset_keys = keys[0], keys[1]
        fresh = jax.vmap(self._init_one)(reset_keys)
        data = jax.tree.map(
            lambda f, d: jnp.where(
                done.reshape((-1,) + (1,) * (d.ndim - 1)), f, d
            ),
            fresh,
            data,
        )

        state = MJXState(
            rng=new_rng,
            episode_length=jnp.where(done, 0, episode_length),
            data=data,
        )
        extras = {"time_outs": time_out & ~terminal}
        return state, self._obs(state), rew.astype(jnp.float32), done, extras
