"""Host-side (non-JAX) environment support.

The reference drives arbitrary torch-based simulators with per-step
host<->device copies (reference: rsl_rl/runners/on_policy_runner.py:103-107).
The TPU-native analog: environments that cannot be traced into XLA implement
the stateful :class:`HostVecEnv` API, and the runner switches to a hybrid
collection loop — jitted policy/processing steps on device, env stepping on
host — while the learning phase stays identical (the rollout is stacked onto
device and fed to the same jitted update).

``GymVecEnv`` adapts Gymnasium vectorized environments (including the
truncation -> ``time_outs`` mapping used for value bootstrapping).
"""

from __future__ import annotations

import abc
import warnings
from typing import Any

import numpy as np


class HostVecEnv(abc.ABC):
    """Stateful vectorized environment running on host (CPU/external sim).

    Unlike :class:`rsl_rl_tpu.env.vec_env.VecEnv`, this API is stateful and
    NumPy-based — the analog of the reference's ``VecEnv`` contract
    (reference env/vec_env.py:13-98). Auto-reset on done is required.
    """

    is_jax = False

    num_envs: int
    num_actions: int
    max_episode_length: int
    cfg: Any = None

    #: Optional per-env elapsed-step counter. Isaac-style simulators expose
    #: this as a writable buffer (reference env/vec_env.py:35); when present
    #: (not None), ``OnPolicyRunner.learn(init_at_random_ep_len=True)``
    #: randomizes it (reference runners/on_policy_runner.py:66-69): written
    #: IN PLACE when it is a writable ndarray (a view into sim state sees the
    #: write), otherwise the attribute is replaced — envs exposing a foreign
    #: buffer type must re-read the attribute each step. Envs without the
    #: buffer leave it None and the runner warns instead.
    episode_length_buf: np.ndarray | None = None

    @abc.abstractmethod
    def reset(self, seed: int | None = None) -> dict[str, np.ndarray]:
        """Reset all envs; returns the obs-group dict."""

    @abc.abstractmethod
    def step(
        self, actions: np.ndarray
    ) -> tuple[dict[str, np.ndarray], np.ndarray, np.ndarray, dict]:
        """Step all envs. Returns ``(obs_dict, rewards, dones, extras)`` with
        the same extras protocol as the JAX contract (``time_outs``, ``log``).
        """


class GymVecEnv(HostVecEnv):
    """Adapter for ``gymnasium.vector`` environments.

    Maps the single observation array to the ``"policy"`` obs group and
    reports truncations as ``extras["time_outs"]`` so PPO bootstraps the value
    on time limits (reference ppo.py:160-164).
    """

    def __init__(self, env, obs_group: str = "policy", cfg: dict | None = None):
        # Gymnasium >= 1.0 defaults vector envs to NEXT_STEP autoreset: the
        # done step returns the TERMINAL obs and the following step ignores
        # its action and returns the reset obs. That violates this adapter's
        # same-step contract (the obs at done must start the fresh episode,
        # like Isaac-style simulators) and would corrupt every
        # episode-boundary transition, so reject it loudly.
        mode = getattr(env, "metadata", {}).get("autoreset_mode")
        if mode is not None and getattr(mode, "name", str(mode)) != "SAME_STEP":
            raise ValueError(
                f"GymVecEnv requires same-step autoreset, got {mode}. Construct the"
                " vector env with gym.make_vec(..., vector_kwargs={'autoreset_mode':"
                " gymnasium.vector.AutoresetMode.SAME_STEP})."
            )
        self.env = env
        self.obs_group = obs_group
        self.num_envs = env.num_envs
        self.num_actions = int(np.prod(env.single_action_space.shape))
        spec = getattr(getattr(env, "spec", None), "max_episode_steps", None)
        if spec is None:
            # a wrong horizon silently changes timeout-bootstrap semantics
            # (reference ppo.py:160-164), so never default quietly
            warnings.warn(
                "GymVecEnv: the wrapped env's spec declares no max_episode_steps;"
                " falling back to max_episode_length=1000. Pass an env with a"
                " TimeLimit spec or set .max_episode_length explicitly —"
                " init_at_random_ep_len and logging use it.",
                UserWarning,
                stacklevel=2,
            )
        self.max_episode_length = spec or 1000
        self.cfg = cfg or {}

    def _obs(self, obs: np.ndarray) -> dict[str, np.ndarray]:
        return {self.obs_group: np.asarray(obs, np.float32)}

    def reset(self, seed: int | None = None) -> dict[str, np.ndarray]:
        obs, _ = self.env.reset(seed=seed)
        return self._obs(obs)

    def step(self, actions: np.ndarray):
        obs, rew, terminated, truncated, info = self.env.step(np.asarray(actions))
        dones = np.asarray(terminated) | np.asarray(truncated)
        extras = {"time_outs": np.asarray(truncated) & ~np.asarray(terminated)}
        return self._obs(obs), np.asarray(rew, np.float32), dones, extras
