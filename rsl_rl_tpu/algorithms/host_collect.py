"""Shared host-side collection machinery for non-JAX environments.

PPO's and Distillation's hybrid collection loops (jitted policy steps, host
env stepping — the analog of the reference's per-step host<->device copies at
on_policy_runner.py:100-139) share all their episode bookkeeping, extras
aggregation, and trajectory stacking; only the per-step payload differs. This
module holds the shared pieces so boundary-semantics fixes apply in one place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class HostEpisodeTracker:
    """NumPy mirror of the on-device episode bookkeeping
    (see ``rsl_rl_tpu.algorithms.ppo.step_episode_stats``)."""

    def __init__(self, stats):
        self.cur_rew = np.asarray(stats.cur_reward_sum).copy()
        self.cur_len = np.asarray(stats.cur_episode_length).copy()
        self.cur_erew = np.asarray(stats.cur_ereward_sum).copy()
        self.cur_irew = np.asarray(stats.cur_ireward_sum).copy()
        self.acc = {
            "ep_reward_sum": 0.0,
            "ep_length_sum": 0.0,
            "ep_ereward_sum": 0.0,
            "ep_ireward_sum": 0.0,
            "ep_count": 0.0,
        }
        self.log_acc: dict[str, float] = {}
        self.log_counts: dict[str, int] = {}
        self.steps = 0

    def step(self, rew_np: np.ndarray, irew_np: np.ndarray, done_np: np.ndarray, extras: dict) -> None:
        self.cur_rew += rew_np + irew_np
        self.cur_erew += rew_np
        self.cur_irew += irew_np
        self.cur_len += 1.0
        self.steps += 1
        if done_np.any():
            d = done_np.astype(bool)
            self.acc["ep_reward_sum"] += float(self.cur_rew[d].sum())
            self.acc["ep_length_sum"] += float(self.cur_len[d].sum())
            self.acc["ep_ereward_sum"] += float(self.cur_erew[d].sum())
            self.acc["ep_ireward_sum"] += float(self.cur_irew[d].sum())
            self.acc["ep_count"] += float(d.sum())
            self.cur_rew[d] = 0.0
            self.cur_len[d] = 0.0
            self.cur_erew[d] = 0.0
            self.cur_irew[d] = 0.0
        # episode takes precedence over log (the reference's elif,
        # on_policy_runner.py:114-117); means are over the steps a key was
        # PRESENT, matching the reference's append-then-average deques —
        # host envs emit these intermittently (e.g. only on episode ends)
        if "episode" in extras:
            group = extras["episode"]
        elif "log" in extras:
            group = extras.get("log")
        else:
            group = None
        if group:
            for k, v in group.items():
                self.log_acc[k] = self.log_acc.get(k, 0.0) + float(np.mean(v))
                self.log_counts[k] = self.log_counts.get(k, 0) + 1

    def stats(self):
        """Episode accumulators as a device-side ``EpisodeStats``."""
        from rsl_rl_tpu.algorithms.ppo import EpisodeStats

        return EpisodeStats(
            cur_reward_sum=jnp.asarray(self.cur_rew),
            cur_episode_length=jnp.asarray(self.cur_len),
            cur_ereward_sum=jnp.asarray(self.cur_erew),
            cur_ireward_sum=jnp.asarray(self.cur_irew),
        )

    def metrics(self) -> dict[str, jax.Array]:
        """Iteration totals + per-iteration extras means as jnp scalars."""
        out = {k: jnp.asarray(v, jnp.float32) for k, v in self.acc.items()}
        for k, v in self.log_acc.items():
            out[f"extras/{k}"] = jnp.asarray(
                v / max(self.log_counts.get(k, 1), 1), jnp.float32
            )
        return out


def stack_trajectory(traj: dict[str, list]) -> dict[str, jax.Array]:
    """Stack per-step host trajectory lists into time-major device arrays
    (obs entries may be pytrees)."""
    out = {}
    for k, xs in traj.items():
        if k == "obs":
            out[k] = jax.tree.map(lambda *ys: jnp.stack(ys), *xs)
        else:
            out[k] = jnp.stack(xs)
    return out
