"""Learning-curve parity: rsl_rl_tpu vs the UPSTREAM reference on Pendulum.

Runs the actual reference library (torch, CPU, imported from /root/reference
via benchmarks/_reference_shim.py) and this framework on the *same* task —
vectorized Pendulum swing-up with identical physics, reward, auto-reset and
timeout semantics — with identical PPO hyperparameters (BASELINE.md config #1
at a CPU-affordable width: 64 envs, 24-step windows, [128,128] ELU MLPs, obs
normalization, adaptive KL), recording mean completed-episode reward per
iteration for both.

Writes benchmarks/results/parity_pendulum.json and prints a checkpoint table.

Usage:
    python benchmarks/parity_pendulum.py [--iterations 600] [--seeds 1 2 3]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# --------------------------------------------------------------------------
# shared task definition (mirrors rsl_rl_tpu/env/pendulum.py exactly)
# --------------------------------------------------------------------------

MAX_SPEED = 8.0
MAX_TORQUE = 2.0
DT = 0.05
G = 10.0
M = 1.0
LENGTH = 1.0
MAX_EPISODE_LENGTH = 200


def train_cfg(seed: int, recurrent: bool = False, rnd: bool = False) -> dict:
    """One config for both frameworks (registry resolves class names on ours;
    the reference eval()s the same names)."""
    policy = {
        "class_name": "ActorCritic",
        "activation": "elu",
        "actor_obs_normalization": True,
        "critic_obs_normalization": True,
        "actor_hidden_dims": [128, 128],
        "critic_hidden_dims": [128, 128],
        "init_noise_std": 1.0,
    }
    if recurrent:
        policy.update(
            {
                "class_name": "ActorCriticRecurrent",
                "rnn_type": "gru",
                "rnn_hidden_dim": 64,
                "actor_hidden_dims": [128],
                "critic_hidden_dims": [128],
            }
        )
    obs_groups = {"policy": ["policy"], "critic": ["policy"]}
    if rnd:
        obs_groups["rnd_state"] = ["policy"]
    return {
        "num_steps_per_env": 24,
        "save_interval": 10_000,
        "seed": seed,
        "obs_groups": obs_groups,
        "logger": "tensorboard",
        "policy": policy,
        "algorithm": {
            "class_name": "PPO",
            # both frameworks' resolvers scale weight by env step_dt (0.05)
            **({"rnd_cfg": {
                "weight": 0.5,
                "num_outputs": 16,
                "predictor_hidden_dims": [-1],
                "target_hidden_dims": [-1],
                "state_normalization": True,
                "reward_normalization": True,
                "learning_rate": 1.0e-3,
            }} if rnd else {}),
            "learning_rate": 1.0e-3,
            "num_learning_epochs": 5,
            "num_mini_batches": 4,
            "schedule": "adaptive",
            "desired_kl": 0.01,
            "gamma": 0.99,
            "lam": 0.95,
            "clip_param": 0.2,
            "entropy_coef": 0.01,
            "value_loss_coef": 1.0,
            "max_grad_norm": 1.0,
            "use_clipped_value_loss": True,
        },
    }


# --------------------------------------------------------------------------
# reference side (torch)
# --------------------------------------------------------------------------



def make_torch_pendulum(
    n: int, partially_observable: bool = False, privileged_group: bool = False
):
    """Reference-contract torch Pendulum env factory (module-level so the
    distillation parity harness reuses the exact same task). Imports are
    deferred so merely importing this module stays torch-free.
    ``privileged_group`` adds a full-state ``"privileged"`` obs group (the
    torch twin of ``rsl_rl_tpu.env.PrivilegedPendulum``)."""
    from benchmarks._reference_shim import TensorDictShim, install_reference_shims

    install_reference_shims()
    import torch

    class TorchPendulum:
        """Reference-contract VecEnv with the same dynamics as our JAX env.

        With ``partially_observable`` the velocity is hidden (our
        ``PartiallyObservablePendulum``), separating recurrent policies."""

        def __init__(self, n: int, partially_observable: bool = False,
                     privileged_group: bool = False):
            self.partially_observable = partially_observable
            self.privileged_group = privileged_group
            self.num_envs = n
            self.num_actions = 1
            self.max_episode_length = MAX_EPISODE_LENGTH
            self.device = "cpu"
            self.cfg = {}
            # the reference's resolve_rnd_config reads env.unwrapped.step_dt
            self.unwrapped = self
            self.step_dt = DT
            self.episode_length_buf = torch.zeros(n, dtype=torch.long)
            self.theta = torch.empty(n).uniform_(-math.pi, math.pi)
            self.theta_dot = torch.empty(n).uniform_(-1.0, 1.0)
            # episode bookkeeping for the parity curve
            self._cur_return = torch.zeros(n)
            self.finished_returns: list[float] = []

        def get_observations(self):
            parts = [torch.cos(self.theta), torch.sin(self.theta)]
            if not self.partially_observable:
                parts.append(self.theta_dot)
            obs = {"policy": torch.stack(parts, dim=-1)}
            if self.privileged_group:
                obs["privileged"] = torch.stack(
                    [torch.cos(self.theta), torch.sin(self.theta), self.theta_dot],
                    dim=-1,
                )
            return TensorDictShim(obs, batch_size=[self.num_envs], device="cpu")

        def step(self, actions):
            u = torch.clamp(actions[:, 0], -MAX_TORQUE, MAX_TORQUE)
            angle_norm = ((self.theta + math.pi) % (2 * math.pi)) - math.pi
            costs = angle_norm**2 + 0.1 * self.theta_dot**2 + 0.001 * u**2
            new_theta_dot = self.theta_dot + (
                3.0 * G / (2.0 * LENGTH) * torch.sin(self.theta)
                + 3.0 / (M * LENGTH**2) * u
            ) * DT
            new_theta_dot = torch.clamp(new_theta_dot, -MAX_SPEED, MAX_SPEED)
            new_theta = self.theta + new_theta_dot * DT

            self.episode_length_buf += 1
            time_out = self.episode_length_buf >= self.max_episode_length
            done = time_out.clone()
            rew = -costs

            self._cur_return += rew
            if done.any():
                self.finished_returns.extend(self._cur_return[done].tolist())
                self._cur_return[done] = 0.0
                n_reset = int(done.sum())
                new_theta[done] = torch.empty(n_reset).uniform_(-math.pi, math.pi)
                new_theta_dot[done] = torch.empty(n_reset).uniform_(-1.0, 1.0)
                self.episode_length_buf[done] = 0
            self.theta, self.theta_dot = new_theta, new_theta_dot

            extras = {"time_outs": time_out}
            return self.get_observations(), rew, done, extras
    return TorchPendulum(n, partially_observable, privileged_group)


def run_reference(
    seed: int, iterations: int, num_envs: int = 64, recurrent: bool = False,
    rnd: bool = False,
) -> list[float]:
    """Train the reference library; returns mean completed-episode reward per
    iteration (nan when no episode finished in that iteration)."""
    from benchmarks._reference_shim import TensorDictShim, install_reference_shims

    install_reference_shims()
    import torch
    import rsl_rl.runners.on_policy_runner as ref_runner_mod
    from rsl_rl.runners import OnPolicyRunner as RefRunner

    # the reference snapshots git state unconditionally on the first learn()
    # iteration (on_policy_runner.py:165-171), which requires GitPython and a
    # log dir; neutralize it for the parity run
    ref_runner_mod.store_code_state = lambda *a, **k: []

    torch.manual_seed(seed)

    env = make_torch_pendulum(num_envs, partially_observable=recurrent)
    import tempfile

    # a real log_dir keeps the reference's learn() bookkeeping on its normal
    # code path (log_dir=None trips attribute errors in its first-iteration
    # git/logger block); saving is neutralized to avoid 600 checkpoints
    log_dir = tempfile.mkdtemp(prefix="ref_parity_")
    runner = RefRunner(env, train_cfg(seed, recurrent, rnd), log_dir=log_dir, device="cpu")
    runner.save = lambda *a, **k: None

    curve = []
    for _ in range(iterations):
        before = len(env.finished_returns)
        runner.learn(1)
        new = env.finished_returns[before:]
        curve.append(sum(new) / len(new) if new else float("nan"))
    return curve


# --------------------------------------------------------------------------
# our side (JAX)
# --------------------------------------------------------------------------


def run_ours(
    seed: int, iterations: int, num_envs: int = 64, recurrent: bool = False,
    rnd: bool = False,
) -> list[float]:
    import jax

    from rsl_rl_tpu.env import PartiallyObservablePendulum, Pendulum
    from rsl_rl_tpu.runners import OnPolicyRunner

    env_cls = PartiallyObservablePendulum if recurrent else Pendulum
    env = env_cls(num_envs=num_envs, max_episode_length=MAX_EPISODE_LENGTH)
    runner = OnPolicyRunner(env, train_cfg(seed, recurrent, rnd), log_dir=None)
    ts, cs = runner.train_state, runner.collect_state

    # with RND on, compare EXTRINSIC returns: the torch env's bookkeeping is
    # env-side (extrinsic by construction), ep_reward_sum includes intrinsic
    reward_key = "ep_ereward_sum" if rnd else "ep_reward_sum"
    curve = []
    for _ in range(iterations):
        ts, cs, rollout, cm = runner._collect(ts, cs)
        ts, cs, um = runner._update(ts, cs, rollout)
        m = jax.device_get(cm)
        count = float(m["ep_count"])
        curve.append(float(m[reward_key]) / count if count > 0 else float("nan"))
    return curve


# --------------------------------------------------------------------------


def summarize(curves: dict, checkpoints=(50, 100, 200, 350, 500)) -> list[dict]:
    import numpy as np

    rows = []
    for it in checkpoints:
        row = {"iteration": it}
        for name, runs in curves.items():
            vals = []
            for c in runs:
                if it <= len(c):
                    window = [v for v in c[max(0, it - 20) : it] if not math.isnan(v)]
                    if window:
                        vals.append(sum(window) / len(window))
            if vals:
                row[name] = round(float(np.mean(vals)), 1)
                row[name + "_std"] = round(float(np.std(vals)), 1)
        rows.append(row)
    return rows


def main():
    p = argparse.ArgumentParser()
    # this is a CPU benchmark (torch reference is CPU-only); pin JAX to CPU
    # programmatically — the axon site hook overrides the JAX_PLATFORMS env
    # var, and touching the tunneled TPU here could collide with a bench run
    import jax

    jax.config.update("jax_platforms", "cpu")

    p.add_argument("--iterations", type=int, default=500)
    p.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--skip-reference", action="store_true")
    p.add_argument(
        "--recurrent", action="store_true",
        help="GRU ActorCriticRecurrent on the partially observable task",
    )
    p.add_argument(
        "--rnd", action="store_true",
        help="PPO + Random Network Distillation intrinsic rewards",
    )
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()
    if args.out is None:
        suffix = ("_recurrent" if args.recurrent else "") + ("_rnd" if args.rnd else "")
        args.out = f"benchmarks/results/parity_pendulum{suffix}.json"

    curves = {"rsl_rl_tpu": [], "reference": []}
    timings = {}

    for seed in args.seeds:
        t0 = time.time()
        curves["rsl_rl_tpu"].append(
            run_ours(seed, args.iterations, args.num_envs, args.recurrent, args.rnd)
        )
        timings.setdefault("rsl_rl_tpu_s", []).append(round(time.time() - t0, 1))
        print(f"[ours seed={seed}] done in {timings['rsl_rl_tpu_s'][-1]}s", flush=True)

    if not args.skip_reference and os.path.isdir("/root/reference"):
        for seed in args.seeds:
            t0 = time.time()
            curves["reference"].append(
                run_reference(seed, args.iterations, args.num_envs, args.recurrent, args.rnd)
            )
            timings.setdefault("reference_s", []).append(round(time.time() - t0, 1))
            print(f"[reference seed={seed}] done in {timings['reference_s'][-1]}s", flush=True)

    rows = summarize(curves)
    task_name = "po_pendulum_gru" if args.recurrent else "pendulum_swingup"
    if args.rnd:
        task_name += "_rnd"
    out = {
        "task": f"{task_name}_{args.num_envs}envs",
        "iterations": args.iterations,
        "seeds": args.seeds,
        "checkpoints": rows,
        "timings": timings,
        "curves": curves,
    }
    path = args.out
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f)
    print(json.dumps(rows, indent=2))
    print(f"full curves -> {path}")


if __name__ == "__main__":
    main()
