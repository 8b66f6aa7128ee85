"""Symmetry-augmentation learning-curve parity: rsl_rl_tpu vs the reference.

The last featured PPO mode: symmetry-based data augmentation (reference
ppo.py:226-244). Both frameworks train PPO on the identical 1-D PointMass
task (drive position/velocity to zero; mirror-symmetric dynamics and reward)
with `use_data_augmentation` enabled — ours through the registered JAX
augmentation (`rsl_rl_tpu.env.toy:point_mass_symmetry`), the reference
through a torch twin defined here with the same contract (original batch
stacked with its mirrored copy).

Writes benchmarks/results/parity_symmetry.json and prints a checkpoint table.

Usage:
    python benchmarks/parity_symmetry.py [--iterations 300] [--seeds 1 2 3]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# task constants (mirror rsl_rl_tpu/env/toy.py::PointMass exactly)
DT = 0.1
BOUND = 5.0
MAX_EPISODE_LENGTH = 100


def train_cfg(seed: int, aug_func) -> dict:
    return {
        "num_steps_per_env": 24,
        "save_interval": 10_000,
        "seed": seed,
        "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
        "logger": "tensorboard",
        "policy": {
            "class_name": "ActorCritic",
            "activation": "elu",
            "actor_obs_normalization": True,
            "critic_obs_normalization": True,
            "actor_hidden_dims": [128, 128],
            "critic_hidden_dims": [128, 128],
            "init_noise_std": 1.0,
        },
        "algorithm": {
            "class_name": "PPO",
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
            "symmetry_cfg": {
                "use_data_augmentation": True,
                "use_mirror_loss": False,
                "data_augmentation_func": aug_func,
                "mirror_loss_coeff": 0.0,
            },
        },
    }


# --------------------------------------------------------------------------
# reference side (torch)
# --------------------------------------------------------------------------


def make_torch_point_mass(n: int):
    """Reference-contract VecEnv twin of rsl_rl_tpu.env.toy.PointMass."""
    from benchmarks._reference_shim import TensorDictShim, install_reference_shims

    install_reference_shims()
    import torch

    class TorchPointMass:
        def __init__(self, num_envs: int):
            self.num_envs = num_envs
            self.num_actions = 1
            self.max_episode_length = MAX_EPISODE_LENGTH
            self.device = "cpu"
            self.cfg = {}
            self.unwrapped = self
            self.step_dt = DT
            self.episode_length_buf = torch.zeros(num_envs, dtype=torch.long)
            self.x = torch.empty(num_envs).uniform_(-2.0, 2.0)
            self.v = torch.zeros(num_envs)
            self._cur_return = torch.zeros(num_envs)
            self.finished_returns: list[float] = []

        def get_observations(self):
            obs = torch.stack([self.x, self.v], dim=-1)
            return TensorDictShim({"policy": obs}, batch_size=[self.num_envs], device="cpu")

        def step(self, actions):
            a = torch.clamp(actions[:, 0], -1.0, 1.0)
            v = self.v + a * DT
            x = self.x + v * DT
            rew = -(x**2 + 0.1 * v**2 + 0.01 * a**2)

            self.episode_length_buf += 1
            time_out = self.episode_length_buf >= self.max_episode_length
            terminal = x.abs() > BOUND
            done = time_out | terminal

            self._cur_return += rew
            if done.any():
                self.finished_returns.extend(self._cur_return[done].tolist())
                self._cur_return[done] = 0.0
                n_reset = int(done.sum())
                x[done] = torch.empty(n_reset).uniform_(-2.0, 2.0)
                v[done] = 0.0
                self.episode_length_buf[done] = 0
            self.x, self.v = x, v

            extras = {"time_outs": time_out & ~terminal}
            return self.get_observations(), rew, done, extras

    return TorchPointMass(n)


def torch_point_mass_symmetry(obs=None, actions=None, env=None, **kwargs):
    """Torch twin of ``rsl_rl_tpu.env.toy.point_mass_symmetry``: stack the
    original batch with its mirrored copy (x, v, a) -> (-x, -v, -a)."""
    from benchmarks._reference_shim import TensorDictShim
    import torch

    obs_aug = None
    if obs is not None:
        data = {k: torch.cat([v, -v], dim=0) for k, v in obs.items()}
        n = next(iter(data.values())).shape[0]
        obs_aug = TensorDictShim(data, batch_size=[n], device="cpu")
    actions_aug = None
    if actions is not None:
        actions_aug = torch.cat([actions, -actions], dim=0)
    return obs_aug, actions_aug


def run_reference(seed: int, iterations: int, num_envs: int = 64) -> list[float]:
    from benchmarks._reference_shim import install_reference_shims

    install_reference_shims()
    import torch
    import rsl_rl.runners.on_policy_runner as ref_runner_mod
    from rsl_rl.runners import OnPolicyRunner as RefRunner

    ref_runner_mod.store_code_state = lambda *a, **k: []
    torch.manual_seed(seed)

    env = make_torch_point_mass(num_envs)
    import tempfile

    log_dir = tempfile.mkdtemp(prefix="ref_symmetry_")
    runner = RefRunner(
        env, train_cfg(seed, torch_point_mass_symmetry), log_dir=log_dir, device="cpu"
    )
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


def run_ours(seed: int, iterations: int, num_envs: int = 64) -> list[float]:
    import jax

    from rsl_rl_tpu.env import PointMass
    from rsl_rl_tpu.runners import OnPolicyRunner

    env = PointMass(num_envs=num_envs, max_episode_length=MAX_EPISODE_LENGTH)
    cfg = train_cfg(seed, "rsl_rl_tpu.env.toy:point_mass_symmetry")
    runner = OnPolicyRunner(env, cfg, log_dir=None)
    ts, cs = runner.train_state, runner.collect_state

    curve = []
    for _ in range(iterations):
        ts, cs, rollout, cm = runner._collect(ts, cs)
        ts, cs, um = runner._update(ts, cs, rollout)
        m = jax.device_get(cm)
        count = float(m["ep_count"])
        curve.append(float(m["ep_reward_sum"]) / count if count > 0 else float("nan"))
    return curve


# --------------------------------------------------------------------------


def summarize(curves: dict, checkpoints=(50, 100, 200, 300)) -> list[dict]:
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
                row[name] = round(float(np.mean(vals)), 2)
                row[name + "_std"] = round(float(np.std(vals)), 2)
        rows.append(row)
    return rows


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=300)
    p.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--skip-reference", action="store_true")
    p.add_argument("--out", type=str, default="benchmarks/results/parity_symmetry.json")
    args = p.parse_args()

    curves = {"rsl_rl_tpu": [], "reference": []}
    timings = {}
    for seed in args.seeds:
        t0 = time.time()
        curves["rsl_rl_tpu"].append(run_ours(seed, args.iterations, args.num_envs))
        timings.setdefault("rsl_rl_tpu_s", []).append(round(time.time() - t0, 1))
        print(f"[ours seed={seed}] done in {timings['rsl_rl_tpu_s'][-1]}s", flush=True)

    if not args.skip_reference and os.path.isdir("/root/reference"):
        for seed in args.seeds:
            t0 = time.time()
            curves["reference"].append(run_reference(seed, args.iterations, args.num_envs))
            timings.setdefault("reference_s", []).append(round(time.time() - t0, 1))
            print(f"[reference seed={seed}] done in {timings['reference_s'][-1]}s", flush=True)

    rows = summarize(curves)
    out = {
        "task": f"pointmass_symmetry_aug_{args.num_envs}envs",
        "iterations": args.iterations,
        "seeds": args.seeds,
        "checkpoints": rows,
        "timings": timings,
        "curves": curves,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps(rows, indent=2))
    print(f"full curves -> {args.out}")


if __name__ == "__main__":
    main()
