"""Distillation learning-curve parity: rsl_rl_tpu vs the upstream reference.

Extends the PPO study (``parity_pendulum.py``) to the teacher-student mode:
ONE teacher — a PPO ActorCritic trained by THIS framework on Pendulum — is
handed to both frameworks through the checkpoint bridge
(``utils.torch_deploy.export_torch_state_dict`` produces the reference's own
RL-checkpoint layout, which its ``StudentTeacher.load_state_dict`` remaps
``actor -> teacher``; our ``DistillationRunner.load`` performs the same remap
on the orbax checkpoint), and a fresh student is distilled against it in each
framework with identical hyperparameters on the identical task. Records per
iteration: the behavior-cloning loss and the mean completed-episode reward of
the (student-driven) rollouts.

Writes benchmarks/results/parity_distillation.json and prints a checkpoint
table.

Usage:
    python benchmarks/parity_distillation.py [--iterations 200] [--seeds 1 2 3]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.parity_pendulum import (
    MAX_EPISODE_LENGTH,
    make_torch_pendulum,
    train_cfg,
)

TEACHER_ITERATIONS = 400


def distill_cfg(seed: int, recurrent: bool = False) -> dict:
    """One distillation config for both frameworks (same class names).

    ``recurrent``: a GRU student on the partially observable obs set cloning
    a feedforward teacher that sees the privileged (full-state) set — the
    canonical sim-to-real distillation setup."""
    policy = {
        "class_name": "StudentTeacher",
        "student_hidden_dims": [128, 128],
        "teacher_hidden_dims": [128, 128],  # must match the RL actor
        "student_obs_normalization": True,
        "teacher_obs_normalization": True,
        "init_noise_std": 0.1,
    }
    obs_groups = {"policy": ["policy"], "teacher": ["policy"]}
    if recurrent:
        policy.update(
            {
                "class_name": "StudentTeacherRecurrent",
                "rnn_type": "gru",
                "rnn_hidden_dim": 64,
                "student_hidden_dims": [128],
            }
        )
        obs_groups = {"policy": ["policy"], "teacher": ["privileged"]}
    return {
        "num_steps_per_env": 24,
        "save_interval": 10_000,
        "seed": seed,
        "obs_groups": obs_groups,
        "logger": "tensorboard",
        "policy": policy,
        "algorithm": {
            "class_name": "Distillation",
            "learning_rate": 1.0e-3,
            "gradient_length": 8,
            "num_learning_epochs": 1,
            "max_grad_norm": 1.0,
        },
    }


# --------------------------------------------------------------------------
# the shared teacher
# --------------------------------------------------------------------------


def train_teacher(
    tmp_dir: str, num_envs: int = 64, privileged: bool = False
) -> tuple[str, str, float]:
    """Train the RL teacher with THIS framework, save it in BOTH checkpoint
    formats; returns (ours_ckpt, reference_ckpt, teacher_reward). With
    ``privileged`` the teacher trains on the full-state obs group of
    ``PrivilegedPendulum`` (the set the distilled student will NOT see)."""
    import jax
    import torch

    from rsl_rl_tpu.env import Pendulum, PrivilegedPendulum
    from rsl_rl_tpu.runners import OnPolicyRunner
    from rsl_rl_tpu.utils.torch_deploy import export_torch_state_dict

    cfg = train_cfg(seed=0)
    if privileged:
        env = PrivilegedPendulum(num_envs=num_envs, max_episode_length=MAX_EPISODE_LENGTH)
        cfg["obs_groups"] = {"policy": ["privileged"], "critic": ["privileged"]}
    else:
        env = Pendulum(num_envs=num_envs, max_episode_length=MAX_EPISODE_LENGTH)
    runner = OnPolicyRunner(env, cfg, log_dir=None)
    ts, cs = runner.train_state, runner.collect_state
    reward, count = 0.0, 0.0
    for it in range(TEACHER_ITERATIONS):
        ts, cs, rollout, cm = runner._collect(ts, cs)
        ts, cs, um = runner._update(ts, cs, rollout)
        if it >= TEACHER_ITERATIONS - 20:  # trailing window for the report
            m = jax.device_get(cm)
            reward += float(m["ep_reward_sum"])
            count += float(m["ep_count"])
    runner.train_state = ts
    teacher_reward = reward / max(count, 1.0)

    ours_path = os.path.join(tmp_dir, "teacher.ckpt")
    runner.save(ours_path)

    ref_path = os.path.join(tmp_dir, "teacher_ref.pt")
    torch.save(
        {
            "model_state_dict": export_torch_state_dict(
                runner.alg.policy, ts.policy
            ),
            "optimizer_state_dict": {},
            "iter": TEACHER_ITERATIONS,
            "infos": None,
        },
        ref_path,
    )
    return ours_path, ref_path, teacher_reward


# --------------------------------------------------------------------------
# the two students
# --------------------------------------------------------------------------


def run_ours(seed: int, iterations: int, teacher_ckpt: str, num_envs: int = 64,
             recurrent: bool = False):
    import jax

    from rsl_rl_tpu.env import Pendulum, PrivilegedPendulum
    from rsl_rl_tpu.runners import DistillationRunner

    env_cls = PrivilegedPendulum if recurrent else Pendulum
    env = env_cls(num_envs=num_envs, max_episode_length=MAX_EPISODE_LENGTH)
    runner = DistillationRunner(env, distill_cfg(seed, recurrent), log_dir=None)
    runner.load(teacher_ckpt, load_optimizer=False)
    assert runner.alg.policy.loaded_teacher
    ts, cs = runner.train_state, runner.collect_state

    rewards, losses = [], []
    for _ in range(iterations):
        ts, cs, rollout, cm = runner._collect(ts, cs)
        ts, cs, um = runner._update(ts, cs, rollout)
        m = jax.device_get({**cm, **um})
        count = float(m["ep_count"])
        rewards.append(float(m["ep_reward_sum"]) / count if count > 0 else float("nan"))
        losses.append(float(m["Loss/behavior"]))
    return rewards, losses


def run_reference(seed: int, iterations: int, teacher_pt: str, num_envs: int = 64,
                  recurrent: bool = False):
    from benchmarks._reference_shim import install_reference_shims

    install_reference_shims()
    import torch
    import rsl_rl.runners.on_policy_runner as ref_runner_mod
    from rsl_rl.runners import DistillationRunner as RefDistillationRunner

    ref_runner_mod.store_code_state = lambda *a, **k: []
    torch.manual_seed(seed)

    env = make_torch_pendulum(
        num_envs, partially_observable=recurrent, privileged_group=recurrent
    )
    import tempfile

    log_dir = tempfile.mkdtemp(prefix="ref_distill_")
    runner = RefDistillationRunner(
        env, distill_cfg(seed, recurrent), log_dir=log_dir, device="cpu"
    )
    runner.save = lambda *a, **k: None
    runner.load(teacher_pt, load_optimizer=False)
    assert runner.alg.policy.loaded_teacher

    # the reference keeps loss_dict local to learn(); capture it off update()
    captured = {}
    orig_update = runner.alg.update

    def update_and_capture():
        loss_dict = orig_update()
        captured.update(loss_dict)
        return loss_dict

    runner.alg.update = update_and_capture

    rewards, losses = [], []
    for _ in range(iterations):
        before = len(env.finished_returns)
        runner.learn(1)
        new = env.finished_returns[before:]
        rewards.append(sum(new) / len(new) if new else float("nan"))
        losses.append(float(captured.get("behavior", float("nan"))))
    return rewards, losses


# --------------------------------------------------------------------------


def summarize(curves: dict, checkpoints=(25, 50, 100, 150, 200)) -> list[dict]:
    import numpy as np

    rows = []
    for it in checkpoints:
        row = {"iteration": it}
        for name, runs in curves.items():
            vals = []
            for c in runs:
                if it <= len(c):
                    window = [v for v in c[max(0, it - 10) : it] if not math.isnan(v)]
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
    p.add_argument("--iterations", type=int, default=200)
    p.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--skip-reference", action="store_true")
    p.add_argument(
        "--recurrent", action="store_true",
        help="GRU student on the PO obs set cloning a privileged ff teacher",
    )
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()
    if args.out is None:
        suffix = "_recurrent" if args.recurrent else ""
        args.out = f"benchmarks/results/parity_distillation{suffix}.json"

    import tempfile

    tmp = tempfile.mkdtemp(prefix="distill_teacher_")
    t0 = time.time()
    ours_ckpt, ref_ckpt, teacher_reward = train_teacher(
        tmp, args.num_envs, privileged=args.recurrent
    )
    print(
        f"[teacher] trained {TEACHER_ITERATIONS} iters in {time.time() - t0:.0f}s,"
        f" trailing mean episode reward {teacher_reward:.1f}",
        flush=True,
    )

    curves = {"rsl_rl_tpu": [], "reference": []}
    loss_curves = {"rsl_rl_tpu": [], "reference": []}
    timings = {}

    for seed in args.seeds:
        t0 = time.time()
        rewards, losses = run_ours(
            seed, args.iterations, ours_ckpt, args.num_envs, args.recurrent
        )
        curves["rsl_rl_tpu"].append(rewards)
        loss_curves["rsl_rl_tpu"].append(losses)
        timings.setdefault("rsl_rl_tpu_s", []).append(round(time.time() - t0, 1))
        print(f"[ours seed={seed}] done in {timings['rsl_rl_tpu_s'][-1]}s", flush=True)

    if not args.skip_reference and os.path.isdir("/root/reference"):
        for seed in args.seeds:
            t0 = time.time()
            rewards, losses = run_reference(
                seed, args.iterations, ref_ckpt, args.num_envs, args.recurrent
            )
            curves["reference"].append(rewards)
            loss_curves["reference"].append(losses)
            timings.setdefault("reference_s", []).append(round(time.time() - t0, 1))
            print(f"[reference seed={seed}] done in {timings['reference_s'][-1]}s", flush=True)

    checkpoints = (25, 50, 100, 150, 200)
    if args.iterations not in checkpoints:
        checkpoints += (args.iterations,)
    rows = summarize(curves, checkpoints=checkpoints)
    task = "pendulum_distillation" + ("_recurrent_privileged" if args.recurrent else "")
    out = {
        "task": f"{task}_{args.num_envs}envs",
        "teacher_iterations": TEACHER_ITERATIONS,
        "teacher_trailing_reward": round(teacher_reward, 1),
        "iterations": args.iterations,
        "seeds": args.seeds,
        "checkpoints": rows,
        "timings": timings,
        "reward_curves": curves,
        "loss_curves": loss_curves,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps(rows, indent=2))
    print(f"full curves -> {args.out}")


if __name__ == "__main__":
    main()
