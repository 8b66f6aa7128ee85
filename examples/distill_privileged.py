"""Privileged-teacher distillation on the domain-randomized physics env.

The canonical sim-to-real recipe (reference README.md:6-10, workflow of
reference distillation_runner.py + student_teacher.py:182-197): train an RL
teacher that SEES the per-episode randomized link masses
(``DomainRandomizedNLink``'s ``"privileged"`` obs group), save its
checkpoint, then load it into a ``DistillationRunner`` — the checkpoint
remap turns the trained actor into the frozen teacher — and distill a
student that only sees the base proprioceptive observation.

This is the runner-API version of ``benchmarks/convergence_distill_tpu.py``
(which drives the algorithm objects directly); here the teacher transfer
goes through the on-disk checkpoint exactly as a downstream user's would.

Usage::

    python examples/distill_privileged.py [--num-envs 1024]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rsl_rl_tpu.env import DomainRandomizedNLink
from rsl_rl_tpu.runners import DistillationRunner, OnPolicyRunner


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-envs", type=int, default=1024)
    parser.add_argument("--teacher-iterations", type=int, default=300)
    parser.add_argument("--distill-iterations", type=int, default=150)
    parser.add_argument("--log-dir", type=str, default="logs/distill_privileged")
    args = parser.parse_args()

    # ---- phase 1: RL teacher on the privileged observation (masses visible)
    teacher_cfg = {
        "num_steps_per_env": 24,
        "save_interval": 100,
        "seed": 1,
        "obs_groups": {"policy": ["privileged"], "critic": ["privileged"]},
        "logger": "tensorboard",
        "policy": {
            "class_name": "ActorCritic",
            "actor_obs_normalization": True,
            "critic_obs_normalization": True,
            "actor_hidden_dims": [256, 256, 256],
            "critic_hidden_dims": [256, 256, 256],
            "noise_std_floor": 0.01,
            "dtype": "bfloat16",
        },
        "algorithm": {"class_name": "PPO", "schedule": "adaptive", "desired_kl": 0.01},
    }
    teacher_dir = os.path.join(args.log_dir, "teacher")
    env = DomainRandomizedNLink(num_envs=args.num_envs, num_links=5)
    teacher_runner = OnPolicyRunner(env, teacher_cfg, log_dir=teacher_dir)
    teacher_runner.learn(args.teacher_iterations)
    teacher_ckpt = os.path.join(
        teacher_dir, f"model_{teacher_runner.current_learning_iteration}.ckpt"
    )

    # ---- phase 2: distill into a student that sees only the base obs.
    # The student's "policy" set is the base observation; the frozen teacher
    # evaluates on the "teacher" set = the privileged group it was trained on.
    student_cfg = {
        "num_steps_per_env": 24,
        "save_interval": 100,
        "seed": 2,
        "obs_groups": {"policy": ["policy"], "teacher": ["privileged"]},
        "logger": "tensorboard",
        "policy": {
            "class_name": "StudentTeacher",
            "student_obs_normalization": True,
            "teacher_obs_normalization": True,
            "student_hidden_dims": [256, 256, 256],
            "teacher_hidden_dims": [256, 256, 256],
            "dtype": "bfloat16",
        },
        "algorithm": {
            "class_name": "Distillation",
            "learning_rate": 1e-3,
            "gradient_length": 15,
            "num_learning_epochs": 1,
        },
    }
    student_runner = DistillationRunner(
        DomainRandomizedNLink(num_envs=args.num_envs, num_links=5),
        student_cfg,
        log_dir=os.path.join(args.log_dir, "student"),
    )
    student_runner.load(teacher_ckpt)  # remaps actor -> teacher, not a resume
    student_runner.learn(args.distill_iterations)


if __name__ == "__main__":
    main()
