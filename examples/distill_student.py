"""Full teacher-student pipeline: train a privileged RL teacher, then distill
it into a student that only sees partial observations.

Mirrors the reference workflow (train with `OnPolicyRunner`, load the RL
checkpoint into a `DistillationRunner`, distill — reference
distillation_runner.py + student_teacher.py checkpoint remapping).

Usage::

    python examples/distill_student.py [--num-envs 1024]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rsl_rl_tpu.env import Pendulum
from rsl_rl_tpu.runners import DistillationRunner, OnPolicyRunner


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-envs", type=int, default=1024)
    parser.add_argument("--teacher-iterations", type=int, default=200)
    parser.add_argument("--distill-iterations", type=int, default=100)
    parser.add_argument("--log-dir", type=str, default="logs/distill")
    args = parser.parse_args()

    # ---- phase 1: RL teacher on the full observation
    teacher_cfg = {
        "num_steps_per_env": 24,
        "save_interval": 100,
        "seed": 1,
        "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
        "logger": "tensorboard",
        "policy": {
            "class_name": "ActorCritic",
            "actor_obs_normalization": True,
            "critic_obs_normalization": True,
            "actor_hidden_dims": [256, 256, 256],
            "critic_hidden_dims": [256, 256, 256],
        },
        "algorithm": {"class_name": "PPO", "schedule": "adaptive", "desired_kl": 0.01},
    }
    teacher_dir = os.path.join(args.log_dir, "teacher")
    env = Pendulum(num_envs=args.num_envs)
    teacher_runner = OnPolicyRunner(env, teacher_cfg, log_dir=teacher_dir)
    teacher_runner.learn(args.teacher_iterations)
    teacher_ckpt = os.path.join(
        teacher_dir, f"model_{teacher_runner.current_learning_iteration}.ckpt"
    )

    # ---- phase 2: distill into a student
    # (the student policy set and the teacher set can differ; here both see
    # "policy" — swap in a partial-obs group for a realistic setup)
    student_cfg = {
        "num_steps_per_env": 24,
        "save_interval": 100,
        "seed": 2,
        "obs_groups": {"policy": ["policy"], "teacher": ["policy"]},
        "logger": "tensorboard",
        "policy": {
            "class_name": "StudentTeacher",
            "student_obs_normalization": True,
            "teacher_obs_normalization": True,
            "student_hidden_dims": [256, 256, 256],
            "teacher_hidden_dims": [256, 256, 256],
        },
        "algorithm": {
            "class_name": "Distillation",
            "learning_rate": 1e-3,
            "gradient_length": 15,
            "num_learning_epochs": 1,
        },
    }
    student_runner = DistillationRunner(
        Pendulum(num_envs=args.num_envs),
        student_cfg,
        log_dir=os.path.join(args.log_dir, "student"),
    )
    student_runner.load(teacher_ckpt)  # remaps actor -> teacher, not a resume
    student_runner.learn(args.distill_iterations)


if __name__ == "__main__":
    main()
