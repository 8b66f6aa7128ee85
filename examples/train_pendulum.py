"""Train PPO on the built-in JAX Pendulum env.

Usage::

    python examples/train_pendulum.py [--num-envs 4096] [--iterations 200]

Runs on whatever devices JAX exposes (TPU chip(s), or CPU with
``JAX_PLATFORMS=cpu``); multi-device execution shards the environments over a
data-parallel mesh automatically.
"""

from __future__ import annotations

import argparse
import os
import sys

# allow running from a repo checkout without installing the package
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rsl_rl_tpu.env import Pendulum
from rsl_rl_tpu.runners import OnPolicyRunner


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-envs", type=int, default=4096)
    parser.add_argument("--iterations", type=int, default=200)
    parser.add_argument("--log-dir", type=str, default="logs/pendulum")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument(
        "--resume", action="store_true",
        help="resume from the newest checkpoint in --log-dir, if any",
    )
    args = parser.parse_args()

    train_cfg = {
        "num_steps_per_env": 24,
        "save_interval": 50,
        "seed": args.seed,
        "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
        "logger": "tensorboard",
        "policy": {
            "class_name": "ActorCritic",
            "activation": "elu",
            "actor_obs_normalization": True,
            "critic_obs_normalization": True,
            "actor_hidden_dims": [256, 256, 256],
            "critic_hidden_dims": [256, 256, 256],
            "init_noise_std": 1.0,
        },
        "algorithm": {
            "class_name": "PPO",
            "learning_rate": 1e-3,
            "num_learning_epochs": 5,
            "num_mini_batches": 4,
            "schedule": "adaptive",
            "desired_kl": 0.01,
            "entropy_coef": 0.01,
            "gamma": 0.99,
            "lam": 0.95,
            "max_grad_norm": 1.0,
        },
    }

    env = Pendulum(num_envs=args.num_envs)
    runner = OnPolicyRunner(env, train_cfg, log_dir=args.log_dir)
    if args.resume and runner.load_latest():
        print(f"resumed from iteration {runner.current_learning_iteration}")
    runner.learn(args.iterations)


if __name__ == "__main__":
    main()
