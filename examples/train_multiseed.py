"""Train N independent PPO seeds fused into ONE XLA program (jax.vmap).

Usage::

    python examples/train_multiseed.py [--seeds 8] [--num-envs 512] \
        [--iterations 100] [--log-dir logs/multiseed]

Every iteration runs collect + update for ALL seeds as one batched program
(``MultiSeedRunner`` over runners/multiseed.py); the console and TensorBoard
carry the cross-seed mean +/- std curves (``Train/mean_reward`` /
``Train/mean_reward_std``) — the error band the reference's users produce by
launching N separate processes. With a log dir the study checkpoints every
``save_interval`` iterations (stacked; bit-identical resume via
``MultiSeedRunner.load``), and the best seed exports to a standard
single-seed checkpoint for deployment.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from rsl_rl_tpu.env import Pendulum
from rsl_rl_tpu.runners import MultiSeedRunner


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, default=8)
    parser.add_argument("--num-envs", type=int, default=512)
    parser.add_argument("--iterations", type=int, default=100)
    parser.add_argument("--key", type=int, default=0)
    parser.add_argument("--log-dir", type=str, default=None)
    args = parser.parse_args()

    cfg = {
        "num_steps_per_env": 24,
        "save_interval": 50,
        "seed": args.key,
        "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
        "logger": "tensorboard",
        "policy": {
            "class_name": "ActorCritic",
            "actor_hidden_dims": [256, 256, 256],
            "critic_hidden_dims": [256, 256, 256],
            "actor_obs_normalization": True,
            "critic_obs_normalization": True,
        },
        "algorithm": {"class_name": "PPO", "schedule": "adaptive", "desired_kl": 0.01},
    }
    env = Pendulum(num_envs=args.num_envs)
    runner = MultiSeedRunner(env, cfg, num_seeds=args.seeds, log_dir=args.log_dir)
    runner.learn(args.iterations)

    if args.log_dir:
        # export the best seed for deployment through OnPolicyRunner.load
        rew, ep_count = runner.seed_rewards()
        if ep_count == 0:
            print(
                "no completed episodes in the trailing window — cannot rank"
                " seeds; train longer before exporting a best seed."
            )
            return
        best = int(np.argmax(rew))
        path = os.path.join(args.log_dir, f"best_seed_{best}.ckpt")
        runner.save_seed(path, best)
        print(f"best seed {best} (reward {rew[best]:.2f}) exported to {path}")


if __name__ == "__main__":
    main()
