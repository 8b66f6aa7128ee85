"""Train PPO on REAL MuJoCo (CPU simulator) through the host-env path.

Unlike ``train_mjx.py`` (which needs ``mujoco-mjx``, not installable in this
repo's CI image), this example runs TODAY wherever base ``mujoco`` is
installed: the 5-link swing-up task of the throughput headline
(``env/nlink.py``) backed by the actual simulator (``env/mujoco_host.py``,
dynamics-identity proven by ``tests/test_mujoco_conformance.py``), trained
through the standard ``OnPolicyRunner`` hybrid collection loop — jitted
policy/update on the accelerator, ``mj_step`` on host — the reference's
external-simulator deployment shape (reference
runners/on_policy_runner.py:103-107).

Usage::

    python examples/train_mujoco_host.py [--num-envs 64] [--iterations 150]
                                         [--num-links 5] [--log-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--iterations", type=int, default=150)
    p.add_argument("--num-links", type=int, default=5)
    p.add_argument("--log-dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    from rsl_rl_tpu.env import MuJoCoNLinkEnv
    from rsl_rl_tpu.runners import OnPolicyRunner

    env = MuJoCoNLinkEnv(
        num_envs=args.num_envs, num_links=args.num_links, seed=args.seed
    )
    cfg = {
        "num_steps_per_env": 24,
        "save_interval": 100,
        "seed": args.seed,
        "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
        "logger": "tensorboard",
        "policy": {
            "class_name": "ActorCritic",
            "activation": "elu",
            "actor_hidden_dims": [128, 128],
            "critic_hidden_dims": [128, 128],
            "actor_obs_normalization": True,
            "critic_obs_normalization": True,
        },
        "algorithm": {
            "class_name": "PPO",
            "learning_rate": 1.0e-3,
            "schedule": "adaptive",
            "desired_kl": 0.01,
            "num_learning_epochs": 5,
            "num_mini_batches": 4,
        },
    }
    runner = OnPolicyRunner(env, cfg, log_dir=args.log_dir)
    runner.learn(args.iterations, init_at_random_ep_len=True)
    print(
        "Trained on real MuJoCo:"
        f" {args.iterations} iterations x {args.num_envs} envs"
        f" x {cfg['num_steps_per_env']} steps through the host-env loop."
    )


if __name__ == "__main__":
    main()
