"""Domain-randomized training with an asymmetric (privileged) critic.

Per-episode physics randomization is the sim-to-real workhorse of the
reference's downstream simulators (Isaac Lab et al.). This example trains
PPO on ``DomainRandomizedNLink`` — every episode each env draws fresh
log-uniform link-mass scales — with the standard asymmetric setup:

- the ACTOR sees only the proprioceptive observation (it must be robust to
  the unobserved plant variation — the point of DR),
- the CRITIC sees the ``"privileged"`` group, which appends
  ``log(mass_scale)`` (value estimation is easier with the true plant
  parameters; the critic is discarded at deployment).

The same privileged group feeds ``StudentTeacher`` distillation
(``examples/distill_student.py``): train a teacher on ``privileged``, then
distill into a student that only sees ``policy``.

Usage::

    python examples/train_domain_randomized.py [--num-envs 4096]
        [--iterations 500] [--mass-range 0.5 2.0] [--log-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--iterations", type=int, default=500)
    p.add_argument("--num-links", type=int, default=5)
    p.add_argument("--mass-range", type=float, nargs=2, default=[0.5, 2.0])
    p.add_argument("--log-dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    from rsl_rl_tpu.env import DomainRandomizedNLink
    from rsl_rl_tpu.runners import OnPolicyRunner

    env = DomainRandomizedNLink(
        num_envs=args.num_envs,
        num_links=args.num_links,
        mass_scale_range=tuple(args.mass_range),
    )
    cfg = {
        "num_steps_per_env": 24,
        "save_interval": 100,
        "seed": args.seed,
        # asymmetric actor-critic: actor blind to the scales, critic not
        "obs_groups": {"policy": ["policy"], "critic": ["privileged"]},
        "logger": "tensorboard",
        "policy": {
            "class_name": "ActorCritic",
            "activation": "elu",
            "actor_hidden_dims": [256, 256, 256],
            "critic_hidden_dims": [256, 256, 256],
            "actor_obs_normalization": True,
            "critic_obs_normalization": True,
            "dtype": "bfloat16",  # TPU-native mode (README "Throughput")
        },
        "algorithm": {
            "class_name": "PPO",
            "learning_rate": 1.0e-3,
            "schedule": "adaptive",
            "desired_kl": 0.01,
            "num_learning_epochs": 5,
            "num_mini_batches": "auto",  # measured-knee selection rule
        },
    }
    runner = OnPolicyRunner(env, cfg, log_dir=args.log_dir)
    runner.learn(args.iterations, init_at_random_ep_len=True)


if __name__ == "__main__":
    main()
