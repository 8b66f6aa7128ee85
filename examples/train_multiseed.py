"""Train N independent PPO seeds fused into ONE XLA program (jax.vmap).

Usage::

    python examples/train_multiseed.py [--seeds 8] [--num-envs 512] [--iterations 100]

Every iteration runs collect + update for ALL seeds as one batched program
(runners/multiseed.py); the script prints the cross-seed mean +/- std reward
curve — the error band the reference's users produce by launching N separate
processes. Runs on whatever device JAX exposes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from rsl_rl_tpu.algorithms.ppo import PPO
from rsl_rl_tpu.env import Pendulum
from rsl_rl_tpu.modules import ActorCritic
from rsl_rl_tpu.runners.multiseed import make_multiseed_train


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, default=8)
    parser.add_argument("--num-envs", type=int, default=512)
    parser.add_argument("--iterations", type=int, default=100)
    parser.add_argument("--key", type=int, default=0)
    args = parser.parse_args()

    env = Pendulum(num_envs=args.num_envs)
    _, obs = env.reset(jax.random.PRNGKey(0))
    policy = ActorCritic(
        obs,
        {"policy": ["policy"], "critic": ["policy"]},
        env.num_actions,
        actor_hidden_dims=[256, 256, 256],
        critic_hidden_dims=[256, 256, 256],
        actor_obs_normalization=True,
        critic_obs_normalization=True,
    )
    ppo = PPO(policy, schedule="adaptive", desired_kl=0.01)

    init, train_step = make_multiseed_train(ppo, env, 24, args.seeds)
    ts, cs = init(jax.random.PRNGKey(args.key))

    # accumulate episode sums across iterations: episodes only complete every
    # ~max_episode_length/num_steps iterations, so per-iteration counts are
    # sparse
    rew_acc = np.zeros(args.seeds)
    cnt_acc = np.zeros(args.seeds)
    for it in range(args.iterations):
        ts, cs, metrics = train_step(ts, cs)
        rew_acc += np.asarray(metrics["ep_reward_sum"])
        cnt_acc += np.asarray(metrics["ep_count"])
        if (it + 1) % 10 == 0:
            per_seed = rew_acc / np.maximum(cnt_acc, 1)
            print(
                f"iter {it + 1:4d}  reward mean {per_seed.mean():9.2f}"
                f"  +/- {per_seed.std():7.2f}  (n={args.seeds} seeds)"
            )
            rew_acc[:] = 0.0
            cnt_acc[:] = 0.0


if __name__ == "__main__":
    main()
