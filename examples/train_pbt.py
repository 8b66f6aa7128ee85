"""Population-based training: exploit/explore over the vmapped seed axis.

Usage::

    python examples/train_pbt.py [--seeds 8] [--num-envs 256] \
        [--iterations 200] [--exploit-interval 20]

Classic PBT [Jaderberg et al. 2017, arXiv:1711.09846] runs a population of
workers under an external scheduler and moves weights between them through
checkpoint files. Here the whole population trains as ONE jitted program
(``runners/pbt.py`` on top of the multiseed vmap transform): every
``exploit_interval`` iterations the bottom quartile (by smoothed episode
reward) copies a random top-quartile member's full train state — a gather
inside the program — and log-uniform-perturbs its learning rate. The
per-seed fitness, learning rates, and exploit count stream out with the
ordinary metrics.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from rsl_rl_tpu.env import Pendulum
from rsl_rl_tpu.modules import ActorCritic
from rsl_rl_tpu.algorithms.ppo import PPO
from rsl_rl_tpu.runners.pbt import make_pbt_train


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, default=8)
    parser.add_argument("--num-envs", type=int, default=256)
    parser.add_argument("--iterations", type=int, default=200)
    parser.add_argument("--exploit-interval", type=int, default=20)
    parser.add_argument("--key", type=int, default=0)
    args = parser.parse_args()

    env = Pendulum(num_envs=args.num_envs)
    _, obs = env.reset(jax.random.PRNGKey(0))
    groups = {"policy": ["policy"], "critic": ["policy"]}
    policy = ActorCritic(
        obs, groups, env.num_actions,
        actor_hidden_dims=[256, 256], critic_hidden_dims=[256, 256],
        actor_obs_normalization=True, critic_obs_normalization=True,
    )
    alg = PPO(policy, schedule="adaptive", desired_kl=0.01)

    init, train_step = make_pbt_train(
        alg, env, num_steps_per_env=24, num_seeds=args.seeds,
        exploit_interval=args.exploit_interval,
    )
    ts, cs, pbt = init(jax.random.PRNGKey(args.key))

    t0 = time.time()
    for it in range(1, args.iterations + 1):
        ts, cs, pbt, metrics = train_step(ts, cs, pbt)
        if it % 10 == 0 or it == 1:
            fit = np.asarray(jax.device_get(metrics["PBT/fitness"]))
            lr = np.asarray(jax.device_get(metrics["PBT/lr"]))
            print(
                f"it {it:4d} | fitness best {fit.max():8.2f} "
                f"median {np.median(fit):8.2f} worst {fit.min():8.2f} | "
                f"lr [{lr.min():.2e}, {lr.max():.2e}] | "
                f"exploits {int(metrics['PBT/exploits'])} | "
                f"{time.time() - t0:6.1f}s"
            )

    fit = np.asarray(jax.device_get(metrics["PBT/fitness"]))
    print(f"best seed: {int(np.argmax(fit))} (fitness {fit.max():.2f})")


if __name__ == "__main__":
    main()
