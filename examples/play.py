"""Evaluate a trained checkpoint: deterministic policy rollout + episode stats.

The deployment companion to the train scripts (the reference ecosystem's
``play.py`` convention; reference ``get_inference_policy``
on_policy_runner.py:326-330)::

    python examples/play.py --ckpt logs/pendulum/model_199.ckpt \
        [--env Pendulum] [--num-envs 64] [--steps 400] [--config cfg.yaml]

The whole evaluation is ONE jitted ``lax.scan`` — policy forward, env step,
hidden-carry resets, and episode-return bookkeeping all compile into a single
XLA program, so it runs at collection speed even over a tunneled TPU (a
Python per-step loop would pay a host round-trip per step). Prints the mean /
std / min / max of completed-episode returns, and a random-action baseline
with the same budget for context.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from rsl_rl_tpu.runners import OnPolicyRunner
from rsl_rl_tpu.utils.config import load_train_cfg
from rsl_rl_tpu.utils.evaluation import evaluate_policy
from rsl_rl_tpu.utils.registry import resolve

# matches examples/train_pendulum.py — used when --config is not given
DEFAULT_CFG = {
    "num_steps_per_env": 24,
    "save_interval": 50,
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
    "algorithm": {"class_name": "PPO"},
}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--env", type=str, default="Pendulum")
    parser.add_argument("--num-envs", type=int, default=64)
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--config", type=str, default=None,
        help="training config YAML (policy block must match the checkpoint);"
        " defaults to the examples/train_pendulum.py config",
    )
    parser.add_argument(
        "--no-baseline", action="store_true",
        help="skip the random-action baseline rollout",
    )
    args = parser.parse_args()

    cfg = load_train_cfg(args.config) if args.config else dict(DEFAULT_CFG)
    env = resolve("env", args.env)(num_envs=args.num_envs)
    runner = OnPolicyRunner(env, cfg, log_dir=None)
    runner.load(args.ckpt)

    policy, ps = runner.alg.policy, runner.train_state.policy
    key = jax.random.PRNGKey(args.seed)
    m = evaluate_policy(env, policy, ps, args.steps, key)
    if m["Eval/episode_count"] == 0:
        print(f"no episode completed within {args.steps} steps — increase --steps")
        return
    print(
        f"policy : {int(m['Eval/episode_count'])} episodes | mean return"
        f" {m['Eval/mean_reward']:10.2f} | min {m['Eval/min_return']:10.2f}"
        f" | max {m['Eval/max_return']:10.2f}"
    )
    if not args.no_baseline:
        b = evaluate_policy(env, policy, ps, args.steps, key, random_actions=True)
        if b["Eval/episode_count"] > 0:
            print(
                f"random : {int(b['Eval/episode_count'])} episodes | mean return"
                f" {b['Eval/mean_reward']:10.2f} | min {b['Eval/min_return']:10.2f}"
                f" | max {b['Eval/max_return']:10.2f}"
            )


if __name__ == "__main__":
    main()
