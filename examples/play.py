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
import jax.numpy as jnp

from rsl_rl_tpu.runners import OnPolicyRunner
from rsl_rl_tpu.utils.config import load_train_cfg
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


def evaluate(env, policy, ps, num_steps: int, key, random_actions: bool = False):
    """Jitted evaluation rollout.

    Returns ``(returns_sum, returns_count, running_cum)`` where
    ``returns_sum / returns_count`` is the mean completed-episode return.
    """

    def program(key):
        k_reset, k_act = jax.random.split(key)
        state, obs = env.reset(k_reset)
        carry0 = policy.initial_carry(env.num_envs)
        cum0 = jnp.zeros((env.num_envs,), jnp.float32)

        def step(c, k):
            state, obs, pcarry, cum, r_sum, r_cnt, r_min, r_max = c
            if random_actions:
                action = jax.random.normal(k, (env.num_envs, env.num_actions))
            else:
                action, pcarry = policy.act_inference(ps, obs, pcarry)
            state, obs, rew, done, _ = env.step(state, action)
            cum = cum + rew
            r_sum = r_sum + jnp.sum(jnp.where(done, cum, 0.0))
            r_cnt = r_cnt + jnp.sum(done)
            r_min = jnp.minimum(r_min, jnp.where(done, cum, jnp.inf).min())
            r_max = jnp.maximum(r_max, jnp.where(done, cum, -jnp.inf).max())
            cum = jnp.where(done, 0.0, cum)
            pcarry = policy.reset_carry(pcarry, done)
            return (state, obs, pcarry, cum, r_sum, r_cnt, r_min, r_max), None

        zero = jnp.zeros((), jnp.float32)
        init = (state, obs, carry0, cum0, zero, zero,
                jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(-jnp.inf, jnp.float32))
        (final, _) = jax.lax.scan(step, init, jax.random.split(k_act, num_steps))
        _, _, _, _, r_sum, r_cnt, r_min, r_max = final
        return r_sum, r_cnt, r_min, r_max

    return jax.device_get(jax.jit(program)(key))


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
    r_sum, r_cnt, r_min, r_max = evaluate(env, policy, ps, args.steps, key)
    if r_cnt == 0:
        print(f"no episode completed within {args.steps} steps — increase --steps")
        return
    print(
        f"policy : {int(r_cnt)} episodes | mean return {r_sum / r_cnt:10.2f}"
        f" | min {r_min:10.2f} | max {r_max:10.2f}"
    )
    if not args.no_baseline:
        b_sum, b_cnt, b_min, b_max = evaluate(
            env, policy, ps, args.steps, key, random_actions=True
        )
        if b_cnt > 0:
            print(
                f"random : {int(b_cnt)} episodes | mean return {b_sum / b_cnt:10.2f}"
                f" | min {b_min:10.2f} | max {b_max:10.2f}"
            )


if __name__ == "__main__":
    main()
