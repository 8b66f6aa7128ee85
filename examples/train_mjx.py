"""End-to-end MJX training conformance drive (docs/mjx_conformance.md §3-4).

Requires ``mujoco`` + ``mujoco-mjx`` (not bundled with this repo's CI image).
Trains PPO on a real MJX cart-pole *balance* task — pole starts near upright,
reward for keeping it there — through the standard ``OnPolicyRunner``, then
round-trips a checkpoint into an inference policy. With ``--bench`` it prints
aggregate env-steps/s using the same ``device_get``-fenced methodology as
bench.py.

Usage::

    python examples/train_mjx.py [--num-envs 1024] [--iterations 200] [--bench]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

CARTPOLE_XML = """
<mujoco model="cartpole">
  <option timestep="0.02"/>
  <worldbody>
    <body name="cart" pos="0 0 1">
      <joint name="slider" type="slide" axis="1 0 0" range="-2 2"/>
      <geom type="box" size="0.2 0.1 0.05" mass="1"/>
      <body name="pole" pos="0 0 0">
        <joint name="hinge" type="hinge" axis="0 1 0" range="-3.14 3.14"/>
        <geom type="capsule" fromto="0 0 0 0 0 0.6" size="0.04" mass="0.3"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor joint="slider" gear="30"/></actuator>
</mujoco>
"""


def make_env(num_envs: int, episode_length: int = 500):
    import mujoco

    from rsl_rl_tpu.env.mjx_env import MJXEnv

    model = mujoco.MjModel.from_xml_string(CARTPOLE_XML)

    def obs_fn(mx, d):
        return {"policy": jnp.concatenate([d.qpos, d.qvel])}

    def reward_fn(mx, d, a):
        upright = jnp.cos(d.qpos[1])  # 1 when the pole is up
        centered = -0.05 * jnp.square(d.qpos[0])
        effort = -0.001 * jnp.sum(jnp.square(a))
        return upright + centered + effort

    def done_fn(mx, d):
        return jnp.abs(d.qpos[1]) > 0.9  # pole fell

    return MJXEnv(
        model,
        num_envs=num_envs,
        episode_length=episode_length,
        obs_fn=obs_fn,
        reward_fn=reward_fn,
        done_fn=done_fn,
        reset_noise_scale=0.05,
    )


def train_cfg() -> dict:
    return {
        "num_steps_per_env": 24,
        "save_interval": 100,
        "seed": 1,
        "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
        "logger": "tensorboard",
        "policy": {
            "class_name": "ActorCritic",
            "activation": "elu",
            "actor_hidden_dims": [256, 256],
            "critic_hidden_dims": [256, 256],
            "actor_obs_normalization": True,
            "critic_obs_normalization": True,
        },
        "algorithm": {
            "class_name": "PPO",
            "learning_rate": 1e-3,
            "schedule": "adaptive",
            "desired_kl": 0.01,
            "gamma": 0.99,
            "lam": 0.95,
            "entropy_coef": 0.005,
        },
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-envs", type=int, default=1024)
    parser.add_argument("--iterations", type=int, default=200)
    parser.add_argument("--log-dir", type=str, default="logs/mjx_cartpole")
    parser.add_argument("--bench", action="store_true")
    args = parser.parse_args()

    from rsl_rl_tpu.runners import OnPolicyRunner

    env = make_env(args.num_envs)
    runner = OnPolicyRunner(env, train_cfg(), log_dir=args.log_dir)

    if args.bench:
        ts, cs = runner.train_state, runner.collect_state
        # warmup/compile, then device_get-fenced timing (bench.py methodology)
        for _ in range(3):
            ts, cs, rollout, cm = runner._collect(ts, cs)
            ts, cs, um = runner._update(ts, cs, rollout)
        jax.device_get(um["Loss/kl"])
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            ts, cs, rollout, cm = runner._collect(ts, cs)
            ts, cs, um = runner._update(ts, cs, rollout)
        jax.device_get(um["Loss/kl"])
        dt = (time.perf_counter() - t0) / iters
        print(
            f"MJX cartpole: {args.num_envs * 24 / dt:,.0f} env-steps/s"
            f" ({dt * 1e3:.2f} ms/iter at {args.num_envs} envs)"
        )
        return

    # -------- conformance: train, then checkpoint -> inference round-trip
    runner.learn(args.iterations)

    from rsl_rl_tpu.utils.checkpoint import latest_checkpoint

    fresh = OnPolicyRunner(make_env(args.num_envs), train_cfg(), log_dir=None)
    fresh.load(latest_checkpoint(args.log_dir))
    policy = fresh.get_inference_policy()

    eval_env = make_env(256)
    state, obs = eval_env.reset(jax.random.PRNGKey(42))
    total = jnp.zeros((256,))
    step = jax.jit(eval_env.step)
    for _ in range(200):
        state, obs, rew, done, extras = step(state, policy(obs))
        total = total + rew
    mean_return = float(total.mean())
    print(f"deterministic eval return over 200 steps: {mean_return:.1f}")
    # an untrained policy scores ~<60 here (pole falls, restarts); trained
    # balance holds upright (reward ~1/step)
    print("CONFORMANCE PASS" if mean_return > 120.0 else "CONFORMANCE FAIL")


if __name__ == "__main__":
    main()
