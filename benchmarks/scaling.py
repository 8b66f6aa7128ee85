"""Data-parallel scaling benchmark: aggregate PPO throughput vs device count.

Measures the BASELINE.md scaling target ("≥80% scaling efficiency, 1 chip ->
N hosts") on whatever devices JAX exposes: for each device count d in
{1, 2, 4, ..., all}, shard ``envs_per_device * d`` environments over a
``Mesh(("data",))`` of d devices and measure fused-iteration throughput.

On a multi-chip slice this reports real scaling; on this image's single chip
it degenerates to the 1-device row (the multi-device *correctness* path is
covered by dryrun_multichip and the CPU-mesh tests instead).

Usage:
    python benchmarks/scaling.py [--envs-per-device 4096] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def measure(num_devices: int, envs_per_device: int, iters: int) -> float:
    from rsl_rl_tpu.algorithms.ppo import PPO
    from rsl_rl_tpu.env import Pendulum
    from rsl_rl_tpu.modules import ActorCritic
    from rsl_rl_tpu.parallel.mesh import data_sharding, make_mesh, replicated, shard_tree

    num_envs = envs_per_device * num_devices
    env = Pendulum(num_envs=num_envs)
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
    ppo = PPO(policy, num_learning_epochs=5, num_mini_batches=4)
    ts = ppo.init_train_state(jax.random.PRNGKey(1), num_envs)
    cs = ppo.init_collect_state(jax.random.PRNGKey(2), env)

    mesh = make_mesh(jax.devices()[:num_devices])
    ts = shard_tree(ts, replicated(mesh))
    cs = shard_tree(cs, data_sharding(mesh))

    collect = ppo.make_collect_fn(env, 24)
    update = ppo.make_update_fn()

    @jax.jit
    def iteration(ts, cs):
        ts, cs, rollout, cm = collect(ts, cs)
        ts, cs, um = update(ts, cs, rollout)
        return ts, cs, um

    for _ in range(3):
        ts, cs, um = iteration(ts, cs)
    jax.device_get(um["Loss/kl"])

    t0 = time.perf_counter()
    for _ in range(iters):
        ts, cs, um = iteration(ts, cs)
    jax.device_get(um["Loss/kl"])
    elapsed = time.perf_counter() - t0
    return num_envs * 24 * iters / elapsed


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs-per-device", type=int, default=4096)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    n_dev = len(jax.devices())
    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    if n_dev not in counts:
        counts.append(n_dev)

    rows = []
    base = None
    for d in counts:
        fps = measure(d, args.envs_per_device, args.iters)
        base = base or fps
        eff = fps / (base * d)
        rows.append({"devices": d, "env_steps_per_s": round(fps), "scaling_efficiency": round(eff, 3)})
        print(json.dumps(rows[-1]), flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/scaling.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
