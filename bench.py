"""Throughput benchmark: PPO on 4096 vectorized JAX Pendulum envs.

Measures aggregate env-steps/s of full PPO training iterations (collection +
learning fused into one XLA program), the reference's ``Perf/total_fps``
metric (reference: rsl_rl/runners/on_policy_runner.py:179,209,220), on
whatever devices JAX exposes (one TPU chip under the driver).

Timing methodology: every measured segment ends with a ``jax.device_get`` of a
loss scalar. On the tunneled TPU backend ``block_until_ready`` can return
before device work finishes, so only a value transfer is a trustworthy fence
(a transferred value proves the whole executable ran).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the ratio against the 5M env-steps/s north-star target from
BASELINE.json (which targets a v4-16 pod slice; this runs on a single chip).
"""

from __future__ import annotations

import json
import time

import jax

NUM_ENVS = 4096
NUM_STEPS = 24
WARMUP_ITERS = 3
MEASURE_ITERS = 30
NORTH_STAR = 5_000_000.0  # env-steps/s aggregate on v4-16 (BASELINE.json:5)


def main() -> None:
    from rsl_rl_tpu.algorithms.ppo import PPO
    from rsl_rl_tpu.env import Pendulum
    from rsl_rl_tpu.modules import ActorCritic
    from rsl_rl_tpu.parallel.mesh import data_sharding, make_mesh, replicated, shard_tree

    env = Pendulum(num_envs=NUM_ENVS)
    _, obs = env.reset(jax.random.PRNGKey(0))
    obs_groups = {"policy": ["policy"], "critic": ["policy"]}
    policy = ActorCritic(
        obs,
        obs_groups,
        env.num_actions,
        actor_hidden_dims=[256, 256, 256],
        critic_hidden_dims=[256, 256, 256],
        actor_obs_normalization=True,
        critic_obs_normalization=True,
    )
    ppo = PPO(policy, num_learning_epochs=5, num_mini_batches=4)

    ts = ppo.init_train_state(jax.random.PRNGKey(1), NUM_ENVS)
    cs = ppo.init_collect_state(jax.random.PRNGKey(2), env)
    if len(jax.devices()) > 1:
        mesh = make_mesh()
        ts = shard_tree(ts, replicated(mesh))
        cs = shard_tree(cs, data_sharding(mesh))

    collect = ppo.make_collect_fn(env, NUM_STEPS)
    update = ppo.make_update_fn()

    # cs is not donated: donating it breaks output transfers on the tunneled
    # TPU backend (see OnPolicyRunner)
    @jax.jit
    def iteration(ts, cs):
        ts, cs, rollout, cm = collect(ts, cs)
        ts, cs, um = update(ts, cs, rollout)
        return ts, cs, um

    for _ in range(WARMUP_ITERS):
        ts, cs, um = iteration(ts, cs)
    jax.device_get(um["Loss/kl"])  # fence: forces all warmup work to finish

    start = time.perf_counter()
    for _ in range(MEASURE_ITERS):
        ts, cs, um = iteration(ts, cs)
    jax.device_get(um["Loss/kl"])  # fence: iterations chain, so this waits for all
    elapsed = time.perf_counter() - start

    steps_per_s = NUM_ENVS * NUM_STEPS * MEASURE_ITERS / elapsed
    print(
        json.dumps(
            {
                "metric": "ppo_env_steps_per_s_4096envs",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / NORTH_STAR, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
