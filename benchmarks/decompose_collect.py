"""Measured decomposition of the collect phase (24% of the headline iteration).

Companion to benchmarks/roofline_ff.py (which covers the learn phase).
At the headline shape (NLinkPendulum-5, 4096 envs, 24-step windows, bf16)
the collect phase times three ways:

- ``env_only``  — the physics chain alone: T*K chained env.step calls with
                  actions derived from state (the chain serializes itself)
- ``act_only``  — the per-step policy path alone: actor mean/std + Gaussian
                  sample + log-prob + critic value, obs perturbed by the
                  outputs so steps serialize
- residual      — bench.measure's collect_s minus the two (normalizer
                  updates, timeout bootstrap, rollout stacking, episode
                  stats, RNG splitting)

DCE WARNING (same family as roofline_ff.py's trap): do NOT measure the
real collect fn inside a K-scan that only returns a scalar like
``ep_count`` — the built-in envs' dones are time-based, so XLA dead-codes
the ENTIRE physics + policy chain and reports a fantasy number (measured:
0.51ms/window vs the honest 3.3ms). bench.measure is the ground truth for
the full collect (it materializes and fences the real outputs); this
script only measures the two sub-chains, each with its outputs consumed.

Run on the TPU box: python benchmarks/decompose_collect.py
Writes benchmarks/results/collect_decomposition.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRIALS = 3
K = 50  # windows per timed dispatch


def main() -> None:
    import jax
    import jax.numpy as jnp

    import bench
    from rsl_rl_tpu.env import NLinkPendulum
    from rsl_rl_tpu.ops import distributions

    T, N = bench.NUM_STEPS, bench.NUM_ENVS
    env = NLinkPendulum(num_envs=N, num_links=5)
    ppo, ts, cs = bench._build(env, dtype=jnp.bfloat16)
    policy = ppo.policy
    key = jax.random.PRNGKey(0)
    env_state, obs = env.reset(key)
    ps = ts.policy

    def timed(fn, *a):
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            jax.device_get(fn(*a))
            best = min(best, (time.perf_counter() - t0) / K)
        return best

    @jax.jit
    def k_env(env_state, obs):
        def body(carry, _):
            es, o = carry
            a = jnp.tanh(o["policy"][:, : env.num_actions]) * 0.1
            es, o, r, d, ex = env.step(es, a)
            return (es, o), None

        (es, o), _ = jax.lax.scan(body, (env_state, obs), None, length=T * K)
        return sum(jnp.sum(v) for v in o.values()) + sum(
            jnp.sum(leaf) for leaf in jax.tree.leaves(es)
        )

    jax.device_get(k_env(env_state, obs))
    env_only = timed(k_env, env_state, obs)
    print("env_only done", flush=True)

    @jax.jit
    def k_act(obs, key):
        def body(carry, _):
            o, k = carry
            k, sub = jax.random.split(k)
            mean, std, _ = policy.act(ps, o, ())
            action = mean + std * jax.random.normal(sub, mean.shape)
            logp = distributions.log_prob(mean, std, action)
            value, _ = policy.value(ps, o, ())
            o = {
                kk: v + (action.sum() + logp.sum() + value.sum()) * 1e-30
                for kk, v in o.items()
            }
            return (o, k), None

        (o, k), _ = jax.lax.scan(body, (obs, key), None, length=T * K)
        return sum(jnp.sum(v) for v in o.values())

    jax.device_get(k_act(obs, key))
    act_only = timed(k_act, obs, key)
    print("act_only done", flush=True)

    m = bench.measure(env, dtype=jnp.bfloat16)
    out = {
        "shape": {"T": T, "N": N, "num_links": 5, "dtype": "bf16"},
        "collect_s_per_window": round(m["collect_s"], 6),
        "env_only_s_per_window": round(env_only, 6),
        "act_only_s_per_window": round(act_only, 6),
        "residual_s_per_window": round(m["collect_s"] - env_only - act_only, 6),
        "end_to_end_steps_per_s": round(m["steps_per_s"], 1),
    }
    print(json.dumps(out, indent=1), flush=True)
    path = "benchmarks/results/collect_decomposition.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {path}")


if __name__ == "__main__":
    main()
