"""Full-scale convergence on the real chip: the bench configs actually learn.

Throughput numbers alone don't prove the flagship workloads TRAIN at scale;
this drives the exact bench configurations (PPO, 4096 N-link envs, bf16 MXU
compute, [256,256,256] MLPs or GRU/LSTM-256 recurrent policies on the
partially observable variant, 5 epochs x 4 minibatches) for thousands of
iterations on the real TPU and records the mean completed-episode reward
curve — the reference's `Train/mean_reward` (reference
runners/on_policy_runner.py:208). `--dtype fp32 vs bf16` at identical seeds
isolates the MXU-precision effect on learning quality.

Iterations run K-per-dispatch (one lax.scan program per 50 iterations, the
runner's `iterations_per_dispatch` mode) so the curve costs one metrics
transfer per 50 iterations instead of per iteration.

Usage (TPU box): python benchmarks/convergence_tpu.py [--iterations 2000]
Writes benchmarks/results/convergence_tpu.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 50  # iterations per dispatch


def run_seed(seed: int, iterations: int, env_name: str,
             std_floor: float | None, policy: str, dtype_name: str) -> dict:
    import jax
    import jax.numpy as jnp

    import bench
    from rsl_rl_tpu.env import (
        DomainRandomizedNLink,
        NLinkPendulum,
        PartiallyObservableNLink,
    )

    env_cls = {
        "nlink": NLinkPendulum,
        "dr_nlink": DomainRandomizedNLink,
        "po_nlink": PartiallyObservableNLink,
    }[env_name]
    env = env_cls(num_envs=bench.NUM_ENVS, num_links=5)
    dtype = {"bf16": jnp.bfloat16, "fp32": None}[dtype_name]
    ppo, ts, cs = bench._build(
        env,
        recurrent=False if policy == "ff" else policy,
        dtype=dtype,
        noise_std_floor=std_floor,
    )
    # reseed: _build uses fixed keys; fold the seed into the RNG state
    ts = ts.replace(rng=jax.random.fold_in(ts.rng, seed))
    collect = ppo.make_collect_fn(env, bench.NUM_STEPS)
    update = ppo.make_update_fn()

    @jax.jit
    def k_iterations(ts, cs):
        def body(carry, _):
            ts, cs = carry
            ts, cs, rollout, cm = collect(ts, cs)
            ts, cs, um = update(ts, cs, rollout)
            return (ts, cs), {
                "rew_sum": cm["ep_reward_sum"],
                "ep_count": cm["ep_count"],
                "kl": um["Loss/kl"],
            }

        (ts, cs), ms = jax.lax.scan(body, (ts, cs), None, length=K)
        return ts, cs, ms

    curve = []
    t0 = time.perf_counter()
    for _ in range(iterations // K):
        ts, cs, ms = k_iterations(ts, cs)
        ms = jax.device_get(ms)
        for r, c in zip(ms["rew_sum"], ms["ep_count"]):
            curve.append(float(r) / float(c) if c > 0 else float("nan"))
    wall = time.perf_counter() - t0
    steps = iterations * bench.NUM_ENVS * bench.NUM_STEPS
    return {
        "seed": seed,
        "curve_every": 1,
        "curve": [round(v, 2) for v in curve],
        "wall_s": round(wall, 1),
        "env_steps": steps,
        "steps_per_s": round(steps / wall, 1),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=2000)
    p.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    p.add_argument(
        "--env", choices=["nlink", "dr_nlink", "po_nlink"], default="nlink",
        help="po_nlink (velocities hidden) is the recurrent flagship workload",
    )
    p.add_argument("--policy", choices=["ff", "gru", "lstm"], default="ff")
    p.add_argument(
        "--dtype", choices=["bf16", "fp32"], default="bf16",
        help="fp32 vs bf16 at identical seeds isolates the MXU-precision "
        "effect on learning quality (backs the bench lines' dtype choices)",
    )
    p.add_argument(
        "--std-floor", type=float, default=None,
        help="opt-in policy noise_std_floor; None reproduces the reference's "
        "unclamped sigma (which can collapse and NaN past ~1400 iterations — "
        "see README 'Known limitations')",
    )
    args = p.parse_args()

    import numpy as np

    runs = []
    for seed in args.seeds:
        r = run_seed(
            seed, args.iterations, args.env, args.std_floor, args.policy,
            args.dtype,
        )
        c = np.asarray(r["curve"], dtype=float)
        tail = c[-100:][~np.isnan(c[-100:])]
        r["final_mean_reward_100"] = round(float(tail.mean()), 1)
        runs.append(r)
        print(
            json.dumps({k: v for k, v in r.items() if k != "curve"}), flush=True
        )

    finals = [r["final_mean_reward_100"] for r in runs]
    out = {
        "workload": f"ppo_{args.policy}_4096envs_{args.env}5_{args.dtype}",
        "iterations": args.iterations,
        "noise_std_floor": args.std_floor,
        "final_mean_reward_100": {
            "mean": round(float(np.mean(finals)), 1),
            "std": round(float(np.std(finals)), 1),
            "per_seed": finals,
        },
        "runs": runs,
    }
    suffix = "" if args.std_floor is None else "_floor"
    if args.policy != "ff" or args.dtype != "bf16":
        suffix += f"_{args.policy}_{args.dtype}"
    path = f"benchmarks/results/convergence_tpu{suffix}.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"final reward (last-100 window): {out['final_mean_reward_100']} -> {path}")


if __name__ == "__main__":
    main()
