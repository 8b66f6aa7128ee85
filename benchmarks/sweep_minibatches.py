"""Minibatch-count sweep at the headline benchmark shape.

The PPO update's per-row cost rises past ~25k rows per minibatch (README
"Throughput"), and the headline config (4096 envs x 24 steps / 4 minibatches
= 24.6k rows) sits exactly on that knee. This sweep measures the headline
bf16 physics workload at num_mini_batches in {2, 4, 8, 16} so the default
can be picked from data rather than inherited from the reference's example
config (reference config/example_config.yaml:36).

Learning-dynamics note: more minibatches = more optimizer steps per epoch at
smaller batch, the same trade the reference exposes; the adaptive-KL schedule
re-tunes the LR per minibatch either way, and the parity studies all run the
reference's own value (4). Throughput is the only thing measured here.

Usage (on the TPU box; single-tenant — don't run alongside bench.py):
    python benchmarks/sweep_minibatches.py
Writes benchmarks/results/sweep_minibatches.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax.numpy as jnp

    import bench
    from rsl_rl_tpu.env import NLinkPendulum

    rows = []
    for mb in (2, 4, 8, 16):
        t0 = time.time()
        m = bench.measure(
            NLinkPendulum(num_envs=bench.NUM_ENVS, num_links=5),
            dtype=jnp.bfloat16,
            num_mini_batches=mb,
        )
        rows.append(
            {
                "num_mini_batches": mb,
                "rows_per_minibatch": bench.NUM_ENVS * bench.NUM_STEPS // mb,
                "steps_per_s": round(m["steps_per_s"], 1),
                "collect_s": round(m["collect_s"], 5),
                "learn_s": round(m["learn_s"], 5),
                "wall_s": round(time.time() - t0, 1),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    out = {
        "workload": "ppo_4096envs_nlink5_physics_bf16",
        "num_envs": bench.NUM_ENVS,
        "num_steps": bench.NUM_STEPS,
        "rows": rows,
        "best": max(rows, key=lambda r: r["steps_per_s"])["num_mini_batches"],
    }
    path = "benchmarks/results/sweep_minibatches.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"best num_mini_batches: {out['best']} -> {path}")


if __name__ == "__main__":
    main()
