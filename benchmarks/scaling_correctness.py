"""Multi-device weak-scaling CORRECTNESS sweep on a virtual CPU mesh.

Real multi-chip hardware is not available in this image, so instead of a
tautological 1-device "scaling" row this records the thing a virtual mesh CAN
prove: for every guaranteed algorithm variant (``__graft_entry__.VARIANTS``),
training losses on 1 device and on N virtual devices are numerically
identical — data parallelism is pure sharding, so scaling changes wall-clock,
never math. Writes benchmarks/results/scaling_correctness.json.

Run on real hardware, benchmarks/scaling.py measures actual throughput
scaling (the BASELINE.md ≥80% efficiency target).

Usage:
    python benchmarks/scaling_correctness.py [--devices 8] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, default=8)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "results", "scaling_correctness.json"),
    )
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices)

    import __graft_entry__ as graft
    from rsl_rl_tpu.parallel.mesh import data_sharding, make_mesh, replicated, shard_tree

    results = []
    for variant in graft.VARIANTS:
        per_dev = {}
        for ndev in (1, args.devices):
            env, alg = graft.make_variant(variant, num_envs=8 * args.devices, hidden=16)
            ts = alg.init_train_state(jax.random.PRNGKey(1), env.num_envs)
            cs = alg.init_collect_state(jax.random.PRNGKey(2), env)
            mesh = make_mesh(jax.devices()[:ndev])
            ts = shard_tree(ts, replicated(mesh))
            cs = shard_tree(cs, data_sharding(mesh))
            collect = jax.jit(alg.make_collect_fn(env, 8))
            update = jax.jit(alg.make_update_fn())
            losses = []
            for _ in range(args.iters):
                ts, cs, rollout, _ = collect(ts, cs)
                ts, cs, um = update(ts, cs, rollout)
                losses.append(
                    float(
                        jax.device_get(
                            um.get("Loss/surrogate", um.get("Loss/behavior"))
                        )
                    )
                )
            per_dev[ndev] = losses
        # allclose-style mixed tolerance: a purely relative criterion is
        # ill-conditioned when a loss passes near zero (a 2e-7 absolute
        # reduction-order difference on a 1e-4 surrogate is noise, not
        # inconsistency)
        max_rel = max(
            abs(a - b) / (abs(a) + 1e-9)
            for a, b in zip(per_dev[1], per_dev[args.devices])
        )
        consistent = all(
            abs(a - b) <= 1e-5 + 1e-3 * abs(a)
            for a, b in zip(per_dev[1], per_dev[args.devices])
        )
        results.append(
            {
                "variant": variant,
                "devices": [1, args.devices],
                "losses_1dev": per_dev[1],
                f"losses_{args.devices}dev": per_dev[args.devices],
                "max_rel_diff": max_rel,
                "consistent": consistent,
            }
        )
        print(f"{variant}: max_rel_diff={max_rel:.2e} consistent={consistent}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")
    assert all(r["consistent"] for r in results)


if __name__ == "__main__":
    main()
