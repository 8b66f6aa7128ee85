"""Measured roofline for the fused RNN replay kernels (GRU vs LSTM).

Round-3 shipped a measured-roofline note for the GRU core
(ops/pallas_rnn.py:40-54) but none for the LSTM, whose learn-phase line ran
1.35x slower (BENCH_r03). This script pins down where the LSTM time goes at
the exact recurrent learn-phase shape (T=24, B=1024 rows/minibatch at 4096
envs / 4 minibatches, H=256, D=15):

- paired fwd and fwd+bwd wall time per call (steady-state: K calls chained
  inside one jitted ``lax.scan``, so dispatch overhead is excluded),
- achieved TFLOP/s against the matmul-FLOPs model,
- fp32 vs bf16 matmul operands (``compute_dtype``),
- batch-block (BB) sweep via ``_pick_block_b`` monkeypatch,
- the full recurrent PPO iteration via ``bench.measure`` for context.

Run on the TPU box: python benchmarks/roofline_rnn.py
Writes benchmarks/results/roofline_rnn.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, B, H, D = 24, 1024, 256, 15
K = 50  # kernel calls per timed dispatch
TRIALS = 3


def make_params(key, rnn_type: str):
    import jax
    import jax.numpy as jnp

    ks = iter(jax.random.split(key, 20))

    def dense(d_in, d_out, bias=True):
        p = {"kernel": jax.random.normal(next(ks), (d_in, d_out), jnp.float32) * 0.05}
        if bias:
            p["bias"] = jnp.zeros((d_out,), jnp.float32)
        return p

    if rnn_type == "gru":
        return {
            "ir": dense(D, H), "iz": dense(D, H), "in": dense(D, H),
            "hr": dense(H, H, bias=False), "hz": dense(H, H, bias=False),
            "hn": dense(H, H),
        }
    return {
        **{f"i{g}": dense(D, H, bias=False) for g in "ifgo"},
        **{f"h{g}": dense(H, H) for g in "ifgo"},
    }


def measure_pair(rnn_type: str, dt, mode: str) -> float:
    """Seconds per paired kernel call (fwd or fwd+bwd), steady-state."""
    import jax
    import jax.numpy as jnp

    from rsl_rl_tpu.ops import pallas_rnn

    pa = make_params(jax.random.PRNGKey(0), rnn_type)
    pb = make_params(jax.random.PRNGKey(1), rnn_type)
    xs = jax.random.normal(jax.random.PRNGKey(2), (T, B, D), jnp.float32)
    resets = (jax.random.uniform(jax.random.PRNGKey(3), (T, B)) < 0.05).astype(
        jnp.float32
    )
    if rnn_type == "gru":
        carry = jnp.zeros((B, H), jnp.float32)
        pair_fn, carries = pallas_rnn.gru_sequence_pair, (carry, carry)
    else:
        c = (jnp.zeros((B, H), jnp.float32), jnp.zeros((B, H), jnp.float32))
        pair_fn, carries = pallas_rnn.lstm_sequence_pair, (c, c)

    def loss(pa, pb, x):
        ha, hb = pair_fn((pa, pb), carries, (x, x), resets, compute_dtype=dt)
        return jnp.sum(ha[-1]) + jnp.sum(hb[-1])

    if mode == "fwd":
        one = loss
    else:
        grad = jax.grad(loss, argnums=(0, 1, 2))

        def one(pa, pb, x):
            ga, gb, gx = grad(pa, pb, x)
            return jnp.sum(gx) + sum(jnp.sum(v) for v in jax.tree.leaves(ga))

    @jax.jit
    def k_calls(pa, pb, xs):
        def body(acc, _):
            # acc*1e-30 threads a data dependency so the K calls serialize
            return one(pa, pb, xs + acc * 1e-30), None

        acc, _ = jax.lax.scan(body, 0.0, None, length=K)
        return acc

    for _ in range(2):
        jax.device_get(k_calls(pa, pb, xs))  # compile + warm
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        jax.device_get(k_calls(pa, pb, xs))
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def model_flops(rnn_type: str, mode: str) -> float:
    """Matmul-FLOPs model for one PAIRED call (2 streams)."""
    gates = 3 if rnn_type == "gru" else 4
    fwd = 2 * 2 * T * B * (H + D) * gates * H  # streams x (h@wh + x@wx)
    # bwd re-does the fwd gate matmuls and adds dgates@whT/wxT + weight grads
    return fwd if mode == "fwd" else 4 * fwd


def main() -> None:
    import jax

    import bench
    from rsl_rl_tpu.ops import pallas_rnn

    results: dict = {"shape": {"T": T, "B": B, "H": H, "D": D}, "kernels": []}

    orig_pick = pallas_rnn._pick_block_b
    try:
        for rnn_type in ("gru", "lstm"):
            for dt_name, dt in (("fp32", None), ("bf16", jax.numpy.bfloat16)):
                for bb in (512, 256, 128):
                    pallas_rnn._pick_block_b = partial(orig_pick, max_bb=bb)
                    row = {"rnn": rnn_type, "dt": dt_name, "bb": bb}
                    for mode in ("fwd", "fwdbwd"):
                        s = measure_pair(rnn_type, dt, mode)
                        row[f"{mode}_us"] = round(s * 1e6, 1)
                        row[f"{mode}_tflops"] = round(
                            model_flops(rnn_type, mode) / s / 1e12, 2
                        )
                    results["kernels"].append(row)
                    print(json.dumps(row), flush=True)
    finally:
        pallas_rnn._pick_block_b = orig_pick

    # full-iteration context (same methodology as bench.py)
    from rsl_rl_tpu.env import NLinkPendulum

    for rnn_type in ("gru", "lstm"):
        for dt_name, dt in (("fp32", None), ("bf16", jax.numpy.bfloat16)):
            m = bench.measure(
                NLinkPendulum(num_envs=bench.NUM_ENVS, num_links=5),
                recurrent=rnn_type,
                dtype=dt,
            )
            row = {
                "workload": f"{rnn_type}_{dt_name}",
                "steps_per_s": round(m["steps_per_s"], 1),
                "learn_s": round(m["learn_s"], 5),
                "collect_s": round(m["collect_s"], 5),
            }
            results.setdefault("iterations", []).append(row)
            print(json.dumps(row), flush=True)

    path = "benchmarks/results/roofline_rnn.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {path}")


if __name__ == "__main__":
    main()
