"""Measured roofline for the feedforward learn phase (the headline's 74%).

BENCH_r02-r04 held the headline flat at ~7.2M env-steps/s with learn_s ~=
0.0100 s/iter and no decomposition of where that time goes (the RNN kernels
got benchmarks/roofline_rnn.py; the flagship feedforward update — reference
metric runners/on_policy_runner.py:179,209,220 — had nothing). This script
measures the learn phase segment by segment at the exact headline shape
(NLinkPendulum-5, 4096 envs x 24 steps, bf16 trunks + fp32 heads, MLP
256x256x256, 5 epochs x 4 minibatches):

- ``gae``          — the GAE reverse scan alone (ops/gae.py)
- ``pack``         — pack_minibatch_rows: fp32 pack + one permutation gather
- ``perm``         — jax.random.permutation alone (a key-sort on TPU)
- ``net_fwdbwd``   — actor+critic forward+backward ONLY (policy.act_value_seq
                     grad), per minibatch of 24576 rows — the network floor
- ``loss_fwdbwd``  — the full PPO minibatch loss fwd+bwd (algorithms/ppo.py
                     _loss: + logprob/ratio/clip/KL/entropy elementwise math)
- ``adam``         — optimizer tx.update + apply_updates alone
- ``minibatch_step`` — the COMPLETE per-step body (slice+loss+lr+clip+adam);
                     x20 this reconstructs the learn phase
- ``update_total`` — the real jitted update(ts, cs, rollout) program
- end-to-end bench.measure context (collect_s / learn_s / steps_per_s)

and evaluates the round-4 VERDICT's proposed lever — packing the minibatch
gather in bf16 instead of fp32 — by monkeypatching a bf16 pack and
re-measuring both the pack segment and the full headline.

METHODOLOGY TRAP (cost a day of wrong conclusions): serializing scan
iterations with ``p - 0.0 * grad`` lets XLA fold ``0*g -> 0`` and dead-code
the ENTIRE backward pass — the "fwd+bwd" segments then measure forward
only and look impossibly fast (117 "achieved" TFLOP/s, above the padded
ceiling), while the in-situ step looks mysteriously 2.4x slower. The
serialization must be ``p + 1e-30 * grad`` (not foldable, numerically
negligible). Cross-check every per-step segment against the epoch-count
slope of the real program (learn_s vs num_learning_epochs is exactly
linear) before trusting it.

FLOPs accounting: ``model_flops`` counts ideal matmul FLOPs;
``padded_flops`` counts them with every matmul dim padded to the MXU tile
(128, with fp32-head gemms costed at half MXU rate), giving the efficiency
CEILING imposed by the narrow obs (15) and action (5) dims — the gap
between measured and padded-model is true overhead (elementwise math,
transposes, pipeline bubbles), the gap between padded and ideal is
irreducible tile padding at this network shape.

Timing: K calls serialized inside one jitted lax.scan (data dependency
threads the carry), fenced by jax.device_get, best of TRIALS — the same
methodology as benchmarks/roofline_rnn.py; ``jax.block_until_ready`` is
NOT used (it can return early on the tunneled backend).

Run on the TPU box: python benchmarks/roofline_ff.py
Writes benchmarks/results/ff_roofline.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 200  # serialized calls per timed dispatch for the sub-10ms segments
K_UPDATE = 30  # the full update is ~10ms/call; 30 amortizes dispatch fine
TRIALS = 3
PEAK_BF16_TFLOPS = 197.0  # TPU v5e per-chip bf16 peak (public spec)


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def mlp_flops(batch: int, dims: list[int], head_fp32: bool, padded: bool) -> float:
    """Matmul FLOPs for one fwd+bwd through an MLP given layer ``dims``
    ([in, h1, ..., out]).

    fwd: y=x@W per layer. bwd: dx=dy@W^T and dW=x^T@dy per layer -> 3 gemms
    of the same (B, K, N) volume each => fwd+bwd = 3x fwd.

    ``padded=True`` pads every contraction/output dim to the 128-lane MXU
    tile (batch to 8) and doubles the cost of fp32 gemms (the fp32 output
    head runs the MXU in multi-pass mode at ~half bf16 rate).
    """
    total = 0.0
    for i in range(len(dims) - 1):
        k_dim, n_dim = dims[i], dims[i + 1]
        is_head = i == len(dims) - 2
        if padded:
            b, kk, nn = _ceil_to(batch, 8), _ceil_to(k_dim, 128), _ceil_to(n_dim, 128)
        else:
            b, kk, nn = batch, k_dim, n_dim
        gemm = 2.0 * b * kk * nn
        if padded and head_fp32 and is_head:
            gemm *= 2.0  # fp32 gemm ~ half MXU rate
        total += 3.0 * gemm  # fwd + dx + dW
    return total


def timed(fn, *args, k: int = K) -> float:
    """Seconds per call for a jitted k-scan program (already compiled)."""
    import jax

    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    import bench
    from rsl_rl_tpu.algorithms import ppo as ppo_mod
    from rsl_rl_tpu.env import NLinkPendulum
    from rsl_rl_tpu.ops.gae import compute_gae

    T, N = bench.NUM_STEPS, bench.NUM_ENVS
    env = NLinkPendulum(num_envs=N, num_links=5)
    ppo, ts, cs = bench._build(env, dtype=jnp.bfloat16)
    policy = ppo.policy
    epochs, n_mb = ppo.num_learning_epochs, ppo.num_mini_batches
    mb = (T * N) // n_mb

    collect = jax.jit(ppo.make_collect_fn(env, T))
    update = jax.jit(ppo.make_update_fn())
    ts, cs, rollout, _ = collect(ts, cs)
    jax.device_get(rollout.rewards[0, 0])

    # ---- dispatch baseline: a trivial K-scan program. On the tunneled
    # backend one program round-trip can cost 10s of ms; every segment
    # below amortizes it over K serialized calls, and this baseline records
    # what residual the division leaves (subtract it mentally from the
    # sub-segment numbers; it is <5us/call at K=200 even on a bad day).
    @jax.jit
    def k_noop(x):
        def body(acc, _):
            return acc + x * 1e-30, None

        acc, _ = jax.lax.scan(body, 0.0, None, length=K)
        return acc

    jax.device_get(k_noop(1.0))
    t0 = time.perf_counter()
    jax.device_get(k_noop(1.0))
    dispatch_s = time.perf_counter() - t0

    obs_dim = int(sum(v.shape[-1] for v in rollout.obs.values()))
    act_dim = int(rollout.actions.shape[-1])
    results: dict = {
        "shape": {
            "T": T, "N": N, "obs_dim": obs_dim, "act_dim": act_dim,
            "hidden": [256, 256, 256], "epochs": epochs,
            "num_mini_batches": n_mb, "rows_per_minibatch": mb,
            "dtype": "bf16_trunk_fp32_head",
        },
        "segments": {},
    }
    results["segments"]["dispatch_roundtrip_s"] = round(dispatch_s, 6)

    # ---- segment: GAE ----------------------------------------------------
    dones_f = rollout.dones.astype(jnp.float32)
    last_values = jnp.zeros((N,), jnp.float32)

    @jax.jit
    def k_gae(rews):
        def body(acc, _):
            ret, adv = compute_gae(
                rews + acc * 1e-30, rollout.values, dones_f, last_values,
                ppo.gamma, ppo.lam,
            )
            return jnp.sum(adv) * 1e-30 + jnp.sum(ret) * 1e-30, None

        acc, _ = jax.lax.scan(body, 0.0, None, length=K)
        return acc

    jax.device_get(k_gae(rollout.rewards))
    results["segments"]["gae_s"] = timed(k_gae, rollout.rewards)
    print("segment gae_s done", flush=True)

    # ---- segment: pack + permutation gather ------------------------------
    returns0, advantages0 = compute_gae(
        rollout.rewards, rollout.values, dones_f, last_values, ppo.gamma, ppo.lam
    )
    perm = jax.random.permutation(jax.random.PRNGKey(3), T * N)

    def make_k_pack(pack_fn):
        @jax.jit
        def k_pack(rews):
            def body(acc, _):
                packed, _ = pack_fn(
                    rollout, returns0 + acc * 1e-30, advantages0, perm
                )
                return jnp.sum(packed[0]).astype(jnp.float32) * 1e-30, None

            acc, _ = jax.lax.scan(body, 0.0, None, length=K)
            return acc

        return k_pack

    k_pack = make_k_pack(ppo_mod.pack_minibatch_rows)
    jax.device_get(k_pack(rollout.rewards))
    results["segments"]["pack_s"] = timed(k_pack, rollout.rewards)
    print("segment pack_s done", flush=True)

    # ---- segment: the permutation itself ----------------------------------
    # jax.random.permutation lowers to a key-sort on TPU — sorts are slow
    # there, and the update draws one per iteration (reference
    # rollout_storage.py:165 torch.randperm equivalent).
    @jax.jit
    def k_perm(key0):
        def body(key, _):
            key, sub = jax.random.split(key)
            p = jax.random.permutation(sub, T * N)
            return key, p[0]

        key, firsts = jax.lax.scan(body, key0, None, length=K)
        return firsts[-1]

    jax.device_get(k_perm(jax.random.PRNGKey(9)))
    results["segments"]["perm_s"] = timed(k_perm, jax.random.PRNGKey(9))
    print("segment perm_s done", flush=True)

    # bytes model for context: pack writes + gather read/write, plus the 20
    # per-minibatch-slice reads the epochs make
    f_cols = obs_dim + 3 * act_dim + 4
    pack_bytes = 4 * (T * N) * f_cols
    results["segments"]["pack_model"] = {
        "f_cols": f_cols,
        "hbm_bytes_pack_and_gather": 3 * pack_bytes,
        "hbm_bytes_epoch_slices": epochs * n_mb * mb * f_cols * 4,
    }

    # ---- segment: network-only fwd+bwd (the floor) -----------------------
    packed0, unpack = ppo_mod.pack_minibatch_rows(rollout, returns0, advantages0, perm)
    batch = jax.tree.map(jax.lax.stop_gradient, unpack(packed0[:mb]))

    def net_loss(params, obs):
        ps = ts.policy.replace(params=params)
        mean, std, value = policy.act_value_seq(ps, obs, None, None)
        return (
            jnp.sum(mean.astype(jnp.float32))
            + jnp.sum(std.astype(jnp.float32))
            + jnp.sum(value.astype(jnp.float32))
        )

    net_grad = jax.grad(net_loss)

    @jax.jit
    def k_net(params):
        def body(p, _):
            g = net_grad(p, batch["obs"])
            return jax.tree.map(lambda a, b: a + 1e-30 * b, p, g), None

        p, _ = jax.lax.scan(body, params, None, length=K)
        # reduce over EVERY leaf: returning a single element lets XLA
        # dead-code the dW gemms / moment updates not feeding it
        return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(p))

    jax.device_get(k_net(ts.policy.params))
    results["segments"]["net_fwdbwd_s"] = timed(k_net, ts.policy.params)
    print("segment net_fwdbwd_s done", flush=True)

    # ---- segment: full minibatch loss fwd+bwd ----------------------------
    loss_grad = jax.value_and_grad(ppo._loss, has_aux=True, argnums=(0, 1))

    @jax.jit
    def k_loss(params):
        def body(p, _):
            (_, _aux), (g, _) = loss_grad(p, None, ts.policy, None, batch, None)
            return jax.tree.map(lambda a, b: a + 1e-30 * b, p, g), None

        p, _ = jax.lax.scan(body, params, None, length=K)
        # reduce over EVERY leaf: returning a single element lets XLA
        # dead-code the dW gemms / moment updates not feeding it
        return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(p))

    jax.device_get(k_loss(ts.policy.params))
    results["segments"]["loss_fwdbwd_s"] = timed(k_loss, ts.policy.params)
    print("segment loss_fwdbwd_s done", flush=True)

    # ---- segment: loss fwd+bwd fed from the PACKED array ------------------
    # The real update's minibatch_step does unpack(dynamic_slice(packed))
    # per step; if XLA feeds the gemms from the strided 34-column slices
    # instead of re-tiling, the step runs far off the standalone number
    # above — this segment isolates exactly that difference.
    mb_starts = jnp.arange(n_mb, dtype=jnp.int32) * mb

    @jax.jit
    def k_loss_packed(params):
        def body(p, i):
            x = mb_starts[i % n_mb]
            b = unpack(jax.lax.dynamic_slice_in_dim(packed0, x, mb, axis=0))
            (_, _aux), (g, _) = loss_grad(p, None, ts.policy, None, b, None)
            return jax.tree.map(lambda a, c: a + 1e-30 * c, p, g), None

        p, _ = jax.lax.scan(body, params, jnp.arange(K), length=K)
        return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(p))

    jax.device_get(k_loss_packed(ts.policy.params))
    results["segments"]["loss_from_packed_fwdbwd_s"] = timed(
        k_loss_packed, ts.policy.params
    )
    print("segment loss_from_packed_fwdbwd_s done", flush=True)

    # ---- segment: same, but per-field arrays materialized ONCE ------------
    # The candidate fix: split the packed array back into contiguous
    # per-field buffers right after the gather (one extra linear copy),
    # then slice those per minibatch — clean gemm operands.
    fields0 = unpack(packed0)

    def slice_fields(x):
        sl = lambda v: jax.lax.dynamic_slice_in_dim(v, x, mb, axis=0)  # noqa: E731
        out = {k: (jax.tree.map(sl, v) if k == "obs" else
                   (v if v is None else sl(v)))
               for k, v in fields0.items()}
        return out

    @jax.jit
    def k_loss_fields(params):
        def body(p, i):
            b = slice_fields(mb_starts[i % n_mb])
            (_, _aux), (g, _) = loss_grad(p, None, ts.policy, None, b, None)
            return jax.tree.map(lambda a, c: a + 1e-30 * c, p, g), None

        p, _ = jax.lax.scan(body, params, jnp.arange(K), length=K)
        return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(p))

    jax.device_get(k_loss_fields(ts.policy.params))
    results["segments"]["loss_from_fields_fwdbwd_s"] = timed(
        k_loss_fields, ts.policy.params
    )
    print("segment loss_from_fields_fwdbwd_s done", flush=True)

    # ---- segment: optimizer ---------------------------------------------
    (_, _aux), (grads0, _) = jax.jit(
        lambda p: loss_grad(p, None, ts.policy, None, batch, None)
    )(ts.policy.params)

    @jax.jit
    def k_adam(params, opt_state):
        def body(carry, _):
            p, s = carry
            updates, s = ppo.tx.update(grads0, s, p)
            p = optax.apply_updates(p, jax.tree.map(lambda u: -ts.lr * u, updates))
            return (p, s), None

        (p, s), _ = jax.lax.scan(body, (params, opt_state), None, length=K)
        return sum(jnp.sum(leaf) for leaf in jax.tree.leaves((p, s)))

    jax.device_get(k_adam(ts.policy.params, ts.opt_state))
    results["segments"]["adam_s"] = timed(k_adam, ts.policy.params, ts.opt_state)
    print("segment adam_s done", flush=True)

    # ---- segment: the COMPLETE minibatch step -----------------------------
    # slice+unpack + loss fwd+bwd + adaptive-KL lr + clip/adam + apply — the
    # exact body the update scans 20x; its time x 20 should reconstruct the
    # learn phase (cross-checked against update_total and the epoch-count
    # slope, which this measurement matched at ~512us/step).
    @jax.jit
    def k_step(params, opt_state, lr):
        def body(carry, i):
            p, s, lr_c = carry
            x = mb_starts[i % n_mb]
            b = unpack(jax.lax.dynamic_slice_in_dim(packed0, x, mb, axis=0))
            (_, aux), (g, _) = loss_grad(p, None, ts.policy, None, b, None)
            kl = aux["kl"]
            lr_c = jnp.where(
                kl > ppo.desired_kl * 2.0,
                jnp.maximum(ppo.min_lr, lr_c / 1.5),
                jnp.where(
                    (kl < ppo.desired_kl / 2.0) & (kl > 0.0),
                    jnp.minimum(ppo.max_lr, lr_c * 1.5),
                    lr_c,
                ),
            )
            updates, s = ppo.tx.update(g, s, p)
            p = jax.tree.map(lambda pp, u: (pp - lr_c * u).astype(pp.dtype), p, updates)
            return (p, s, lr_c), kl

        (p, s, lr), kls = jax.lax.scan(body, (params, opt_state, lr), jnp.arange(K))
        return kls[-1] + sum(jnp.sum(leaf) for leaf in jax.tree.leaves((p, s))) * 1e-30

    jax.device_get(k_step(ts.policy.params, ts.opt_state, ts.lr))
    results["segments"]["minibatch_step_s"] = timed(
        k_step, ts.policy.params, ts.opt_state, ts.lr
    )
    print("segment minibatch_step_s done", flush=True)

    # ---- segment: the real update program --------------------------------
    @jax.jit
    def k_update(ts_in, cs_in):
        def body(carry, _):
            t, c = carry
            t, c, m = update(t, c, rollout)
            return (t, c), m["Loss/kl"]

        (t, c), kls = jax.lax.scan(body, (ts_in, cs_in), None, length=K_UPDATE)
        return kls[-1]

    jax.device_get(k_update(ts, cs))
    results["segments"]["update_total_s"] = timed(k_update, ts, cs, k=K_UPDATE)
    print("segment update_total_s done", flush=True)

    # ---- FLOPs model ------------------------------------------------------
    actor_dims = [obs_dim, 256, 256, 256, act_dim]
    critic_dims = [obs_dim, 256, 256, 256, 1]
    ideal = mlp_flops(mb, actor_dims, True, False) + mlp_flops(mb, critic_dims, True, False)
    padded = mlp_flops(mb, actor_dims, True, True) + mlp_flops(mb, critic_dims, True, True)
    steps_per_update = epochs * n_mb
    seg = results["segments"]
    seg["flops_model"] = {
        "ideal_gflop_per_minibatch": round(ideal / 1e9, 2),
        "padded_gflop_per_minibatch": round(padded / 1e9, 2),
        "tile_padding_ceiling": round(ideal / padded, 3),
        "peak_bf16_tflops": PEAK_BF16_TFLOPS,
    }
    disp_per_call = seg["dispatch_roundtrip_s"] / K
    seg["achieved_tflops"] = {
        # dispatch-corrected: the tunneled backend's per-program round-trip
        # is amortized over K but still worth subtracting explicitly
        "net_fwdbwd": round(ideal / (seg["net_fwdbwd_s"] - disp_per_call) / 1e12, 1),
        "loss_fwdbwd": round(ideal / (seg["loss_fwdbwd_s"] - disp_per_call) / 1e12, 1),
        "padded_model_tflops_at_peak": round(ideal / padded * PEAK_BF16_TFLOPS, 1),
    }
    disp = seg["dispatch_roundtrip_s"] / K
    seg["decomposition"] = {
        # the real learn phase is steps x minibatch_step (+ pack/perm/GAE,
        # which the compiler overlaps almost entirely — the epoch-count
        # slope puts the fixed part at <0.1ms)
        "reconstructed_update_s": round(
            seg["gae_s"] + seg["pack_s"]
            + steps_per_update * seg["minibatch_step_s"],
            6,
        ),
        "minibatch_steps": steps_per_update,
        "minibatch_step_minus_dispatch_us": round(
            (seg["minibatch_step_s"] - disp) * 1e6, 1
        ),
        "optimizer_share_us": round(
            (seg["minibatch_step_s"] - seg["loss_fwdbwd_s"]) * 1e6, 1
        ),
        "loss_minus_net_s": round(seg["loss_fwdbwd_s"] - seg["net_fwdbwd_s"], 6),
        "pack_share_of_update": round(seg["pack_s"] / seg["update_total_s"], 4),
        "achieved_tflops_minibatch_step": round(
            ideal / (seg["minibatch_step_s"] - disp) / 1e12, 1
        ),
    }
    print(json.dumps(results["segments"], indent=1), flush=True)

    # ---- bf16 pack variant (round-4 VERDICT lever) ------------------------
    orig_pack = ppo_mod.pack_minibatch_rows  # bind BEFORE the monkeypatch

    def pack_bf16(rollout_, returns_, advantages_, perm_):
        packed_, unpack_ = orig_pack(rollout_, returns_, advantages_, perm_)
        return packed_.astype(jnp.bfloat16), lambda rows: unpack_(
            rows.astype(jnp.float32)
        )

    k_pack_bf16 = make_k_pack(pack_bf16)
    jax.device_get(k_pack_bf16(rollout.rewards))
    results["bf16_pack"] = {"pack_s": timed(k_pack_bf16, rollout.rewards)}

    # end-to-end: the real headline with the bf16 pack monkeypatched in
    try:
        ppo_mod.pack_minibatch_rows = pack_bf16
        m = bench.measure(NLinkPendulum(num_envs=N, num_links=5), dtype=jnp.bfloat16)
        results["bf16_pack"]["end_to_end"] = {
            "steps_per_s": round(m["steps_per_s"], 1),
            "collect_s": round(m["collect_s"], 5),
            "learn_s": round(m["learn_s"], 5),
        }
    finally:
        ppo_mod.pack_minibatch_rows = orig_pack

    # ---- end-to-end context (fp32 pack, the shipped default) --------------
    m = bench.measure(NLinkPendulum(num_envs=N, num_links=5), dtype=jnp.bfloat16)
    results["end_to_end"] = {
        "steps_per_s": round(m["steps_per_s"], 1),
        "collect_s": round(m["collect_s"], 5),
        "learn_s": round(m["learn_s"], 5),
    }

    print(json.dumps({k: v for k, v in results.items() if k != "segments"},
                     indent=1), flush=True)
    path = "benchmarks/results/ff_roofline.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {path}")


if __name__ == "__main__":
    main()
