"""Long-horizon sigma trajectories: MEASURE the reference's unclamped-std
behavior instead of code-reading it.

Round 4 found that full-bf16 actor heads NaN past ~iteration 1400 via sigma
collapse (fixed by default with fp32 output heads, networks/mlp.py
``head_dtype``), and README/PARITY claimed the underlying *mechanism* — a
scalar noise-std parameter that nothing ever bounds — "remains open in both
frameworks", supported only by reading the reference's code
(/root/reference/rsl_rl/modules/actor_critic.py:89-91,140 parameterizes
sigma as a raw ``nn.Parameter`` consumed unclamped by ``Normal``).

This harness turns that claim into data: it trains the UNMODIFIED reference
(torch, CPU, imported from /root/reference) and this framework (fp32 arm,
CPU) on the same 5-link swing-up for >=2000 iterations, recording the
per-iteration minimum of the raw std parameter on both sides. The raw
parameter can drift negative in either framework (neither applies abs/clamp
before ``Normal``; torch's ``Normal(validate_args=None)`` accepts negative
scale and our ``ops/distributions.py`` mirrors that) — so sigma_min crossing
zero, not just shrinking, is the collapse signature to look for.

Writes benchmarks/results/sigma_longrun.json.

Usage:
    JAX_PLATFORMS=cpu python benchmarks/sigma_longrun.py \
        [--iterations 3000] [--seeds 1 2 3 4] [--num-envs 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.parity_nlink import make_torch_nlink, train_cfg  # noqa: E402


def run_reference(seed: int, iterations: int, num_envs: int) -> dict:
    """Train the unmodified reference, logging min(policy.std) per iteration.

    ``alg.policy.std`` is the reference's scalar-mode noise parameter
    (reference actor_critic.py:89); nothing in its update path bounds it
    (reference ppo.py never touches it outside the gradient step).
    """
    from benchmarks._reference_shim import install_reference_shims

    install_reference_shims()
    import tempfile

    import torch
    import rsl_rl.runners.on_policy_runner as ref_runner_mod
    from rsl_rl.runners import OnPolicyRunner as RefRunner

    ref_runner_mod.store_code_state = lambda *a, **k: []
    torch.manual_seed(seed)
    env = make_torch_nlink(num_envs)
    log_dir = tempfile.mkdtemp(prefix="ref_sigma_")
    runner = RefRunner(env, train_cfg(seed), log_dir=log_dir, device="cpu")
    runner.save = lambda *a, **k: None

    sigma_min, sigma_mean, reward = [], [], []
    for it in range(iterations):
        before = len(env.finished_returns)
        runner.learn(1, init_at_random_ep_len=it == 0)
        std = runner.alg.policy.std.detach()
        sigma_min.append(float(std.min()))
        sigma_mean.append(float(std.mean()))
        new = env.finished_returns[before:]
        reward.append(sum(new) / len(new) if new else float("nan"))
    return {"sigma_min": sigma_min, "sigma_mean": sigma_mean, "reward": reward}


def run_ours(seed: int, iterations: int, num_envs: int) -> dict:
    """Train this framework's fp32 arm, logging min(params['std']).

    Matches the collapse-study configuration (benchmarks/convergence_tpu.py
    --dtype fp32, no --std-floor) at CPU scale: the scalar std parameter
    lives at ``train_state.policy.params['std']`` (modules/actor_critic.py
    scalar mode) and is never clamped when ``noise_std_floor`` is None.
    """
    import jax

    from benchmarks.parity_nlink import MAX_EPISODE_LENGTH, NUM_LINKS
    from rsl_rl_tpu.env import NLinkPendulum
    from rsl_rl_tpu.runners import OnPolicyRunner

    env = NLinkPendulum(
        num_envs=num_envs, num_links=NUM_LINKS, max_episode_length=MAX_EPISODE_LENGTH
    )
    runner = OnPolicyRunner(env, train_cfg(seed), log_dir=None)
    ts, cs = runner.train_state, runner.collect_state
    env_state = env.randomize_episode_length(
        cs.env_state, jax.random.PRNGKey(seed * 7919 + 13)
    )
    cs = cs.replace(env_state=env_state)

    sigma_min, sigma_mean, reward = [], [], []
    for _ in range(iterations):
        ts, cs, rollout, cm = runner._collect(ts, cs)
        ts, cs, um = runner._update(ts, cs, rollout)
        std = jax.device_get(ts.policy.params["std"])
        sigma_min.append(float(std.min()))
        sigma_mean.append(float(std.mean()))
        m = jax.device_get(cm)
        count = float(m["ep_count"])
        reward.append(float(m["ep_reward_sum"]) / count if count > 0 else float("nan"))
    return {"sigma_min": sigma_min, "sigma_mean": sigma_mean, "reward": reward}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=3000)
    p.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3, 4])
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--skip-reference", action="store_true")
    p.add_argument("--skip-ours", action="store_true")
    p.add_argument("--out", type=str, default="benchmarks/results/sigma_longrun.json")
    args = p.parse_args()

    runs = {"reference": [], "rsl_rl_tpu": []}
    timings = {}
    for seed in args.seeds:
        if not args.skip_ours:
            t0 = time.time()
            r = run_ours(seed, args.iterations, args.num_envs)
            r["seed"] = seed
            runs["rsl_rl_tpu"].append(r)
            timings.setdefault("rsl_rl_tpu_s", []).append(round(time.time() - t0, 1))
            print(
                f"[ours seed={seed}] sigma_min@end={r['sigma_min'][-1]:+.4f}"
                f" min-over-run={min(r['sigma_min']):+.4f}"
                f" ({timings['rsl_rl_tpu_s'][-1]}s)",
                flush=True,
            )
        if not args.skip_reference and os.path.isdir("/root/reference"):
            t0 = time.time()
            r = run_reference(seed, args.iterations, args.num_envs)
            r["seed"] = seed
            runs["reference"].append(r)
            timings.setdefault("reference_s", []).append(round(time.time() - t0, 1))
            print(
                f"[reference seed={seed}] sigma_min@end={r['sigma_min'][-1]:+.4f}"
                f" min-over-run={min(r['sigma_min']):+.4f}"
                f" ({timings['reference_s'][-1]}s)",
                flush=True,
            )

    def table(side):
        rows = {}
        for it in (1, 500, 1000, 1500, 2000, args.iterations - 1):
            if it >= args.iterations:
                continue
            vals = [r["sigma_min"][it] for r in runs[side]]
            if vals:
                rows[it] = round(sum(vals) / len(vals), 4)
        return rows

    out = {
        "task": f"nlink5_swingup_{args.num_envs}envs_fp32",
        "iterations": args.iterations,
        "seeds": args.seeds,
        "sigma_min_mean_by_iter": {s: table(s) for s in runs},
        "crossed_zero": {
            s: sum(1 for r in runs[s] if min(r["sigma_min"]) < 0) for s in runs
        },
        "timings": timings,
        "runs": runs,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps({k: v for k, v in out.items() if k != "runs"}, indent=2))
    print(f"full trajectories -> {args.out}")


if __name__ == "__main__":
    main()
