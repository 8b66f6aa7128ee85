"""Learning-curve parity on the PHYSICS-GRADE workload: 5-link swing-up.

The toy parity studies (Pendulum/PointMass, 1 DoF) can hide multi-DoF
pathologies — action-dim >> 1 interacts with the std init, adaptive-KL LR
and advantage whitening. This harness trains the UPSTREAM reference (torch,
CPU, imported from /root/reference) and this framework on the *same*
5-link N-link swing-up — the throughput headline env (env/nlink.py), whose
dynamics are pinned to real MuJoCo by tests/test_mujoco_conformance.py —
with identical PPO hyperparameters, recording mean completed-episode reward
per iteration.

The torch twin below implements the identical manipulator equation
(same constants, init distribution, reward, timeout-only termination) in
float32, so both frameworks see the same task definition; the reference
steps it on CPU exactly like its downstream simulators (reference
runners/on_policy_runner.py:103-107).

Writes benchmarks/results/parity_nlink.json and prints a checkpoint table.

Usage:
    python benchmarks/parity_nlink.py [--iterations 500] [--seeds 1 2 ... 10]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.parity_pendulum import summarize, train_cfg  # noqa: E402

NUM_LINKS = 5
MAX_EPISODE_LENGTH = 400


# --------------------------------------------------------------------------
# reference side (torch)
# --------------------------------------------------------------------------


def make_torch_nlink(
    n: int, num_links: int = NUM_LINKS, partially_observable: bool = False
):
    """Reference-contract torch env with NLinkPendulum's exact dynamics
    (env/nlink.py:120-207): manipulator equation in float32, semi-implicit
    Euler over 4 substeps, same reward and timeout-only auto-reset.
    ``partially_observable`` hides the angular velocities (the torch twin of
    ``PartiallyObservableNLink``) for the recurrent study."""
    from benchmarks._reference_shim import TensorDictShim, install_reference_shims

    install_reference_shims()
    import torch

    class TorchNLink:
        g = 9.81
        damping = 0.05
        max_torque = 10.0
        max_speed = 20.0
        dt = 0.02
        n_substeps = 4

        def __init__(self, n: int, L: int, partially_observable: bool = False):
            self.partially_observable = partially_observable
            self.num_envs = n
            self.L = L
            self.num_actions = L
            self.max_episode_length = MAX_EPISODE_LENGTH
            self.device = "cpu"
            self.cfg = {}
            self.unwrapped = self
            self.step_dt = self.dt
            self.masses = torch.ones(L)
            self.lengths = torch.ones(L) / L
            cummass = torch.cumsum(self.masses.flip(0), 0).flip(0)
            idx = torch.arange(L)
            self._K = cummass[torch.maximum(idx[:, None], idx[None, :])]
            self._ll = self.lengths[:, None] * self.lengths[None, :]
            self._total_len = float(self.lengths.sum())
            self.episode_length_buf = torch.zeros(n, dtype=torch.long)
            self.theta = torch.empty(n, L).uniform_(-0.1, 0.1)
            self.omega = torch.empty(n, L).uniform_(-0.05, 0.05)
            self._cur_return = torch.zeros(n)
            self.finished_returns: list[float] = []

        def _accel(self, theta, omega, tau):
            dth = theta[:, :, None] - theta[:, None, :]
            coup = self._K * self._ll
            M = coup * torch.cos(dth)
            C = torch.einsum("nij,nj->ni", coup * torch.sin(dth), omega**2)
            G = self.g * self.lengths * torch.diagonal(self._K) * torch.sin(theta)
            rhs = tau - C - G - self.damping * omega
            return torch.linalg.solve(M, rhs.unsqueeze(-1)).squeeze(-1)

        def get_observations(self):
            parts = [torch.cos(self.theta), torch.sin(self.theta)]
            if not self.partially_observable:
                parts.append(0.1 * self.omega)
            obs = torch.cat(parts, dim=-1)
            return TensorDictShim(
                {"policy": obs}, batch_size=[self.num_envs], device="cpu"
            )

        def step(self, actions):
            u = torch.clamp(actions, -self.max_torque, self.max_torque)
            tau = u - torch.cat([u[:, 1:], torch.zeros_like(u[:, :1])], dim=1)
            theta, omega = self.theta, self.omega
            h = self.dt / self.n_substeps
            for _ in range(self.n_substeps):
                omega = omega + h * self._accel(theta, omega, tau)
                omega = torch.clamp(omega, -self.max_speed, self.max_speed)
                theta = theta + h * omega

            height = -torch.sum(self.lengths * torch.cos(theta), dim=-1)
            height = height / self._total_len
            rew = (
                height
                - 0.05 * torch.mean(omega**2, dim=-1)
                - 0.01 * torch.mean(u**2, dim=-1)
            )

            self.episode_length_buf += 1
            time_out = self.episode_length_buf >= self.max_episode_length
            done = time_out.clone()
            self._cur_return += rew
            if done.any():
                self.finished_returns.extend(self._cur_return[done].tolist())
                self._cur_return[done] = 0.0
                n_reset = int(done.sum())
                theta[done] = torch.empty(n_reset, self.L).uniform_(-0.1, 0.1)
                omega[done] = torch.empty(n_reset, self.L).uniform_(-0.05, 0.05)
                self.episode_length_buf[done] = 0
            self.theta, self.omega = theta, omega
            extras = {"time_outs": time_out}
            return self.get_observations(), rew, done, extras

    return TorchNLink(n, num_links, partially_observable)


def run_reference(
    seed: int, iterations: int, num_envs: int = 64, random_ep_len: bool = False,
    recurrent: bool = False,
) -> list[float]:
    from benchmarks._reference_shim import install_reference_shims

    install_reference_shims()
    import torch
    import rsl_rl.runners.on_policy_runner as ref_runner_mod
    from rsl_rl.runners import OnPolicyRunner as RefRunner

    ref_runner_mod.store_code_state = lambda *a, **k: []
    torch.manual_seed(seed)
    env = make_torch_nlink(num_envs, partially_observable=recurrent)
    import tempfile

    log_dir = tempfile.mkdtemp(prefix="ref_parity_nlink_")
    runner = RefRunner(env, train_cfg(seed, recurrent), log_dir=log_dir, device="cpu")
    runner.save = lambda *a, **k: None

    curve = []
    for it in range(iterations):
        before = len(env.finished_returns)
        # the reference randomizes episode_length_buf once, at learn() entry
        # (reference on_policy_runner.py:66-69)
        runner.learn(1, init_at_random_ep_len=random_ep_len and it == 0)
        new = env.finished_returns[before:]
        curve.append(sum(new) / len(new) if new else float("nan"))
    return curve


# --------------------------------------------------------------------------
# our side (JAX)
# --------------------------------------------------------------------------


def run_ours(
    seed: int, iterations: int, num_envs: int = 64, random_ep_len: bool = False,
    recurrent: bool = False,
) -> list[float]:
    import jax

    from rsl_rl_tpu.env import NLinkPendulum, PartiallyObservableNLink
    from rsl_rl_tpu.runners import OnPolicyRunner

    env_cls = PartiallyObservableNLink if recurrent else NLinkPendulum
    env = env_cls(
        num_envs=num_envs, num_links=NUM_LINKS, max_episode_length=MAX_EPISODE_LENGTH
    )
    runner = OnPolicyRunner(env, train_cfg(seed, recurrent), log_dir=None)
    ts, cs = runner.train_state, runner.collect_state
    if random_ep_len:
        # same desynchronization learn(init_at_random_ep_len=True) applies
        env_state = env.randomize_episode_length(
            cs.env_state, jax.random.PRNGKey(seed * 7919 + 13)
        )
        cs = cs.replace(env_state=env_state)
    curve = []
    for _ in range(iterations):
        ts, cs, rollout, cm = runner._collect(ts, cs)
        ts, cs, um = runner._update(ts, cs, rollout)
        m = jax.device_get(cm)
        count = float(m["ep_count"])
        curve.append(float(m["ep_reward_sum"]) / count if count > 0 else float("nan"))
    return curve


# --------------------------------------------------------------------------


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=500)
    p.add_argument("--seeds", type=int, nargs="+", default=list(range(1, 11)))
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--skip-reference", action="store_true")
    p.add_argument(
        "--random-ep-len", action="store_true",
        help="desynchronize episode boundaries (init_at_random_ep_len) on"
        " both sides — diagnostic for synchronized-reset artifacts",
    )
    p.add_argument(
        "--recurrent", action="store_true",
        help="GRU ActorCriticRecurrent on the partially observable task"
        " (angular velocities hidden)",
    )
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()
    if args.out is None:
        suffix = "_recurrent" if args.recurrent else ""
        args.out = f"benchmarks/results/parity_nlink{suffix}.json"

    curves = {"rsl_rl_tpu": [], "reference": []}
    timings = {}

    for seed in args.seeds:
        t0 = time.time()
        curves["rsl_rl_tpu"].append(
            run_ours(
                seed, args.iterations, args.num_envs, args.random_ep_len,
                args.recurrent,
            )
        )
        timings.setdefault("rsl_rl_tpu_s", []).append(round(time.time() - t0, 1))
        print(f"[ours seed={seed}] done in {timings['rsl_rl_tpu_s'][-1]}s", flush=True)

    if not args.skip_reference and os.path.isdir("/root/reference"):
        for seed in args.seeds:
            t0 = time.time()
            curves["reference"].append(
                run_reference(
                    seed, args.iterations, args.num_envs, args.random_ep_len,
                    args.recurrent,
                )
            )
            timings.setdefault("reference_s", []).append(round(time.time() - t0, 1))
            print(
                f"[reference seed={seed}] done in {timings['reference_s'][-1]}s",
                flush=True,
            )

    rows = summarize(curves)
    task = f"nlink{NUM_LINKS}_swingup_{args.num_envs}envs"
    if args.recurrent:
        task = f"po_nlink{NUM_LINKS}_gru_{args.num_envs}envs"
    out = {
        "task": task,
        "iterations": args.iterations,
        "seeds": args.seeds,
        "checkpoints": rows,
        "timings": timings,
        "curves": curves,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps(rows, indent=2))
    print(f"full curves -> {args.out}")


if __name__ == "__main__":
    main()
