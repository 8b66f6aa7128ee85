"""Data-parallel training with HOST (non-JAX) environments.

The reference's multi-GPU path composes with any external simulator — each
rank steps its own env and gradients all-reduce (reference
on_policy_runner.py:353-395, ppo.py:441-469). These tests prove the TPU
counterpart (parallel/host_dp.py): the hybrid collection loop driven through
a ``HostShardingBridge`` trains identically on

- 1 device (legacy un-bridged path) vs 2 devices (bridged, global programs),
  in one process — ``TestSingleProcessHostDP``;
- 2 real processes each stepping its own env SHARD vs one process stepping
  the full env — ``TestMultiProcessHostDP`` (the pattern of
  tests/test_distributed.py, now with host envs).

Exactness is possible because jitted steps are global programs: the
normalizer's batch mean is a global mean via XLA collectives, so unlike the
reference's DDP (whose per-rank normalizer buffers silently drift) the
training state stays truly replicated.
"""

from __future__ import annotations

import ast
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from tests.host_env_double import ShardableHostEnv

_WORKER = os.path.join(os.path.dirname(__file__), "host_dp_worker.py")


def _ppo_cfg(recurrent: bool = False) -> dict:
    policy = {
        "class_name": "ActorCritic",
        "activation": "elu",
        "actor_obs_normalization": True,
        "critic_obs_normalization": True,
        "actor_hidden_dims": [16],
        "critic_hidden_dims": [16],
    }
    if recurrent:
        policy.update(
            {"class_name": "ActorCriticRecurrent", "rnn_type": "gru", "rnn_hidden_dim": 8}
        )
    return {
        "num_steps_per_env": 8,
        "save_interval": 10_000,
        "seed": 7,
        "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
        "logger": "tensorboard",
        "policy": policy,
        "algorithm": {
            "class_name": "PPO",
            "learning_rate": 1e-3,
            "num_learning_epochs": 2,
            "num_mini_batches": 2,
            "schedule": "adaptive",
            "desired_kl": 0.01,
            "gamma": 0.99,
            "lam": 0.95,
            "clip_param": 0.2,
            "entropy_coef": 0.01,
            "value_loss_coef": 1.0,
            "max_grad_norm": 1.0,
            "use_clipped_value_loss": True,
        },
    }


def _train_losses(runner, iters: int = 3) -> list[dict]:
    ts, cs = runner.train_state, runner.collect_state
    out = []
    for _ in range(iters):
        ts, cs, rollout, cm = runner._collect(ts, cs)
        ts, cs, um = runner._update(ts, cs, rollout)
        out.append(
            {k: float(v) for k, v in jax.device_get(um).items() if k.startswith("Loss/")}
        )
    return out


def _assert_loss_seqs_close(a: list[dict], b: list[dict]) -> None:
    for sa, sb in zip(a, b):
        assert set(sa) == set(sb)
        for k, va in sa.items():
            vb = sb[k]
            assert abs(va - vb) <= 1e-5 + 1e-3 * abs(va), f"{k}: {va} vs {vb}"


class TestSingleProcessHostDP:
    @pytest.mark.parametrize("recurrent", [False, True], ids=["feedforward", "recurrent"])
    def test_bridged_2dev_matches_unbridged_1dev(self, recurrent):
        from rsl_rl_tpu.runners import OnPolicyRunner

        losses = {}
        for device in ("cpu:0", None):  # 1-device legacy path, 2-device bridge
            env = ShardableHostEnv(num_envs=8)
            runner = OnPolicyRunner(env, _ppo_cfg(recurrent), log_dir=None, device=device)
            if device is None:
                assert runner._host_bridge is not None, "2-device host run must bridge"
                assert runner.num_devices == 2
            else:
                assert runner._host_bridge is None
            losses[device] = _train_losses(runner)
        _assert_loss_seqs_close(losses["cpu:0"], losses[None])

    def test_indivisible_env_count_falls_back_to_single_device(self):
        """A single-process host env whose count does not divide the visible
        devices must warn and train single-device, not fail construction
        (it trained fine before host DP existed)."""
        import warnings as _warnings

        from rsl_rl_tpu.runners import OnPolicyRunner

        env = ShardableHostEnv(num_envs=7)  # 2 CPU devices visible
        with _warnings.catch_warnings(record=True) as w:
            _warnings.simplefilter("always")
            runner = OnPolicyRunner(env, _ppo_cfg(False), log_dir=None)
        assert runner._host_bridge is None
        assert runner.num_devices == 1
        assert any("not divisible" in str(x.message) for x in w)
        _train_losses(runner, iters=1)  # trains

    def test_distillation_bridge_matches_unbridged(self):
        """The distillation hybrid loop through the bridge (algorithm-level:
        the runner requires a loaded teacher, irrelevant to sharding)."""
        from rsl_rl_tpu.algorithms.distillation import Distillation
        from rsl_rl_tpu.modules import StudentTeacher
        from rsl_rl_tpu.parallel.host_dp import HostShardingBridge
        from rsl_rl_tpu.parallel.mesh import make_mesh, replicated, shard_tree
        from rsl_rl_tpu.algorithms.ppo import CollectState, init_episode_stats
        from rsl_rl_tpu.parallel.mesh import data_sharding

        groups = {"policy": ["policy"], "teacher": ["policy"]}
        losses = {}
        for ndev in (1, 2):
            env = ShardableHostEnv(num_envs=8)
            obs_local = env.reset()
            obs = {k: jax.numpy.asarray(v) for k, v in obs_local.items()}
            policy = StudentTeacher(
                obs, groups, env.num_actions,
                student_hidden_dims=[16], teacher_hidden_dims=[16],
                student_obs_normalization=True,
            )
            alg = Distillation(policy, gradient_length=4, max_grad_norm=1.0)
            ts = alg.init_train_state(jax.random.PRNGKey(1), env.num_envs)
            mesh = make_mesh(jax.devices()[:ndev])
            bridge = HostShardingBridge(mesh) if ndev > 1 else None
            ts = shard_tree(ts, replicated(mesh))
            if bridge is not None:
                cs = CollectState(
                    env_state=(),
                    obs=bridge.to_global({k: np.asarray(v) for k, v in obs_local.items()}),
                    carry=shard_tree(policy.initial_carry(env.num_envs), data_sharding(mesh)),
                    stats=init_episode_stats(env.num_envs),
                )
            else:
                cs = alg.init_collect_state_from((), obs, env.num_envs)
            collect = alg.make_host_collect_fn(env, 8, bridge=bridge)
            update = jax.jit(alg.make_update_fn())
            seq = []
            for _ in range(3):
                ts, cs, rollout, cm = collect(ts, cs)
                ts, cs, um = update(ts, cs, rollout)
                seq.append({k: float(v) for k, v in jax.device_get(um).items()
                            if k.startswith("Loss/")})
            losses[ndev] = seq
        _assert_loss_seqs_close(losses[1], losses[2])

    def test_shard_composability_of_double(self):
        """Sanity: two shards stepped side by side equal the full env."""
        full = ShardableHostEnv(num_envs=8)
        s0 = ShardableHostEnv(num_envs=4, start_id=0)
        s1 = ShardableHostEnv(num_envs=4, start_id=4)
        of, o0, o1 = full.reset(), s0.reset(), s1.reset()
        np.testing.assert_array_equal(
            of["policy"], np.concatenate([o0["policy"], o1["policy"]])
        )
        rng = np.random.default_rng(0)
        for _ in range(40):
            a = rng.uniform(-1, 1, size=(8, 2)).astype(np.float32)
            of, rf, df, _ = full.step(a)
            o0, r0, d0, _ = s0.step(a[:4])
            o1, r1, d1, _ = s1.step(a[4:])
            np.testing.assert_array_equal(
                of["policy"], np.concatenate([o0["policy"], o1["policy"]])
            )
            np.testing.assert_array_equal(rf, np.concatenate([r0, r1]))
            np.testing.assert_array_equal(df, np.concatenate([d0, d1]))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _parse_losses(out: str, pid: int) -> list[dict]:
    for line in out.splitlines():
        if line.startswith(f"proc{pid} losses:"):
            return [dict(step) for step in ast.literal_eval(line.split(":", 1)[1].strip())]
    raise AssertionError(f"no loss line for proc{pid} in:\n{out}")


class TestMultiProcessHostDP:
    """Two REAL processes, each stepping its own 8-env host shard through the
    full OnPolicyRunner; losses must be replicated across processes AND match
    a single-process run over the 16-env full env (the done-criterion of the
    reference-DDP-for-external-simulators capability)."""

    def _spawn(self):
        port = _free_port()
        env = {**os.environ, "JAX_PLATFORMS": ""}
        procs = [
            subprocess.Popen(
                [sys.executable, _WORKER, str(i), "2", str(port)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
            )
            for i in range(2)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=240)
                outs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        return procs, outs

    def test_two_process_host_shards_match_single_process(self):
        for _attempt in range(2):  # retry once: _free_port TOCTOU
            procs, outs = self._spawn()
            if all(p.returncode == 0 for p in procs):
                break
        assert all(p.returncode == 0 for p in procs), (
            f"worker failed:\nproc0:\n{outs[0]}\n\nproc1:\n{outs[1] if len(outs) > 1 else ''}"
        )
        l0 = _parse_losses(outs[0], 0)
        l1 = _parse_losses(outs[1], 1)
        _assert_loss_seqs_close(l0, l1)

        # single process, full 16-env host env over this process's 2 devices
        from rsl_rl_tpu.runners import OnPolicyRunner

        env_ = ShardableHostEnv(num_envs=16)
        cfg = _ppo_cfg()
        runner = OnPolicyRunner(env_, cfg, log_dir=None)
        assert runner._host_bridge is not None
        single = _train_losses(runner, iters=len(l0))
        _assert_loss_seqs_close(l0, single)
