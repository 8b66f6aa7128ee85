"""Multi-process (multi-"host") distributed training test.

Spawns two REAL processes, each with 2 virtual CPU devices, wires them with
``distributed_init(coordinator_address=...)`` (the pod-slice bootstrap path,
reference on_policy_runner.py:353-395), and runs data-parallel PPO over the
4-device global mesh. Asserts:

- both processes see the same replicated losses (the XLA-inserted
  allreduces actually crossed the process boundary), and
- those losses match an in-process run of the SAME global configuration on
  this process's 2 local devices — data parallelism is pure sharding, so
  the process topology (1x2 vs 2x2) must not change the math.
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

_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _parse_losses(out: str, pid: int) -> dict:
    for line in out.splitlines():
        if line.startswith(f"proc{pid} losses:"):
            return dict(ast.literal_eval(line.split(":", 1)[1].strip()))
    raise AssertionError(f"no loss line for proc{pid} in:\n{out}")


class TestMultiProcess:
    def _spawn(self):
        port = _free_port()
        env = {**os.environ, "JAX_PLATFORMS": ""}  # workers self-configure
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

    def test_two_process_training_matches_single_process(self):
        # _free_port closes its probe socket before the coordinator binds the
        # port (TOCTOU); one retry with a fresh port absorbs the rare race
        for attempt in range(2):
            procs, outs = self._spawn()
            if all(p.returncode == 0 for p in procs):
                break
        assert all(p.returncode == 0 for p in procs), (
            f"worker failed:\nproc0:\n{outs[0]}\n\nproc1:\n{outs[1] if len(outs) > 1 else ''}"
        )
        l0 = _parse_losses(outs[0], 0)
        l1 = _parse_losses(outs[1], 1)
        assert l0 == l1, "replicated losses differ across processes"

        # same global config in-process on 2 local devices must match
        import __graft_entry__ as graft
        from rsl_rl_tpu.parallel import data_sharding, make_mesh, replicated, shard_tree

        num_envs = 16  # worker: 4 * global device count (4)
        env_, alg = graft.make_variant("feedforward", num_envs=num_envs, hidden=16)
        ts = alg.init_train_state(jax.random.PRNGKey(1), num_envs)
        cs = alg.init_collect_state(jax.random.PRNGKey(2), env_)
        mesh = make_mesh(jax.devices()[:2])
        ts = shard_tree(ts, replicated(mesh))
        cs = shard_tree(cs, data_sharding(mesh))
        collect = jax.jit(alg.make_collect_fn(env_, 4))
        update = jax.jit(alg.make_update_fn())
        for _ in range(2):
            ts, cs, rollout, cm = collect(ts, cs)
            ts, cs, um = update(ts, cs, rollout)
        for k, v in l0.items():
            np.testing.assert_allclose(
                float(um[k]), v, rtol=1e-5,
                err_msg=f"{k}: 2-process run diverged from in-process run",
            )
