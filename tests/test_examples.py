"""Smoke-execute every ``examples/`` script.

The 12 entry scripts are the framework's public face (the reference is a
library consumed downstream, reference README.md:6-10) and are named by the
docs as the deployment/conformance commands — this module keeps a refactor
from silently rotting them. Each script runs in a subprocess with tiny
arguments on one virtual CPU device.

Platform pinning gotcha: ``JAX_PLATFORMS``/``XLA_FLAGS`` env vars are
silently ignored for platform selection in this image (a sitecustomize
registers the TPU plugin and pins ``jax_platforms`` via ``jax.config``), so
the subprocess wrapper pins CPU with ``jax.config.update`` BEFORE the first
backend touch — the same pattern as tests/conftest.py.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")

# generous per-script budget: XLA compiles a handful of CPU programs per
# script and the 1-core CI box is often loaded
TIMEOUT_S = 900


def run_example(script: str, *args: str, timeout: int = TIMEOUT_S):
    path = os.path.join(EXAMPLES, script)
    wrapper = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import runpy, sys;"
        f"sys.argv = [{path!r}] + {list(args)!r};"
        f"runpy.run_path({path!r}, run_name='__main__')"
    )
    return subprocess.run(
        [sys.executable, "-c", wrapper],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )


def assert_ok(res, *needles: str):
    assert res.returncode == 0, (
        f"script failed (rc={res.returncode})\nstdout:\n{res.stdout[-3000:]}"
        f"\nstderr:\n{res.stderr[-3000:]}"
    )
    for needle in needles:
        assert needle in res.stdout, (
            f"expected {needle!r} in stdout:\n{res.stdout[-3000:]}"
        )


@pytest.fixture(scope="module")
def pendulum_run(tmp_path_factory):
    """One tiny train_pendulum run shared by the train/play/export tests."""
    log_dir = str(tmp_path_factory.mktemp("ex_pendulum"))
    res = run_example(
        "train_pendulum.py",
        "--num-envs", "8", "--iterations", "2", "--log-dir", log_dir,
    )
    return res, log_dir


class TestTrainScripts:
    def test_train_pendulum(self, pendulum_run):
        res, log_dir = pendulum_run
        assert_ok(res)
        files = os.listdir(log_dir)
        assert any(f.startswith("model_") for f in files), files
        assert any(f.startswith("events.out.tfevents") for f in files), files

    def test_train_recurrent(self, tmp_path):
        res = run_example(
            "train_recurrent.py",
            "--num-envs", "8", "--iterations", "2", "--rnn", "gru",
            "--log-dir", str(tmp_path),
        )
        assert_ok(res)
        assert any(f.startswith("model_") for f in os.listdir(str(tmp_path)))

    def test_train_domain_randomized(self, tmp_path):
        res = run_example(
            "train_domain_randomized.py",
            "--num-envs", "8", "--iterations", "2", "--num-links", "3",
            "--log-dir", str(tmp_path),
        )
        assert_ok(res)

    def test_train_mujoco_host(self, tmp_path):
        res = run_example(
            "train_mujoco_host.py",
            "--num-envs", "4", "--iterations", "2", "--num-links", "3",
            "--log-dir", str(tmp_path),
        )
        assert_ok(res)

    def test_train_multiseed(self):
        res = run_example(
            "train_multiseed.py",
            "--seeds", "2", "--num-envs", "8", "--iterations", "2",
        )
        assert_ok(res)

    def test_train_pbt(self):
        res = run_example(
            "train_pbt.py",
            "--seeds", "2", "--num-envs", "8", "--iterations", "4",
            "--exploit-interval", "2",
        )
        assert_ok(res)

    def test_train_multihost_single_host_degrade(self, tmp_path):
        # no coordinator + no pod markers -> degrades to local devices
        res = run_example(
            "train_multihost.py",
            "--num-envs", "8", "--iterations", "2", "--log-dir", str(tmp_path),
        )
        assert_ok(res)

    def test_train_mjx(self):
        """mujoco-mjx is not installed in this image (documented in
        docs/mjx_conformance.md): the script must fail with the clear
        install-gate message, not an obscure traceback. With mjx present it
        must instead train end-to-end."""
        res = run_example("train_mjx.py", "--num-envs", "4", "--iterations", "2")
        try:
            from rsl_rl_tpu.env.mjx_env import _HAS_MJX
        except ImportError:
            _HAS_MJX = False
        if _HAS_MJX:
            assert_ok(res)
        else:
            assert res.returncode != 0
            out = res.stdout + res.stderr
            assert "mjx" in out.lower(), out[-3000:]


class TestDistillScripts:
    def test_distill_student(self, tmp_path):
        res = run_example(
            "distill_student.py",
            "--num-envs", "8", "--teacher-iterations", "2",
            "--distill-iterations", "2", "--log-dir", str(tmp_path),
        )
        assert_ok(res)

    def test_distill_privileged(self, tmp_path):
        res = run_example(
            "distill_privileged.py",
            "--num-envs", "8", "--teacher-iterations", "2",
            "--distill-iterations", "2", "--log-dir", str(tmp_path),
        )
        assert_ok(res)


class TestDeployScripts:
    def _latest_ckpt(self, log_dir: str) -> str:
        cks = [f for f in os.listdir(log_dir) if f.startswith("model_")]
        assert cks, os.listdir(log_dir)
        return os.path.join(log_dir, sorted(cks)[-1])

    def test_play(self, pendulum_run):
        res0, log_dir = pendulum_run
        assert res0.returncode == 0, res0.stderr[-2000:]
        res = run_example(
            "play.py",
            "--ckpt", self._latest_ckpt(log_dir),
            "--num-envs", "4", "--steps", "32",
        )
        assert_ok(res)

    def test_export_policy(self, pendulum_run, tmp_path):
        res0, log_dir = pendulum_run
        assert res0.returncode == 0, res0.stderr[-2000:]
        out_dir = str(tmp_path)
        res = run_example(
            "export_policy.py",
            "--ckpt", self._latest_ckpt(log_dir), "--out-dir", out_dir,
        )
        assert_ok(res)
        produced = os.listdir(out_dir)
        for artifact in ("policy.stablehlo", "policy.pt", "reference_state_dict.pt"):
            assert artifact in produced, produced
