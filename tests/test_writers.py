"""Writer backends: TB scalar writing, W&B/Neptune dual-write plumbing.

The external backends aren't installed in CI, so their wrappers are tested
through injected fake modules — the dual-write contract, name mapping,
config/model/diff upload hooks and the factory's error paths
(reference wandb_utils.py:18-87, neptune_utils.py:29-94,
on_policy_runner.py:438-460).
"""

import sys
import types

import pytest

from rsl_rl_tpu.utils.writers import TensorBoardWriter, make_writer


class TestTensorBoard:
    def test_scalars_written(self, tmp_path):
        w = make_writer("tensorboard", str(tmp_path))
        assert isinstance(w, TensorBoardWriter)
        w.add_scalar("Loss/test", 1.5, 0)
        w.add_scalar("Loss/test", 1.0, 1)
        w.stop()
        files = list(tmp_path.iterdir())
        assert any("events.out" in f.name for f in files)

    def test_unknown_logger_raises(self, tmp_path):
        with pytest.raises(ValueError, match="Logger type not found"):
            make_writer("mlflow", str(tmp_path))

    def test_missing_backend_raises_importerror(self, tmp_path):
        # wandb/neptune are not installed in this image
        for name, err in (("wandb", "Wandb"), ("neptune", "Neptune")):
            if name in sys.modules:
                pytest.skip(f"{name} installed")
            with pytest.raises((ImportError, KeyError)):
                make_writer(name, str(tmp_path), cfg={})


class _FakeWandbRun:
    def __init__(self):
        self.name = "run-abc-7"


class TestWandbDualWrite:
    @pytest.fixture
    def fake_wandb(self, monkeypatch):
        mod = types.ModuleType("wandb")
        mod.logged = []
        mod.saved = []
        mod.run = _FakeWandbRun()
        mod.config = types.SimpleNamespace(update=lambda d: mod.logged.append(("config", d)))
        mod.init = lambda **kw: mod.logged.append(("init", kw))
        mod.log = lambda d, step=None: mod.logged.append(("log", d, step))
        mod.save = lambda path, base_path=None: mod.saved.append(path)
        mod.finish = lambda: mod.logged.append(("finish",))
        monkeypatch.setitem(sys.modules, "wandb", mod)
        return mod

    def test_scalars_dual_written_with_name_map(self, tmp_path, fake_wandb):
        w = make_writer("wandb", str(tmp_path), cfg={"wandb_project": "p", "experiment_name": "e"})
        w.add_scalar("Train/mean_reward/time", 3.0, 5)
        w.add_scalar("Loss/surrogate", -0.1, 5)
        logs = [e for e in fake_wandb.logged if e[0] == "log"]
        # slash-time tags are remapped for wandb (reference wandb_utils.py:41-46)
        assert ("log", {"Train/mean_reward_time": 3.0}, 5) in logs
        assert ("log", {"Loss/surrogate": -0.1}, 5) in logs
        # orbax checkpoint dirs nest array files; every one must be registered
        ckpt_dir = tmp_path / "model.ckpt"
        (ckpt_dir / "d").mkdir(parents=True)
        (ckpt_dir / "manifest.ocdbt").write_text("m")
        (ckpt_dir / "d" / "abc123").write_text("array-data")
        w.save_model(str(ckpt_dir), 5)
        assert str(ckpt_dir / "d" / "abc123") in fake_wandb.saved
        assert str(ckpt_dir / "manifest.ocdbt") in fake_wandb.saved
        w.stop()
        assert ("finish",) in fake_wandb.logged

    def test_missing_project_raises(self, tmp_path, fake_wandb):
        with pytest.raises(KeyError, match="wandb_project"):
            make_writer("wandb", str(tmp_path), cfg={})


class _FakeNeptuneHandle:
    """Records .log/.upload/.upload_files/assignment calls per key."""

    def __init__(self, store, key):
        self._store = store
        self._key = key

    def log(self, value, step=None):
        self._store.append(("log", self._key, value, step))

    def upload(self, path):
        self._store.append(("upload", self._key, path))

    def upload_files(self, pattern):
        self._store.append(("upload_files", self._key, pattern))


class _FakeNeptuneRun:
    def __init__(self, store):
        self._store = store

    def __getitem__(self, key):
        return _FakeNeptuneHandle(self._store, key)

    def __setitem__(self, key, value):
        self._store.append(("set", key, value))

    def stop(self):
        self._store.append(("stop",))


class TestNeptuneDualWrite:
    """Mirror of TestWandbDualWrite for the Neptune backend
    (reference neptune_utils.py:29-94)."""

    @pytest.fixture
    def fake_neptune(self, monkeypatch):
        mod = types.ModuleType("neptune")
        mod.calls = []
        mod.init_run = lambda **kw: (mod.calls.append(("init", kw)), _FakeNeptuneRun(mod.calls))[1]
        monkeypatch.setitem(sys.modules, "neptune", mod)
        return mod

    def test_scalars_dual_written(self, tmp_path, fake_neptune):
        w = make_writer(
            "neptune", str(tmp_path),
            cfg={"neptune_project": "org/proj", "run_name": "exp-1"},
        )
        init = [c for c in fake_neptune.calls if c[0] == "init"][0]
        assert init[1]["project"] == "org/proj"
        w.add_scalar("Loss/surrogate", -0.25, 3)
        logs = [c for c in fake_neptune.calls if c[0] == "log"]
        assert ("log", "Loss/surrogate", -0.25, 3) in logs
        # TensorBoard side also written
        w.stop()
        assert ("stop",) in fake_neptune.calls
        assert any("events.out" in f.name for f in tmp_path.iterdir())

    def test_model_and_diff_upload(self, tmp_path, fake_neptune):
        import os

        w = make_writer("neptune", str(tmp_path), cfg={"neptune_project": "p"})
        # checkpoints are orbax directories with NESTED array files
        # (d/<hash>, ocdbt.process_0/...); globs are non-recursive, so the
        # writer must enumerate every file explicitly
        ckpt_dir = tmp_path / "model_5.ckpt"
        (ckpt_dir / "d").mkdir(parents=True)
        (ckpt_dir / "manifest.ocdbt").write_text("m")
        (ckpt_dir / "d" / "abc123").write_text("array-data")
        w.save_model(str(ckpt_dir), 5)
        uploads = [c for c in fake_neptune.calls if c[0] == "upload_files"]
        assert uploads and uploads[0][1] == "model/saved_model_5"
        assert sorted(uploads[0][2]) == [
            os.path.join(str(ckpt_dir), "d", "abc123"),
            os.path.join(str(ckpt_dir), "manifest.ocdbt"),
        ]
        # git diffs stay single files -> plain upload
        diff = tmp_path / "repo.diff"
        diff.write_text("diff")
        w.save_file(str(diff))
        assert any(c[0] == "upload" and c[1].startswith("git_diff/") for c in fake_neptune.calls)

    def test_missing_project_raises(self, tmp_path, fake_neptune):
        with pytest.raises(KeyError, match="neptune_project"):
            make_writer("neptune", str(tmp_path), cfg={})
