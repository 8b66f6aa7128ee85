"""Vectorized multi-seed training tests (runners/multiseed.py).

vmap over the seed axis must be pure batching: each seed's trajectory
matches what the same seed produces in a standalone single-seed run, and
distinct seeds produce distinct trajectories.
"""

import os

import jax
import numpy as np
import pytest

from rsl_rl_tpu.runners.multiseed import make_multiseed_train


def _losses(um, i=None):
    total = 0.0
    for k, v in um.items():
        if k.startswith("Loss/") and k != "Loss/learning_rate":
            total += float(v if i is None else v[i])
    return total


class TestMultiseed:
    @pytest.mark.parametrize("variant", [
        "feedforward", "recurrent",
        # rnd vmaps the RND pytree (per-env reward_norm, counter);
        # distillation vmaps the chunked segmented-BPTT update
        "rnd", "distillation",
    ])
    def test_vmapped_seeds_match_standalone_runs(self, variant):
        import __graft_entry__ as graft

        env, alg = graft.make_variant(variant, num_envs=8, hidden=16)
        init, train_step = make_multiseed_train(alg, env, num_steps_per_env=8, num_seeds=2)
        key = jax.random.PRNGKey(7)
        ts, cs = init(key)
        batched = []
        for _ in range(2):
            ts, cs, metrics = train_step(ts, cs)
            batched.append(metrics)

        # replay each seed standalone with the same key derivation
        keys = jax.random.split(key, 2)
        collect = jax.jit(alg.make_collect_fn(env, 8))
        update = jax.jit(alg.make_update_fn())
        for i in range(2):
            ts_i = alg.init_train_state(keys[i], env.num_envs)
            cs_i = alg.init_collect_state(jax.random.fold_in(keys[i], 1), env)
            for it in range(2):
                ts_i, cs_i, rollout, cm = collect(ts_i, cs_i)
                ts_i, cs_i, um = update(ts_i, cs_i, rollout)
                np.testing.assert_allclose(
                    _losses(batched[it], i), _losses(um), rtol=1e-4,
                    err_msg=f"seed {i} iteration {it} diverged from standalone run",
                )

    def test_seeds_are_independent(self):
        import __graft_entry__ as graft

        env, alg = graft.make_variant("feedforward", num_envs=8, hidden=16)
        init, train_step = make_multiseed_train(alg, env, num_steps_per_env=8, num_seeds=3)
        ts, cs = init(jax.random.PRNGKey(0))
        ts, cs, metrics = train_step(ts, cs)
        vf = np.asarray(metrics["Loss/value_function"])
        assert vf.shape == (3,)
        assert len({float(x) for x in vf}) == 3, "seeds produced identical losses"

    def test_seed_axis_shards_over_mesh(self):
        """Seeds place across the data mesh axis like any other batch dim."""
        import __graft_entry__ as graft
        from rsl_rl_tpu.parallel.mesh import data_sharding, make_mesh, shard_tree

        env, alg = graft.make_variant("feedforward", num_envs=8, hidden=16)
        init, train_step = make_multiseed_train(alg, env, num_steps_per_env=8, num_seeds=2)
        ts, cs = init(jax.random.PRNGKey(3))
        mesh = make_mesh(jax.devices()[:2])
        ts = shard_tree(ts, data_sharding(mesh))  # leading axis == seeds
        cs = shard_tree(cs, data_sharding(mesh))
        ts, cs, metrics = train_step(ts, cs)
        assert np.all(np.isfinite(np.asarray(metrics["Loss/value_function"])))


class TestMultiSeedRunner:
    """Productized multi-seed training: logging, stacked checkpoints with
    bit-identical resume, per-seed export to the single-seed runner."""

    CFG = {
        "num_steps_per_env": 8,
        "save_interval": 2,
        "seed": 3,
        "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
        "logger": "tensorboard",
        "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [16],
                   "critic_hidden_dims": [16], "actor_obs_normalization": True,
                   "critic_obs_normalization": True},
        "algorithm": {"class_name": "PPO", "schedule": "adaptive",
                      "desired_kl": 0.01, "num_learning_epochs": 2,
                      "num_mini_batches": 2},
    }

    def _runner(self, log_dir=None):
        import copy

        from rsl_rl_tpu.env import Pendulum
        from rsl_rl_tpu.runners import MultiSeedRunner

        env = Pendulum(num_envs=8, max_episode_length=16)
        return MultiSeedRunner(env, copy.deepcopy(self.CFG), num_seeds=3, log_dir=log_dir)

    def test_learn_logs_and_saves(self, tmp_path):
        runner = self._runner(str(tmp_path))
        runner.learn(3)
        files = os.listdir(str(tmp_path))
        assert any(f.startswith("events.out.tfevents") for f in files)
        assert any(f.startswith("model_") for f in files)

    def test_resume_bit_identical(self, tmp_path):
        runner = self._runner(str(tmp_path))
        runner.learn(3)
        path = os.path.join(str(tmp_path), "snap.ckpt")
        runner.save(path)

        runner2 = self._runner()
        runner2.load(path)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            jax.device_get(runner.train_state.policy.params),
            jax.device_get(runner2.train_state.policy.params),
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            jax.device_get(runner.train_state.opt_state),
            jax.device_get(runner2.train_state.opt_state),
        )
        assert runner2.current_learning_iteration == runner.current_learning_iteration

    def test_seed_count_mismatch_rejected(self, tmp_path):
        import copy

        import pytest

        from rsl_rl_tpu.env import Pendulum
        from rsl_rl_tpu.runners import MultiSeedRunner

        runner = self._runner(str(tmp_path))
        runner.learn(1)
        path = os.path.join(str(tmp_path), "snap.ckpt")
        runner.save(path)
        other = MultiSeedRunner(
            Pendulum(num_envs=8, max_episode_length=16), copy.deepcopy(self.CFG),
            num_seeds=2,
        )
        with pytest.raises(ValueError, match="seeds"):
            other.load(path)

    def test_rnd_mismatch_rejected(self, tmp_path):
        """A checkpoint saved without RND state must fail a load into an
        RND-configured runner with a named error, not a bare KeyError."""
        import copy

        import pytest

        from rsl_rl_tpu.env import Pendulum
        from rsl_rl_tpu.runners import MultiSeedRunner

        runner = self._runner(str(tmp_path))
        runner.learn(1)
        path = os.path.join(str(tmp_path), "snap.ckpt")
        runner.save(path)
        cfg = copy.deepcopy(self.CFG)
        cfg["algorithm"]["rnd_cfg"] = {
            "weight": 0.5,
            "num_outputs": 4,
            "predictor_hidden_dims": [-1],
            "target_hidden_dims": [-1],
        }
        other = MultiSeedRunner(
            Pendulum(num_envs=8, max_episode_length=16), cfg, num_seeds=3,
        )
        with pytest.raises(ValueError, match="RND"):
            other.load(path)

    def test_save_seed_loads_into_single_runner(self, tmp_path):
        from rsl_rl_tpu.env import Pendulum
        from rsl_rl_tpu.runners import OnPolicyRunner

        runner = self._runner(str(tmp_path))
        runner.learn(2)
        path = os.path.join(str(tmp_path), "seed1.ckpt")
        runner.save_seed(path, 1)

        import copy

        single = OnPolicyRunner(
            Pendulum(num_envs=8, max_episode_length=16), copy.deepcopy(self.CFG),
            log_dir=None,
        )
        single.load(path)
        # exported params equal the studied seed's slice
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b)),
            jax.device_get(runner.train_state.policy.params),
            jax.device_get(single.train_state.policy.params),
        )
        assert single.current_learning_iteration == runner.current_learning_iteration
        single.learn(1)  # and it keeps training

    def test_host_env_rejected(self):
        import copy

        import pytest

        from tests.host_env_double import ShardableHostEnv
        from rsl_rl_tpu.runners import MultiSeedRunner

        with pytest.raises(ValueError, match="JAX-native"):
            MultiSeedRunner(ShardableHostEnv(num_envs=8), copy.deepcopy(self.CFG), 2)


class TestMultiseedKernelDispatch:
    def test_vmapped_replay_routes_to_xproj_cores(self, monkeypatch):
        """Under vmap (the multiseed transform) the replay must dispatch to
        the xproj-streaming cores — the batching behavior TPU-verified in
        the round-2 multiseed hardware run — and must NOT pick the
        x-streaming or stream-paired cores (unverified batched on hardware;
        pallas interpret mode cannot even execute a batched grid). This
        pins the dispatch DECISION; no kernel executes."""
        import jax.numpy as jnp

        from rsl_rl_tpu.ops import pallas_rnn

        T_, B_, D_, H_ = 4, 128, 8, 128
        picked = []

        def fake_xproj(dt, wh, bhn, carry0, xproj, resets):
            picked.append("xproj")
            return jnp.zeros((T_, B_, H_), jnp.float32)

        def fake_xstream(*a, **k):
            raise AssertionError("x-stream core selected under vmap")

        monkeypatch.setattr(pallas_rnn, "_gru_core", fake_xproj)
        monkeypatch.setattr(pallas_rnn, "_gru_core_x", fake_xstream)

        from rsl_rl_tpu.networks.memory import Memory

        mem = Memory(hidden_size=H_, rnn_type="gru", num_layers=1)
        params = mem.init(
            jax.random.PRNGKey(0), mem.initialize_carry(B_), jnp.zeros((B_, D_))
        )["params"]

        def one(x):
            return pallas_rnn.gru_sequence(
                params["cell_0"], jnp.zeros((B_, H_)), x, jnp.zeros((T_, B_), bool)
            )

        out = jax.vmap(one)(jnp.zeros((3, T_, B_, D_)))
        assert out.shape == (3, T_, B_, H_)
        assert picked == ["xproj"]

        # ...and WITHOUT vmap the same shape picks the x-stream core
        picked.clear()
        monkeypatch.setattr(
            pallas_rnn, "_gru_core_x",
            lambda *a, **k: (picked.append("xstream"), jnp.zeros((T_, B_, H_)))[1],
        )
        one(jnp.zeros((T_, B_, D_)))
        assert picked == ["xstream"]

    def test_under_vmap_detection(self):
        from rsl_rl_tpu.ops import pallas_rnn

        seen = {}

        def inner(y):
            seen["vmap_grad"] = pallas_rnn.under_vmap()
            return (y * y).sum()

        jax.jit(jax.vmap(jax.grad(inner)))(np.ones((2, 3), np.float32))
        assert seen["vmap_grad"] is True

        def plain(y):
            seen["jit"] = pallas_rnn.under_vmap()
            return y * 2

        jax.jit(plain)(np.ones(3, np.float32))
        assert seen["jit"] is False

    def test_jax_version_pin(self):
        """The trace-walk's jax-internals assumption is pinned at import
        time: the running jax must be in the verified series (otherwise the
        module emits a RuntimeWarning at import — too late to test here, so
        assert the predicate both ways instead)."""
        from rsl_rl_tpu.ops import pallas_rnn

        # the image's jax is a verified series, so import stayed silent
        assert pallas_rnn._jax_version_verified() is True
        assert pallas_rnn._jax_version_verified(jax.__version__) is True
        # an unverified version must trip the predicate the warning keys on
        assert pallas_rnn._jax_version_verified("0.4.35") is False
        assert pallas_rnn._jax_version_verified("1.0.0") is False
        # every pinned series entry is prefix-shaped (ends with a dot), so
        # "0.9." cannot accidentally match "0.90.x"
        for p in pallas_rnn._VERIFIED_JAX_SERIES:
            assert p.endswith(".")
        assert pallas_rnn._jax_version_verified("0.90.0") is False


class TestMultiSeedRunnerConfigResolution:
    """The runner must resolve rnd_cfg/symmetry_cfg exactly like
    OnPolicyRunner (num_states/obs_groups/step_dt for RND, the _env handle
    for symmetry) — the docstring promises schema parity."""

    def _cfg(self, alg_extra):
        return {
            "num_steps_per_env": 8,
            "save_interval": 1000,
            "seed": 1,
            "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
            "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [16],
                       "critic_hidden_dims": [16]},
            "algorithm": {"class_name": "PPO", "num_learning_epochs": 2,
                          "num_mini_batches": 2, **alg_extra},
        }

    def test_rnd_cfg_trains(self):
        from rsl_rl_tpu.env import PointMass
        from rsl_rl_tpu.runners import MultiSeedRunner

        env = PointMass(num_envs=8, max_episode_length=16)
        runner = MultiSeedRunner(
            env,
            self._cfg({
                "rnd_cfg": {
                    "weight": 0.5,
                    "num_outputs": 4,
                    "predictor_hidden_dims": [-1],
                    "target_hidden_dims": [-1],
                }
            }),
            num_seeds=2,
        )
        runner.learn(1)
        assert runner.train_state.rnd is not None

    def test_symmetry_cfg_trains(self):
        from rsl_rl_tpu.env import PointMass
        from rsl_rl_tpu.runners import MultiSeedRunner

        env = PointMass(num_envs=8, max_episode_length=16)
        runner = MultiSeedRunner(
            env,
            self._cfg({
                "symmetry_cfg": {
                    "use_data_augmentation": True,
                    "use_mirror_loss": False,
                    "data_augmentation_func": "rsl_rl_tpu.env.toy:point_mass_symmetry",
                    "mirror_loss_coeff": 0.0,
                }
            }),
            num_seeds=2,
        )
        runner.learn(1)


class TestMultiSeedRunnerFeatureParity:
    """MultiSeedRunner carries the full OnPolicyRunner feature set:
    K-iterations-per-dispatch, load_latest auto-resume, git snapshot,
    W&B config/model/diff uploads, profiler window, eval warning."""

    def _runner(self, log_dir=None, **cfg_extra):
        import copy

        from rsl_rl_tpu.env import Pendulum
        from rsl_rl_tpu.runners import MultiSeedRunner

        cfg = copy.deepcopy(TestMultiSeedRunner.CFG)
        cfg.update(cfg_extra)
        env = Pendulum(num_envs=8, max_episode_length=16)
        return MultiSeedRunner(env, cfg, num_seeds=2, log_dir=log_dir)

    def test_k_dispatch_matches_per_iteration(self):
        params = {}
        for extra in ({}, {"iterations_per_dispatch": 2}):
            runner = self._runner(**extra)
            runner.learn(5)  # 2 + 2 + 1: exercises the remainder program
            params[bool(extra)] = jax.device_get(runner.train_state.policy.params)
        for la, lb in zip(
            jax.tree.leaves(params[False]), jax.tree.leaves(params[True])
        ):
            np.testing.assert_allclose(la, lb, rtol=1e-5, atol=1e-7)

    def test_k_dispatch_logs_saves_and_counts(self, tmp_path):
        runner = self._runner(
            str(tmp_path), iterations_per_dispatch=3, save_interval=4
        )
        runner.learn(6)
        files = os.listdir(str(tmp_path))
        assert any(f.startswith("events.out.tfevents") for f in files)
        # iteration 4 hit the save boundary inside group [3..5] -> saved at
        # the group end (5), plus the final save
        assert "model_5.ckpt" in files
        assert runner.current_learning_iteration == 5
        assert runner.tot_timesteps == 6 * 8 * 8 * 2  # iters*steps*envs*seeds

    def test_k_dispatch_pbt(self):
        """The K-scan must also carry PBT state through the exchange."""
        import copy

        from rsl_rl_tpu.env import Pendulum
        from rsl_rl_tpu.runners import MultiSeedRunner

        cfg = copy.deepcopy(TestMultiSeedRunner.CFG)
        cfg["iterations_per_dispatch"] = 2
        runner = MultiSeedRunner(
            Pendulum(num_envs=8, max_episode_length=16),
            cfg,
            num_seeds=2,
            pbt={"exploit_interval": 2},
        )
        runner.learn(4)
        assert runner.pbt_state is not None

    def test_load_latest_resumes_newest(self, tmp_path):
        runner = self._runner(str(tmp_path))
        runner.learn(3)  # saves model_0, model_2 (+ final model_2)
        fresh = self._runner(str(tmp_path))
        assert fresh.load_latest()
        assert fresh.current_learning_iteration == runner.current_learning_iteration
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            jax.device_get(runner.train_state.policy.params),
            jax.device_get(fresh.train_state.policy.params),
        )

    def test_load_latest_returns_false_when_empty(self, tmp_path):
        runner = self._runner(str(tmp_path))
        assert not runner.load_latest()

    def test_git_snapshot_written(self, tmp_path):
        runner = self._runner(str(tmp_path))
        runner.learn(1)
        git_dir = os.path.join(str(tmp_path), "git")
        assert os.path.isdir(git_dir) and os.listdir(git_dir)

    def test_wandb_config_model_and_diff_upload(self, tmp_path, monkeypatch):
        """The W&B writer path gets config upload at construction, model
        upload on save, and git-diff upload at the first iteration — parity
        with OnPolicyRunner (reference wandb_utils.py:48-77)."""
        import sys
        import types

        mod = types.ModuleType("wandb")
        mod.logged = []
        mod.saved = []
        mod.run = types.SimpleNamespace(name="run-1")
        mod.config = types.SimpleNamespace(
            update=lambda d: mod.logged.append(("config", d))
        )
        mod.init = lambda **kw: mod.logged.append(("init", kw))
        mod.log = lambda d, step=None: mod.logged.append(("log", d, step))
        mod.save = lambda path, base_path=None: mod.saved.append(path)
        mod.finish = lambda: mod.logged.append(("finish",))
        monkeypatch.setitem(sys.modules, "wandb", mod)

        runner = self._runner(
            str(tmp_path), logger="wandb", wandb_project="proj"
        )
        runner.learn(2)
        assert any(e[0] == "config" for e in mod.logged)
        assert mod.saved  # model ckpt files + git diff registered
        assert any("repo.diff" in p for p in mod.saved)

    def test_profiler_window_writes_trace(self, tmp_path):
        runner = self._runner(str(tmp_path), profiler_trace_iterations=[0, 1])
        runner.learn(3)
        assert os.path.isdir(os.path.join(str(tmp_path), "profile"))

    def test_eval_without_logdir_warns(self):
        import pytest

        with pytest.warns(UserWarning, match="log_dir"):
            self._runner(eval_interval=2)


class TestIntrospectionSelfTest:
    def test_self_test_survives_first_call_under_vmap(self, monkeypatch):
        """The lazy introspection self-test must pass even when the FIRST
        under_vmap() call of the process happens inside an ambient vmap
        trace (a vmapped multiseed step) — the ambient BatchTrace must not
        read as 'introspection broken' and permanently disable the fused
        kernels (round-4 regression)."""
        from rsl_rl_tpu.ops import pallas_rnn

        monkeypatch.setattr(pallas_rnn, "_INTROSPECTION_OK", None)
        seen = {}

        def inner(y):
            seen["inside"] = pallas_rnn.under_vmap()
            return (y * y).sum()

        jax.jit(jax.vmap(jax.grad(inner)))(np.ones((2, 3), np.float32))
        assert seen["inside"] is True
        assert pallas_rnn._INTROSPECTION_OK is True

        def plain(y):
            seen["jit"] = pallas_rnn.under_vmap()
            return y * 2

        jax.jit(plain)(np.ones(3, np.float32))
        assert seen["jit"] is False


class TestMultiSeedDistillation:
    """MultiSeedRunner x Distillation: the runner accepts any registered
    algorithm sharing the collect/update factory surface; for student-teacher
    policies learn() gates on a loaded teacher (reference
    distillation_runner.py:61-62) and load_teacher() broadcasts one RL
    checkpoint's actor to every seed's frozen teacher."""

    def _distill_runner(self, num_seeds=3, log_dir=None):
        from rsl_rl_tpu.env import PointMass
        from rsl_rl_tpu.runners import MultiSeedRunner

        cfg = {
            "num_steps_per_env": 16,
            "save_interval": 1000,
            "seed": 2,
            "obs_groups": {"policy": ["policy"], "teacher": ["policy", "privileged"]},
            "logger": "tensorboard",
            "policy": {
                "class_name": "StudentTeacher",
                "student_hidden_dims": [32, 32],
                "teacher_hidden_dims": [32, 32],
                "teacher_obs_normalization": True,
            },
            "algorithm": {
                "class_name": "Distillation",
                "learning_rate": 1e-3,
                "gradient_length": 8,
                "num_learning_epochs": 1,
            },
        }
        env = PointMass(num_envs=16, max_episode_length=32)
        return MultiSeedRunner(env, cfg, num_seeds=num_seeds, log_dir=log_dir)

    @pytest.fixture(scope="class")
    def rl_checkpoint(self, tmp_path_factory):
        """A quick RL teacher whose actor sees the privileged obs."""
        from rsl_rl_tpu.env import PointMass
        from rsl_rl_tpu.runners import OnPolicyRunner

        cfg = {
            "num_steps_per_env": 16,
            "save_interval": 1000,
            "seed": 1,
            "obs_groups": {"policy": ["policy", "privileged"],
                           "critic": ["policy", "privileged"]},
            "logger": "tensorboard",
            "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [32, 32],
                       "critic_hidden_dims": [32, 32],
                       "actor_obs_normalization": True},
            "algorithm": {"class_name": "PPO", "learning_rate": 1e-3},
        }
        env = PointMass(num_envs=16, max_episode_length=32)
        runner = OnPolicyRunner(env, cfg, log_dir=None)
        ts, cs = runner.train_state, runner.collect_state
        for _ in range(10):
            ts, cs, rollout, _ = runner._collect(ts, cs)
            ts, cs, _ = runner._update(ts, cs, rollout)
        runner.train_state, runner.collect_state = ts, cs
        path = os.path.join(str(tmp_path_factory.mktemp("ms_teacher")), "teacher.ckpt")
        runner.save(path)
        return path

    def test_learn_requires_teacher(self):
        runner = self._distill_runner()
        with pytest.raises(ValueError, match="Teacher model parameters not loaded"):
            runner.learn(1)

    def test_load_teacher_broadcasts_and_distills(self, rl_checkpoint, tmp_path):
        runner = self._distill_runner(log_dir=str(tmp_path))
        runner.load_teacher(rl_checkpoint)

        # one shared teacher across seeds...
        aux = jax.device_get(runner.train_state.policy.aux)
        for leaf in jax.tree.leaves(aux["teacher"]):
            for i in range(1, runner.num_seeds):
                np.testing.assert_array_equal(leaf[i], leaf[0])
        # ...but independently-initialized students
        students = jax.tree.leaves(jax.device_get(runner.train_state.policy.params))
        assert any(not np.array_equal(leaf[0], leaf[1]) for leaf in students)

        # the behavior-cloning loss drops for EVERY seed, [S]-leading metrics
        ts, cs = runner.train_state, runner.collect_state
        first = last = None
        for it in range(20):
            ts, cs, m = runner._train_step(ts, cs)
            v = np.asarray(jax.device_get(m["Loss/behavior"]))
            if it == 0:
                first = v
            last = v
        assert last.shape == (runner.num_seeds,)
        assert np.isfinite(last).all()
        assert (last < first).all(), f"no distillation progress: {first} -> {last}"

        # and the full learn() loop (gate passed) logs + saves like PPO studies
        runner.train_state, runner.collect_state = ts, cs
        runner.learn(2)
        files = os.listdir(str(tmp_path))
        assert any(f.startswith("model_") for f in files)

    def test_load_teacher_rejects_distillation_checkpoint(self, rl_checkpoint, tmp_path):
        runner = self._distill_runner(log_dir=None)
        runner.load_teacher(rl_checkpoint)
        snap = os.path.join(str(tmp_path), "study.ckpt")
        runner.save(snap)
        runner2 = self._distill_runner()
        with pytest.raises(ValueError, match="distillation checkpoint"):
            runner2.load_teacher(snap)

    def test_load_teacher_rejects_non_student_policy(self, rl_checkpoint):
        from rsl_rl_tpu.env import PointMass
        from rsl_rl_tpu.runners import MultiSeedRunner

        cfg = {
            "num_steps_per_env": 8,
            "save_interval": 1000,
            "seed": 1,
            "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
            "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [16],
                       "critic_hidden_dims": [16]},
            "algorithm": {"class_name": "PPO"},
        }
        runner = MultiSeedRunner(
            PointMass(num_envs=8, max_episode_length=16), cfg, num_seeds=2
        )
        with pytest.raises(ValueError, match="no teacher"):
            runner.load_teacher(rl_checkpoint)
