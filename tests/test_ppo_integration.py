"""Integration tests: PPO end-to-end on tiny JAX envs (SURVEY.md §4.2-4.3)."""

import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsl_rl_tpu.algorithms.ppo import PPO
from rsl_rl_tpu.env import Pendulum, PointMass
from rsl_rl_tpu.modules import ActorCritic, ActorCriticRecurrent
from rsl_rl_tpu.runners import OnPolicyRunner


def _runner_cfg(**overrides):
    cfg = {
        "num_steps_per_env": 16,
        "save_interval": 1000,
        "seed": 1,
        "obs_groups": {"policy": ["policy"], "critic": ["policy", "privileged"]},
        "logger": "tensorboard",
        "policy": {
            "class_name": "ActorCritic",
            "activation": "elu",
            "actor_obs_normalization": False,
            "critic_obs_normalization": False,
            "actor_hidden_dims": [32, 32],
            "critic_hidden_dims": [32, 32],
            "init_noise_std": 1.0,
            "noise_std_type": "scalar",
        },
        "algorithm": {
            "class_name": "PPO",
            "learning_rate": 1e-3,
            "num_learning_epochs": 4,
            "num_mini_batches": 4,
            "schedule": "adaptive",
            "value_loss_coef": 1.0,
            "clip_param": 0.2,
            "use_clipped_value_loss": True,
            "desired_kl": 0.01,
            "entropy_coef": 0.01,
            "gamma": 0.99,
            "lam": 0.95,
            "max_grad_norm": 1.0,
            "normalize_advantage_per_mini_batch": False,
        },
    }
    cfg.update(overrides)
    return cfg


class TestLearning:
    def test_pointmass_reward_improves(self):
        """PPO must visibly improve on the trivially-solvable PointMass."""
        env = PointMass(num_envs=32, max_episode_length=64)
        runner = OnPolicyRunner(env, _runner_cfg(), log_dir=None)

        collect, update = runner._collect, runner._update
        ts, cs = runner.train_state, runner.collect_state
        window = []
        for it in range(150):
            ts, cs, rollout, cm = collect(ts, cs)
            ts, cs, um = update(ts, cs, rollout)
            window.append(
                (float(cm["ep_reward_sum"]), float(cm["ep_count"]))
            )
        first = sum(r for r, _ in window[:30]) / max(sum(c for _, c in window[:30]), 1)
        last = sum(r for r, _ in window[-30:]) / max(sum(c for _, c in window[-30:]), 1)
        assert last > first + 5.0, f"no improvement: first={first}, last={last}"

    def test_recurrent_ppo_runs_and_is_finite(self):
        env = PointMass(num_envs=16, max_episode_length=32)
        cfg = _runner_cfg()
        cfg["policy"] = {
            "class_name": "ActorCriticRecurrent",
            "actor_hidden_dims": [16],
            "critic_hidden_dims": [16],
            "rnn_type": "gru",
            "rnn_hidden_dim": 16,
        }
        runner = OnPolicyRunner(env, cfg, log_dir=None)
        ts, cs = runner.train_state, runner.collect_state
        for _ in range(5):
            ts, cs, rollout, cm = runner._collect(ts, cs)
            ts, cs, um = runner._update(ts, cs, rollout)
        for k, v in um.items():
            assert np.isfinite(float(v)), f"{k} is not finite"

    def test_rnd_ppo_runs(self):
        env = PointMass(num_envs=16, max_episode_length=32)
        cfg = _runner_cfg()
        cfg["obs_groups"]["rnd_state"] = ["policy"]
        cfg["algorithm"]["rnd_cfg"] = {
            "weight": 0.5,
            "state_normalization": True,
            "reward_normalization": True,
            "learning_rate": 1e-3,
            "num_outputs": 4,
            "predictor_hidden_dims": [-1],
            "target_hidden_dims": [-1],
        }
        runner = OnPolicyRunner(env, cfg, log_dir=None)
        ts, cs = runner.train_state, runner.collect_state
        for _ in range(3):
            ts, cs, rollout, cm = runner._collect(ts, cs)
            ts, cs, um = runner._update(ts, cs, rollout)
        assert "Loss/rnd" in um
        assert np.isfinite(float(um["Loss/rnd"]))
        # the RND weight was scaled by env.step_dt (resolve_rnd_config)
        assert float(cm["Rnd/weight"]) == pytest.approx(0.5 * env.step_dt)


class TestBf16ConfigPath:
    """`policy: {dtype: bfloat16}` arrives from YAML as a STRING — the whole
    stack (MLP trunks, recurrent memories, mixed-precision step math, Pallas
    operand casts) must accept it end-to-end."""

    @pytest.mark.parametrize("policy_cfg", [
        {"class_name": "ActorCritic", "actor_hidden_dims": [32],
         "critic_hidden_dims": [32], "dtype": "bfloat16"},
        {"class_name": "ActorCriticRecurrent", "rnn_type": "gru",
         "rnn_hidden_dim": 16, "actor_hidden_dims": [32],
         "critic_hidden_dims": [32], "dtype": "bfloat16"},
    ])
    def test_string_dtype_trains(self, policy_cfg):
        env = PointMass(num_envs=8, max_episode_length=16)
        cfg = _runner_cfg(policy=policy_cfg)
        runner = OnPolicyRunner(env, cfg, log_dir=None)
        ts, cs = runner.train_state, runner.collect_state
        for _ in range(2):
            ts, cs, rollout, cm = runner._collect(ts, cs)
            ts, cs, um = runner._update(ts, cs, rollout)
        assert np.isfinite(float(um["Loss/value_function"]))
        # params stay fp32 (bf16 is compute-only)
        leaf = jax.tree.leaves(ts.policy.params)[0]
        assert leaf.dtype == jnp.float32


class TestDataParallelConsistency:
    """The same seed must give (numerically) identical training on 1 and 2
    devices — data parallelism is pure sharding (SURVEY.md §4.3). Covers every
    guaranteed variant (__graft_entry__.VARIANTS): plain/recurrent PPO, RND
    (per-env reward_norm + counter in the carried state), symmetry (augmented
    losses), and feedforward/recurrent distillation (segmented-BPTT update,
    matching the reference's dedicated grad-allreduce at
    reference distillation.py:157-185)."""

    # keep literal (pytest ids stay stable); the sync test below fails if
    # __graft_entry__.VARIANTS gains a variant this list doesn't cover
    VARIANT_LIST = [
        "feedforward", "recurrent", "recurrent_lstm", "rnd",
        "symmetry_feedforward", "symmetry_recurrent", "distillation",
        "distillation_recurrent", "domain_randomized",
    ]

    def test_covers_every_guaranteed_variant(self):
        import __graft_entry__ as graft

        assert set(self.VARIANT_LIST) == set(graft.VARIANTS), (
            "a new guaranteed variant must be added to the 1-vs-2-device"
            " consistency parametrization"
        )

    @pytest.mark.parametrize("variant", VARIANT_LIST)
    def test_1dev_vs_2dev_same_losses(self, variant):
        import __graft_entry__ as graft
        from rsl_rl_tpu.parallel.mesh import (
            data_sharding,
            make_mesh,
            replicated,
            shard_tree,
        )

        assert variant in graft.VARIANTS
        results = {}
        for ndev in (1, 2):
            env, alg = graft.make_variant(variant, num_envs=16, hidden=16)
            ts = alg.init_train_state(jax.random.PRNGKey(1), 16)
            cs = alg.init_collect_state(jax.random.PRNGKey(2), env)
            mesh = make_mesh(jax.devices()[:ndev])
            ts = shard_tree(ts, replicated(mesh))
            cs = shard_tree(cs, data_sharding(mesh))
            collect = jax.jit(alg.make_collect_fn(env, 8))
            update = jax.jit(alg.make_update_fn())
            losses = []
            for _ in range(3):
                ts, cs, rollout, cm = collect(ts, cs)
                ts, cs, um = update(ts, cs, rollout)
                losses.append({k: float(v) for k, v in um.items()
                               if k.startswith("Loss/")})
            results[ndev] = losses
        # per-key, per-step comparison (a summed criterion could hide
        # compensating per-term differences); mixed abs+rel tolerance since a
        # purely relative one is ill-conditioned near zero
        for step_1dev, step_2dev in zip(results[1], results[2]):
            assert set(step_1dev) == set(step_2dev)
            for k, a in step_1dev.items():
                b = step_2dev[k]
                assert abs(a - b) <= 1e-5 + 1e-3 * abs(a), (
                    f"{k}: 1-device {a} vs 2-device {b}"
                )


class TestIterationsPerDispatch:
    """K-iterations-per-program mode: one lax.scan dispatch per K fused
    iterations must train identically to per-iteration fused dispatches,
    keep per-iteration logging, and still write checkpoints."""

    def test_k_dispatch_matches_per_iteration(self, tmp_path):
        params = {}
        for cfg_extra in ({"fuse_iteration": True},
                          {"iterations_per_dispatch": 3}):
            env = PointMass(num_envs=8, max_episode_length=16)
            cfg = _runner_cfg(**cfg_extra)
            runner = OnPolicyRunner(env, cfg, log_dir=None)
            runner.learn(7)  # 3 + 3 + 1: exercises the remainder-chunk program
            params[tuple(cfg_extra)] = jax.device_get(runner.train_state.policy.params)
        a, b = params.values()
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(la, lb, rtol=1e-5, atol=1e-7)

    def test_k_dispatch_logs_and_saves(self, tmp_path):
        env = PointMass(num_envs=8, max_episode_length=16)
        cfg = _runner_cfg(iterations_per_dispatch=4)
        cfg["save_interval"] = 5
        runner = OnPolicyRunner(env, cfg, log_dir=str(tmp_path))
        runner.learn(8)
        # per-iteration scalars in the tfevents file + group-boundary ckpts
        assert any(f.startswith("events.out") for f in os.listdir(tmp_path))
        ckpts = [f for f in os.listdir(tmp_path) if f.startswith("model_")]
        # iteration 5 hit the save boundary inside group [4..7] -> saved at
        # the group end (7), plus the final save
        assert "model_7.ckpt" in ckpts
        assert runner.current_learning_iteration == 7

    def test_k_dispatch_rejects_host_envs(self):
        from tests.host_env_double import ShardableHostEnv

        env = ShardableHostEnv(num_envs=8)
        cfg = _runner_cfg(iterations_per_dispatch=2)
        cfg["obs_groups"] = {"policy": ["policy"], "critic": ["policy"]}
        with pytest.raises(ValueError, match="JAX-native"):
            OnPolicyRunner(env, cfg, log_dir=None)


class TestCheckpointing:
    def test_save_load_resume_identical(self, tmp_path):
        """save -> load must restore bit-identical training trajectories."""
        env = PointMass(num_envs=8, max_episode_length=16)
        cfg = _runner_cfg()
        runner = OnPolicyRunner(env, cfg, log_dir=str(tmp_path))
        runner.learn(3)
        path = os.path.join(str(tmp_path), "snap.ckpt")
        runner.save(path)
        ref_params = jax.device_get(runner.train_state.policy.params)

        env2 = PointMass(num_envs=8, max_episode_length=16)
        runner2 = OnPolicyRunner(env2, _runner_cfg(), log_dir=None)
        runner2.load(path)
        got_params = jax.device_get(runner2.train_state.policy.params)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            ref_params, got_params,
        )
        assert runner2.current_learning_iteration == runner.current_learning_iteration
        # optimizer state restored as well
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            jax.device_get(runner.train_state.opt_state),
            jax.device_get(runner2.train_state.opt_state),
        )

    def test_load_without_optimizer(self, tmp_path):
        env = PointMass(num_envs=8, max_episode_length=16)
        runner = OnPolicyRunner(env, _runner_cfg(), log_dir=str(tmp_path))
        runner.learn(2)
        path = os.path.join(str(tmp_path), "snap.ckpt")
        runner.save(path)
        runner2 = OnPolicyRunner(
            PointMass(num_envs=8, max_episode_length=16), _runner_cfg(), log_dir=None
        )
        lr_before = float(runner2.train_state.lr)
        runner2.load(path, load_optimizer=False)
        assert float(runner2.train_state.lr) == lr_before


class TestRunnerLogging:
    def test_tensorboard_files_written(self, tmp_path):
        env = PointMass(num_envs=8, max_episode_length=16)
        runner = OnPolicyRunner(env, _runner_cfg(), log_dir=str(tmp_path))
        runner.learn(2)
        files = os.listdir(str(tmp_path))
        assert any(f.startswith("events.out.tfevents") for f in files)
        assert any(f.startswith("model_") for f in files)
        assert os.path.isdir(os.path.join(str(tmp_path), "git"))


class TestAutoResume:
    def test_load_latest_resumes_newest(self, tmp_path):
        from rsl_rl_tpu.env import PointMass
        from rsl_rl_tpu.runners import OnPolicyRunner
        from rsl_rl_tpu.utils.checkpoint import latest_checkpoint

        cfg = {
            "num_steps_per_env": 8, "save_interval": 1, "seed": 5,
            "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
            "logger": "tensorboard",
            "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [16],
                       "critic_hidden_dims": [16]},
            "algorithm": {"class_name": "PPO"},
        }
        runner = OnPolicyRunner(PointMass(num_envs=4), cfg, log_dir=str(tmp_path))
        runner.learn(3)
        path = latest_checkpoint(str(tmp_path))
        assert path is not None and path.endswith("model_2.ckpt")

        fresh = OnPolicyRunner(PointMass(num_envs=4), cfg, log_dir=str(tmp_path))
        assert fresh.load_latest()
        assert fresh.current_learning_iteration == 2

    def test_load_latest_returns_false_when_empty(self, tmp_path):
        from rsl_rl_tpu.env import PointMass
        from rsl_rl_tpu.runners import OnPolicyRunner

        cfg = {
            "num_steps_per_env": 8, "save_interval": 100, "seed": 5,
            "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
            "logger": "tensorboard",
            "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [16],
                       "critic_hidden_dims": [16]},
            "algorithm": {"class_name": "PPO"},
        }
        runner = OnPolicyRunner(PointMass(num_envs=4), cfg, log_dir=str(tmp_path))
        assert not runner.load_latest()


class TestFusedIteration:
    def test_fused_mode_trains_and_logs(self, tmp_path):
        from rsl_rl_tpu.env import PointMass
        from rsl_rl_tpu.runners import OnPolicyRunner

        cfg = {
            "num_steps_per_env": 8, "save_interval": 100, "seed": 6,
            "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
            "logger": "tensorboard", "fuse_iteration": True,
            "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [16],
                       "critic_hidden_dims": [16]},
            "algorithm": {"class_name": "PPO"},
        }
        runner = OnPolicyRunner(PointMass(num_envs=4), cfg, log_dir=str(tmp_path))
        runner.learn(3)
        assert runner.current_learning_iteration == 2
        assert any(f.startswith("events.out") for f in os.listdir(str(tmp_path)))


class TestConfigReuse:
    def test_rnd_weight_not_compounded_across_runners(self):
        """Building two runners from ONE config template must not scale the
        RND weight by step_dt twice (resolve_rnd_config copies, never
        mutates the user's dict)."""
        from rsl_rl_tpu.env import PointMass

        template = {
            "num_steps_per_env": 8, "save_interval": 100, "seed": 1,
            "obs_groups": {"policy": ["policy"], "critic": ["policy"],
                           "rnd_state": ["policy"]},
            "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [16],
                       "critic_hidden_dims": [16]},
            "algorithm": {"class_name": "PPO", "rnd_cfg": {
                "weight": 1.0, "predictor_hidden_dims": [8],
                "target_hidden_dims": [8], "num_outputs": 4,
            }},
        }
        r1 = OnPolicyRunner(PointMass(num_envs=4), template, log_dir=None)
        r2 = OnPolicyRunner(PointMass(num_envs=4), template, log_dir=None)
        assert template["algorithm"]["rnd_cfg"]["weight"] == 1.0
        dt = PointMass(num_envs=1).step_dt
        assert np.isclose(r1.alg.rnd.initial_weight, dt)
        assert np.isclose(r2.alg.rnd.initial_weight, dt)

    def test_rnd_resume_requires_rnd_state(self, tmp_path):
        """Resuming an RND run from a non-RND checkpoint must fail loudly."""
        from rsl_rl_tpu.env import PointMass

        plain_cfg = {
            "num_steps_per_env": 8, "save_interval": 100, "seed": 1,
            "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
            "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [16],
                       "critic_hidden_dims": [16]},
            "algorithm": {"class_name": "PPO"},
        }
        plain = OnPolicyRunner(PointMass(num_envs=4), plain_cfg, log_dir=None)
        ckpt = str(tmp_path / "plain.ckpt")
        plain.save(ckpt)

        rnd_cfg = {
            **plain_cfg,
            "obs_groups": {"policy": ["policy"], "critic": ["policy"],
                           "rnd_state": ["policy"]},
            "algorithm": {"class_name": "PPO", "rnd_cfg": {
                "weight": 1.0, "predictor_hidden_dims": [8],
                "target_hidden_dims": [8], "num_outputs": 4,
            }},
        }
        rnd_runner = OnPolicyRunner(PointMass(num_envs=4), rnd_cfg, log_dir=None)
        with pytest.raises(ValueError, match="no RND state"):
            rnd_runner.load(ckpt)


class TestInferencePolicy:
    def test_device_pinned_inference(self):
        from rsl_rl_tpu.env import PointMass

        cfg = {
            "num_steps_per_env": 8, "save_interval": 100, "seed": 1,
            "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
            "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [16],
                       "critic_hidden_dims": [16]},
            "algorithm": {"class_name": "PPO"},
        }
        runner = OnPolicyRunner(PointMass(num_envs=4), cfg, log_dir=None)
        target = jax.devices("cpu")[-1]
        policy = runner.get_inference_policy(device=f"cpu:{len(jax.devices('cpu')) - 1}")
        _, obs = runner.env.reset(jax.random.PRNGKey(0))
        action = policy(obs)
        assert action.shape == (4, 1)
        assert target in action.devices()


class TestProfilerTraceResume:
    def test_resume_past_trace_start_does_not_crash(self, tmp_path):
        """A run resumed past trace_window[0] never called start_trace; the
        stop at trace_window[1] must be skipped, not raise
        RuntimeError('No profile started') and kill training."""
        from rsl_rl_tpu.env import Pendulum
        from rsl_rl_tpu.runners import OnPolicyRunner

        cfg = _runner_cfg()
        cfg["obs_groups"] = {"policy": ["policy"], "critic": ["policy"]}
        cfg["profiler_trace_iterations"] = [0, 2]
        runner = OnPolicyRunner(
            Pendulum(num_envs=8, max_episode_length=16), cfg, log_dir=str(tmp_path)
        )
        runner.current_learning_iteration = 1  # resumed past the start
        runner.learn(3)  # iterations 1..3 cross trace_window[1] == 2


class TestAutoMiniBatches:
    """num_mini_batches="auto": the measured-knee selection rule
    (README "Tuning"; sweep in benchmarks/results/sweep_minibatches.json)."""

    def test_resolution_rule(self):
        from rsl_rl_tpu.algorithms.ppo import resolve_num_mini_batches

        # integers pass through untouched (reference contract)
        assert resolve_num_mini_batches(7, 24, 4096, False) == 7
        # headline shape: 4096*24 = 98.3k rows -> 4 minibatches (24.6k rows)
        assert resolve_num_mini_batches("auto", 24, 4096, False) == 4
        # 16384 envs -> 16 minibatches (the README-measured winner)
        assert resolve_num_mini_batches("auto", 24, 16384, False) == 16
        # small workloads stay at the reference default 4
        assert resolve_num_mini_batches("auto", 24, 64, False) == 4
        # recurrent divisibility is on the env axis: 4100 envs * 24 steps =
        # 98.4k rows wants 8, but 4100 % 8 != 0 -> stops at 4
        assert resolve_num_mini_batches("auto", 24, 4100, True) == 4
        assert resolve_num_mini_batches("auto", 24, 8192, True) == 8

    def test_auto_trains_and_matches_explicit(self):
        """"auto" at a shape resolving to 4 must train exactly like an
        explicit 4 (same permutation stream, same updates)."""
        params = {}
        for nmb in (4, "auto"):
            env = PointMass(num_envs=8, max_episode_length=16)
            cfg = _runner_cfg()
            cfg["algorithm"]["num_mini_batches"] = nmb
            runner = OnPolicyRunner(env, cfg, log_dir=None)
            runner.learn(3)
            params[str(nmb)] = jax.device_get(runner.train_state.policy.params)
        for la, lb in zip(jax.tree.leaves(params["4"]), jax.tree.leaves(params["auto"])):
            np.testing.assert_array_equal(la, lb)
