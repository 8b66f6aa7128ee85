"""Integration tests for student-teacher distillation."""

import os

import jax
import numpy as np
import pytest

from rsl_rl_tpu.env import PointMass
from rsl_rl_tpu.runners import DistillationRunner, OnPolicyRunner


def _rl_cfg():
    return {
        "num_steps_per_env": 16,
        "save_interval": 1000,
        "seed": 1,
        # the RL actor sees the privileged obs so its checkpoint can serve as
        # the (privileged) teacher for distillation
        "obs_groups": {"policy": ["policy", "privileged"], "critic": ["policy", "privileged"]},
        "logger": "tensorboard",
        "policy": {
            "class_name": "ActorCritic",
            "actor_hidden_dims": [32, 32],
            "critic_hidden_dims": [32, 32],
            "actor_obs_normalization": True,
        },
        "algorithm": {"class_name": "PPO", "learning_rate": 1e-3},
    }


def _distill_cfg(recurrent=False, **alg_overrides):
    policy = {
        "class_name": "StudentTeacherRecurrent" if recurrent else "StudentTeacher",
        "student_hidden_dims": [32, 32],
        "teacher_hidden_dims": [32, 32],
        "teacher_obs_normalization": True,
    }
    if recurrent:
        policy.update({"rnn_type": "gru", "rnn_hidden_dim": 16})
    return {
        "num_steps_per_env": 16,
        "save_interval": 1000,
        "seed": 2,
        "obs_groups": {"policy": ["policy"], "teacher": ["policy", "privileged"]},
        "logger": "tensorboard",
        "policy": policy,
        "algorithm": {
            "class_name": "Distillation",
            "learning_rate": 1e-3,
            "gradient_length": 8,
            "num_learning_epochs": 1,
            **alg_overrides,
        },
    }


@pytest.fixture(scope="module")
def rl_checkpoint(tmp_path_factory):
    """Train a quick RL teacher and save its checkpoint."""
    tmp = tmp_path_factory.mktemp("teacher")
    env = PointMass(num_envs=16, max_episode_length=32)
    runner = OnPolicyRunner(env, _rl_cfg(), log_dir=None)
    ts, cs = runner.train_state, runner.collect_state
    for _ in range(30):
        ts, cs, rollout, _ = runner._collect(ts, cs)
        ts, cs, _ = runner._update(ts, cs, rollout)
    runner.train_state, runner.collect_state = ts, cs
    path = os.path.join(str(tmp), "teacher.ckpt")
    runner.save(path)
    return path


class TestDistillation:
    def test_requires_loaded_teacher(self):
        env = PointMass(num_envs=8, max_episode_length=16)
        runner = DistillationRunner(env, _distill_cfg(), log_dir=None)
        with pytest.raises(ValueError, match="Teacher model parameters not loaded"):
            runner.learn(1)

    def test_student_learns_teacher(self, rl_checkpoint):
        """The behavior-cloning loss must drop sharply within a few updates."""
        env = PointMass(num_envs=16, max_episode_length=32)
        runner = DistillationRunner(env, _distill_cfg(), log_dir=None)
        infos = runner.load(rl_checkpoint)
        assert runner.current_learning_iteration == 0  # teacher load is NOT a resume
        ts, cs = runner.train_state, runner.collect_state
        losses = []
        for _ in range(40):
            ts, cs, rollout, _ = runner._collect(ts, cs)
            ts, cs, um = runner._update(ts, cs, rollout)
            losses.append(float(um["Loss/behavior"]))
        assert losses[-1] < losses[0] * 0.5, f"no distillation progress: {losses[:3]} -> {losses[-3:]}"

    def test_recurrent_student(self, rl_checkpoint):
        env = PointMass(num_envs=8, max_episode_length=16)
        runner = DistillationRunner(env, _distill_cfg(recurrent=True), log_dir=None)
        runner.load(rl_checkpoint)
        ts, cs = runner.train_state, runner.collect_state
        losses = []
        for _ in range(30):
            ts, cs, rollout, _ = runner._collect(ts, cs)
            ts, cs, um = runner._update(ts, cs, rollout)
            losses.append(float(um["Loss/behavior"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_huber_loss_and_grad_clip(self, rl_checkpoint):
        env = PointMass(num_envs=8, max_episode_length=16)
        runner = DistillationRunner(
            env, _distill_cfg(loss_type="huber", max_grad_norm=1.0), log_dir=None
        )
        runner.load(rl_checkpoint)
        ts, cs = runner.train_state, runner.collect_state
        ts, cs, rollout, _ = runner._collect(ts, cs)
        ts, cs, um = runner._update(ts, cs, rollout)
        assert np.isfinite(float(um["Loss/behavior"]))

    def test_distillation_resume_roundtrip(self, rl_checkpoint, tmp_path):
        env = PointMass(num_envs=8, max_episode_length=16)
        runner = DistillationRunner(env, _distill_cfg(), log_dir=str(tmp_path))
        runner.load(rl_checkpoint)
        runner.learn(2)
        snap = os.path.join(str(tmp_path), "distill.ckpt")
        runner.save(snap)

        runner2 = DistillationRunner(
            PointMass(num_envs=8, max_episode_length=16), _distill_cfg(), log_dir=None
        )
        runner2.load(snap)
        # distillation checkpoint IS a resume
        assert runner2.current_learning_iteration == runner.current_learning_iteration
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            jax.device_get(runner.train_state.policy.params),
            jax.device_get(runner2.train_state.policy.params),
        )


class TestChunkedReplayEquivalence:
    """The chunked whole-window replay (fused Pallas on TPU) must be
    numerically equivalent to the per-step-scan formulation: same per-step
    losses, same post-update params, same replay-end carry."""

    def _run(self, recurrent, force_per_step, teacher_recurrent=False,
             rnn_type="gru", epochs=2, gradient_length=5):
        import jax.numpy as jnp
        from rsl_rl_tpu.algorithms.distillation import Distillation
        from rsl_rl_tpu.modules import StudentTeacher, StudentTeacherRecurrent

        env = PointMass(num_envs=8, max_episode_length=6)  # frequent resets
        _, obs = env.reset(jax.random.PRNGKey(0))
        groups = {"policy": ["policy"], "critic": ["policy"], "teacher": ["policy"]}
        if recurrent:
            policy = StudentTeacherRecurrent(
                obs, groups, env.num_actions,
                rnn_type=rnn_type, rnn_hidden_dim=8,
                student_hidden_dims=[16], teacher_hidden_dims=[16],
                teacher_recurrent=teacher_recurrent,
            )
        else:
            policy = StudentTeacher(
                obs, groups, env.num_actions,
                student_hidden_dims=[16], teacher_hidden_dims=[16],
            )
        alg = Distillation(
            policy, num_learning_epochs=epochs,
            gradient_length=gradient_length, max_grad_norm=1.0,
        )
        if force_per_step:
            alg.MAX_UNROLLED_SEGMENTS = -1  # instance override
        ts = alg.init_train_state(jax.random.PRNGKey(1), env.num_envs)
        cs = alg.init_collect_state(jax.random.PRNGKey(2), env)
        collect = jax.jit(alg.make_collect_fn(env, 16))  # > episode length
        update = jax.jit(alg.make_update_fn())
        ts, cs, rollout, _ = collect(ts, cs)
        ts, cs, um = update(ts, cs, rollout)
        return ts, cs, float(um["Loss/behavior"])

    @pytest.mark.parametrize("case", [
        dict(recurrent=False),
        dict(recurrent=True, rnn_type="gru"),
        dict(recurrent=True, rnn_type="lstm"),
        dict(recurrent=True, rnn_type="gru", teacher_recurrent=True),
        # gradient_length not dividing epochs*T: exercises the tail chunks
        dict(recurrent=True, rnn_type="gru", epochs=1, gradient_length=7),
    ])
    def test_paths_agree(self, case):
        ts_a, cs_a, loss_a = self._run(force_per_step=False, **case)
        ts_b, cs_b, loss_b = self._run(force_per_step=True, **case)
        np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5)
        jax.tree_util.tree_map_with_path(
            lambda p, a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg=f"params mismatch at {jax.tree_util.keystr(p)}",
            ),
            ts_a.policy.params, ts_b.policy.params,
        )
        jax.tree_util.tree_map_with_path(
            lambda p, a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg=f"carry mismatch at {jax.tree_util.keystr(p)}",
            ),
            cs_a.carry, cs_b.carry,
        )
