"""Deterministic evaluation: the jitted eval program and the runner's
``eval_interval`` integration (``Eval/*`` scalars).

No reference counterpart (its users hand-roll play scripts, reference
on_policy_runner.py:326-330); the invariants tested here are ours:
evaluation must complete episodes, must not perturb training numerics,
and must refuse host envs.
"""

import os

import jax
import numpy as np
import pytest

from rsl_rl_tpu.env import PointMass
from rsl_rl_tpu.modules import ActorCritic, ActorCriticRecurrent
from rsl_rl_tpu.runners import OnPolicyRunner
from rsl_rl_tpu.utils.evaluation import evaluate_policy

from tests.test_ppo_integration import _runner_cfg


def _policy(env, recurrent: bool = False):
    _, obs = env.reset(jax.random.PRNGKey(0))
    groups = {"policy": ["policy"], "critic": ["policy"]}
    if recurrent:
        policy = ActorCriticRecurrent(
            obs, groups, env.num_actions, rnn_type="gru", rnn_hidden_dim=8,
            actor_hidden_dims=[16], critic_hidden_dims=[16],
        )
    else:
        policy = ActorCritic(
            obs, groups, env.num_actions,
            actor_hidden_dims=[16], critic_hidden_dims=[16],
        )
    return policy, policy.init(jax.random.PRNGKey(1))


class TestEvaluatePolicy:
    def test_completes_episodes_and_reports_stats(self):
        env = PointMass(num_envs=8, max_episode_length=16)
        policy, ps = _policy(env)
        m = evaluate_policy(env, policy, ps, 33, jax.random.PRNGKey(2))
        # 33 steps over 16-step episodes: every env completes >= 2 episodes
        assert m["Eval/episode_count"] >= 16
        assert np.isfinite(m["Eval/mean_reward"])
        assert 0 < m["Eval/mean_episode_length"] <= 16
        assert m["Eval/min_return"] <= m["Eval/mean_reward"] <= m["Eval/max_return"]

    def test_deterministic_given_key(self):
        env = PointMass(num_envs=4, max_episode_length=16)
        policy, ps = _policy(env)
        a = evaluate_policy(env, policy, ps, 20, jax.random.PRNGKey(3))
        b = evaluate_policy(env, policy, ps, 20, jax.random.PRNGKey(3))
        assert a == b

    def test_recurrent_carry_threads_through(self):
        env = PointMass(num_envs=4, max_episode_length=16)
        policy, ps = _policy(env, recurrent=True)
        m = evaluate_policy(env, policy, ps, 20, jax.random.PRNGKey(4))
        assert m["Eval/episode_count"] >= 4
        assert np.isfinite(m["Eval/mean_reward"])


class TestRunnerEvalInterval:
    def _cfg(self, **kw):
        return _runner_cfg(
            obs_groups={"policy": ["policy"], "critic": ["policy"]},
            num_steps_per_env=8,
            **kw,
        )

    def _eval_tags(self, log_dir):
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )

        acc = EventAccumulator(log_dir)
        acc.Reload()
        return [t for t in acc.Tags()["scalars"] if t.startswith("Eval/")]

    def test_eval_scalars_written(self, tmp_path):
        env = PointMass(num_envs=8, max_episode_length=16)
        runner = OnPolicyRunner(
            env, self._cfg(eval_interval=2), log_dir=str(tmp_path)
        )
        runner.learn(3)
        tags = self._eval_tags(str(tmp_path))
        assert "Eval/episode_count" in tags
        assert "Eval/mean_reward" in tags

    def test_eval_does_not_perturb_training(self, tmp_path):
        env = PointMass(num_envs=8, max_episode_length=16)
        plain = OnPolicyRunner(env, self._cfg(), log_dir=str(tmp_path / "a"))
        plain.learn(2)
        with_eval = OnPolicyRunner(
            env, self._cfg(eval_interval=1), log_dir=str(tmp_path / "b")
        )
        with_eval.learn(2)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            jax.device_get(plain.train_state.policy.params),
            jax.device_get(with_eval.train_state.policy.params),
        )

    def test_eval_under_k_dispatch_runs_at_group_boundary(self, tmp_path):
        env = PointMass(num_envs=8, max_episode_length=16)
        runner = OnPolicyRunner(
            env,
            self._cfg(eval_interval=2, iterations_per_dispatch=2),
            log_dir=str(tmp_path),
        )
        runner.learn(4)
        assert "Eval/episode_count" in self._eval_tags(str(tmp_path))

    def test_host_env_rejected(self):
        from tests.host_env_double import ShardableHostEnv

        with pytest.raises(ValueError, match="eval_interval"):
            OnPolicyRunner(
                ShardableHostEnv(num_envs=8),
                self._cfg(eval_interval=2),
                log_dir=None,
            )


class TestMultiSeedEval:
    def test_vmapped_eval_scalars_written(self, tmp_path):
        from rsl_rl_tpu.runners import MultiSeedRunner

        env = PointMass(num_envs=8, max_episode_length=16)
        cfg = _runner_cfg(
            obs_groups={"policy": ["policy"], "critic": ["policy"]},
            num_steps_per_env=8,
            eval_interval=2,
        )
        runner = MultiSeedRunner(env, cfg, num_seeds=2, log_dir=str(tmp_path))
        runner.learn(3)
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )

        acc = EventAccumulator(str(tmp_path))
        acc.Reload()
        tags = acc.Tags()["scalars"]
        assert "Eval/mean_reward" in tags
        assert "Eval/mean_reward_std" in tags
        assert "Eval/best_seed_reward" in tags
        # 16-step episodes, eval budget = max episode length: both seeds'
        # 8 envs each complete exactly one episode per eval
        counts = [s.value for s in acc.Scalars("Eval/episode_count")]
        assert all(c == 16.0 for c in counts)
