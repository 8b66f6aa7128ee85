"""Symmetry augmentation and mirror-loss integration tests
(reference ppo.py:226-244, 317-348)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsl_rl_tpu.env import PointMass
from rsl_rl_tpu.env.toy import point_mass_symmetry
from rsl_rl_tpu.runners import OnPolicyRunner
from rsl_rl_tpu.utils.resolvers import string_to_callable


def _cfg(symmetry_cfg):
    return {
        "num_steps_per_env": 8,
        "save_interval": 1000,
        "seed": 1,
        "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
        "policy": {
            "class_name": "ActorCritic",
            "actor_hidden_dims": [16],
            "critic_hidden_dims": [16],
        },
        "algorithm": {
            "class_name": "PPO",
            "learning_rate": 1e-3,
            "num_learning_epochs": 2,
            "num_mini_batches": 2,
            "symmetry_cfg": symmetry_cfg,
        },
    }


class TestSymmetryFunction:
    def test_augmentation_shape_and_mirror(self):
        obs = {"policy": jnp.asarray([[1.0, 2.0]])}
        actions = jnp.asarray([[0.5]])
        obs_aug, act_aug = point_mass_symmetry(obs=obs, actions=actions)
        assert obs_aug["policy"].shape == (2, 2)
        np.testing.assert_allclose(np.asarray(obs_aug["policy"][1]), [-1.0, -2.0])
        np.testing.assert_allclose(np.asarray(act_aug[1]), [-0.5])

    def test_string_resolution(self):
        fn = string_to_callable("rsl_rl_tpu.env.toy:point_mass_symmetry")
        assert fn is point_mass_symmetry


class TestSymmetryTraining:
    def test_data_augmentation_runs_and_learns(self):
        env = PointMass(num_envs=16, max_episode_length=32)
        cfg = _cfg(
            {
                "use_data_augmentation": True,
                "use_mirror_loss": False,
                "data_augmentation_func": "rsl_rl_tpu.env.toy:point_mass_symmetry",
                "mirror_loss_coeff": 0.0,
            }
        )
        runner = OnPolicyRunner(env, cfg, log_dir=None)
        ts, cs = runner.train_state, runner.collect_state
        rewards = []
        for _ in range(60):
            ts, cs, rollout, cm = runner._collect(ts, cs)
            ts, cs, um = runner._update(ts, cs, rollout)
            rewards.append((float(cm["ep_reward_sum"]), float(cm["ep_count"])))
        assert "Loss/symmetry" in um
        assert np.isfinite(float(um["Loss/symmetry"]))
        first = sum(r for r, _ in rewards[:15]) / max(sum(c for _, c in rewards[:15]), 1)
        last = sum(r for r, _ in rewards[-15:]) / max(sum(c for _, c in rewards[-15:]), 1)
        assert last > first, f"no improvement with augmentation: {first} -> {last}"

    def test_mirror_loss_mode(self):
        env = PointMass(num_envs=16, max_episode_length=32)
        cfg = _cfg(
            {
                "use_data_augmentation": False,
                "use_mirror_loss": True,
                "data_augmentation_func": point_mass_symmetry,
                "mirror_loss_coeff": 0.5,
            }
        )
        runner = OnPolicyRunner(env, cfg, log_dir=None)
        ts, cs = runner.train_state, runner.collect_state
        sym_losses = []
        for _ in range(25):
            ts, cs, rollout, _ = runner._collect(ts, cs)
            ts, cs, um = runner._update(ts, cs, rollout)
            sym_losses.append(float(um["Loss/symmetry"]))
        assert np.isfinite(sym_losses).all()
        # the mirror loss is being minimized: it should drop from its start
        assert min(sym_losses[-5:]) < sym_losses[0] + 1e-6

    def test_logging_only_mode(self, capsys):
        """use_data_augmentation=False and use_mirror_loss=False: symmetry is
        tracked for logging only (reference ppo.py:77-80)."""
        env = PointMass(num_envs=8, max_episode_length=16)
        cfg = _cfg(
            {
                "use_data_augmentation": False,
                "use_mirror_loss": False,
                "data_augmentation_func": point_mass_symmetry,
                "mirror_loss_coeff": 0.0,
            }
        )
        runner = OnPolicyRunner(env, cfg, log_dir=None)
        assert "Symmetry not used for learning" in capsys.readouterr().out
        ts, cs = runner.train_state, runner.collect_state
        ts, cs, rollout, _ = runner._collect(ts, cs)
        ts, cs, um = runner._update(ts, cs, rollout)
        assert "Loss/symmetry" in um

    def test_recurrent_symmetry_raises(self):
        env = PointMass(num_envs=8, max_episode_length=16)
        cfg = _cfg(
            {
                "use_data_augmentation": True,
                "use_mirror_loss": False,
                "data_augmentation_func": point_mass_symmetry,
                "mirror_loss_coeff": 0.0,
            }
        )
        cfg["policy"] = {
            "class_name": "ActorCriticRecurrent",
            "actor_hidden_dims": [8],
            "critic_hidden_dims": [8],
            "rnn_hidden_dim": 8,
        }
        with pytest.raises(NotImplementedError):
            OnPolicyRunner(env, cfg, log_dir=None)


class TestRecurrentSymmetryGate:
    def test_logging_only_symmetry_rejected_for_recurrent(self):
        """Even logging-only symmetry configs must be rejected for recurrent
        policies (the mirror-loss block can't replay a [T, nb] batch through
        the stateful single-step act_inference)."""
        import jax
        import jax.numpy as jnp

        from rsl_rl_tpu.algorithms.ppo import PPO
        from rsl_rl_tpu.modules import ActorCriticRecurrent

        policy = ActorCriticRecurrent(
            {"policy": jnp.zeros((4, 3))},
            {"policy": ["policy"], "critic": ["policy"]},
            1,
            rnn_type="gru", rnn_hidden_dim=8,
            actor_hidden_dims=[8], critic_hidden_dims=[8],
        )
        with pytest.raises(NotImplementedError, match="recurrent"):
            PPO(policy, symmetry_cfg={
                "use_data_augmentation": False,
                "use_mirror_loss": False,
                "data_augmentation_func": "rsl_rl_tpu.env.toy:point_mass_symmetry",
            })
