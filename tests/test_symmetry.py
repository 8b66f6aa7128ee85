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


def _recurrent_cfg(symmetry_cfg):
    cfg = _cfg(symmetry_cfg)
    cfg["policy"] = {
        "class_name": "ActorCriticRecurrent",
        "actor_hidden_dims": [16],
        "critic_hidden_dims": [16],
        "rnn_type": "gru",
        "rnn_hidden_dim": 16,
    }
    return cfg


class TestSequenceAugmentation:
    """Unit tests for the time-major augmentation helpers
    (rsl_rl_tpu/modules/symmetry.py — the scan-replay analog of reference
    ppo.py:226-257)."""

    def test_fold_layout(self):
        """Copies stack along the env axis, original first, per timestep."""
        from rsl_rl_tpu.modules.symmetry import apply_augmentation

        T, nb, D = 3, 2, 2
        obs = {"policy": jnp.arange(T * nb * D, dtype=jnp.float32).reshape(T, nb, D)}
        actions = jnp.arange(T * nb, dtype=jnp.float32).reshape(T, nb, 1)
        obs_a, act_a, num_aug = apply_augmentation(
            point_mass_symmetry, None, obs, actions, time_major=True
        )
        assert num_aug == 2
        assert obs_a["policy"].shape == (T, 2 * nb, D)
        # first nb columns are the original
        np.testing.assert_allclose(np.asarray(obs_a["policy"][:, :nb]), np.asarray(obs["policy"]))
        np.testing.assert_allclose(np.asarray(act_a[:, :nb]), np.asarray(actions))
        # second nb columns are the mirrored copy, timestep-aligned
        np.testing.assert_allclose(np.asarray(obs_a["policy"][:, nb:]), -np.asarray(obs["policy"]))
        np.testing.assert_allclose(np.asarray(act_a[:, nb:]), -np.asarray(actions))

    def test_tile_batch_layouts(self):
        from rsl_rl_tpu.modules.symmetry import tile_batch

        x = jnp.arange(6, dtype=jnp.float32).reshape(3, 2)  # [T, nb]
        tiled = tile_batch(x, 2, time_major=True)
        assert tiled.shape == (3, 4)
        np.testing.assert_allclose(np.asarray(tiled[:, :2]), np.asarray(x))
        np.testing.assert_allclose(np.asarray(tiled[:, 2:]), np.asarray(x))
        flat = jnp.arange(3, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(tile_batch(flat, 2, time_major=False)), [0, 1, 2, 0, 1, 2]
        )


class TestRecurrentSymmetryTraining:
    """Recurrent policies support all three symmetry modes
    (reference ppo.py:226-257, 317-348 runs them with masks/hidden states)."""

    def test_recurrent_data_augmentation_learns(self):
        env = PointMass(num_envs=16, max_episode_length=32)
        cfg = _recurrent_cfg(
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
        assert last > first, f"no improvement with recurrent augmentation: {first} -> {last}"

    def test_recurrent_mirror_loss_mode(self):
        env = PointMass(num_envs=16, max_episode_length=32)
        cfg = _recurrent_cfg(
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
        assert min(sym_losses[-5:]) < sym_losses[0] + 1e-6

    def test_recurrent_logging_only_mode(self):
        env = PointMass(num_envs=8, max_episode_length=16)
        cfg = _recurrent_cfg(
            {
                "use_data_augmentation": False,
                "use_mirror_loss": False,
                "data_augmentation_func": point_mass_symmetry,
                "mirror_loss_coeff": 0.0,
            }
        )
        runner = OnPolicyRunner(env, cfg, log_dir=None)
        ts, cs = runner.train_state, runner.collect_state
        ts, cs, rollout, _ = runner._collect(ts, cs)
        ts, cs, um = runner._update(ts, cs, rollout)
        assert "Loss/symmetry" in um
        assert np.isfinite(float(um["Loss/symmetry"]))

    def test_recurrent_augmented_update_matches_manual_tiling(self):
        """The augmented recurrent forward must see the mirrored obs with the
        same window-start carry and resets as the original (tile semantics)."""
        from rsl_rl_tpu.modules.symmetry import apply_augmentation, tile_carry

        env = PointMass(num_envs=8, max_episode_length=16)
        cfg = _recurrent_cfg(
            {
                "use_data_augmentation": True,
                "use_mirror_loss": False,
                "data_augmentation_func": point_mass_symmetry,
                "mirror_loss_coeff": 0.0,
            }
        )
        runner = OnPolicyRunner(env, cfg, log_dir=None)
        policy = runner.alg.policy
        ts, cs = runner.train_state, runner.collect_state
        ts, cs, rollout, _ = runner._collect(ts, cs)

        obs_a, _, num_aug = apply_augmentation(
            point_mass_symmetry, None, rollout.obs, None, time_major=True
        )
        resets = rollout.replay_resets()
        carry_t = tile_carry(rollout.carry0, num_aug)
        resets_t = jnp.tile(resets, (1, num_aug))
        mean_full, _ = policy.act_seq(ts.policy, obs_a, carry_t, resets_t)
        mean_orig, _ = policy.act_seq(ts.policy, rollout.obs, rollout.carry0, resets)
        nb = rollout.num_envs
        np.testing.assert_allclose(
            np.asarray(mean_full[:, :nb]), np.asarray(mean_orig), rtol=1e-5, atol=1e-6
        )
