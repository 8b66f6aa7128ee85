"""Host (non-JAX) environment path: hybrid collection with Gymnasium envs."""

import gymnasium as gym
import numpy as np
import pytest

from rsl_rl_tpu.env import GymVecEnv
from rsl_rl_tpu.runners import OnPolicyRunner


def _cfg(**overrides):
    cfg = {
        "num_steps_per_env": 16,
        "save_interval": 1000,
        "seed": 1,
        "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
        "policy": {
            "class_name": "ActorCritic",
            "actor_hidden_dims": [32, 32],
            "critic_hidden_dims": [32, 32],
            "actor_obs_normalization": True,
            "critic_obs_normalization": True,
        },
        "algorithm": {
            "class_name": "PPO",
            "learning_rate": 1e-3,
            "num_learning_epochs": 4,
            "num_mini_batches": 4,
        },
    }
    cfg.update(overrides)
    return cfg


def _make_vec(num_envs=16):
    from gymnasium.vector import AutoresetMode

    return gym.make_vec(
        "Pendulum-v1",
        num_envs=num_envs,
        vectorization_mode="sync",
        vector_kwargs={"autoreset_mode": AutoresetMode.SAME_STEP},
    )


@pytest.fixture
def pendulum_env():
    env = _make_vec()
    wrapped = GymVecEnv(env)
    yield wrapped
    env.close()


class TestGymAdapter:
    def test_contract(self, pendulum_env):
        obs = pendulum_env.reset(seed=0)
        assert obs["policy"].shape == (16, 3)
        assert pendulum_env.num_actions == 1
        actions = np.zeros((16, 1), np.float32)
        obs, rew, dones, extras = pendulum_env.step(actions)
        assert rew.shape == (16,)
        assert "time_outs" in extras

    def test_truncation_maps_to_time_outs(self):
        env = _make_vec(num_envs=2)
        wrapped = GymVecEnv(env)
        wrapped.reset(seed=0)
        # Pendulum-v1 truncates at 200 steps
        for _ in range(200):
            _, _, dones, extras = wrapped.step(np.zeros((2, 1), np.float32))
        assert dones.all()
        assert extras["time_outs"].all()
        env.close()


class TestHostTraining:
    def test_ppo_runs_on_gym_pendulum(self, pendulum_env):
        runner = OnPolicyRunner(pendulum_env, _cfg(), log_dir=None)
        assert not runner.is_jax_env
        ts, cs = runner.train_state, runner.collect_state
        for _ in range(4):
            ts, cs, rollout, cm = runner._collect(ts, cs)
            ts, cs, um = runner._update(ts, cs, rollout)
        for k, v in um.items():
            assert np.isfinite(float(v)), f"{k} not finite"
        assert rollout.actions.shape == (16, 16, 1)

    def test_recurrent_ppo_on_host_env(self, pendulum_env):
        cfg = _cfg()
        cfg["policy"] = {
            "class_name": "ActorCriticRecurrent",
            "actor_hidden_dims": [16],
            "critic_hidden_dims": [16],
            "rnn_type": "gru",
            "rnn_hidden_dim": 16,
        }
        runner = OnPolicyRunner(pendulum_env, cfg, log_dir=None)
        ts, cs = runner.train_state, runner.collect_state
        for _ in range(3):
            ts, cs, rollout, cm = runner._collect(ts, cs)
            ts, cs, um = runner._update(ts, cs, rollout)
        assert np.isfinite(float(um["Loss/surrogate"]))

    def test_episode_stats_flow(self, pendulum_env):
        """Completed-episode stats must surface after 200 env steps."""
        cfg = _cfg(num_steps_per_env=32)
        runner = OnPolicyRunner(pendulum_env, cfg, log_dir=None)
        ts, cs = runner.train_state, runner.collect_state
        total_eps = 0.0
        for _ in range(8):  # 8 * 32 = 256 steps > 200
            ts, cs, rollout, cm = runner._collect(ts, cs)
            ts, cs, um = runner._update(ts, cs, rollout)
            total_eps += float(cm["ep_count"])
        assert total_eps >= 16  # all 16 envs completed an episode


class _CountingHostEnv:
    """Minimal Isaac-style host env exposing a writable episode_length_buf
    (reference env/vec_env.py:35)."""

    is_jax = False

    def __init__(self, num_envs=8):
        self.num_envs = num_envs
        self.num_actions = 1
        self.max_episode_length = 50
        self.cfg = {}
        self.episode_length_buf = np.zeros(num_envs, np.int32)

    def reset(self, seed=None):
        self.episode_length_buf[:] = 0
        return {"policy": np.zeros((self.num_envs, 3), np.float32)}

    def step(self, actions):
        self.episode_length_buf += 1
        dones = self.episode_length_buf >= self.max_episode_length
        self.episode_length_buf = np.where(dones, 0, self.episode_length_buf)
        obs = {"policy": np.zeros((self.num_envs, 3), np.float32)}
        return obs, np.zeros(self.num_envs, np.float32), dones, {"time_outs": dones}


class TestInitAtRandomEpLen:
    def test_randomizes_exposed_buffer(self, tmp_path):
        """learn(init_at_random_ep_len=True) must scatter episode_length_buf
        in [0, max_episode_length) like reference on_policy_runner.py:66-69."""
        env = _CountingHostEnv(num_envs=64)
        cfg = _cfg(num_steps_per_env=4)
        runner = OnPolicyRunner(env, cfg, log_dir=str(tmp_path))
        runner.learn(1, init_at_random_ep_len=True)
        # the buffer advanced 4 steps from the randomized start; with 64 envs
        # over [0, 50) the starts cannot all coincide
        assert env.episode_length_buf.dtype == np.int32
        assert len(np.unique(env.episode_length_buf)) > 1

    def test_warns_without_buffer(self, pendulum_env, tmp_path):
        runner = OnPolicyRunner(pendulum_env, _cfg(num_steps_per_env=4), log_dir=str(tmp_path))
        with pytest.warns(UserWarning, match="episode_length_buf"):
            runner.learn(1, init_at_random_ep_len=True)


class TestAutoresetModeGate:
    def test_next_step_autoreset_rejected(self):
        """Gymnasium's default NEXT_STEP autoreset corrupts episode-boundary
        transitions under the same-step contract; the adapter must refuse it."""
        env = gym.make_vec("Pendulum-v1", num_envs=2, vectorization_mode="sync")
        try:
            if env.metadata.get("autoreset_mode") is None:
                pytest.skip("old gymnasium without autoreset modes")
            with pytest.raises(ValueError, match="same-step autoreset"):
                GymVecEnv(env)
        finally:
            env.close()

    def test_same_step_autoreset_gives_fresh_obs_at_done(self):
        """At the done step the returned obs must already belong to the new
        episode: it must match the underlying envs' post-reset state."""
        raw = _make_vec(num_envs=2)
        env = GymVecEnv(raw)
        env.reset(seed=0)
        done = np.zeros(2, bool)
        for _ in range(250):
            obs, rew, done, extras = env.step(np.zeros((2, 1), np.float32))
            if done.any():
                break
        assert done.any(), "no episode ended within 250 steps"
        # the sync vector env exposes per-env simulators; their state was
        # reset on this step, and the adapter's obs must reflect it
        for i in np.flatnonzero(done):
            theta, theta_dot = raw.unwrapped.envs[i].unwrapped.state
            want = np.array([np.cos(theta), np.sin(theta), theta_dot], np.float32)
            np.testing.assert_allclose(obs["policy"][i], want, rtol=1e-5, atol=1e-6)
