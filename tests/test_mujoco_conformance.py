"""Real-MuJoCo conformance for the in-tree N-link physics environment.

The throughput headline trains on ``NLinkPendulum`` (env/nlink.py), an
in-tree manipulator-equation simulator standing in for the GPU-resident
simulators the reference targets (reference README.md:6-10). These tests
pin its numerics to REAL MuJoCo (CPU, double precision) as ground truth:

- instantaneous forward dynamics (mass matrix, Coriolis, gravity, torque
  mapping, absolute-velocity damping) match ``mj_forward`` to fp32 noise,
- semi-implicit Euler trajectories match ``mj_step`` over a 100-substep
  horizon,
- the public ``env.step`` matches the real-MuJoCo host env
  (``MuJoCoNLinkEnv``) observation-for-observation and reward-for-reward,
- PPO trains end-to-end on the real simulator through the host path.

``mujoco-mjx`` itself is not installable here (docs/mjx_conformance.md
records the attempt); base MuJoCo is, so this is the strongest available
evidence that the physics workload is simulator-grade, not toy-grade.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rsl_rl_tpu.env.mujoco_host import MuJoCoNLinkEnv, nlink_mjcf  # noqa: E402
from rsl_rl_tpu.env.nlink import NLinkPendulum  # noqa: E402


def _build(num_links: int):
    env = NLinkPendulum(num_envs=4, num_links=num_links)
    model = mujoco.MjModel.from_xml_string(
        nlink_mjcf(num_links, np.asarray(env.lengths), env.dt / env.n_substeps)
    )
    A = np.tril(np.ones((num_links, num_links)))  # theta = A @ q
    damp = env.damping * (A.T @ A)  # absolute-omega damper in relative coords
    return env, model, A, damp


class TestForwardDynamics:
    """nlink's manipulator equation vs mj_forward at random states."""

    @pytest.mark.parametrize("num_links", [3, 5])
    def test_accel_matches(self, num_links):
        env, model, A, damp = _build(num_links)
        data = mujoco.MjData(model)
        accel = jax.jit(env._accel)
        rng = np.random.default_rng(0)
        worst = 0.0
        for _ in range(64):
            theta = rng.uniform(-np.pi, np.pi, num_links)
            omega = rng.uniform(-5.0, 5.0, num_links)
            u = rng.uniform(-10.0, 10.0, num_links)
            data.qpos[:] = np.diff(theta, prepend=0.0)
            data.qvel[:] = np.diff(omega, prepend=0.0)
            data.ctrl[:] = u
            data.qfrc_applied[:] = -damp @ data.qvel
            mujoco.mj_forward(model, data)
            mj_thetadd = A @ data.qacc  # relative -> absolute accel
            tau = env._joint_to_generalized(jnp.asarray(u, jnp.float32)[None])
            ours = np.asarray(
                accel(
                    jnp.asarray(theta, jnp.float32)[None],
                    jnp.asarray(omega, jnp.float32)[None],
                    tau,
                )
            )[0]
            rel = np.max(np.abs(ours - mj_thetadd) / (np.abs(mj_thetadd) + 1.0))
            worst = max(worst, float(rel))
        # measured fp32 noise floor ~6e-5 at L=5; 10x headroom
        assert worst < 6e-4, f"forward dynamics disagree with MuJoCo: {worst}"

    def test_mass_matrix_matches(self):
        """Our closed-form M(q) vs MuJoCo's CRB inertia (mj_fullM)."""
        env, model, A, _ = _build(5)
        data = mujoco.MjData(model)
        rng = np.random.default_rng(1)
        for _ in range(8):
            theta = rng.uniform(-np.pi, np.pi, 5)
            data.qpos[:] = np.diff(theta, prepend=0.0)
            mujoco.mj_forward(model, data)
            M_q = np.zeros((5, 5))
            mujoco.mj_fullM(model, data, M_q)
            # our M is in absolute coords: M_q = A^T M_theta A
            th = jnp.asarray(theta, jnp.float32)[None]
            dth = th[:, :, None] - th[:, None, :]
            M_theta = np.asarray(env._K * env._ll * jnp.cos(dth))[0]
            np.testing.assert_allclose(A.T @ M_theta @ A, M_q, atol=2e-6)


class TestTrajectories:
    def test_substep_trajectory_matches(self):
        """100 semi-implicit Euler substeps, damping on, fixed torque."""
        env, model, A, damp = _build(5)
        data = mujoco.MjData(model)
        rng = np.random.default_rng(2)
        theta0 = rng.uniform(-0.5, 0.5, 5)
        omega0 = rng.uniform(-0.5, 0.5, 5)
        u = rng.uniform(-3.0, 3.0, 5)
        data.qpos[:] = np.diff(theta0, prepend=0.0)
        data.qvel[:] = np.diff(omega0, prepend=0.0)
        data.ctrl[:] = u
        th = jnp.asarray(theta0, jnp.float32)[None]
        om = jnp.asarray(omega0, jnp.float32)[None]
        tau = env._joint_to_generalized(jnp.asarray(u, jnp.float32)[None])
        substep = jax.jit(env._substep)
        h = env.dt / env.n_substeps
        for _ in range(100):
            data.qfrc_applied[:] = -damp @ data.qvel
            mujoco.mj_step(model, data)
            th, om = substep(th, om, tau, h)
        # measured fp32 divergence ~1.4e-7 over this horizon; wide headroom
        np.testing.assert_allclose(np.asarray(th)[0], A @ data.qpos, atol=1e-4)
        np.testing.assert_allclose(np.asarray(om)[0], A @ data.qvel, atol=1e-3)

    def test_env_step_matches_host_env(self):
        """Public JAX env.step vs the real-MuJoCo host env, obs and reward."""
        n, L, T = 4, 5, 25
        jax_env = NLinkPendulum(num_envs=n, num_links=L, max_episode_length=1000)
        host_env = MuJoCoNLinkEnv(num_envs=n, num_links=L, max_episode_length=1000)
        state, obs = jax_env.reset(jax.random.PRNGKey(0))
        # start the host env from the JAX env's sampled initial state
        theta = np.asarray(state.theta, np.float64)
        omega = np.asarray(state.omega, np.float64)
        for i, d in enumerate(host_env.data):
            d.qpos[:] = np.diff(theta[i], prepend=0.0)
            d.qvel[:] = np.diff(omega[i], prepend=0.0)
            mujoco.mj_forward(host_env.model, d)
        host_obs = host_env._obs_from(*host_env._state())
        np.testing.assert_allclose(
            np.asarray(obs["policy"]), host_obs["policy"], atol=1e-5
        )

        step = jax.jit(jax_env.step)
        rng = np.random.default_rng(3)
        for t in range(T):
            # moderate torques: the system is chaotic, so fp32-vs-fp64
            # divergence grows exponentially with trajectory energy
            actions = rng.uniform(-3.0, 3.0, (n, L)).astype(np.float32)
            state, obs, rew, done, extras = step(state, jnp.asarray(actions))
            h_obs, h_rew, h_done, h_extras = host_env.step(actions)
            assert not bool(np.asarray(done).any()) and not h_done.any()
            np.testing.assert_allclose(
                np.asarray(obs["policy"]), h_obs["policy"], atol=5e-3,
                err_msg=f"obs diverged from real MuJoCo at step {t}",
            )
            np.testing.assert_allclose(
                np.asarray(rew), h_rew, rtol=5e-3, atol=5e-3,
                err_msg=f"reward diverged from real MuJoCo at step {t}",
            )


class TestHostEnvContract:
    def test_contract_shapes_and_autoreset(self):
        env = MuJoCoNLinkEnv(num_envs=3, num_links=5, max_episode_length=4)
        obs = env.reset(seed=0)
        assert obs["policy"].shape == (3, 15)
        assert env.num_actions == 5
        for t in range(4):
            obs, rew, done, extras = env.step(np.zeros((3, 5), np.float32))
            assert rew.shape == (3,)
            assert "time_outs" in extras and "log" in extras
        assert done.all() and extras["time_outs"].all()
        assert (env.episode_length_buf == 0).all()  # auto-reset happened
        # post-reset obs is a fresh near-hanging state, not the rolled one
        assert np.all(np.abs(obs["policy"][:, 5:10]) < 0.15)  # sin(theta) small

    def test_reset_is_seeded(self):
        a = MuJoCoNLinkEnv(num_envs=2, num_links=3).reset(seed=7)
        b = MuJoCoNLinkEnv(num_envs=2, num_links=3).reset(seed=7)
        np.testing.assert_array_equal(a["policy"], b["policy"])


class TestRealSimulatorTraining:
    def test_ppo_trains_on_real_mujoco(self):
        """PPO end-to-end on the real simulator through the host path."""
        from rsl_rl_tpu.runners import OnPolicyRunner

        env = MuJoCoNLinkEnv(num_envs=8, num_links=3, max_episode_length=64)
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
                "num_learning_epochs": 2,
                "num_mini_batches": 2,
            },
        }
        runner = OnPolicyRunner(env, cfg, log_dir=None)
        assert not runner.is_jax_env
        runner.learn(3)
        # losses are finite and the policy is exportable
        policy = runner.get_inference_policy()
        acts = policy({"policy": jnp.zeros((8, 9), jnp.float32)})
        assert np.isfinite(np.asarray(acts)).all()


CARTPOLE_XML = """
<mujoco model="cartpole">
  <option timestep="0.02"/>
  <worldbody>
    <body name="cart" pos="0 0 1">
      <joint name="slider" type="slide" axis="1 0 0" range="-2 2"/>
      <geom type="box" size="0.2 0.1 0.05" mass="1"/>
      <body name="pole" pos="0 0 0">
        <joint name="hinge" type="hinge" axis="0 1 0" range="-3.14 3.14"/>
        <geom type="capsule" fromto="0 0 0 0 0 0.6" size="0.04" mass="0.3"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor joint="slider" gear="30"/></actuator>
</mujoco>
"""


class TestGenericMuJoCoHostEnv:
    """MuJoCoHostEnv: any MJCF model through the four hooks."""

    def _make(self, num_envs=3, max_len=8, fall_threshold=1.0):
        from rsl_rl_tpu.env.mujoco_host import MuJoCoHostEnv

        class Cartpole(MuJoCoHostEnv):
            def compute_obs(self, data):
                return {
                    "policy": np.concatenate([data.qpos, data.qvel]).astype(
                        np.float32
                    )
                }

            def compute_reward(self, data, action):
                return float(np.cos(data.qpos[1]))  # pole uprightness

            def compute_terminated(self, data):
                return bool(abs(data.qpos[1]) > fall_threshold)  # pole fell

        return Cartpole(
            CARTPOLE_XML, num_envs=num_envs, max_episode_length=max_len,
            n_substeps=2, seed=0,
        )

    def test_contract_and_model_introspection(self):
        env = self._make()
        assert env.num_actions == 1  # from model.nu
        assert env.step_dt == pytest.approx(0.04)  # timestep * n_substeps
        obs = env.reset(seed=0)
        assert obs["policy"].shape == (3, 4)  # nq + nv
        obs, rew, done, extras = env.step(np.zeros((3, 1), np.float32))
        assert rew.shape == (3,) and "time_outs" in extras

    def test_terminal_vs_timeout_split(self):
        env = self._make(max_len=50, fall_threshold=0.05)
        env.reset(seed=0)
        # slam the cart: the pole tips past the threshold -> TERMINAL done
        # well before the 50-step time limit
        for t in range(40):
            obs, rew, done, extras = env.step(np.full((3, 1), 1.0, np.float32))
            if done.any():
                break
        assert done.any() and t < 40
        assert not extras["time_outs"][done].any()  # terminal, not timeout
        assert (env.episode_length_buf[done] == 0).all()  # auto-reset

    def test_timeout_when_surviving(self):
        env = self._make(max_len=4)
        env.reset(seed=0)
        for _ in range(4):
            obs, rew, done, extras = env.step(np.zeros((3, 1), np.float32))
        assert done.all() and extras["time_outs"].all()

    def test_trains_through_runner(self):
        from rsl_rl_tpu.runners import OnPolicyRunner

        env = self._make(num_envs=8, max_len=32)
        cfg = {
            "num_steps_per_env": 8,
            "save_interval": 1000,
            "seed": 1,
            "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
            "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [16],
                       "critic_hidden_dims": [16]},
            "algorithm": {"class_name": "PPO", "num_learning_epochs": 2,
                          "num_mini_batches": 2},
        }
        runner = OnPolicyRunner(env, cfg, log_dir=None)
        runner.learn(2)


class TestRandomizedMassConformance:
    """DomainRandomizedNLink's per-env coupling vs MuJoCo with those masses:
    the randomized dynamics are real physics, pinned to the same ground
    truth as the base env."""

    def test_dr_accel_matches_mujoco(self):
        from rsl_rl_tpu.env.nlink import DomainRandomizedNLink

        L = 4
        env = DomainRandomizedNLink(num_envs=1, num_links=L)
        A = np.tril(np.ones((L, L)))
        damp = env.damping * (A.T @ A)  # absolute-omega damper: mass-free
        rng = np.random.default_rng(5)
        worst = 0.0
        for _ in range(8):
            scale = np.exp(rng.uniform(np.log(0.5), np.log(2.0), L))
            model = mujoco.MjModel.from_xml_string(
                nlink_mjcf(
                    L, np.asarray(env.lengths), env.dt / env.n_substeps,
                    masses=scale,
                )
            )
            data = mujoco.MjData(model)
            theta = rng.uniform(-np.pi, np.pi, L)
            omega = rng.uniform(-3.0, 3.0, L)
            u = rng.uniform(-5.0, 5.0, L)
            data.qpos[:] = np.diff(theta, prepend=0.0)
            data.qvel[:] = np.diff(omega, prepend=0.0)
            data.ctrl[:] = u
            data.qfrc_applied[:] = -damp @ data.qvel
            mujoco.mj_forward(model, data)
            K = env._K_of(jnp.asarray(scale, jnp.float32)[None])
            tau = env._joint_to_generalized(jnp.asarray(u, jnp.float32)[None])
            ours = np.asarray(
                env._accel(
                    jnp.asarray(theta, jnp.float32)[None],
                    jnp.asarray(omega, jnp.float32)[None],
                    tau,
                    K,
                )
            )[0]
            mj = A @ data.qacc
            worst = max(worst, float(np.max(np.abs(ours - mj) / (np.abs(mj) + 1.0))))
        assert worst < 6e-4, f"randomized-mass dynamics disagree with MuJoCo: {worst}"
