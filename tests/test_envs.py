"""VecEnv contract tests for the built-in JAX environments."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsl_rl_tpu.env import (
    CartPoleSwingUp,
    DomainRandomizedNLink,
    Hopper,
    NLinkPendulum,
    PartiallyObservableNLink,
    PartiallyObservablePendulum,
    Pendulum,
    PrivilegedPendulum,
    PointMass,
    Reacher,
    SparseGoalReach,
)

ENVS = [
    lambda n: Pendulum(num_envs=n, max_episode_length=50),
    lambda n: PartiallyObservablePendulum(num_envs=n, max_episode_length=50),
    lambda n: PrivilegedPendulum(num_envs=n, max_episode_length=50),
    lambda n: CartPoleSwingUp(num_envs=n, max_episode_length=50),
    lambda n: PointMass(num_envs=n, max_episode_length=50),
    lambda n: SparseGoalReach(num_envs=n, max_episode_length=50),
    lambda n: Reacher(num_envs=n, max_episode_length=50),
    lambda n: NLinkPendulum(num_envs=n, num_links=3, max_episode_length=50),
    lambda n: DomainRandomizedNLink(num_envs=n, num_links=3, max_episode_length=50),
    lambda n: PartiallyObservableNLink(num_envs=n, num_links=3, max_episode_length=50),
    lambda n: Hopper(num_envs=n, max_episode_length=50),
    # per-env heterogeneous time limits (reference vec_env.py:30-36 allows a
    # scalar OR per-env tensor)
    lambda n: Pendulum(num_envs=n, max_episode_length=20 + 7 * (np.arange(n) % 5)),
]


def _horizon(env) -> int:
    """Largest per-env time limit (handles scalar and per-env arrays)."""
    return int(np.max(np.asarray(env.max_episode_length)))


@pytest.mark.parametrize("make_env", ENVS)
class TestContract:
    def test_reset_and_step_shapes(self, make_env):
        env = make_env(6)
        state, obs = env.reset(jax.random.PRNGKey(0))
        for v in obs.values():
            assert v.shape[0] == 6
        actions = jnp.zeros((6, env.num_actions))
        state, obs, rew, done, extras = env.step(state, actions)
        assert rew.shape == (6,)
        assert done.shape == (6,)
        assert done.dtype == jnp.bool_
        assert "time_outs" in extras and "log" in extras

    def test_step_is_jittable(self, make_env):
        env = make_env(4)
        state, obs = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        state, obs, rew, done, extras = step(state, jnp.zeros((4, env.num_actions)))
        assert np.isfinite(np.asarray(rew)).all()

    def test_timeout_and_autoreset(self, make_env):
        """After max_episode_length zero-action steps every env must have
        terminated at least once and auto-reset (episode_length rewinds)."""
        env = make_env(4)
        state, obs = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        saw_done = np.zeros(4, bool)
        for _ in range(_horizon(env) + 1):
            state, obs, rew, done, extras = step(state, jnp.zeros((4, env.num_actions)))
            saw_done |= np.asarray(done)
        assert saw_done.all()
        assert (
            np.asarray(state.episode_length)
            <= np.asarray(env.max_episode_length)
        ).all()

    def test_randomize_episode_length(self, make_env):
        env = make_env(64)
        state, _ = env.reset(jax.random.PRNGKey(0))
        state = env.randomize_episode_length(state, jax.random.PRNGKey(1))
        lengths = np.asarray(state.episode_length)
        assert lengths.min() >= 0
        assert (lengths < np.asarray(env.max_episode_length)).all()
        assert len(np.unique(lengths)) > 5  # actually randomized

    def test_autoreset_gives_fresh_obs(self, make_env):
        """The obs returned on a done step must be the new episode's obs:
        it must equal the observation computed from the post-reset state."""
        env = make_env(3)
        state, obs0 = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        done = None
        for _ in range(_horizon(env)):
            state, obs, rew, done, extras = step(state, jnp.zeros((3, env.num_actions)))
        assert np.asarray(done).any(), "no env finished within the time limit"
        # the step's returned obs is derived from the already-reset state
        # (all envs' _obs take the state; PointMass's optional last_action
        # defaults to the zero action this loop uses)
        fresh = env._obs(state)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
            ),
            obs,
            fresh,
        )
        # and the episode counter rewound for the done envs
        assert (np.asarray(state.episode_length)[np.asarray(done)] == 0).all()


class TestPerEnvEpisodeLength:
    """Per-env time limits (reference vec_env.py:30-36: scalar OR tensor)."""

    def test_each_env_times_out_at_its_own_limit(self):
        limits = np.array([3, 5, 8, 13])
        env = Pendulum(num_envs=4, max_episode_length=limits)
        state, _ = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        for t in range(1, 14):
            state, obs, rew, done, extras = step(state, jnp.zeros((4, 1)))
            expected = (t % limits) == 0
            np.testing.assert_array_equal(np.asarray(done), expected, err_msg=f"step {t}")
            # Pendulum has no terminal states: every done is a timeout,
            # so the bootstrap flag must track the per-env limit too
            np.testing.assert_array_equal(np.asarray(extras["time_outs"]), expected)

    def test_trains_with_heterogeneous_limits(self):
        """The timeout bootstrap path handles per-env limits inside the
        fused collect scan (reference ppo.py:160-164)."""
        from rsl_rl_tpu.runners import OnPolicyRunner

        env = Pendulum(num_envs=8, max_episode_length=10 + 3 * np.arange(8))
        cfg = {
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
                "num_learning_epochs": 2,
                "num_mini_batches": 2,
            },
        }
        runner = OnPolicyRunner(env, cfg, log_dir=None)
        ts, cs = runner.train_state, runner.collect_state
        for _ in range(3):
            ts, cs, rollout, cm = runner._collect(ts, cs)
            ts, cs, um = runner._update(ts, cs, rollout)
        assert np.isfinite(float(um["Loss/value_function"]))
        assert float(cm["ep_count"]) > 0  # short-limit envs finished episodes


class TestPendulumPhysics:
    def test_matches_gymnasium(self):
        """One dynamics step must match gymnasium's Pendulum-v1 exactly."""
        gym = pytest.importorskip("gymnasium")
        genv = gym.make("Pendulum-v1")
        genv.reset(seed=0)
        theta0, theta_dot0 = 0.3, -0.5
        genv.unwrapped.state = np.array([theta0, theta_dot0])
        gobs, grew, _, _, _ = genv.step(np.array([1.5]))

        env = Pendulum(num_envs=1)
        state, _ = env.reset(jax.random.PRNGKey(0))
        state = state.replace(theta=jnp.asarray([theta0]), theta_dot=jnp.asarray([theta_dot0]))
        state, obs, rew, done, _ = env.step(state, jnp.asarray([[1.5]]))
        np.testing.assert_allclose(np.asarray(obs["policy"][0]), gobs, rtol=1e-5)
        np.testing.assert_allclose(float(rew[0]), grew, rtol=1e-5)

    def test_po_pendulum_hides_velocity(self):
        env = PartiallyObservablePendulum(num_envs=2)
        _, obs = env.reset(jax.random.PRNGKey(0))
        assert obs["policy"].shape == (2, 2)


class TestNLinkPhysics:
    """Validate the manipulator-equation dynamics of the physics-bench env."""

    def test_single_link_matches_analytic_pendulum(self):
        """With L=1 the manipulator equation reduces to the point-mass
        pendulum: ml² θ̈ = u − mgl sinθ − bω. Compare one undriven substep
        chain against explicit integration of that ODE."""
        env = NLinkPendulum(num_envs=1, num_links=1, max_episode_length=1000)
        state, _ = env.reset(jax.random.PRNGKey(0))
        theta0, omega0 = 0.7, -0.3
        state = state.replace(
            theta=jnp.asarray([[theta0]]), omega=jnp.asarray([[omega0]])
        )
        u = 0.8
        state2, _, _, _, _ = env.step(state, jnp.asarray([[u]]))

        # replicate semi-implicit Euler on the analytic 1-link ODE
        m, l, g, b = 1.0, float(env.lengths[0]), env.g, env.damping
        th, om = theta0, omega0
        h = env.dt / env.n_substeps
        for _ in range(env.n_substeps):
            acc = (u - m * g * l * np.sin(th) - b * om) / (m * l * l)
            om = om + h * acc
            th = th + h * om
        np.testing.assert_allclose(float(state2.theta[0, 0]), th, rtol=1e-5)
        np.testing.assert_allclose(float(state2.omega[0, 0]), om, rtol=1e-5)

    def test_energy_conserved_undriven(self):
        """With zero torque and damping removed, semi-implicit Euler must
        approximately conserve mechanical energy over a swing."""
        env = NLinkPendulum(num_envs=4, num_links=4, max_episode_length=10_000)
        env.damping = 0.0
        state, _ = env.reset(jax.random.PRNGKey(1))
        # displaced start so there is real exchange between KE and PE
        key = jax.random.PRNGKey(2)
        state = state.replace(
            theta=jax.random.uniform(key, (4, 4), minval=-0.8, maxval=0.8)
        )
        e0 = np.asarray(env.total_energy(state))
        step = jax.jit(env.step)
        zeros = jnp.zeros((4, env.num_actions))
        for _ in range(100):
            state, *_ = step(state, zeros)
        e1 = np.asarray(env.total_energy(state))
        scale = np.abs(e0) + env.g  # energy scale ~ g * total mass * length
        assert (np.abs(e1 - e0) / scale < 0.05).all(), (e0, e1)

    def test_mass_matrix_symmetric_positive_definite(self):
        env = NLinkPendulum(num_envs=2, num_links=5)
        state, _ = env.reset(jax.random.PRNGKey(3))
        theta = jax.random.uniform(jax.random.PRNGKey(4), (2, 5), minval=-3, maxval=3)
        dth = theta[:, :, None] - theta[:, None, :]
        M = np.asarray(env._K * env._ll * jnp.cos(dth))
        np.testing.assert_allclose(M, np.swapaxes(M, 1, 2), atol=1e-6)
        for b in range(2):
            eig = np.linalg.eigvalsh(M[b])
            assert eig.min() > 0, eig

    def test_trains_ppo_smoke(self):
        """A short PPO run on the physics env improves tip height."""
        from rsl_rl_tpu.runners import OnPolicyRunner

        env = NLinkPendulum(num_envs=32, num_links=2, max_episode_length=64)
        cfg = {
            "num_steps_per_env": 16,
            "save_interval": 1000,
            "seed": 3,
            "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
            "policy": {
                "class_name": "ActorCritic",
                "actor_hidden_dims": [32],
                "critic_hidden_dims": [32],
            },
            "algorithm": {
                "class_name": "PPO",
                "num_learning_epochs": 3,
                "num_mini_batches": 2,
            },
        }
        runner = OnPolicyRunner(env, cfg, log_dir=None)
        ts, cs = runner.train_state, runner.collect_state
        heights = []
        for _ in range(40):
            ts, cs, rollout, cm = runner._collect(ts, cs)
            ts, cs, um = runner._update(ts, cs, rollout)
            heights.append(float(cm["extras/nlink/tip_height"]))
        assert np.isfinite(float(um["Loss/value_function"]))
        assert np.mean(heights[-10:]) > np.mean(heights[:10]), heights[:3] + heights[-3:]


class TestHopperContact:
    """Validate the unilateral spring-damper contact of the hopper env."""

    def test_ballistic_in_flight(self):
        """Above leg length there is no contact force: the body follows
        projectile motion (semi-implicit Euler), thrust or not."""
        env = Hopper(num_envs=2, max_episode_length=1000)
        state, _ = env.reset(jax.random.PRNGKey(0))
        state = state.replace(z=jnp.asarray([2.0, 2.0]), v=jnp.asarray([1.0, 1.0]))
        # one env thrusts mid-air, one does not -> identical motion
        state2, _, _, _, _ = env.step(state, jnp.asarray([[1.0], [0.0]]))
        np.testing.assert_allclose(
            float(state2.z[0]), float(state2.z[1]), rtol=1e-6
        )
        # matches explicit semi-implicit Euler projectile integration
        z, v = 2.0, 1.0
        h = env.dt / env.n_substeps
        for _ in range(env.n_substeps):
            v -= h * env.g
            z += h * v
        np.testing.assert_allclose(float(state2.z[0]), z, rtol=1e-6)

    def test_passive_drop_bounces_and_decays(self):
        """Dropped with no thrust, the body bounces on the leg spring and
        successive apexes decay (damping removes energy)."""
        env = Hopper(num_envs=1, max_episode_length=100_000)
        state, _ = env.reset(jax.random.PRNGKey(1))
        state = state.replace(z=jnp.asarray([1.8]), v=jnp.asarray([0.0]))
        step = jax.jit(env.step)
        zs = []
        for _ in range(300):
            state, _, _, _, extras = step(state, jnp.zeros((1, 1)))
            zs.append(float(state.z[0]))
        zs = np.asarray(zs)
        assert zs.min() < env.l0, "never made contact"
        # find the first two flight apexes after the first bounce
        apexes = [
            zs[i] for i in range(1, len(zs) - 1)
            if zs[i] > env.l0 and zs[i] >= zs[i - 1] and zs[i] >= zs[i + 1]
        ]
        assert len(apexes) >= 2, "did not rebound into flight"
        assert apexes[1] < apexes[0], apexes[:2]
        assert zs[-1] < 1.2  # settles toward rest on the spring

    def test_contact_force_is_unilateral(self):
        """The leg can push but never pull: during rebound above rest
        length the only acceleration is gravity."""
        env = Hopper(num_envs=1, max_episode_length=100_000)
        state, _ = env.reset(jax.random.PRNGKey(2))
        # moving up fast just above the contact threshold
        state = state.replace(z=jnp.asarray([env.l0 + 0.01]), v=jnp.asarray([3.0]))
        state2, _, _, _, _ = env.step(state, jnp.zeros((1, 1)))
        dv = float(state2.v[0]) - 3.0
        # fp32 cancellation in dv: loose relative tolerance
        np.testing.assert_allclose(dv, -env.g * env.dt, rtol=1e-4)

    def test_trains_ppo_smoke(self):
        """PPO discovers stance-phase thrusting: mean height improves."""
        from rsl_rl_tpu.runners import OnPolicyRunner

        env = Hopper(num_envs=32, max_episode_length=64)
        cfg = {
            "num_steps_per_env": 16,
            "save_interval": 1000,
            "seed": 5,
            "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
            "policy": {
                "class_name": "ActorCritic",
                "actor_hidden_dims": [32],
                "critic_hidden_dims": [32],
            },
            "algorithm": {
                "class_name": "PPO",
                "num_learning_epochs": 3,
                "num_mini_batches": 2,
            },
        }
        runner = OnPolicyRunner(env, cfg, log_dir=None)
        ts, cs = runner.train_state, runner.collect_state
        heights = []
        for _ in range(40):
            ts, cs, rollout, cm = runner._collect(ts, cs)
            ts, cs, um = runner._update(ts, cs, rollout)
            heights.append(float(cm["extras/hopper/height"]))
        assert np.isfinite(float(um["Loss/value_function"]))
        assert np.mean(heights[-10:]) > np.mean(heights[:10]), heights[:3] + heights[-3:]


class TestCartPolePhysics:
    def test_starts_hanging_down(self):
        env = CartPoleSwingUp(num_envs=8)
        state, obs = env.reset(jax.random.PRNGKey(0))
        # cos(theta) near -1 (hanging)
        assert np.asarray(obs["policy"][:, 2]).max() < -0.9

    def test_terminal_on_track_limit(self):
        env = CartPoleSwingUp(num_envs=1, max_episode_length=10_000)
        state, _ = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        done_seen = False
        for _ in range(2000):
            state, obs, rew, done, extras = step(state, jnp.ones((1, 1)))
            if bool(done[0]):
                done_seen = True
                assert not bool(extras["time_outs"][0])  # true terminal
                break
        assert done_seen


class TestConfigLoading:
    def test_example_config_parses(self):
        import os
        from rsl_rl_tpu.utils import load_train_cfg

        path = os.path.join(os.path.dirname(__file__), "..", "config", "example_config.yaml")
        cfg = load_train_cfg(path)
        assert cfg["num_steps_per_env"] == 24
        assert cfg["policy"]["class_name"] == "ActorCritic"
        assert cfg["algorithm"]["class_name"] == "PPO"


class TestDomainRandomizedNLink:
    """Per-episode mass randomization: scales ride the state pytree."""

    def test_unit_scales_reduce_to_base_dynamics(self):
        env = DomainRandomizedNLink(num_envs=4, num_links=3)
        base = NLinkPendulum(num_envs=4, num_links=3)
        key = jax.random.PRNGKey(0)
        theta = jax.random.uniform(key, (4, 3), minval=-2.0, maxval=2.0)
        omega = jax.random.uniform(key, (4, 3), minval=-3.0, maxval=3.0)
        tau = jax.random.uniform(key, (4, 3), minval=-5.0, maxval=5.0)
        K = env._K_of(jnp.ones((4, 3)))
        np.testing.assert_allclose(
            np.asarray(env._accel(theta, omega, tau, K)),
            np.asarray(base._accel(theta, omega, tau)),
            rtol=1e-6, atol=1e-6,
        )

    def test_scales_sampled_in_range_and_resampled_on_done(self):
        env = DomainRandomizedNLink(
            num_envs=8, num_links=3, max_episode_length=3,
            mass_scale_range=(0.5, 2.0),
        )
        state, obs = env.reset(jax.random.PRNGKey(1))
        ms0 = np.asarray(state.mass_scale)
        assert ms0.shape == (8, 3)
        assert (ms0 >= 0.5).all() and (ms0 <= 2.0).all()
        step = jax.jit(env.step)
        a = jnp.zeros((8, 3))
        # within an episode the scales must persist
        state, *_ = step(state, a)
        np.testing.assert_array_equal(np.asarray(state.mass_scale), ms0)
        state, *_ = step(state, a)
        state, obs, rew, done, extras = step(state, a)  # hits the time limit
        assert bool(np.asarray(done).all())
        ms1 = np.asarray(state.mass_scale)
        assert (ms1 != ms0).any(), "scales must resample at episode reset"
        assert (ms1 >= 0.5).all() and (ms1 <= 2.0).all()

    def test_privileged_group_carries_log_scales(self):
        env = DomainRandomizedNLink(num_envs=4, num_links=3)
        state, obs = env.reset(jax.random.PRNGKey(2))
        assert obs["privileged"].shape == (4, 9 + 3)
        np.testing.assert_allclose(
            np.asarray(obs["privileged"][:, -3:]),
            np.log(np.asarray(state.mass_scale)),
            rtol=1e-6,
        )
        # the policy group must NOT leak the scales
        assert obs["policy"].shape == (4, 9)

    def test_mass_distribution_changes_dynamics(self):
        """A heavier tip link must fall differently from a heavier root link
        (per-link randomization is real physics, not a no-op)."""
        env = DomainRandomizedNLink(num_envs=2, num_links=3)
        # bent, moving configuration: in a straight at-rest chain the mass
        # dependence nearly cancels (free-fall-like), so bend it
        theta = jnp.tile(jnp.asarray([0.3, 1.2, -0.7]), (2, 1))
        omega = jnp.tile(jnp.asarray([1.0, -2.0, 0.5]), (2, 1))
        tau = jnp.zeros((2, 3))
        scales = jnp.asarray([[2.0, 1.0, 1.0], [1.0, 1.0, 2.0]])
        acc = np.asarray(env._accel(theta, omega, tau, env._K_of(scales)))
        assert np.abs(acc[0] - acc[1]).max() > 1e-3

    def test_trains_end_to_end(self):
        from rsl_rl_tpu.runners import OnPolicyRunner

        env = DomainRandomizedNLink(num_envs=8, num_links=3, max_episode_length=16)
        cfg = {
            "num_steps_per_env": 8, "save_interval": 1000, "seed": 1,
            # asymmetric actor-critic: the critic sees the privileged scales
            "obs_groups": {"policy": ["policy"], "critic": ["privileged"]},
            "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [16],
                       "critic_hidden_dims": [16]},
            "algorithm": {"class_name": "PPO", "num_learning_epochs": 2,
                          "num_mini_batches": 2},
        }
        runner = OnPolicyRunner(env, cfg, log_dir=None)
        runner.learn(2)
