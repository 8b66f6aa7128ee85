"""MJX adapter tests.

mujoco-mjx is not installed in the CI image, so the REAL physics path is
exercised only when available (TestMJXPhysics skips without it). The
adapter's own logic — vmapped init/step, auto-reset, timeout/terminal
split, obs/reward/done hooks, the whole VecEnv contract — is executed
unconditionally against a fake ``mjx`` module implementing the five API
points the adapter touches (``put_model``/``make_data``/``forward``/
``step`` + pytree ``Data``) with a damped point-mass integrator, the same
test-double pattern as the fake-wandb writer tests.
"""

import types

import numpy as np
import pytest
from flax import struct

import rsl_rl_tpu.env.mjx_env as mjx_env_mod
from rsl_rl_tpu.env.mjx_env import _HAS_MJX, MJXEnv


@struct.dataclass
class _FakeData:
    qpos: object
    qvel: object
    ctrl: object


def _fake_mjx_module():
    import jax.numpy as jnp

    mod = types.SimpleNamespace()
    mod.put_model = lambda m: m
    mod.make_data = lambda model: _FakeData(
        qpos=jnp.zeros((model.nq,)), qvel=jnp.zeros((model.nv,)),
        ctrl=jnp.zeros((model.nu,)),
    )
    mod.forward = lambda model, data: data

    def step(model, data):
        dt = model.opt.timestep
        qvel = data.qvel + dt * (data.ctrl - 0.1 * data.qvel)
        return data.replace(qpos=data.qpos + dt * qvel, qvel=qvel)

    mod.step = step
    return mod


def _fake_mj_model(nq=1, nv=1, nu=1, timestep=0.02):
    return types.SimpleNamespace(
        nq=nq, nv=nv, nu=nu, opt=types.SimpleNamespace(timestep=timestep)
    )


@pytest.fixture
def fake_mjx(monkeypatch):
    mod = _fake_mjx_module()
    monkeypatch.setattr(mjx_env_mod, "mjx", mod)
    monkeypatch.setattr(mjx_env_mod, "_HAS_MJX", True)
    return mod


class TestMJXAdapterWithFake:
    """Executes the 170 LoC of adapter glue without mujoco-mjx installed."""

    def _make_env(self, num_envs=4, episode_length=8, done_fn=None):
        import jax.numpy as jnp

        return MJXEnv(
            _fake_mj_model(),
            num_envs=num_envs,
            episode_length=episode_length,
            obs_fn=lambda mx, d: {"policy": jnp.concatenate([d.qpos, d.qvel])},
            reward_fn=lambda mx, d, a: -jnp.square(d.qpos[0]),
            done_fn=done_fn,
            reset_noise_scale=0.01,
        )

    def test_contract_shapes_and_types(self, fake_mjx):
        import jax
        import jax.numpy as jnp

        env = self._make_env()
        assert env.num_actions == 1 and env.step_dt == pytest.approx(0.02)
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs["policy"].shape == (4, 2)
        # reset noise applied per env: initial qpos differ across envs
        assert len({float(q) for q in np.asarray(state.data.qpos[:, 0])}) == 4
        state, obs, rew, done, extras = jax.jit(env.step)(state, jnp.ones((4, 1)))
        assert rew.shape == (4,) and rew.dtype == jnp.float32
        assert done.shape == (4,) and "time_outs" in extras

    def test_timeout_autoreset(self, fake_mjx):
        import jax
        import jax.numpy as jnp

        env = self._make_env()
        state, obs = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        for _ in range(8):
            state, obs, rew, done, extras = step(state, jnp.ones((4, 1)))
        assert bool(done.all()) and bool(extras["time_outs"].all())
        assert int(state.episode_length.sum()) == 0
        # auto-reset rebuilt fresh data: qpos back to noise-scale magnitude
        assert float(jnp.max(jnp.abs(state.data.qpos))) < 0.02

    def test_terminal_vs_timeout_split(self, fake_mjx):
        import jax
        import jax.numpy as jnp

        env = self._make_env(
            episode_length=1000, done_fn=lambda mx, d: d.qpos[0] > 0.001
        )
        state, obs = env.reset(jax.random.PRNGKey(1))
        step = jax.jit(env.step)
        done_any = False
        for _ in range(20):
            state, obs, rew, done, extras = step(state, jnp.ones((4, 1)))
            # terminal dones must NOT be flagged as timeouts
            assert not bool(jnp.any(extras["time_outs"] & done))
            done_any = done_any or bool(jnp.any(done))
        assert done_any, "done_fn never triggered"

    def test_ppo_learns_on_fake_mjx(self, fake_mjx):
        """The adapter must trace into the fused collect scan + update."""
        from rsl_rl_tpu.runners import OnPolicyRunner

        env = self._make_env(num_envs=8, episode_length=16)
        cfg = {
            "num_steps_per_env": 8, "save_interval": 1000, "seed": 1,
            "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
            "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [32],
                       "critic_hidden_dims": [32]},
            "algorithm": {"class_name": "PPO"},
        }
        runner = OnPolicyRunner(env, cfg, log_dir=None)
        runner.learn(3)
        assert np.isfinite(float(runner.train_state.lr))


class TestImportGate:
    @pytest.mark.skipif(_HAS_MJX, reason="mjx installed; gate not reachable")
    def test_constructor_raises_without_mjx(self):
        with pytest.raises(ImportError, match="mujoco-mjx"):
            MJXEnv(None, num_envs=4, episode_length=10, obs_fn=None, reward_fn=None)


@pytest.mark.skipif(not _HAS_MJX, reason="mujoco-mjx not installed")
class TestMJXPhysics:
    def _make_env(self, num_envs=4):
        import jax.numpy as jnp
        import mujoco

        xml = """
        <mujoco>
          <option timestep="0.02"/>
          <worldbody>
            <body name="cart" pos="0 0 0">
              <joint name="slide" type="slide" axis="1 0 0"/>
              <geom type="box" size="0.1 0.1 0.1" mass="1"/>
            </body>
          </worldbody>
          <actuator><motor joint="slide" gear="1"/></actuator>
        </mujoco>
        """
        model = mujoco.MjModel.from_xml_string(xml)
        return MJXEnv(
            model,
            num_envs=num_envs,
            episode_length=8,
            obs_fn=lambda mx, d: {"policy": jnp.concatenate([d.qpos, d.qvel])},
            reward_fn=lambda mx, d, a: -jnp.square(d.qpos[0]),
        )

    def test_contract_shapes(self):
        import jax

        env = self._make_env()
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs["policy"].shape == (4, 2)
        actions = jax.numpy.ones((4, 1))
        state, obs, rew, done, extras = env.step(state, actions)
        assert rew.shape == (4,) and done.shape == (4,)
        assert "time_outs" in extras

    def test_timeout_autoreset(self):
        import jax

        env = self._make_env()
        state, obs = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        for i in range(8):
            state, obs, rew, done, extras = step(state, jax.numpy.ones((4, 1)))
        assert bool(done.all())
        assert int(state.episode_length.sum()) == 0


class TestBraxGate:
    def test_constructor_raises_without_brax(self):
        from rsl_rl_tpu.env.brax_env import _HAS_BRAX, BraxVecEnv

        if _HAS_BRAX:
            import pytest as _pytest
            _pytest.skip("brax installed; gate not reachable")
        with pytest.raises(ImportError, match="brax"):
            BraxVecEnv(None, num_envs=4, episode_length=10)


@struct.dataclass
class _FakeBraxState:
    pipeline: object  # arbitrary nested sim state (exercises the tree.map)
    obs: object
    reward: object
    done: object
    metrics: dict = struct.field(pytree_node=True, default_factory=dict)


class _FakeBraxEnv:
    """Single-env double for brax.envs.Env: damped point mass, brax dtypes
    (float 0/1 done, metrics dict), terminal when |x| leaves the bound."""

    action_size = 1
    dt = 0.05

    def reset(self, key):
        import jax, jax.numpy as jnp

        x = jax.random.uniform(key, (), minval=-0.1, maxval=0.1)
        pipeline = {"x": x, "v": jnp.zeros(())}
        return _FakeBraxState(
            pipeline=pipeline,
            obs=jnp.stack([x, jnp.zeros(())]),
            reward=jnp.zeros(()),
            done=jnp.zeros(()),
            metrics={"fake/abs_x": jnp.abs(x)},
        )

    def step(self, state, action):
        import jax.numpy as jnp

        v = state.pipeline["v"] + self.dt * action[0]
        x = state.pipeline["x"] + self.dt * v
        done = (jnp.abs(x) > 0.5).astype(jnp.float32)
        return _FakeBraxState(
            pipeline={"x": x, "v": v},
            obs=jnp.stack([x, v]),
            reward=-jnp.square(x),
            done=done,
            metrics={"fake/abs_x": jnp.abs(x)},
        )


class TestBraxAdapterWithFake:
    def _make_env(self, num_envs=4, episode_length=8):
        import rsl_rl_tpu.env.brax_env as brax_env_mod

        # the gate flag is module state; flip it for the double
        orig = brax_env_mod._HAS_BRAX
        brax_env_mod._HAS_BRAX = True
        try:
            env = brax_env_mod.BraxVecEnv(
                _FakeBraxEnv(), num_envs=num_envs, episode_length=episode_length
            )
        finally:
            brax_env_mod._HAS_BRAX = orig
        return env

    def test_contract_and_metrics_log(self):
        import jax
        import jax.numpy as jnp

        env = self._make_env()
        assert env.num_actions == 1 and env.step_dt == pytest.approx(0.05)
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs["policy"].shape == (4, 2)
        state, obs, rew, done, extras = jax.jit(env.step)(state, jnp.zeros((4, 1)))
        assert rew.shape == (4,) and done.dtype == bool
        assert extras["log"]["fake/abs_x"].shape == (4,)

    def test_terminal_autoreset(self):
        import jax
        import jax.numpy as jnp

        env = self._make_env(episode_length=1000)
        state, obs = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        # constant max torque drives |x| past the brax-env terminal bound
        # (x grows ~0.00125 k^2, so every env terminates well within 35 steps)
        for _ in range(35):
            state, obs, rew, done, extras = step(state, jnp.ones((4, 1)))
        # every env terminated at least once and none was flagged a timeout
        assert bool(jnp.all(state.episode_length < 35))
        assert not bool(jnp.any(extras["time_outs"]))
        # auto-reset pulled x back inside the spawn range for done envs
        assert float(jnp.max(jnp.abs(state.brax.pipeline["x"]))) < 0.6

    def test_timeout_flagged(self):
        import jax
        import jax.numpy as jnp

        env = self._make_env(episode_length=3)
        state, obs = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        for _ in range(3):
            state, obs, rew, done, extras = step(state, jnp.zeros((4, 1)))
        assert bool(done.all()) and bool(extras["time_outs"].all())


class TestMJXRngStreams:
    def test_carried_rng_distinct_from_init_noise_keys(self, fake_mjx):
        """The per-env rng carried out of reset must NOT be the keys
        _init_one already consumed for qpos/qvel noise — reusing them makes
        the first auto-reset's noise draws collide with the initial
        perturbations (biased domain randomization)."""
        import jax
        import jax.numpy as jnp

        env = TestMJXAdapterWithFake()._make_env(num_envs=4)
        key = jax.random.PRNGKey(7)
        state, _ = env.reset(key)
        consumed = jax.random.split(key, 4)  # the old (buggy) carried value
        assert not np.array_equal(np.asarray(state.rng), np.asarray(consumed))
        # streams stay pairwise distinct
        rows = {tuple(np.asarray(r).tolist()) for r in state.rng}
        assert len(rows) == 4
