"""MJX adapter tests.

mujoco-mjx is not installed in the CI image, so the full physics path is
exercised only when available; the import gate itself is always tested.
"""

import pytest

from rsl_rl_tpu.env.mjx_env import _HAS_MJX, MJXEnv


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
