"""Policy export (StableHLO) round-trip tests."""

import jax
import numpy as np

from rsl_rl_tpu.env import Pendulum
from rsl_rl_tpu.modules import ActorCritic, ActorCriticRecurrent
from rsl_rl_tpu.utils.export import export_policy, load_policy

GROUPS = {"policy": ["policy"], "critic": ["policy"]}


class TestExport:
    def test_ff_roundtrip(self, tmp_path):
        env = Pendulum(num_envs=4)
        _, obs = env.reset(jax.random.PRNGKey(0))
        policy = ActorCritic(obs, GROUPS, 1, actor_hidden_dims=[16], critic_hidden_dims=[16])
        ps = policy.init(jax.random.PRNGKey(1))

        path = str(tmp_path / "policy.export")
        export_policy(policy, ps, obs, path)
        loaded = load_policy(path)

        want, _ = policy.act_inference(ps, obs, ())
        got = loaded(obs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    def test_recurrent_roundtrip_stateful(self, tmp_path):
        env = Pendulum(num_envs=4)
        _, obs = env.reset(jax.random.PRNGKey(0))
        policy = ActorCriticRecurrent(
            obs, GROUPS, 1, actor_hidden_dims=[8], critic_hidden_dims=[8],
            rnn_type="gru", rnn_hidden_dim=8,
        )
        ps = policy.init(jax.random.PRNGKey(1))
        path = str(tmp_path / "policy_rnn.export")
        export_policy(policy, ps, obs, path)
        loaded = load_policy(path)
        assert loaded.is_recurrent

        # two stateful steps must match the module's stateful inference
        carry = policy.initial_carry(4)
        w1, carry = policy.act_inference(ps, obs, carry)
        w2, carry = policy.act_inference(ps, obs, carry)
        g1 = loaded(obs)
        g2 = loaded(obs)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(w1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(w2), rtol=1e-6)
        # reset gives a fresh hidden state
        loaded.reset()
        np.testing.assert_allclose(np.asarray(loaded(obs)), np.asarray(w1), rtol=1e-6)
