"""Torch deployment-bridge parity (utils/torch_deploy.py).

``as_torch_policy`` must reproduce the JAX ``act_inference`` path exactly
(fp32): normalizer math, activation variants, the state-dependent-std mean
slice, GRU/LSTM gate layouts (single- and multi-layer), and the student
path. The ONNX wrapper's missing-dependency gate is pinned too (the image
ships no ``onnx``; serialization itself is torch's own tested code).
"""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from rsl_rl_tpu.modules import (
    ActorCritic,
    ActorCriticRecurrent,
    StudentTeacher,
    StudentTeacherRecurrent,
)
from rsl_rl_tpu.utils.torch_deploy import as_torch_policy, export_onnx

B, D_POL, D_EXTRA, A = 5, 6, 3, 2
GROUPS = {"policy": ["policy", "extra"], "critic": ["policy", "extra"]}


def _obs(key, batch=B):
    k1, k2 = jax.random.split(key)
    return {
        "policy": jax.random.normal(k1, (batch, D_POL)) * 2.0 + 0.5,
        "extra": jax.random.normal(k2, (batch, D_EXTRA)),
    }


def _flat(obs):
    return torch.from_numpy(
        np.concatenate([np.asarray(obs["policy"]), np.asarray(obs["extra"])], -1)
    ).float()


def _warm_norm(policy, ps, key):
    """Fold a random batch into the normalizer so its moments are nontrivial."""
    return policy.update_normalization(ps, _obs(key, batch=64))


class TestFeedforwardParity:
    @pytest.mark.parametrize("activation", ["elu", "tanh", "gelu", "crelu", "mish"])
    def test_actor_matches_act_inference(self, activation):
        policy = ActorCritic(
            _obs(jax.random.PRNGKey(0)), GROUPS, A,
            actor_hidden_dims=[16, 8], critic_hidden_dims=[16],
            activation=activation, actor_obs_normalization=True,
        )
        ps = _warm_norm(policy, policy.init(jax.random.PRNGKey(1)), jax.random.PRNGKey(2))
        obs = _obs(jax.random.PRNGKey(3))
        want, _ = policy.act_inference(ps, obs, ())

        module = as_torch_policy(policy, ps).eval()
        assert module.obs_names == ["policy", "extra"]
        with torch.no_grad():
            got = module(_flat(obs)).numpy()
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)

    def test_state_dependent_std_exports_mean_head(self):
        policy = ActorCritic(
            _obs(jax.random.PRNGKey(0)), GROUPS, A,
            actor_hidden_dims=[16], critic_hidden_dims=[16],
            state_dependent_std=True,
        )
        ps = policy.init(jax.random.PRNGKey(1))
        obs = _obs(jax.random.PRNGKey(2))
        want, _ = policy.act_inference(ps, obs, ())
        module = as_torch_policy(policy, ps).eval()
        with torch.no_grad():
            got = module(_flat(obs))
        assert got.shape == (B, A)
        np.testing.assert_allclose(got.numpy(), np.asarray(want), atol=1e-5)


class TestRecurrentParity:
    @pytest.mark.parametrize("rnn_type", ["gru", "lstm"])
    @pytest.mark.parametrize("num_layers", [1, 2])
    def test_stateful_rollout_matches(self, rnn_type, num_layers):
        policy = ActorCriticRecurrent(
            _obs(jax.random.PRNGKey(0)), GROUPS, A,
            rnn_type=rnn_type, rnn_hidden_dim=12, rnn_num_layers=num_layers,
            actor_hidden_dims=[16], critic_hidden_dims=[16],
            actor_obs_normalization=True,
        )
        ps = _warm_norm(policy, policy.init(jax.random.PRNGKey(1)), jax.random.PRNGKey(2))
        module = as_torch_policy(policy, ps).eval()

        carry = policy.initial_carry(B)
        hidden = None
        for t in range(4):
            obs = _obs(jax.random.fold_in(jax.random.PRNGKey(3), t))
            want, carry = policy.act_inference(ps, obs, carry)
            with torch.no_grad():
                got, hidden = module(_flat(obs), hidden)
            np.testing.assert_allclose(
                got.numpy(), np.asarray(want), atol=1e-5,
                err_msg=f"step {t} diverged",
            )

        # final hidden state matches layer by layer (torch: [L, B, H])
        h_torch = hidden[0] if rnn_type == "lstm" else hidden
        for layer in range(num_layers):
            jax_layer = carry["actor"][layer]
            jax_h = jax_layer[1] if rnn_type == "lstm" else jax_layer
            np.testing.assert_allclose(
                h_torch[layer].numpy(), np.asarray(jax_h), atol=1e-5
            )
        if rnn_type == "lstm":
            for layer in range(num_layers):
                np.testing.assert_allclose(
                    hidden[1][layer].numpy(),
                    np.asarray(carry["actor"][layer][0]), atol=1e-5,
                )

    def test_column_zeroing_is_the_reset(self):
        """Zeroing a batch column of the torch hidden == reset_carry on that
        env (the documented deployment-side episode reset)."""
        policy = ActorCriticRecurrent(
            _obs(jax.random.PRNGKey(0)), GROUPS, A,
            rnn_type="gru", rnn_hidden_dim=8, rnn_num_layers=1,
            actor_hidden_dims=[8], critic_hidden_dims=[8],
        )
        ps = policy.init(jax.random.PRNGKey(1))
        module = as_torch_policy(policy, ps).eval()

        obs = _obs(jax.random.PRNGKey(2))
        carry = policy.initial_carry(B)
        _, carry = policy.act_inference(ps, obs, carry)
        with torch.no_grad():
            _, hidden = module(_flat(obs), None)

        dones = jnp.zeros((B,), bool).at[1].set(True)
        carry = policy.reset_carry(carry, dones)
        hidden[:, 1, :] = 0.0

        obs2 = _obs(jax.random.PRNGKey(4))
        want, _ = policy.act_inference(ps, obs2, carry)
        with torch.no_grad():
            got, _ = module(_flat(obs2), hidden)
        np.testing.assert_allclose(got.numpy(), np.asarray(want), atol=1e-5)


class TestStudentParity:
    ST_GROUPS = {**GROUPS, "teacher": ["policy", "extra"]}

    def test_feedforward_student(self):
        policy = StudentTeacher(
            _obs(jax.random.PRNGKey(0)), self.ST_GROUPS, A,
            student_hidden_dims=[16], teacher_hidden_dims=[16],
            student_obs_normalization=True,
        )
        ps = _warm_norm(policy, policy.init(jax.random.PRNGKey(1)), jax.random.PRNGKey(2))
        obs = _obs(jax.random.PRNGKey(3))
        want, _ = policy.act_inference(ps, obs, ())
        module = as_torch_policy(policy, ps).eval()
        with torch.no_grad():
            got = module(_flat(obs)).numpy()
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)

    def test_recurrent_student(self):
        policy = StudentTeacherRecurrent(
            _obs(jax.random.PRNGKey(0)), self.ST_GROUPS, A,
            rnn_type="gru", rnn_hidden_dim=8, rnn_num_layers=1,
            student_hidden_dims=[16], teacher_hidden_dims=[16],
        )
        ps = policy.init(jax.random.PRNGKey(1))
        module = as_torch_policy(policy, ps).eval()
        carry = policy.initial_carry(B)
        hidden = None
        for t in range(3):
            obs = _obs(jax.random.fold_in(jax.random.PRNGKey(2), t))
            want, carry = policy.act_inference(ps, obs, carry)
            with torch.no_grad():
                got, hidden = module(_flat(obs), hidden)
            np.testing.assert_allclose(got.numpy(), np.asarray(want), atol=1e-5)


class TestOnnxGate:
    def test_missing_onnx_raises_actionable_error(self, tmp_path):
        if importlib.util.find_spec("onnx") is not None:
            pytest.skip("onnx installed; the gate is for images without it")
        policy = ActorCritic(
            _obs(jax.random.PRNGKey(0)), GROUPS, A,
            actor_hidden_dims=[8], critic_hidden_dims=[8],
        )
        ps = policy.init(jax.random.PRNGKey(1))
        with pytest.raises(RuntimeError, match="onnx"):
            export_onnx(policy, ps, str(tmp_path / "p.onnx"))
