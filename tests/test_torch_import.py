"""Reference-checkpoint import parity (utils/torch_deploy.py, torch -> JAX).

Builds REAL upstream reference modules (torch, /root/reference via the
benchmark shims), takes their ``state_dict()``, imports it with
``import_torch_state_dict``, and checks the JAX ``act_inference`` path
reproduces the reference's deterministic actions — the migration story for
users bringing trained rsl_rl models over (normalizer moments, std modes,
GRU/LSTM gate layouts, student/teacher nets all covered).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

torch = pytest.importorskip("torch")
if not os.path.isdir("/root/reference/rsl_rl"):
    pytest.skip("reference checkout unavailable", allow_module_level=True)

from benchmarks._reference_shim import TensorDictShim, install_reference_shims

install_reference_shims()

import jax

from rsl_rl.modules import ActorCritic as RefActorCritic
from rsl_rl.modules import ActorCriticRecurrent as RefActorCriticRecurrent
from rsl_rl.modules import StudentTeacher as RefStudentTeacher

from rsl_rl_tpu.modules import ActorCritic, ActorCriticRecurrent, StudentTeacher
from rsl_rl_tpu.utils.torch_deploy import (
    import_torch_checkpoint,
    import_torch_state_dict,
)

N, D, A = 6, 5, 3
GROUPS = {"policy": ["policy"], "critic": ["policy"]}


def _obs_np(seed, batch=N):
    return np.random.default_rng(seed).standard_normal((batch, D)).astype(np.float32) * 1.5


def _td(obs_np):
    return TensorDictShim({"policy": torch.from_numpy(obs_np)}, batch_size=[obs_np.shape[0]])


def _jx(obs_np):
    return {"policy": jax.numpy.asarray(obs_np)}


class TestActorCriticImport:
    @pytest.mark.parametrize("noise_std_type", ["scalar", "log"])
    def test_feedforward_with_normalizers(self, noise_std_type):
        torch.manual_seed(11)
        ref = RefActorCritic(
            _td(np.zeros((N, D), np.float32)), GROUPS, A,
            actor_hidden_dims=[16, 8], critic_hidden_dims=[16],
            actor_obs_normalization=True, critic_obs_normalization=True,
            noise_std_type=noise_std_type,
        )
        # fold a batch into the reference normalizers so moments are nontrivial
        ref.update_normalization(_td(_obs_np(0, batch=64)))

        policy = ActorCritic(
            _jx(np.zeros((N, D), np.float32)), GROUPS, A,
            actor_hidden_dims=[16, 8], critic_hidden_dims=[16],
            actor_obs_normalization=True, critic_obs_normalization=True,
            noise_std_type=noise_std_type,
        )
        ps = import_torch_state_dict(
            policy, policy.init(jax.random.PRNGKey(0)), ref.state_dict()
        )

        obs = _obs_np(1)
        with torch.no_grad():
            want = ref.act_inference(_td(obs)).numpy()
        got, _ = policy.act_inference(ps, _jx(obs), ())
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

        # the critic came along too
        with torch.no_grad():
            want_v = ref.evaluate(_td(obs)).numpy().squeeze(-1)
        got_v, _ = policy.value(ps, _jx(obs), ())
        np.testing.assert_allclose(np.asarray(got_v), want_v, atol=1e-5)

    def test_architecture_mismatch_raises(self):
        torch.manual_seed(1)
        ref = RefActorCritic(
            _td(np.zeros((N, D), np.float32)), GROUPS, A,
            actor_hidden_dims=[16], critic_hidden_dims=[16],
        )
        policy = ActorCritic(
            _jx(np.zeros((N, D), np.float32)), GROUPS, A,
            actor_hidden_dims=[32], critic_hidden_dims=[16],
        )
        with pytest.raises(ValueError):
            import_torch_state_dict(
                policy, policy.init(jax.random.PRNGKey(0)), ref.state_dict()
            )

    def test_missing_normalizer_keys_actionable(self):
        """Checkpoint saved without normalizers + policy configured with them
        must fail with a message naming the flag, not a raw KeyError path."""
        torch.manual_seed(2)
        ref = RefActorCritic(
            _td(np.zeros((N, D), np.float32)), GROUPS, A,
            actor_hidden_dims=[16], critic_hidden_dims=[16],
        )
        policy = ActorCritic(
            _jx(np.zeros((N, D), np.float32)), GROUPS, A,
            actor_hidden_dims=[16], critic_hidden_dims=[16],
            actor_obs_normalization=True,
        )
        with pytest.raises(KeyError, match="obs_normalization"):
            import_torch_state_dict(
                policy, policy.init(jax.random.PRNGKey(0)), ref.state_dict()
            )

    def test_orphan_normalizer_rejected(self):
        """The opposite mismatch: checkpoint trained WITH a normalizer,
        target policy built without one — importing would silently feed raw
        obs into weights trained on normalized obs; must raise."""
        torch.manual_seed(9)
        ref = RefActorCritic(
            _td(np.zeros((N, D), np.float32)), GROUPS, A,
            actor_hidden_dims=[16], critic_hidden_dims=[16],
            actor_obs_normalization=True,
        )
        policy = ActorCritic(
            _jx(np.zeros((N, D), np.float32)), GROUPS, A,
            actor_hidden_dims=[16], critic_hidden_dims=[16],
        )
        with pytest.raises(ValueError, match="actor_obs_normalization"):
            import_torch_state_dict(
                policy, policy.init(jax.random.PRNGKey(0)), ref.state_dict()
            )


class TestRecurrentImport:
    @pytest.mark.parametrize("rnn_type", ["gru", "lstm"])
    @pytest.mark.parametrize("num_layers", [1, 2])
    def test_stateful_rollout_matches(self, rnn_type, num_layers):
        torch.manual_seed(3)
        kw = dict(
            actor_hidden_dims=[16], critic_hidden_dims=[16],
            rnn_type=rnn_type, rnn_hidden_dim=10, rnn_num_layers=num_layers,
        )
        ref = RefActorCriticRecurrent(_td(np.zeros((N, D), np.float32)), GROUPS, A, **kw)
        policy = ActorCriticRecurrent(_jx(np.zeros((N, D), np.float32)), GROUPS, A, **kw)
        ps = import_torch_state_dict(
            policy, policy.init(jax.random.PRNGKey(0)), ref.state_dict()
        )

        carry = policy.initial_carry(N)
        for t in range(4):
            obs = _obs_np(10 + t)
            with torch.no_grad():
                want = ref.act_inference(_td(obs)).numpy()  # stateful module
            got, carry = policy.act_inference(ps, _jx(obs), carry)
            np.testing.assert_allclose(
                np.asarray(got), want, atol=1e-5, err_msg=f"step {t}"
            )


class TestStudentTeacherImport:
    ST_GROUPS = {"policy": ["policy"], "teacher": ["policy"]}

    def test_student_and_teacher(self):
        torch.manual_seed(4)
        kw = dict(student_hidden_dims=[16], teacher_hidden_dims=[12, 8])
        ref = RefStudentTeacher(
            _td(np.zeros((N, D), np.float32)), self.ST_GROUPS, A,
            student_obs_normalization=True, **kw,
        )
        ref.update_normalization(_td(_obs_np(5, batch=32)))
        policy = StudentTeacher(
            _jx(np.zeros((N, D), np.float32)), self.ST_GROUPS, A,
            student_obs_normalization=True, **kw,
        )
        ps = import_torch_state_dict(
            policy, policy.init(jax.random.PRNGKey(0)), ref.state_dict()
        )

        obs = _obs_np(6)
        with torch.no_grad():
            want = ref.act_inference(_td(obs)).numpy()
        got, _ = policy.act_inference(ps, _jx(obs), ())
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

        with torch.no_grad():
            want_t = ref.evaluate(_td(obs)).numpy()
        got_t, _ = policy.evaluate(ps, _jx(obs), ())
        np.testing.assert_allclose(np.asarray(got_t), want_t, atol=1e-5)


class TestCheckpointFile:
    def test_reference_save_layout_roundtrip(self, tmp_path):
        torch.manual_seed(7)
        ref = RefActorCritic(
            _td(np.zeros((N, D), np.float32)), GROUPS, A,
            actor_hidden_dims=[16], critic_hidden_dims=[16],
        )
        path = str(tmp_path / "model_42.pt")
        # the reference OnPolicyRunner.save layout (on_policy_runner.py:289-305)
        torch.save(
            {"model_state_dict": ref.state_dict(), "optimizer_state_dict": {},
             "iter": 42, "infos": None},
            path,
        )
        policy = ActorCritic(
            _jx(np.zeros((N, D), np.float32)), GROUPS, A,
            actor_hidden_dims=[16], critic_hidden_dims=[16],
        )
        ps, it = import_torch_checkpoint(policy, policy.init(jax.random.PRNGKey(0)), path)
        assert it == 42
        obs = _obs_np(8)
        with torch.no_grad():
            want = ref.act_inference(_td(obs)).numpy()
        got, _ = policy.act_inference(ps, _jx(obs), ())
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestExportToReference:
    """export_torch_state_dict: TPU-trained models strict-load into the real
    upstream modules and reproduce our deterministic actions there."""

    def _warm(self, policy, ps, seed):
        return policy.update_normalization(
            ps, {"policy": jax.numpy.asarray(_obs_np(seed, batch=64))}
        )

    def test_feedforward_strict_load(self):
        from rsl_rl_tpu.utils.torch_deploy import export_torch_state_dict

        policy = ActorCritic(
            _jx(np.zeros((N, D), np.float32)), GROUPS, A,
            actor_hidden_dims=[16, 8], critic_hidden_dims=[16],
            actor_obs_normalization=True, critic_obs_normalization=True,
        )
        ps = self._warm(policy, policy.init(jax.random.PRNGKey(3)), 20)
        sd = export_torch_state_dict(policy, ps)

        torch.manual_seed(0)
        ref = RefActorCritic(
            _td(np.zeros((N, D), np.float32)), GROUPS, A,
            actor_hidden_dims=[16, 8], critic_hidden_dims=[16],
            actor_obs_normalization=True, critic_obs_normalization=True,
        )
        torch.nn.Module.load_state_dict(ref, sd, strict=True)

        obs = _obs_np(21)
        want, _ = policy.act_inference(ps, _jx(obs), ())
        with torch.no_grad():
            got = ref.act_inference(_td(obs)).numpy()
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)
        want_v, _ = policy.value(ps, _jx(obs), ())
        with torch.no_grad():
            got_v = ref.evaluate(_td(obs)).numpy().squeeze(-1)
        np.testing.assert_allclose(got_v, np.asarray(want_v), atol=1e-5)

    @pytest.mark.parametrize("rnn_type", ["gru", "lstm"])
    def test_recurrent_strict_load(self, rnn_type):
        from rsl_rl_tpu.utils.torch_deploy import export_torch_state_dict

        kw = dict(
            actor_hidden_dims=[16], critic_hidden_dims=[16],
            rnn_type=rnn_type, rnn_hidden_dim=10, rnn_num_layers=2,
        )
        policy = ActorCriticRecurrent(_jx(np.zeros((N, D), np.float32)), GROUPS, A, **kw)
        ps = policy.init(jax.random.PRNGKey(4))
        sd = export_torch_state_dict(policy, ps)

        torch.manual_seed(0)
        ref = RefActorCriticRecurrent(_td(np.zeros((N, D), np.float32)), GROUPS, A, **kw)
        torch.nn.Module.load_state_dict(ref, sd, strict=True)

        carry = policy.initial_carry(N)
        for t in range(3):
            obs = _obs_np(30 + t)
            want, carry = policy.act_inference(ps, _jx(obs), carry)
            with torch.no_grad():
                got = ref.act_inference(_td(obs)).numpy()
            np.testing.assert_allclose(
                got, np.asarray(want), atol=1e-5, err_msg=f"step {t}"
            )

    def test_roundtrip_is_identity(self):
        from rsl_rl_tpu.utils.torch_deploy import export_torch_state_dict

        policy = ActorCriticRecurrent(
            _jx(np.zeros((N, D), np.float32)), GROUPS, A,
            actor_hidden_dims=[16], critic_hidden_dims=[16],
            rnn_type="gru", rnn_hidden_dim=10,
            actor_obs_normalization=True,
        )
        ps = policy.update_normalization(
            policy.init(jax.random.PRNGKey(5)),
            {"policy": jax.numpy.asarray(_obs_np(40, batch=32))},
        )
        ps2 = import_torch_state_dict(policy, ps, export_torch_state_dict(policy, ps))
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            jax.device_get(ps), jax.device_get(ps2),
        )

    def test_student_teacher_strict_load(self):
        from rsl_rl_tpu.utils.torch_deploy import export_torch_state_dict

        st_groups = {"policy": ["policy"], "teacher": ["policy"]}
        kw = dict(student_hidden_dims=[16], teacher_hidden_dims=[12, 8])
        policy = StudentTeacher(
            _jx(np.zeros((N, D), np.float32)), st_groups, A,
            student_obs_normalization=True, **kw,
        )
        ps = self._warm(policy, policy.init(jax.random.PRNGKey(6)), 50)
        sd = export_torch_state_dict(policy, ps)

        torch.manual_seed(0)
        ref = RefStudentTeacher(
            _td(np.zeros((N, D), np.float32)), st_groups, A,
            student_obs_normalization=True, **kw,
        )
        torch.nn.Module.load_state_dict(ref, sd, strict=True)

        obs = _obs_np(51)
        want, _ = policy.act_inference(ps, _jx(obs), ())
        with torch.no_grad():
            got = ref.act_inference(_td(obs)).numpy()
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)
