"""Numerical parity against the UPSTREAM reference implementation.

These tests import the actual reference library (torch, from /root/reference,
via the benchmarks/_reference_shim stand-ins for its absent GitPython /
tensordict deps) and check that our pure-JAX counterparts produce the same
numbers on identical inputs:

- GAE returns/advantages vs ``RolloutStorage.compute_returns``
  (reference rollout_storage.py:127-149)
- running normalizer moments vs ``EmpiricalNormalization``
  (reference normalization.py:49-66)
- Gaussian log-prob/entropy vs ``torch.distributions.Normal`` as the reference
  policies use it (reference actor_critic.py:113-115, 170-171)
- ActorCritic forward outputs with weights copied across frameworks
- one full PPO update's loss dict on identical rollout data + identical
  initial weights (reference ppo.py:178-422)

Skipped when the reference checkout or torch is unavailable.
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
import jax.numpy as jnp

from rsl_rl.algorithms import PPO as RefPPO
from rsl_rl.modules import ActorCritic as RefActorCritic
from rsl_rl.networks import EmpiricalNormalization as RefNorm

from rsl_rl_tpu.algorithms.ppo import PPO, CollectState, init_episode_stats
from rsl_rl_tpu.modules import ActorCritic
from rsl_rl_tpu.ops import distributions
from rsl_rl_tpu.ops.gae import compute_gae
from rsl_rl_tpu.ops.running_norm import (
    init_running_norm,
    normalize,
    update_running_norm,
)
from rsl_rl_tpu.storage.rollout import Rollout

T, N, A, D = 24, 8, 3, 6


def _rollout_data(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "obs": rng.normal(size=(T, N, D)).astype(np.float32),
        "actions": rng.normal(size=(T, N, A)).astype(np.float32),
        "rewards": rng.normal(size=(T, N)).astype(np.float32),
        "dones": (rng.random((T, N)) < 0.05),
        "values": rng.normal(size=(T, N)).astype(np.float32),
        "log_probs": rng.normal(size=(T, N)).astype(np.float32),
        "mu": rng.normal(size=(T, N, A)).astype(np.float32),
        "sigma": rng.uniform(0.5, 1.5, size=(T, N, A)).astype(np.float32),
        "last_obs": rng.normal(size=(N, D)).astype(np.float32),
    }


def _copy_mlp_params(ours: dict, ref_seq: torch.nn.Module) -> None:
    """Copy flax MLP params into a reference MLP (nn.Sequential subclass)."""
    linears = [m for m in ref_seq if isinstance(m, torch.nn.Linear)]
    for i, lin in enumerate(linears):
        layer = ours[f"dense_{i}"]
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(np.asarray(layer["kernel"]).T))
            lin.bias.copy_(torch.from_numpy(np.asarray(layer["bias"])))


def _ref_actor_critic(params) -> RefActorCritic:
    """Reference ActorCritic with our initialized weights copied in."""
    obs_td = TensorDictShim({"policy": torch.zeros(N, D)}, batch_size=[N])
    ref = RefActorCritic(
        obs_td,
        {"policy": ["policy"], "critic": ["policy"]},
        A,
        actor_hidden_dims=[32, 32],
        critic_hidden_dims=[32, 32],
        init_noise_std=1.0,
    )
    _copy_mlp_params(params["actor"], ref.actor)
    _copy_mlp_params(params["critic"], ref.critic)
    with torch.no_grad():
        ref.std.copy_(torch.from_numpy(np.asarray(params["std"])))
    return ref


def _our_actor_critic():
    obs = {"policy": jnp.zeros((N, D))}
    policy = ActorCritic(
        obs,
        {"policy": ["policy"], "critic": ["policy"]},
        A,
        actor_hidden_dims=[32, 32],
        critic_hidden_dims=[32, 32],
        init_noise_std=1.0,
    )
    ps = policy.init(jax.random.PRNGKey(3))
    return policy, ps


class TestGAEParity:
    def test_returns_and_advantages_match(self):
        data = _rollout_data()
        ref_ppo_storage_cls = __import__(
            "rsl_rl.storage.rollout_storage", fromlist=["RolloutStorage"]
        ).RolloutStorage
        obs_td = TensorDictShim({"policy": torch.zeros(N, D)}, batch_size=[N])
        storage = ref_ppo_storage_cls("rl", N, T, obs_td, [A])
        storage.rewards.copy_(torch.from_numpy(data["rewards"]).unsqueeze(-1))
        storage.values.copy_(torch.from_numpy(data["values"]).unsqueeze(-1))
        storage.dones.copy_(torch.from_numpy(data["dones"]).unsqueeze(-1))
        last_values = torch.from_numpy(data["values"][-1]).unsqueeze(-1)
        storage.compute_returns(last_values, 0.99, 0.95, normalize_advantage=True)

        returns, advantages = compute_gae(
            jnp.asarray(data["rewards"]),
            jnp.asarray(data["values"]),
            jnp.asarray(data["dones"], jnp.float32),
            jnp.asarray(data["values"][-1]),
            0.99,
            0.95,
            normalize_advantage=True,
        )
        np.testing.assert_allclose(
            np.asarray(returns), storage.returns.squeeze(-1).numpy(), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(advantages), storage.advantages.squeeze(-1).numpy(), rtol=1e-4, atol=1e-4
        )


class TestNormalizerParity:
    def test_moments_and_forward_match(self):
        rng = np.random.default_rng(1)
        ref = RefNorm((D,))
        state = init_running_norm(D)
        for _ in range(5):
            batch = rng.normal(loc=2.0, scale=3.0, size=(N, D)).astype(np.float32)
            ref.update(torch.from_numpy(batch))
            state = update_running_norm(state, jnp.asarray(batch))
        np.testing.assert_allclose(np.asarray(state.mean), ref.mean.numpy(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(state.std), ref.std.numpy(), rtol=1e-5)
        x = rng.normal(size=(N, D)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(normalize(state, jnp.asarray(x))),
            ref(torch.from_numpy(x)).numpy(),
            rtol=1e-5,
            atol=1e-6,
        )


class TestGaussianParity:
    def test_log_prob_and_entropy_match_torch(self):
        rng = np.random.default_rng(2)
        mean = rng.normal(size=(N, A)).astype(np.float32)
        std = rng.uniform(0.3, 2.0, size=(N, A)).astype(np.float32)
        value = rng.normal(size=(N, A)).astype(np.float32)
        dist = torch.distributions.Normal(torch.from_numpy(mean), torch.from_numpy(std))
        np.testing.assert_allclose(
            np.asarray(distributions.log_prob(jnp.asarray(mean), jnp.asarray(std), jnp.asarray(value))),
            dist.log_prob(torch.from_numpy(value)).sum(dim=-1).numpy(),
            rtol=1e-5,
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(distributions.entropy(jnp.asarray(std))),
            dist.entropy().sum(dim=-1).numpy(),
            rtol=1e-5,
        )


class TestActorCriticParity:
    def test_forward_outputs_match_with_copied_weights(self):
        policy, ps = _our_actor_critic()
        ref = _ref_actor_critic(ps.params)
        obs_np = np.random.default_rng(4).normal(size=(N, D)).astype(np.float32)
        obs_td = TensorDictShim({"policy": torch.from_numpy(obs_np)}, batch_size=[N])
        obs_jax = {"policy": jnp.asarray(obs_np)}

        with torch.no_grad():
            ref_action = ref.act_inference(obs_td).numpy()
            ref_value = ref.evaluate(obs_td).squeeze(-1).numpy()
        our_action, _ = policy.act_inference(ps, obs_jax, ())
        our_value, _ = policy.value(ps, obs_jax, ())
        np.testing.assert_allclose(np.asarray(our_action), ref_action, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(our_value), ref_value, rtol=1e-4, atol=1e-5)


class TestFullUpdateParity:
    def test_ppo_update_loss_dict_matches(self):
        """One full-batch PPO update on identical weights + rollout data must
        produce the same loss dict in both frameworks."""
        data = _rollout_data(5)
        policy, ps = _our_actor_critic()

        # ---- ours
        ours = PPO(policy, num_learning_epochs=1, num_mini_batches=1, schedule="fixed",
                   desired_kl=None, learning_rate=1e-10)
        ts = ours.init_train_state(jax.random.PRNGKey(0), N)
        ts = ts.replace(policy=ps)
        rollout = Rollout(
            obs={"policy": jnp.asarray(data["obs"])},
            actions=jnp.asarray(data["actions"]),
            rewards=jnp.asarray(data["rewards"]),
            dones=jnp.asarray(data["dones"]),
            values=jnp.asarray(data["values"]),
            log_probs=jnp.asarray(data["log_probs"]),
            mu=jnp.asarray(data["mu"]),
            sigma=jnp.asarray(data["sigma"]),
        )
        cs = CollectState(
            env_state=(),
            obs={"policy": jnp.asarray(data["last_obs"])},
            carry=(),
            stats=init_episode_stats(N),
        )
        _, _, our_losses = jax.jit(ours.make_update_fn())(ts, cs, rollout)
        our_losses = {k: float(v) for k, v in our_losses.items()}

        # ---- reference
        ref_policy = _ref_actor_critic(ps.params)
        ref = RefPPO(ref_policy, num_learning_epochs=1, num_mini_batches=1,
                     schedule="fixed", desired_kl=None, learning_rate=1e-10)
        obs_td = TensorDictShim({"policy": torch.zeros(N, D)}, batch_size=[N])
        ref.init_storage("rl", N, T, obs_td, [A])
        s = ref.storage
        s.observations["policy"].copy_(torch.from_numpy(data["obs"]))
        s.actions.copy_(torch.from_numpy(data["actions"]))
        s.rewards.copy_(torch.from_numpy(data["rewards"]).unsqueeze(-1))
        s.dones.copy_(torch.from_numpy(data["dones"]).unsqueeze(-1))
        s.values.copy_(torch.from_numpy(data["values"]).unsqueeze(-1))
        s.actions_log_prob.copy_(torch.from_numpy(data["log_probs"]).unsqueeze(-1))
        s.mu.copy_(torch.from_numpy(data["mu"]))
        s.sigma.copy_(torch.from_numpy(data["sigma"]))
        s.step = T
        last_td = TensorDictShim(
            {"policy": torch.from_numpy(data["last_obs"])}, batch_size=[N]
        )
        with torch.inference_mode():
            ref.compute_returns(last_td)
        ref_losses = ref.update()

        for key in ("value_function", "surrogate", "entropy"):
            assert np.isclose(
                our_losses[f"Loss/{key}"], ref_losses[key], rtol=2e-3, atol=1e-4
            ), f"{key}: ours={our_losses[f'Loss/{key}']} ref={ref_losses[key]}"


class TestRecurrentUpdateParity:
    """SURVEY.md 'hard part #1': our masked-scan BPTT replay vs the
    reference's padded-trajectory replay from stored hidden states must yield
    the same update losses. The rollout is generated BY the reference's own
    act/process_env_step cycle; its stored transitions are mirrored into our
    Rollout, weights are copied across frameworks, and one full-batch update
    is compared."""

    @pytest.mark.parametrize("rnn_type", ["gru", "lstm"])
    def test_recurrent_ppo_update_loss_dict_matches(self, rnn_type):
        from rsl_rl.modules import ActorCriticRecurrent as RefACR

        from rsl_rl_tpu.modules import ActorCriticRecurrent

        H = 16
        rng = np.random.default_rng(7)
        obs_seq = rng.normal(size=(T + 1, N, D)).astype(np.float32)
        rewards = rng.normal(size=(T, N)).astype(np.float32)
        dones_np = (rng.random((T, N)) < 0.15)

        # ---- our policy provides the initial weights
        ours_policy = ActorCriticRecurrent(
            {"policy": jnp.zeros((N, D))},
            {"policy": ["policy"], "critic": ["policy"]},
            A,
            rnn_type=rnn_type,
            rnn_hidden_dim=H,
            actor_hidden_dims=[32],
            critic_hidden_dims=[32],
            init_noise_std=1.0,
        )
        ps = ours_policy.init(jax.random.PRNGKey(11))

        # ---- reference policy with copied weights
        obs_td0 = TensorDictShim({"policy": torch.zeros(N, D)}, batch_size=[N])
        ref_policy = RefACR(
            obs_td0,
            {"policy": ["policy"], "critic": ["policy"]},
            A,
            rnn_type=rnn_type,
            rnn_hidden_dim=H,
            actor_hidden_dims=[32],
            critic_hidden_dims=[32],
            init_noise_std=1.0,
        )
        _copy_mlp_params(ps.params["actor"], ref_policy.actor)
        _copy_mlp_params(ps.params["critic"], ref_policy.critic)
        with torch.no_grad():
            ref_policy.std.copy_(torch.from_numpy(np.asarray(ps.params["std"])))
            for mem_name, ref_mem in (("memory_a", ref_policy.memory_a),
                                      ("memory_c", ref_policy.memory_c)):
                cell = ps.params[mem_name]["cell_0"]
                if rnn_type == "gru":
                    # torch GRU gate order r|z|n; flax GRUCell has input-side
                    # biases on all gates, hidden-side bias only on n
                    w_ih = np.concatenate(
                        [np.asarray(cell[k]["kernel"]).T for k in ("ir", "iz", "in")],
                        axis=0,
                    )
                    b_ih = np.concatenate(
                        [np.asarray(cell[k]["bias"]) for k in ("ir", "iz", "in")]
                    )
                    w_hh = np.concatenate(
                        [np.asarray(cell[k]["kernel"]).T for k in ("hr", "hz", "hn")],
                        axis=0,
                    )
                    b_hh = np.concatenate(
                        [np.zeros(H, np.float32), np.zeros(H, np.float32),
                         np.asarray(cell["hn"]["bias"])]
                    )
                else:
                    # torch LSTM gate order i|f|g|o matches flax
                    # OptimizedLSTMCell; flax has NO input-side bias
                    w_ih = np.concatenate(
                        [np.asarray(cell[f"i{k}"]["kernel"]).T for k in "ifgo"],
                        axis=0,
                    )
                    b_ih = np.zeros(4 * H, np.float32)
                    w_hh = np.concatenate(
                        [np.asarray(cell[f"h{k}"]["kernel"]).T for k in "ifgo"],
                        axis=0,
                    )
                    b_hh = np.concatenate(
                        [np.asarray(cell[f"h{k}"]["bias"]) for k in "ifgo"]
                    )
                ref_mem.rnn.weight_ih_l0.copy_(torch.from_numpy(w_ih))
                ref_mem.rnn.bias_ih_l0.copy_(torch.from_numpy(b_ih))
                ref_mem.rnn.weight_hh_l0.copy_(torch.from_numpy(w_hh))
                ref_mem.rnn.bias_hh_l0.copy_(torch.from_numpy(b_hh))

        # ---- reference rollout through its own act/process_env_step cycle
        ref = RefPPO(ref_policy, num_learning_epochs=1, num_mini_batches=1,
                     schedule="fixed", desired_kl=None, learning_rate=1e-10)
        ref.init_storage("rl", N, T, obs_td0, [A])
        obs = TensorDictShim({"policy": torch.from_numpy(obs_seq[0])}, batch_size=[N])
        for t in range(T):
            with torch.no_grad():
                ref.act(obs)
            next_obs = TensorDictShim(
                {"policy": torch.from_numpy(obs_seq[t + 1])}, batch_size=[N]
            )
            ref.process_env_step(
                next_obs,
                torch.from_numpy(rewards[t]),
                torch.from_numpy(dones_np[t].astype(np.uint8)),
                {},
            )
            obs = next_obs
        post_hidden = ref_policy.get_hidden_states()  # after T steps + resets
        with torch.no_grad():
            ref.compute_returns(obs)
        ref_losses = ref.update()

        # ---- mirror the stored rollout into our structures
        s = ref.storage
        if rnn_type == "gru":
            zero_layer = (jnp.zeros((N, H), jnp.float32),)
        else:
            # flax LSTM carry is (c, h) per layer
            zero_layer = (
                (jnp.zeros((N, H), jnp.float32), jnp.zeros((N, H), jnp.float32)),
            )
        carry0 = {"actor": zero_layer, "critic": zero_layer}

        def to_carry(hid):
            """torch hidden -> our per-layer carry tuple (layer 0 only)."""
            if rnn_type == "gru":
                return (jnp.asarray(hid[0].detach().numpy()),)
            h, c = hid  # torch LSTM hidden is (h_n, c_n); flax carry is (c, h)
            return (
                (jnp.asarray(c[0].detach().numpy()), jnp.asarray(h[0].detach().numpy())),
            )
        rollout = Rollout(
            obs={"policy": jnp.asarray(obs_seq[:T])},
            actions=jnp.asarray(s.actions.numpy()),
            rewards=jnp.asarray(s.rewards.squeeze(-1).numpy()),
            dones=jnp.asarray(dones_np),
            values=jnp.asarray(s.values.squeeze(-1).numpy()),
            log_probs=jnp.asarray(s.actions_log_prob.squeeze(-1).numpy()),
            mu=jnp.asarray(s.mu.numpy()),
            sigma=jnp.asarray(s.sigma.numpy()),
            carry0=carry0,
        )
        cs = CollectState(
            env_state=(),
            obs={"policy": jnp.asarray(obs_seq[T])},
            carry={
                "actor": to_carry(post_hidden[0]),
                "critic": to_carry(post_hidden[1]),
            },
            stats=init_episode_stats(N),
        )
        ours = PPO(ours_policy, num_learning_epochs=1, num_mini_batches=1,
                   schedule="fixed", desired_kl=None, learning_rate=1e-10)
        ts = ours.init_train_state(jax.random.PRNGKey(0), N).replace(policy=ps)
        _, _, our_losses = jax.jit(ours.make_update_fn())(ts, cs, rollout)

        for key in ("value_function", "surrogate", "entropy"):
            assert np.isclose(
                float(our_losses[f"Loss/{key}"]), ref_losses[key], rtol=2e-3, atol=1e-4
            ), f"{key}: ours={float(our_losses[f'Loss/{key}'])} ref={ref_losses[key]}"


class TestAdaptiveChainParity:
    """Full 5-epoch x 4-minibatch adaptive-KL update chain: with the reference
    forced to use OUR permutation, the post-update parameters and the final
    adapted learning rate must match across frameworks — proving the
    minibatch loop, adaptive-LR rule, gradient clipping and Adam path are all
    equivalent, not just the loss values."""

    def test_post_update_params_and_lr_match(self):
        data = _rollout_data(5)
        policy, ps = _our_actor_critic()
        lr0 = 1e-3

        ours = PPO(policy, num_learning_epochs=5, num_mini_batches=4,
                   schedule="adaptive", desired_kl=0.01, learning_rate=lr0,
                   max_grad_norm=1.0)
        ts = ours.init_train_state(jax.random.PRNGKey(0), N).replace(policy=ps)
        rollout = Rollout(
            obs={"policy": jnp.asarray(data["obs"])},
            actions=jnp.asarray(data["actions"]),
            rewards=jnp.asarray(data["rewards"]),
            dones=jnp.asarray(data["dones"]),
            values=jnp.asarray(data["values"]),
            log_probs=jnp.asarray(data["log_probs"]),
            mu=jnp.asarray(data["mu"]),
            sigma=jnp.asarray(data["sigma"]),
        )
        cs = CollectState(
            env_state=(), obs={"policy": jnp.asarray(data["last_obs"])},
            carry=(), stats=init_episode_stats(N),
        )
        ts2, _, um = jax.jit(ours.make_update_fn())(ts, cs, rollout)

        # the permutation our update drew (same rng split as make_update_fn)
        _, key_perm = jax.random.split(ts.rng)
        mb = (T * N) // 4
        our_perm = np.asarray(jax.random.permutation(key_perm, 4 * mb))

        ref_policy = _ref_actor_critic(ps.params)
        ref = RefPPO(ref_policy, num_learning_epochs=5, num_mini_batches=4,
                     schedule="adaptive", desired_kl=0.01, learning_rate=lr0,
                     max_grad_norm=1.0)
        obs_td = TensorDictShim({"policy": torch.zeros(N, D)}, batch_size=[N])
        ref.init_storage("rl", N, T, obs_td, [A])
        s = ref.storage
        s.observations["policy"].copy_(torch.from_numpy(data["obs"]))
        s.actions.copy_(torch.from_numpy(data["actions"]))
        s.rewards.copy_(torch.from_numpy(data["rewards"]).unsqueeze(-1))
        s.dones.copy_(torch.from_numpy(data["dones"]).unsqueeze(-1))
        s.values.copy_(torch.from_numpy(data["values"]).unsqueeze(-1))
        s.actions_log_prob.copy_(torch.from_numpy(data["log_probs"]).unsqueeze(-1))
        s.mu.copy_(torch.from_numpy(data["mu"]))
        s.sigma.copy_(torch.from_numpy(data["sigma"]))
        s.step = T
        last = TensorDictShim({"policy": torch.from_numpy(data["last_obs"])}, batch_size=[N])

        orig_randperm = torch.randperm
        torch.randperm = lambda n, **kw: torch.from_numpy(our_perm.copy()).long()
        try:
            with torch.inference_mode():
                ref.compute_returns(last)
            ref.update()
        finally:
            torch.randperm = orig_randperm

        assert np.isclose(float(um["Loss/learning_rate"]), ref.learning_rate, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ts2.policy.params["std"]),
            ref_policy.std.detach().numpy(),
            rtol=1e-4, atol=1e-6,
        )
        our_k = np.asarray(ts2.policy.params["actor"]["dense_2"]["kernel"])
        ref_k = ref_policy.actor[4].weight.detach().numpy().T
        np.testing.assert_allclose(our_k, ref_k, rtol=1e-3, atol=2e-5)


class TestDistillationUpdateParity:
    """Truncated-BPTT distillation update vs the reference: same rollout,
    copied weights, same gradient_length segmentation -> same behavior loss
    and same post-update student parameters (reference distillation.py:105-151)."""

    def test_distillation_update_matches(self):
        from rsl_rl.algorithms import Distillation as RefDistillation
        from rsl_rl.modules import StudentTeacher as RefStudentTeacher

        from rsl_rl_tpu.algorithms.distillation import Distillation
        from rsl_rl_tpu.modules import StudentTeacher

        rng = np.random.default_rng(9)
        obs_seq = rng.normal(size=(T + 1, N, D)).astype(np.float32)
        dones_np = (rng.random((T, N)) < 0.1)

        ours_policy = StudentTeacher(
            {"policy": jnp.zeros((N, D))},
            {"policy": ["policy"], "teacher": ["policy"]},
            A,
            student_hidden_dims=[32],
            teacher_hidden_dims=[32],
        )
        ps = ours_policy.init(jax.random.PRNGKey(21))
        ours_policy.loaded_teacher = True

        obs_td0 = TensorDictShim({"policy": torch.zeros(N, D)}, batch_size=[N])
        ref_policy = RefStudentTeacher(
            obs_td0,
            {"policy": ["policy"], "teacher": ["policy"]},
            A,
            student_hidden_dims=[32],
            teacher_hidden_dims=[32],
        )
        _copy_mlp_params(ps.params["student"], ref_policy.student)
        _copy_mlp_params(ps.aux["teacher"], ref_policy.teacher)
        with torch.no_grad():
            ref_policy.std.copy_(torch.from_numpy(np.asarray(ps.params["std"])))

        G, LR = 7, 1e-3
        ref = RefDistillation(ref_policy, num_learning_epochs=2, gradient_length=G,
                              learning_rate=LR)
        ref.init_storage("distillation", N, T, obs_td0, [A])
        obs = TensorDictShim({"policy": torch.from_numpy(obs_seq[0])}, batch_size=[N])
        for t in range(T):
            with torch.no_grad():
                ref.act(obs)
            next_obs = TensorDictShim(
                {"policy": torch.from_numpy(obs_seq[t + 1])}, batch_size=[N]
            )
            ref.process_env_step(
                next_obs,
                torch.zeros(N),
                torch.from_numpy(dones_np[t].astype(np.uint8)),
                {},
            )
            obs = next_obs
        s = ref.storage
        ref_losses = ref.update()

        ours = Distillation(ours_policy, num_learning_epochs=2, gradient_length=G,
                            learning_rate=LR)
        ts = ours.init_train_state(jax.random.PRNGKey(0), N).replace(policy=ps)
        rollout = Rollout(
            obs={"policy": jnp.asarray(obs_seq[:T])},
            actions=jnp.asarray(s.actions.numpy()),
            rewards=jnp.zeros((T, N)),
            dones=jnp.asarray(dones_np),
            privileged_actions=jnp.asarray(s.privileged_actions.numpy()),
        )
        cs = CollectState(
            env_state=(), obs={"policy": jnp.asarray(obs_seq[T])},
            carry=(), stats=init_episode_stats(N),
        )
        ts_after, _, um = jax.jit(ours.make_update_fn())(ts, cs, rollout)

        assert np.isclose(
            float(um["Loss/behavior"]), ref_losses["behavior"], rtol=1e-4, atol=1e-6
        ), f"behavior: ours={float(um['Loss/behavior'])} ref={ref_losses['behavior']}"
        our_k = np.asarray(ts_after.policy.params["student"]["dense_1"]["kernel"])
        ref_k = ref_policy.student[2].weight.detach().numpy().T
        np.testing.assert_allclose(our_k, ref_k, rtol=1e-3, atol=2e-6)


class TestRecurrentDistillationUpdateParity:
    """Recurrent truncated-BPTT distillation vs the reference: GRU student +
    feedforward teacher, reference-generated rollout, copied weights, same
    gradient_length segmentation (incl. a trailing partial segment) -> same
    behavior loss and post-update student parameters. Closes the loop on the
    segmented-scan replay's hidden detach/rewind semantics
    (reference distillation.py:105-151: reset(hidden_states=last_hidden)
    per epoch, detach at gradient steps, done-masked resets per step).

    Two learning rates separate semantics from arithmetic: at lr~0 the
    replayed losses must match to fp32 exactness (rtol 1e-6 — any reset /
    rewind / segmentation off-by-one would show at the loss's own scale);
    at lr=1e-3, Adam compounds torch-vs-flax GRU evaluation-order ulps
    across 6 optimizer steps, so the tolerance is the recurrent-noise scale
    the recurrent PPO parity test also uses (rtol 2e-3)."""

    @pytest.mark.parametrize(
        "lr, loss_rtol, param_atol",
        [(1e-12, 1e-6, 1e-7), (1e-3, 2e-3, 1e-4)],
        ids=["semantics-exact", "with-optimizer-compounding"],
    )
    def test_recurrent_distillation_update_matches(self, lr, loss_rtol, param_atol):
        from rsl_rl.algorithms import Distillation as RefDistillation
        from rsl_rl.modules import StudentTeacherRecurrent as RefSTR

        from rsl_rl_tpu.algorithms.distillation import Distillation
        from rsl_rl_tpu.modules import StudentTeacherRecurrent

        H = 16
        rng = np.random.default_rng(17)
        obs_seq = rng.normal(size=(T + 1, N, D)).astype(np.float32)
        dones_np = (rng.random((T, N)) < 0.1)

        ours_policy = StudentTeacherRecurrent(
            {"policy": jnp.zeros((N, D))},
            {"policy": ["policy"], "teacher": ["policy"]},
            A,
            rnn_type="gru",
            rnn_hidden_dim=H,
            student_hidden_dims=[32],
            teacher_hidden_dims=[32],
        )
        ps = ours_policy.init(jax.random.PRNGKey(31))
        ours_policy.loaded_teacher = True

        obs_td0 = TensorDictShim({"policy": torch.zeros(N, D)}, batch_size=[N])
        ref_policy = RefSTR(
            obs_td0,
            {"policy": ["policy"], "teacher": ["policy"]},
            A,
            rnn_type="gru",
            rnn_hidden_dim=H,
            student_hidden_dims=[32],
            teacher_hidden_dims=[32],
        )
        _copy_mlp_params(ps.params["student"], ref_policy.student)
        _copy_mlp_params(ps.aux["teacher"], ref_policy.teacher)
        with torch.no_grad():
            ref_policy.std.copy_(torch.from_numpy(np.asarray(ps.params["std"])))
            cell = ps.params["memory_s"]["cell_0"]
            w_ih = np.concatenate(
                [np.asarray(cell[k]["kernel"]).T for k in ("ir", "iz", "in")], axis=0
            )
            b_ih = np.concatenate(
                [np.asarray(cell[k]["bias"]) for k in ("ir", "iz", "in")]
            )
            w_hh = np.concatenate(
                [np.asarray(cell[k]["kernel"]).T for k in ("hr", "hz", "hn")], axis=0
            )
            b_hh = np.concatenate(
                [np.zeros(H, np.float32), np.zeros(H, np.float32),
                 np.asarray(cell["hn"]["bias"])]
            )
            mem = ref_policy.memory_s
            mem.rnn.weight_ih_l0.copy_(torch.from_numpy(w_ih))
            mem.rnn.bias_ih_l0.copy_(torch.from_numpy(b_ih))
            mem.rnn.weight_hh_l0.copy_(torch.from_numpy(w_hh))
            mem.rnn.bias_hh_l0.copy_(torch.from_numpy(b_hh))

        G = 7  # 2 epochs x 24 steps = 6 full segments + 6-step tail
        ref = RefDistillation(ref_policy, num_learning_epochs=2, gradient_length=G,
                              learning_rate=lr)
        ref.init_storage("distillation", N, T, obs_td0, [A])
        obs = TensorDictShim({"policy": torch.from_numpy(obs_seq[0])}, batch_size=[N])
        for t in range(T):
            with torch.no_grad():
                ref.act(obs)
            next_obs = TensorDictShim(
                {"policy": torch.from_numpy(obs_seq[t + 1])}, batch_size=[N]
            )
            ref.process_env_step(
                next_obs,
                torch.zeros(N),
                torch.from_numpy(dones_np[t].astype(np.uint8)),
                {},
            )
            obs = next_obs
        s = ref.storage
        ref_losses = ref.update()

        ours = Distillation(ours_policy, num_learning_epochs=2, gradient_length=G,
                            learning_rate=lr)
        ts = ours.init_train_state(jax.random.PRNGKey(0), N).replace(policy=ps)
        carry0 = ours_policy.initial_carry(N)  # zeros == ref's initial
        # last_hidden_states=None (reference distillation.py:54,112)
        rollout = Rollout(
            obs={"policy": jnp.asarray(obs_seq[:T])},
            actions=jnp.asarray(s.actions.numpy()),
            rewards=jnp.zeros((T, N)),
            dones=jnp.asarray(dones_np),
            privileged_actions=jnp.asarray(s.privileged_actions.numpy()),
            carry0=carry0,
        )
        cs = CollectState(
            env_state=(), obs={"policy": jnp.asarray(obs_seq[T])},
            carry=carry0, stats=init_episode_stats(N),
        )
        ts_after, _, um = jax.jit(ours.make_update_fn())(ts, cs, rollout)

        assert np.isclose(
            float(um["Loss/behavior"]), ref_losses["behavior"], rtol=loss_rtol
        ), f"behavior: ours={float(um['Loss/behavior'])} ref={ref_losses['behavior']}"
        our_k = np.asarray(ts_after.policy.params["student"]["dense_1"]["kernel"])
        ref_k = ref_policy.student[2].weight.detach().numpy().T
        np.testing.assert_allclose(our_k, ref_k, rtol=1e-3, atol=param_atol)
        cell_k = np.asarray(
            ts_after.policy.params["memory_s"]["cell_0"]["hn"]["kernel"]
        )
        ref_cell_k = ref_policy.memory_s.rnn.weight_hh_l0.detach().numpy()[2 * H:].T
        np.testing.assert_allclose(cell_k, ref_cell_k, rtol=1e-3, atol=param_atol)
