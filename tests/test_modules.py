"""Tests for policy modules: ActorCritic (+recurrent), StudentTeacher, RND."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsl_rl_tpu.modules import (
    ActorCritic,
    ActorCriticRecurrent,
    RandomNetworkDistillation,
    StudentTeacher,
    StudentTeacherRecurrent,
)


def _obs(n=4, d_policy=6, d_priv=3):
    return {
        "policy": jnp.ones((n, d_policy)),
        "privileged": jnp.ones((n, d_priv)),
    }


OBS_GROUPS = {"policy": ["policy"], "critic": ["policy", "privileged"], "teacher": ["policy", "privileged"]}


class TestActorCritic:
    def test_shapes(self):
        obs = _obs()
        ac = ActorCritic(obs, OBS_GROUPS, num_actions=2, actor_hidden_dims=[16], critic_hidden_dims=[16])
        ps = ac.init(jax.random.PRNGKey(0))
        mean, std, _ = ac.act(ps, obs, ())
        v, _ = ac.value(ps, obs, ())
        assert mean.shape == (4, 2) and std.shape == (4, 2)
        assert v.shape == (4,)

    def test_scalar_std_initial_value(self):
        obs = _obs()
        ac = ActorCritic(obs, OBS_GROUPS, 2, init_noise_std=0.7, actor_hidden_dims=[8], critic_hidden_dims=[8])
        ps = ac.init(jax.random.PRNGKey(0))
        _, std, _ = ac.act(ps, obs, ())
        np.testing.assert_allclose(np.asarray(std), 0.7, rtol=1e-6)

    def test_noise_std_floor_clamps(self):
        """Opt-in sigma floor: with init std below the floor, act() returns the
        floor; default (None) preserves the reference's unclamped behavior."""
        obs = _obs()
        ac = ActorCritic(
            obs, OBS_GROUPS, 2, init_noise_std=1e-4, noise_std_floor=0.05,
            actor_hidden_dims=[8], critic_hidden_dims=[8],
        )
        ps = ac.init(jax.random.PRNGKey(0))
        _, std, _ = ac.act(ps, obs, ())
        np.testing.assert_allclose(np.asarray(std), 0.05, rtol=1e-6)
        # default: no clamp (parity with reference actor_critic.py:89-91,140)
        ac2 = ActorCritic(
            obs, OBS_GROUPS, 2, init_noise_std=1e-4,
            actor_hidden_dims=[8], critic_hidden_dims=[8],
        )
        ps2 = ac2.init(jax.random.PRNGKey(0))
        _, std2, _ = ac2.act(ps2, obs, ())
        np.testing.assert_allclose(np.asarray(std2), 1e-4, rtol=1e-5)

    def test_noise_std_floor_state_dependent(self):
        """In state-dependent scalar mode the raw head output IS the std and
        can drift negative (reference actor_critic.py:123); the floor also
        repairs the sign."""
        obs = _obs()
        ac = ActorCritic(
            obs, OBS_GROUPS, 2, state_dependent_std=True, init_noise_std=1e-4,
            noise_std_floor=0.05, actor_hidden_dims=[8], critic_hidden_dims=[8],
        )
        ps = ac.init(jax.random.PRNGKey(0))
        _, std, _ = ac.act(ps, obs, ())
        assert np.all(np.asarray(std) >= 0.05)

    def test_noise_std_floor_recurrent(self):
        obs = _obs()
        ac = ActorCriticRecurrent(
            obs, OBS_GROUPS, 2, init_noise_std=1e-4, noise_std_floor=0.05,
            actor_hidden_dims=[8], critic_hidden_dims=[8], rnn_hidden_dim=8,
        )
        ps = ac.init(jax.random.PRNGKey(0))
        carry = ac.initial_carry(4)
        _, std, _ = ac.act(ps, obs, carry)
        np.testing.assert_allclose(np.asarray(std), 0.05, rtol=1e-6)

    def test_log_std_mode(self):
        obs = _obs()
        ac = ActorCritic(
            obs, OBS_GROUPS, 2, init_noise_std=0.5, noise_std_type="log",
            actor_hidden_dims=[8], critic_hidden_dims=[8],
        )
        ps = ac.init(jax.random.PRNGKey(0))
        _, std, _ = ac.act(ps, obs, ())
        np.testing.assert_allclose(np.asarray(std), 0.5, rtol=1e-5)

    def test_state_dependent_std_init(self):
        """At init, the std head has zero weights, so std == init_noise_std
        for every input (reference actor_critic.py:79-88)."""
        obs = _obs()
        ac = ActorCritic(
            obs, OBS_GROUPS, 3, init_noise_std=1.3, state_dependent_std=True,
            actor_hidden_dims=[16], critic_hidden_dims=[8],
        )
        ps = ac.init(jax.random.PRNGKey(0))
        rand_obs = {k: jax.random.normal(jax.random.PRNGKey(1), v.shape) for k, v in obs.items()}
        mean, std, _ = ac.act(ps, rand_obs, ())
        assert mean.shape == (4, 3)
        np.testing.assert_allclose(np.asarray(std), 1.3, rtol=1e-5)

    def test_state_dependent_std_log_mode(self):
        obs = _obs()
        ac = ActorCritic(
            obs, OBS_GROUPS, 2, init_noise_std=0.4, state_dependent_std=True,
            noise_std_type="log", actor_hidden_dims=[8], critic_hidden_dims=[8],
        )
        ps = ac.init(jax.random.PRNGKey(0))
        _, std, _ = ac.act(ps, obs, ())
        np.testing.assert_allclose(np.asarray(std), 0.4, rtol=1e-4)

    def test_invalid_noise_type_raises(self):
        with pytest.raises(ValueError):
            ActorCritic(_obs(), OBS_GROUPS, 2, noise_std_type="bogus")

    def test_obs_group_concat_order(self):
        """Critic input is the concat of its groups in config order."""
        obs = {"policy": jnp.ones((2, 3)), "privileged": 2.0 * jnp.ones((2, 2))}
        groups = {"policy": ["policy"], "critic": ["policy", "privileged"]}
        ac = ActorCritic(obs, groups, 1, actor_hidden_dims=[4], critic_hidden_dims=[4])
        assert ac.num_critic_obs == 5
        assert ac.num_actor_obs == 3

    def test_normalization_update_changes_output(self):
        obs = _obs()
        ac = ActorCritic(
            obs, OBS_GROUPS, 2, actor_obs_normalization=True,
            actor_hidden_dims=[8], critic_hidden_dims=[8],
        )
        ps = ac.init(jax.random.PRNGKey(0))
        mean0, _, _ = ac.act(ps, obs, ())
        big_obs = {k: 10.0 + v for k, v in obs.items()}
        for _ in range(5):
            ps = ac.update_normalization(ps, big_obs)
        mean1, _, _ = ac.act(ps, obs, ())
        assert not np.allclose(np.asarray(mean0), np.asarray(mean1))


class TestActorCriticRecurrent:
    def test_rollout_and_replay_consistency(self):
        """Sequence replay from the window-start carry must reproduce the
        stepwise rollout distribution exactly (the semantics the reference
        achieves via stored hiddens + split_and_pad, rollout_storage.py:206-260)."""
        obs_probe = _obs()
        ac = ActorCriticRecurrent(
            obs_probe, OBS_GROUPS, 2, rnn_type="lstm", rnn_hidden_dim=16,
            actor_hidden_dims=[8], critic_hidden_dims=[8],
        )
        ps = ac.init(jax.random.PRNGKey(0))
        N, T = 4, 6
        carry = ac.initial_carry(N)
        key = jax.random.PRNGKey(1)
        dones = np.zeros((T, N), bool)
        dones[2, 1] = True
        dones[4, 3] = True

        obs_seq = {
            "policy": jax.random.normal(key, (T, N, 6)),
            "privileged": jax.random.normal(key, (T, N, 3)),
        }
        carry0 = carry
        means, stds, values = [], [], []
        for t in range(T):
            obs_t = {k: v[t] for k, v in obs_seq.items()}
            mean, std, carry = ac.act(ps, obs_t, carry)
            v, carry = ac.value(ps, obs_t, carry)
            carry = ac.reset_carry(carry, jnp.asarray(dones[t]))
            means.append(mean)
            values.append(v)
        means = np.stack([np.asarray(m) for m in means])
        values = np.stack([np.asarray(v) for v in values])

        resets = np.zeros((T, N), bool)
        resets[1:] = dones[:-1]
        mean_seq, _ = ac.act_seq(ps, obs_seq, carry0, jnp.asarray(resets))
        value_seq = ac.value_seq(ps, obs_seq, carry0, jnp.asarray(resets))
        np.testing.assert_allclose(np.asarray(mean_seq), means, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(value_seq), values, rtol=1e-5, atol=1e-5)

    def test_rnn_hidden_size_deprecation_shim(self):
        with pytest.warns(DeprecationWarning):
            ac = ActorCriticRecurrent(
                _obs(), OBS_GROUPS, 2, rnn_hidden_size=32,
                actor_hidden_dims=[8], critic_hidden_dims=[8],
            )
        assert ac.rnn_hidden_dim == 32


class TestStudentTeacher:
    def test_teacher_bootstrap_from_rl_checkpoint(self):
        """Loading an ActorCritic checkpoint maps actor->teacher and returns
        resume=False (reference student_teacher.py:182-197). The RL actor's
        obs set must match the distillation teacher's obs set."""
        obs = _obs()
        ac_groups = {"policy": ["policy", "privileged"], "critic": ["policy", "privileged"]}
        ac = ActorCritic(
            obs, ac_groups, 2, actor_hidden_dims=[16, 16], critic_hidden_dims=[8],
            actor_obs_normalization=True,
        )
        ac_state = ac.init(jax.random.PRNGKey(0))

        st = StudentTeacher(
            obs, OBS_GROUPS, 2, student_hidden_dims=[8],
            teacher_hidden_dims=[16, 16], teacher_obs_normalization=True,
        )
        st_state = st.init(jax.random.PRNGKey(1))
        new_state, resumed = st.load_state_dict(st_state, ac_state)
        assert resumed is False
        assert st.loaded_teacher
        # teacher params now equal the RL actor params
        chex_equal = jax.tree.map(
            lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
            new_state.aux["teacher"], ac_state.params["actor"],
        )
        assert all(jax.tree.leaves(chex_equal))
        # teacher sees the 'teacher' obs set, so its action comes from the
        # loaded actor weights
        action, _ = st.evaluate(new_state, obs, ())
        assert action.shape == (4, 2)

    def test_resume_from_distillation_checkpoint(self):
        obs = _obs()
        st = StudentTeacher(obs, OBS_GROUPS, 2, student_hidden_dims=[8], teacher_hidden_dims=[8])
        s1 = st.init(jax.random.PRNGKey(0))
        s2 = st.init(jax.random.PRNGKey(5))
        restored, resumed = st.load_state_dict(s1, s2)
        assert resumed is True

    def test_mismatched_checkpoint_raises(self):
        obs = _obs()
        st = StudentTeacher(obs, OBS_GROUPS, 2, student_hidden_dims=[8], teacher_hidden_dims=[8])
        s = st.init(jax.random.PRNGKey(0))
        with pytest.raises(ValueError):
            st.load_state_dict(s, {"params": {"bogus": {}}})


class TestStudentTeacherRecurrent:
    def test_recurrent_teacher_memory_from_rl_checkpoint(self):
        obs = _obs()
        ac_groups = {"policy": ["policy", "privileged"], "critic": ["policy", "privileged"]}
        acr = ActorCriticRecurrent(
            obs, ac_groups, 2, rnn_hidden_dim=16, actor_hidden_dims=[8], critic_hidden_dims=[8],
        )
        ac_state = acr.init(jax.random.PRNGKey(0))
        st = StudentTeacherRecurrent(
            obs, OBS_GROUPS, 2, rnn_hidden_dim=16, teacher_recurrent=True,
            student_hidden_dims=[8], teacher_hidden_dims=[8],
        )
        st_state = st.init(jax.random.PRNGKey(1))
        new_state, resumed = st.load_state_dict(st_state, ac_state)
        assert resumed is False
        eq = jax.tree.map(
            lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
            new_state.aux["memory_t"], ac_state.params["memory_a"],
        )
        assert all(jax.tree.leaves(eq))

    def test_act_evaluate_shapes(self):
        obs = _obs()
        st = StudentTeacherRecurrent(
            obs, OBS_GROUPS, 2, rnn_hidden_dim=8, student_hidden_dims=[8], teacher_hidden_dims=[8],
        )
        ps = st.init(jax.random.PRNGKey(0))
        carry = st.initial_carry(4)
        mean, std, carry = st.act(ps, obs, carry)
        teacher_action, carry = st.evaluate(ps, obs, carry)
        assert mean.shape == (4, 2) and teacher_action.shape == (4, 2)


class TestRND:
    def _make(self, **kw):
        obs_groups = {"policy": ["policy"], "rnd_state": ["policy", "privileged"]}
        rnd = RandomNetworkDistillation(
            num_states=9, obs_groups=obs_groups, num_outputs=4,
            predictor_hidden_dims=[-1], target_hidden_dims=[-1], **kw,
        )
        return rnd, rnd.init(jax.random.PRNGKey(0), num_envs=4)

    def test_intrinsic_reward_positive_and_counter(self):
        rnd, state = self._make(weight=1.0)
        obs = _obs()
        state, reward, weight = rnd.get_intrinsic_reward(state, obs)
        assert reward.shape == (4,)
        assert float(weight) == 1.0
        assert int(state.counter) == 1
        assert np.all(np.asarray(reward) >= 0)

    def test_weight_zero_kills_reward(self):
        rnd, state = self._make(weight=0.0)
        state, reward, _ = rnd.get_intrinsic_reward(state, _obs())
        np.testing.assert_allclose(np.asarray(reward), 0.0)

    def test_step_schedule(self):
        rnd, state = self._make(
            weight=1.0,
            weight_schedule={"mode": "step", "final_step": 3, "final_value": 0.1},
        )
        weights = []
        for _ in range(5):
            state, _, w = rnd.get_intrinsic_reward(state, _obs())
            weights.append(float(w))
        # the counter is 1-indexed (incremented before the schedule is read,
        # reference rnd.py:115,168-172), so the final value kicks in at call 3
        np.testing.assert_allclose(weights, [1.0, 1.0, 0.1, 0.1, 0.1])

    def test_linear_schedule(self):
        rnd, state = self._make(
            weight=1.0,
            weight_schedule={
                "mode": "linear", "initial_step": 1, "final_step": 5, "final_value": 0.0,
            },
        )
        weights = []
        for _ in range(6):
            state, _, w = rnd.get_intrinsic_reward(state, _obs())
            weights.append(float(w))
        np.testing.assert_allclose(weights, [1.0, 0.75, 0.5, 0.25, 0.0, 0.0], atol=1e-6)

    def test_predictor_loss_decreases_distance(self):
        import optax

        rnd, state = self._make(weight=1.0)
        obs = _obs()
        tx = optax.adam(1e-2)
        opt = tx.init(state.predictor)
        loss0 = float(rnd.predictor_loss(state.predictor, state, obs))
        pred = state.predictor
        for _ in range(50):
            g = jax.grad(rnd.predictor_loss)(pred, state, obs)
            updates, opt = tx.update(g, opt, pred)
            pred = optax.apply_updates(pred, updates)
        loss1 = float(rnd.predictor_loss(pred, state, obs))
        assert loss1 < loss0 * 0.5
