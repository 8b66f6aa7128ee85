"""PPO loss-term unit tests on fixed tensors (SURVEY.md §4.1) and the
first-minibatch invariants that pin the replay semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsl_rl_tpu.algorithms.ppo import PPO
from rsl_rl_tpu.env import Pendulum, PointMass
from rsl_rl_tpu.modules import ActorCritic, ActorCriticRecurrent
from rsl_rl_tpu.ops import distributions


def _make_ppo(env, recurrent=False, **ppo_kw):
    _, obs = env.reset(jax.random.PRNGKey(0))
    groups = {"policy": ["policy"], "critic": ["policy"]}
    if recurrent:
        policy = ActorCriticRecurrent(
            obs, groups, env.num_actions, actor_hidden_dims=[16], critic_hidden_dims=[16],
            rnn_type="lstm", rnn_hidden_dim=12,
        )
    else:
        policy = ActorCritic(
            obs, groups, env.num_actions, actor_hidden_dims=[16], critic_hidden_dims=[16]
        )
    ppo = PPO(policy, **ppo_kw)
    ts = ppo.init_train_state(jax.random.PRNGKey(1), env.num_envs)
    cs = ppo.init_collect_state(jax.random.PRNGKey(2), env)
    return ppo, ts, cs


class TestFirstMinibatchInvariants:
    """On the first minibatch of the first epoch the policy is unchanged, so
    the recomputed log-probs must equal the stored ones (ratio == 1) and the
    recomputed values must equal the stored values. This is the strongest
    check that the update-time replay reproduces rollout-time computation —
    including the recurrent hidden-state replay semantics
    (reference rollout_storage.py:206-260)."""

    @pytest.mark.parametrize("recurrent", [False, True])
    def test_replay_reproduces_rollout(self, recurrent):
        env = Pendulum(num_envs=8, max_episode_length=10)  # forces mid-window dones
        ppo, ts, cs = _make_ppo(env, recurrent=recurrent, num_mini_batches=1)
        collect = jax.jit(ppo.make_collect_fn(env, 24))
        ts, cs, rollout, _ = collect(ts, cs)

        ps = ts.policy
        resets = rollout.replay_resets()
        if recurrent:
            mean, std = ppo.policy.act_seq(ps, rollout.obs, rollout.carry0, resets)
            values = ppo.policy.value_seq(ps, rollout.obs, rollout.carry0, resets)
        else:
            mean, std = ppo.policy.act_seq(ps, rollout.obs, None, resets)
            values = ppo.policy.value_seq(ps, rollout.obs, None, resets)
        logp = distributions.log_prob(mean, std, rollout.actions)

        np.testing.assert_allclose(
            np.asarray(logp), np.asarray(rollout.log_probs), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(values), np.asarray(rollout.values), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(mean), np.asarray(rollout.mu), rtol=1e-5, atol=1e-6
        )


class TestLossTerms:
    """Verify the loss expressions on hand-constructed batches by calling
    PPO._loss directly with known inputs."""

    def _setup(self, **ppo_kw):
        env = PointMass(num_envs=4, max_episode_length=8)
        ppo, ts, cs = _make_ppo(env, **ppo_kw)
        return ppo, ts

    def _batch(self, ppo, ts, B=32, adv=None):
        key = jax.random.PRNGKey(3)
        obs = {"policy": jax.random.normal(key, (B, 2))}
        mean, std, _ = ppo.policy.act(ts.policy, obs, ())
        actions = mean + 0.1
        logp = distributions.log_prob(mean, std, actions)
        value = ppo.policy.value(ts.policy, obs, ())[0]
        return {
            "obs": obs,
            "actions": actions,
            "values": value,
            "returns": value + 1.0,
            "advantages": jnp.ones((B,)) if adv is None else adv,
            "log_probs": logp,
            "mu": mean,
            "sigma": std,
            "resets": jnp.zeros((B,), bool),
        }

    def test_ratio_one_surrogate_equals_negative_advantage(self):
        """With unchanged params, ratio == 1 exactly, so the clipped surrogate
        reduces to -mean(advantages) (reference ppo.py:296-302)."""
        ppo, ts = self._setup()
        batch = self._batch(ppo, ts)
        _, aux = ppo._loss(ts.policy.params, None, ts.policy, None, batch, None)
        assert float(aux["surrogate"]) == pytest.approx(-1.0, abs=1e-5)

    def test_clipped_value_loss(self):
        """With values == stored targets, clipping is inactive and the value
        loss is mean((V - R)^2) = 1 for R = V + 1 (reference ppo.py:304-313)."""
        ppo, ts = self._setup()
        batch = self._batch(ppo, ts)
        _, aux = ppo._loss(ts.policy.params, None, ts.policy, None, batch, None)
        assert float(aux["value_function"]) == pytest.approx(1.0, abs=1e-4)

    def test_kl_near_zero_for_unchanged_params(self):
        ppo, ts = self._setup()
        batch = self._batch(ppo, ts)
        _, aux = ppo._loss(ts.policy.params, None, ts.policy, None, batch, None)
        assert abs(float(aux["kl"])) < 1e-3

    def test_entropy_matches_distribution(self):
        ppo, ts = self._setup()
        batch = self._batch(ppo, ts)
        _, aux = ppo._loss(ts.policy.params, None, ts.policy, None, batch, None)
        want = float(jnp.mean(distributions.entropy(batch["sigma"])))
        assert float(aux["entropy"]) == pytest.approx(want, rel=1e-5)

    def test_per_minibatch_advantage_normalization(self):
        """normalize_advantage_per_mini_batch whitens within the batch
        (reference ppo.py:219-222): surrogate == -mean(whitened) == 0."""
        ppo, ts = self._setup(normalize_advantage_per_mini_batch=True)
        adv = jnp.asarray(np.random.default_rng(0).normal(size=(32,)).astype(np.float32))
        batch = self._batch(ppo, ts, adv=adv)
        _, aux = ppo._loss(ts.policy.params, None, ts.policy, None, batch, None)
        assert abs(float(aux["surrogate"])) < 1e-5


class TestAdaptiveLR:
    def test_lr_decreases_on_high_kl_increases_on_low(self):
        """The carried LR follows the reference's x1.5 adaptation with
        [1e-5, 1e-2] bounds (reference ppo.py:276-284)."""
        env = PointMass(num_envs=8, max_episode_length=16)
        # huge LR -> big param steps -> high KL -> LR must fall
        ppo, ts, cs = _make_ppo(env, learning_rate=1e-2, desired_kl=0.0001)
        collect = jax.jit(ppo.make_collect_fn(env, 8))
        update = jax.jit(ppo.make_update_fn())
        ts, cs, rollout, _ = collect(ts, cs)
        ts, cs, _ = update(ts, cs, rollout)
        assert float(ts.lr) < 1e-2

        # impossible-to-exceed desired_kl -> LR must rise (to the cap)
        ppo2, ts2, cs2 = _make_ppo(env, learning_rate=1e-3, desired_kl=10.0)
        collect2 = jax.jit(ppo2.make_collect_fn(env, 8))
        update2 = jax.jit(ppo2.make_update_fn())
        ts2, cs2, rollout2, _ = collect2(ts2, cs2)
        ts2, cs2, _ = update2(ts2, cs2, rollout2)
        assert float(ts2.lr) > 1e-3

    def test_fixed_schedule_keeps_lr(self):
        env = PointMass(num_envs=8, max_episode_length=16)
        ppo, ts, cs = _make_ppo(env, learning_rate=1e-3, schedule="fixed")
        collect = jax.jit(ppo.make_collect_fn(env, 8))
        update = jax.jit(ppo.make_update_fn())
        ts, cs, rollout, _ = collect(ts, cs)
        ts, cs, _ = update(ts, cs, rollout)
        assert float(ts.lr) == pytest.approx(1e-3)


class TestTimeoutBootstrap:
    def test_reward_augmented_on_timeout(self):
        """On a timeout step the stored reward includes gamma * V(s_t)
        (reference ppo.py:160-164). Pendulum only ends by timeout, so the
        rollout reward at a done step must differ from the raw env reward by
        exactly gamma * value."""
        env = Pendulum(num_envs=4, max_episode_length=6)
        ppo, ts, cs = _make_ppo(env)
        collect = jax.jit(ppo.make_collect_fn(env, 12))
        ts, cs, rollout, _ = collect(ts, cs)
        dones = np.asarray(rollout.dones)
        assert dones.any()
        t, n = np.argwhere(dones)[0]
        # raw reward is bounded: |cost| <= pi^2 + 0.1*64 + 0.001*4 ~ 16.3
        stored = float(np.asarray(rollout.rewards)[t, n])
        value = float(np.asarray(rollout.values)[t, n])
        # recompute the raw reward bound check: stored - gamma*value must be
        # a valid pendulum reward (in [-16.3, 0])
        raw = stored - ppo.gamma * value
        assert -16.4 <= raw <= 0.0



class TestExtrasLogging:
    """episode/log extras precedence (reference on_policy_runner.py:114-117:
    exactly ONE of the two dicts is logged per step, episode first)."""

    def test_device_collect_prefers_episode(self):
        import jax.numpy as jnp

        from rsl_rl_tpu.algorithms.ppo import collect_extras_logs

        out = collect_extras_logs(
            {"episode": {"m": jnp.asarray([1.0, 3.0])}, "log": {"m": jnp.asarray(9.0)}}
        )
        assert float(out["m"]) == 2.0  # episode mean, log ignored

        out = collect_extras_logs({"log": {"m": jnp.asarray(9.0)}})
        assert float(out["m"]) == 9.0

        assert collect_extras_logs({"time_outs": jnp.zeros(2)}) == {}

    def test_host_tracker_means_over_occurrences(self):
        """Intermittently-present extras average over the steps they were
        PRESENT (the reference's append-then-average deques), not over all
        steps; episode beats log within a step."""
        import jax

        from rsl_rl_tpu.algorithms.ppo import init_episode_stats
        from rsl_rl_tpu.algorithms.host_collect import HostEpisodeTracker

        tracker = HostEpisodeTracker(init_episode_stats(2))
        zeros = np.zeros(2, np.float32)
        nodone = np.zeros(2, bool)
        # 3 steps; the metric appears on one, with a decoy "log" duplicate
        tracker.step(zeros, zeros, nodone, {})
        tracker.step(
            zeros, zeros, nodone,
            {"episode": {"success": 1.0}, "log": {"success": 0.0}},
        )
        tracker.step(zeros, zeros, nodone, {})
        m = jax.device_get(tracker.metrics())
        assert float(m["extras/success"]) == 1.0
