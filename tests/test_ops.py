"""Unit tests for the pure math ops: distributions, GAE, running norms.

GAE and normalizer tests check against independent NumPy re-derivations of the
reference semantics (SURVEY.md §4.1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsl_rl_tpu.ops import (
    compute_gae,
    distributions,
    init_discounted_variation_norm,
    init_running_norm,
    normalize,
    normalize_reward,
    update_running_norm,
)


class TestDistributions:
    def test_log_prob_matches_scipy(self):
        rng = np.random.default_rng(0)
        mean = rng.normal(size=(5, 3)).astype(np.float32)
        std = rng.uniform(0.5, 2.0, size=(5, 3)).astype(np.float32)
        x = rng.normal(size=(5, 3)).astype(np.float32)
        got = distributions.log_prob(jnp.asarray(mean), jnp.asarray(std), jnp.asarray(x))
        # manual per-dim normal logpdf
        want = (
            -0.5 * ((x - mean) / std) ** 2 - np.log(std) - 0.5 * np.log(2 * np.pi)
        ).sum(-1)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_entropy(self):
        std = jnp.asarray([[1.0, 2.0]])
        got = distributions.entropy(std)
        want = (0.5 + 0.5 * np.log(2 * np.pi) + np.log(np.array([1.0, 2.0]))).sum()
        np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-6)

    def test_kl_zero_for_identical(self):
        mean = jnp.ones((4, 3))
        std = jnp.full((4, 3), 0.5)
        kl = distributions.kl_divergence(mean, std, mean, std)
        # the reference's +1e-5 inside the log makes this slightly nonzero
        assert np.all(np.abs(np.asarray(kl)) < 1e-4)

    def test_sample_statistics(self):
        key = jax.random.PRNGKey(0)
        mean = jnp.full((200_000, 1), 1.5)
        std = jnp.full((200_000, 1), 0.3)
        s = distributions.sample(key, mean, std)
        assert abs(float(s.mean()) - 1.5) < 5e-3
        assert abs(float(s.std()) - 0.3) < 5e-3


def _reference_gae(rewards, values, dones, last_values, gamma, lam):
    """Reverse Python loop mirroring rollout_storage.py:127-149 semantics."""
    T, N = rewards.shape
    returns = np.zeros_like(rewards)
    adv = np.zeros(N, dtype=rewards.dtype)
    for t in reversed(range(T)):
        next_values = last_values if t == T - 1 else values[t + 1]
        not_terminal = 1.0 - dones[t]
        delta = rewards[t] + not_terminal * gamma * next_values - values[t]
        adv = delta + not_terminal * gamma * lam * adv
        returns[t] = adv + values[t]
    advantages = returns - values
    return returns, advantages


class TestGAE:
    def test_matches_reference_loop(self):
        rng = np.random.default_rng(1)
        T, N = 24, 7
        rewards = rng.normal(size=(T, N)).astype(np.float32)
        values = rng.normal(size=(T, N)).astype(np.float32)
        dones = (rng.uniform(size=(T, N)) < 0.1).astype(np.float32)
        last_values = rng.normal(size=(N,)).astype(np.float32)

        ret, adv = compute_gae(
            jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
            jnp.asarray(last_values), 0.99, 0.95, normalize_advantage=False,
        )
        want_ret, want_adv = _reference_gae(rewards, values, dones, last_values, 0.99, 0.95)
        np.testing.assert_allclose(np.asarray(ret), want_ret, rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(adv), want_adv, rtol=2e-5, atol=1e-5)

    def test_normalized_advantage_whitening(self):
        rng = np.random.default_rng(2)
        rewards = rng.normal(size=(10, 4)).astype(np.float32)
        values = rng.normal(size=(10, 4)).astype(np.float32)
        dones = np.zeros((10, 4), np.float32)
        last_values = np.zeros(4, np.float32)
        _, adv = compute_gae(
            jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
            jnp.asarray(last_values), 0.99, 0.95, normalize_advantage=True,
        )
        adv = np.asarray(adv)
        assert abs(adv.mean()) < 1e-5
        # unbiased std normalization (ddof=1), matching torch Tensor.std()
        assert abs(adv.std(ddof=1) - 1.0) < 1e-3

    def test_terminal_cuts_bootstrap(self):
        # a done at step t must zero the value bootstrap from t+1
        rewards = jnp.ones((2, 1))
        values = jnp.zeros((2, 1))
        dones = jnp.asarray([[1.0], [0.0]])
        last_values = jnp.asarray([100.0])
        ret, _ = compute_gae(rewards, values, dones, last_values, 0.99, 0.95, False)
        assert float(ret[0, 0]) == pytest.approx(1.0)  # no bootstrap through done
        assert float(ret[1, 0]) == pytest.approx(1.0 + 0.99 * 100.0)


class TestRunningNorm:
    def test_single_batch_moments(self):
        rng = np.random.default_rng(3)
        x = rng.normal(2.0, 3.0, size=(1000, 4)).astype(np.float32)
        state = init_running_norm(4)
        state = update_running_norm(state, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(state.mean), x.mean(0), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(state.var), x.var(0) + (1000 / 1000) * 0, rtol=0.05
        )

    def test_incremental_matches_reference_formula(self):
        """Two sequential batches must match the reference's update rule
        (normalization.py:49-66), which is NOT the same as pooled moments."""
        rng = np.random.default_rng(4)
        a = rng.normal(size=(50, 3)).astype(np.float32)
        b = rng.normal(1.0, 2.0, size=(70, 3)).astype(np.float32)

        state = init_running_norm(3)
        state = update_running_norm(state, jnp.asarray(a))
        state = update_running_norm(state, jnp.asarray(b))

        # replicate reference recurrence in numpy
        mean = np.zeros(3, np.float32)
        var = np.ones(3, np.float32)
        count = 0
        for batch in (a, b):
            count += batch.shape[0]
            rate = batch.shape[0] / count
            mean_x = batch.mean(0)
            var_x = batch.var(0)
            delta = mean_x - mean
            new_mean = mean + rate * delta
            var = var + rate * (var_x - var + delta * (mean_x - new_mean))
            mean = new_mean
        np.testing.assert_allclose(np.asarray(state.mean), mean, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(state.var), var, rtol=1e-5, atol=1e-6)

    def test_until_freeze(self):
        state = init_running_norm(2, until=100)
        x1 = jnp.ones((100, 2))
        state = update_running_norm(state, x1)
        frozen_mean = np.asarray(state.mean)
        # count == until -> frozen (reference checks count >= until pre-update)
        state = update_running_norm(state, 100.0 * jnp.ones((50, 2)))
        np.testing.assert_allclose(np.asarray(state.mean), frozen_mean)
        assert float(state.count) == 100

    def test_until_zero_freezes_immediately(self):
        """until=0 is a FROZEN normalizer (reference: count 0 >= until 0
        returns before the first update, normalization.py:55) — distinct
        from until=None (never freeze)."""
        state = init_running_norm(2, until=0)
        state = update_running_norm(state, 5.0 * jnp.ones((10, 2)))
        np.testing.assert_allclose(np.asarray(state.mean), 0.0)
        assert float(state.count) == 0

        never = init_running_norm(2, until=None)
        never = update_running_norm(never, 5.0 * jnp.ones((10, 2)))
        np.testing.assert_allclose(np.asarray(never.mean), 5.0)

    def test_normalize_roundtrip(self):
        state = init_running_norm(3)
        x = jnp.asarray(np.random.default_rng(5).normal(size=(64, 3)).astype(np.float32))
        state = update_running_norm(state, x)
        from rsl_rl_tpu.ops import denormalize

        y = normalize(state, x)
        np.testing.assert_allclose(np.asarray(denormalize(state, y)), np.asarray(x), atol=1e-5)

    def test_multi_leading_dims(self):
        state = init_running_norm(2)
        x = jnp.ones((4, 8, 2))
        state = update_running_norm(state, x)
        assert float(state.count) == 32


class TestDiscountedVariationNorm:
    def test_scaling_by_discounted_return_std(self):
        rng = np.random.default_rng(6)
        state = init_discounted_variation_norm(num_envs=16, gamma=0.9)
        rew = None
        avg = np.zeros(16, np.float32)
        # run some steps and track what the discounted accumulator should be
        for _ in range(30):
            rew = rng.normal(size=(16,)).astype(np.float32)
            avg = avg * 0.9 + rew
            state, out = normalize_reward(state, jnp.asarray(rew))
        np.testing.assert_allclose(np.asarray(state.avg), avg, rtol=1e-4, atol=1e-5)
        # output = rew / std of discounted return estimate
        std = float(state.emp.std)
        assert std > 0
        np.testing.assert_allclose(np.asarray(out), rew / std, rtol=1e-5)

    def test_zero_std_passthrough(self):
        state = init_discounted_variation_norm(num_envs=2)
        # before any update the std is sqrt(1.0)=1 -> just passes scaled; force
        # a zero-variance state instead:
        state = state.replace(emp=state.emp.replace(var=jnp.zeros(())))
        _, out = normalize_reward(state, jnp.asarray([3.0, -1.0]), update=False)
        np.testing.assert_allclose(np.asarray(out), [3.0, -1.0])
