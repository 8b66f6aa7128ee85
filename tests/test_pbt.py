"""Population-based training tests (runners/pbt.py).

PBT composes the multiseed vmap transform with an in-program
exploit/explore exchange; these tests pin the exchange semantics: clones
are exact pytree copies of a top member, the copied learning rate is
log-uniform perturbed within the configured band, and a fraction of zero
disables the exchange entirely.
"""

import jax
import numpy as np
import pytest

from rsl_rl_tpu.runners.pbt import make_pbt_train


def _make(variant="feedforward", num_envs=8, hidden=16, episode_len=8):
    """(env, alg) with short episodes so fitness becomes valid fast."""
    import __graft_entry__ as graft

    from rsl_rl_tpu.env import Pendulum

    _, alg = graft.make_variant(variant, num_envs=num_envs, hidden=hidden)
    env = Pendulum(num_envs=num_envs, max_episode_length=episode_len)
    return env, alg


class TestPBT:
    def test_zero_fraction_disables_exchange(self):
        env, alg = _make()
        init, train_step = make_pbt_train(
            alg, env, num_steps_per_env=8, num_seeds=3,
            exploit_interval=1, exploit_fraction=0.0,
        )
        ts, cs, pbt = init(jax.random.PRNGKey(0))
        for _ in range(3):
            ts, cs, pbt, metrics = train_step(ts, cs, pbt)
        assert int(metrics["PBT/exploits"]) == 0
        assert np.asarray(metrics["PBT/fitness"]).shape == (3,)
        assert np.all(np.isfinite(np.asarray(metrics["Loss/value_function"])))
        # 8-step rollouts against 8-step episodes: every seed finished
        # episodes, so fitness carries real reward readings
        assert np.all(np.isfinite(np.asarray(metrics["PBT/fitness"])))

    def test_exploit_clones_a_top_member_and_perturbs_lr(self):
        env, alg = _make()
        num_seeds = 4
        init, train_step = make_pbt_train(
            alg, env, num_steps_per_env=8, num_seeds=num_seeds,
            exploit_interval=1, exploit_fraction=0.25,
            lr_perturb=(0.8, 1.25),
        )
        ts, cs, pbt = init(jax.random.PRNGKey(1))
        # iteration 1: episodes complete (episode_len == rollout len), every
        # seed's fitness turns valid, it=1 % 1 == 0 -> the exchange fires
        ts, cs, pbt, metrics = train_step(ts, cs, pbt)
        assert int(metrics["PBT/exploits"]) == 1

        params = jax.device_get(ts.policy.params)
        lrs = np.asarray(jax.device_get(ts.lr))

        def seed_slice(i):
            return jax.tree.map(lambda x: np.asarray(x)[i], params)

        clones = [
            (i, j)
            for i in range(num_seeds)
            for j in range(num_seeds)
            if i < j
            and all(
                np.array_equal(a, b)
                for a, b in zip(
                    jax.tree.leaves(seed_slice(i)), jax.tree.leaves(seed_slice(j))
                )
            )
        ]
        assert len(clones) == 1, f"expected exactly one cloned pair, got {clones}"
        i, j = clones[0]
        ratio = lrs[i] / lrs[j]
        assert ratio != 1.0, "cloned learning rate was not perturbed"
        assert 0.8 <= min(ratio, 1.0 / ratio) and max(ratio, 1.0 / ratio) <= 1.25

    def test_exchange_waits_for_valid_fitness(self):
        # 32-step episodes vs 8-step rollouts: no seed finishes an episode
        # in the first iteration, so the (due) exchange must hold off
        env, alg = _make(episode_len=32)
        init, train_step = make_pbt_train(
            alg, env, num_steps_per_env=8, num_seeds=4,
            exploit_interval=1, exploit_fraction=0.25,
        )
        ts, cs, pbt = init(jax.random.PRNGKey(2))
        ts, cs, pbt, metrics = train_step(ts, cs, pbt)
        assert int(metrics["PBT/exploits"]) == 0

    @pytest.mark.parametrize("variant", ["recurrent", "rnd"])
    def test_composes_with_variants(self, variant):
        """The exchange gathers whatever pytrees the variant carries —
        recurrent carries stay per-seed, RND state travels with the clone."""
        env, alg = _make(variant)
        init, train_step = make_pbt_train(
            alg, env, num_steps_per_env=8, num_seeds=2,
            exploit_interval=1, exploit_fraction=0.5,
        )
        ts, cs, pbt = init(jax.random.PRNGKey(3))
        for _ in range(2):
            ts, cs, pbt, metrics = train_step(ts, cs, pbt)
        assert int(metrics["PBT/exploits"]) >= 1
        assert np.all(np.isfinite(np.asarray(metrics["Loss/value_function"])))
