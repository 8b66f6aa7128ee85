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

    def test_overlapping_pools_rejected(self):
        """exploit_fraction > 0.5 would let replaced losers serve as clone
        sources; construction must refuse."""
        env, alg = _make()
        with pytest.raises(ValueError, match="exploit_fraction"):
            make_pbt_train(
                alg, env, num_steps_per_env=8, num_seeds=4, exploit_fraction=0.75
            )

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


class TestPBTRunner:
    """MultiSeedRunner(pbt=...): the productized study — logging, stacked
    checkpoints carrying the PBT bookkeeping, mode-mismatch guards."""

    CFG = {
        "num_steps_per_env": 8,
        "save_interval": 2,
        "seed": 3,
        "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
        "logger": "tensorboard",
        "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [16],
                   "critic_hidden_dims": [16]},
        "algorithm": {"class_name": "PPO", "schedule": "adaptive",
                      "desired_kl": 0.01, "num_learning_epochs": 2,
                      "num_mini_batches": 2},
    }
    PBT = {"exploit_interval": 1, "exploit_fraction": 0.25}

    def _runner(self, log_dir=None, pbt=True):
        import copy

        from rsl_rl_tpu.env import Pendulum
        from rsl_rl_tpu.runners import MultiSeedRunner

        env = Pendulum(num_envs=8, max_episode_length=8)
        return MultiSeedRunner(
            env, copy.deepcopy(self.CFG), num_seeds=4, log_dir=log_dir,
            pbt=dict(self.PBT) if pbt else None,
        )

    def test_learn_logs_pbt_scalars(self, tmp_path):
        import os

        runner = self._runner(str(tmp_path))
        runner.learn(3)
        assert int(runner.pbt_state.exploits) >= 1
        files = os.listdir(str(tmp_path))
        assert any(f.startswith("events.out.tfevents") for f in files)
        assert any(f.startswith("model_") for f in files)

    def test_resume_restores_pbt_state(self, tmp_path):
        import os

        runner = self._runner(str(tmp_path))
        runner.learn(3)
        path = os.path.join(str(tmp_path), "snap.ckpt")
        runner.save(path)

        runner2 = self._runner()
        runner2.load(path)
        np.testing.assert_array_equal(
            np.asarray(runner.pbt_state.fitness), np.asarray(runner2.pbt_state.fitness)
        )
        assert int(runner2.pbt_state.exploits) == int(runner.pbt_state.exploits)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            jax.device_get(runner.train_state.policy.params),
            jax.device_get(runner2.train_state.policy.params),
        )
        runner2.learn(1)  # and it keeps training

    def test_mode_mismatch_rejected(self, tmp_path):
        import os

        runner = self._runner(str(tmp_path))
        runner.learn(1)
        path = os.path.join(str(tmp_path), "snap.ckpt")
        runner.save(path)
        plain = self._runner(pbt=False)
        with pytest.raises(ValueError, match="PBT"):
            plain.load(path)
