"""Vectorized multi-seed training tests (runners/multiseed.py).

vmap over the seed axis must be pure batching: each seed's trajectory
matches what the same seed produces in a standalone single-seed run, and
distinct seeds produce distinct trajectories.
"""

import jax
import numpy as np
import pytest

from rsl_rl_tpu.runners.multiseed import make_multiseed_train


def _losses(um, i=None):
    total = 0.0
    for k, v in um.items():
        if k.startswith("Loss/") and k != "Loss/learning_rate":
            total += float(v if i is None else v[i])
    return total


class TestMultiseed:
    @pytest.mark.parametrize("variant", [
        "feedforward", "recurrent",
        # rnd vmaps the RND pytree (per-env reward_norm, counter);
        # distillation vmaps the chunked segmented-BPTT update
        "rnd", "distillation",
    ])
    def test_vmapped_seeds_match_standalone_runs(self, variant):
        import __graft_entry__ as graft

        env, alg = graft.make_variant(variant, num_envs=8, hidden=16)
        init, train_step = make_multiseed_train(alg, env, num_steps_per_env=8, num_seeds=2)
        key = jax.random.PRNGKey(7)
        ts, cs = init(key)
        batched = []
        for _ in range(2):
            ts, cs, metrics = train_step(ts, cs)
            batched.append(metrics)

        # replay each seed standalone with the same key derivation
        keys = jax.random.split(key, 2)
        collect = jax.jit(alg.make_collect_fn(env, 8))
        update = jax.jit(alg.make_update_fn())
        for i in range(2):
            ts_i = alg.init_train_state(keys[i], env.num_envs)
            cs_i = alg.init_collect_state(jax.random.fold_in(keys[i], 1), env)
            for it in range(2):
                ts_i, cs_i, rollout, cm = collect(ts_i, cs_i)
                ts_i, cs_i, um = update(ts_i, cs_i, rollout)
                np.testing.assert_allclose(
                    _losses(batched[it], i), _losses(um), rtol=1e-4,
                    err_msg=f"seed {i} iteration {it} diverged from standalone run",
                )

    def test_seeds_are_independent(self):
        import __graft_entry__ as graft

        env, alg = graft.make_variant("feedforward", num_envs=8, hidden=16)
        init, train_step = make_multiseed_train(alg, env, num_steps_per_env=8, num_seeds=3)
        ts, cs = init(jax.random.PRNGKey(0))
        ts, cs, metrics = train_step(ts, cs)
        vf = np.asarray(metrics["Loss/value_function"])
        assert vf.shape == (3,)
        assert len({float(x) for x in vf}) == 3, "seeds produced identical losses"

    def test_seed_axis_shards_over_mesh(self):
        """Seeds place across the data mesh axis like any other batch dim."""
        import __graft_entry__ as graft
        from rsl_rl_tpu.parallel.mesh import data_sharding, make_mesh, shard_tree

        env, alg = graft.make_variant("feedforward", num_envs=8, hidden=16)
        init, train_step = make_multiseed_train(alg, env, num_steps_per_env=8, num_seeds=2)
        ts, cs = init(jax.random.PRNGKey(3))
        mesh = make_mesh(jax.devices()[:2])
        ts = shard_tree(ts, data_sharding(mesh))  # leading axis == seeds
        cs = shard_tree(cs, data_sharding(mesh))
        ts, cs, metrics = train_step(ts, cs)
        assert np.all(np.isfinite(np.asarray(metrics["Loss/value_function"])))
