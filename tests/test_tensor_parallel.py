"""Tensor-parallel (model-sharded) training tests.

The declarative Megatron-style MLP sharding (rsl_rl_tpu/parallel/tp.py) must
be a pure placement change: the same seed gives numerically identical
training whether the policy is replicated or model-sharded. The reference
has no tensor-parallel mode (it is DDP-only, reference ppo.py:428-469);
these tests guard the beyond-reference capability.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from rsl_rl_tpu.parallel.tp import make_tp_mesh, shard_tree_tp, tp_tree_shardings


class TestSpecAssignment:
    def _mesh(self):
        return make_tp_mesh(2, jax.devices()[:2])

    def test_mlp_params_alternate_column_row(self):
        import jax.numpy as jnp

        from rsl_rl_tpu.networks.mlp import MLP

        mesh = self._mesh()
        mlp = MLP(output_dim=3, hidden_dims=[16, 16])
        params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))["params"]
        specs = jax.tree.map(lambda s: s.spec, tp_tree_shardings(params, mesh))
        # dense_0 column-parallel, dense_1 row-parallel
        assert specs["dense_0"]["kernel"] == P(None, "model")
        assert specs["dense_0"]["bias"] == P("model")
        assert specs["dense_1"]["kernel"] == P("model", None)
        assert specs["dense_1"]["bias"] == P()
        # final layer: out=3 not divisible by 2 and layer index even -> replicated
        assert specs["dense_2"]["kernel"] == P()
        assert specs["dense_2"]["bias"] == P()

    def test_non_mlp_leaves_replicated(self):
        import __graft_entry__ as graft

        mesh = self._mesh()
        env, alg = graft.make_variant("feedforward", num_envs=8, hidden=16)
        ts = alg.init_train_state(jax.random.PRNGKey(1), 8)
        shardings = tp_tree_shardings(ts, mesh)
        specs = jax.tree.map(lambda s: s.spec, shardings)
        assert specs.policy.params["std"] == P()
        # optimizer moments mirror the param sharding (same dense_k paths)
        flat = jax.tree_util.tree_flatten_with_path(specs)[0]
        moment_specs = {
            tuple(str(k) for k in path): spec
            for path, spec in flat
            if any("dense_0" in str(k) for k in path)
        }
        assert any(s == P(None, "model") for s in moment_specs.values())

    def test_bad_model_size_raises(self):
        with pytest.raises(ValueError, match="must divide"):
            make_tp_mesh(3, jax.devices()[:2])


class TestRunnerConfig:
    def test_model_parallel_size_trains_identically(self):
        """`model_parallel_size: 2` in the runner config must produce the
        same training trajectory as the default data-parallel runner —
        sharding is placement, never math."""
        from rsl_rl_tpu.env import PointMass
        from rsl_rl_tpu.runners import OnPolicyRunner

        def run(extra_cfg):
            cfg = {
                "num_steps_per_env": 8, "save_interval": 1000, "seed": 3,
                "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
                "policy": {"class_name": "ActorCritic",
                           "actor_hidden_dims": [16, 16],
                           "critic_hidden_dims": [16, 16]},
                "algorithm": {"class_name": "PPO"},
                **extra_cfg,
            }
            runner = OnPolicyRunner(PointMass(num_envs=8), cfg, log_dir=None)
            runner.learn(2)
            return jax.device_get(runner.train_state.policy.params)

        base = run({})
        tp = run({"model_parallel_size": 2})
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
            base, tp,
        )

    def test_bad_model_parallel_size_raises(self):
        from rsl_rl_tpu.env import PointMass
        from rsl_rl_tpu.runners import OnPolicyRunner

        cfg = {
            "num_steps_per_env": 8, "save_interval": 1000, "seed": 3,
            "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
            "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [16]},
            "algorithm": {"class_name": "PPO"},
            "model_parallel_size": 3,  # does not divide the 2 test devices
        }
        with pytest.raises(ValueError, match="must divide"):
            OnPolicyRunner(PointMass(num_envs=8), cfg, log_dir=None)


class TestTensorParallelConsistency:
    @pytest.mark.parametrize("variant", ["feedforward", "recurrent"])
    def test_replicated_vs_model_sharded_same_losses(self, variant):
        """1-device replicated vs 2-device model-sharded training must agree
        (sharding is placement, never math)."""
        import __graft_entry__ as graft
        from rsl_rl_tpu.parallel.mesh import (
            data_sharding,
            make_mesh,
            replicated,
            shard_tree,
        )

        results = {}
        for mode in ("replicated", "tp"):
            env, alg = graft.make_variant(variant, num_envs=16, hidden=16)
            ts = alg.init_train_state(jax.random.PRNGKey(1), 16)
            cs = alg.init_collect_state(jax.random.PRNGKey(2), env)
            if mode == "tp":
                mesh = make_tp_mesh(2, jax.devices()[:2])
                ts = shard_tree_tp(ts, mesh)
                cs = shard_tree(cs, data_sharding(mesh))
            else:
                mesh = make_mesh(jax.devices()[:1])
                ts = shard_tree(ts, replicated(mesh))
                cs = shard_tree(cs, data_sharding(mesh))
            collect = jax.jit(alg.make_collect_fn(env, 8))
            update = jax.jit(alg.make_update_fn())
            losses = []
            for _ in range(3):
                ts, cs, rollout, cm = collect(ts, cs)
                ts, cs, um = update(ts, cs, rollout)
                losses.append(sum(
                    float(v) for k, v in um.items()
                    if k.startswith("Loss/") and k != "Loss/learning_rate"
                ))
            results[mode] = losses
        np.testing.assert_allclose(results["replicated"], results["tp"], rtol=1e-4)
