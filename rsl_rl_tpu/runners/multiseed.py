"""Multi-seed training: N independent runs fused into ONE XLA program.

A capability the reference cannot express: because every piece of mutable
state lives in pytrees (``TrainState``/``CollectState``) and the collect and
update functions are pure, an entire training run is a value -> value
transform — so ``jax.vmap`` turns it into N independent runs batched over a
leading seed axis. The MXU sees one batched matmul per layer instead of N
small ones, which is how seed studies and learning-curve error bands (the
reference's users run these as N separate torch processes, reference
README.md "multi-GPU training" positioning) become a single-program,
single-chip workload.

Composes with the device mesh: shard the seed axis over ``data`` to place
one (or more) seeds per chip — ``shard_tree(ts, seed_sharding(mesh))`` with
the same declarative machinery as parallel/mesh.py. The per-seed adaptive-KL
learning rates, RND states, and episode statistics all vectorize because
they are ordinary pytree leaves.

Recurrent policies compose too: vmap of the fused Pallas BPTT kernels
(``ops/pallas_rnn.py``, pallas_call + custom_vjp) batches over the seed
axis — verified on real TPU hardware (2-seed GRU-128 PPO train step with
the shape gate admitting the fused path; finite per-seed losses). That
verification covered the xproj-streaming cores, so vmapped callers dispatch
to those: the newer x-streaming and stream-paired cores defer to them under
vmap (``ops.pallas_rnn.under_vmap``) until batched hardware runs prove them
too. CPU test runs always take the scan fallback, so this claim is
TPU-verified, not CI-enforced.
"""

from __future__ import annotations

from typing import Callable

import jax


def make_multiseed_train(
    alg, env, num_steps_per_env: int, num_seeds: int
) -> tuple[Callable, Callable]:
    """Build ``(init, train_step)`` for vectorized multi-seed training.

    ``init(key) -> (ts, cs)`` initializes ``num_seeds`` independent train and
    collect states stacked on a leading seed axis (distinct policy inits,
    env resets, and action-noise streams per seed).

    ``train_step(ts, cs) -> (ts, cs, metrics)`` runs one full training
    iteration (collect + update, same fused program the single-seed runner
    jits) for every seed; every metric gains a leading ``[num_seeds]`` axis,
    so cross-seed mean/std curves come out of one ``device_get``.
    """
    collect = alg.make_collect_fn(env, num_steps_per_env)
    update = alg.make_update_fn()

    def init(key: jax.Array):
        keys = jax.random.split(key, num_seeds)
        ts = jax.vmap(lambda k: alg.init_train_state(k, env.num_envs))(keys)
        cs = jax.vmap(
            lambda k: alg.init_collect_state(jax.random.fold_in(k, 1), env)
        )(keys)
        return ts, cs

    @jax.jit
    def train_step(ts, cs):
        def one(ts_i, cs_i):
            ts_i, cs_i, rollout, cm = collect(ts_i, cs_i)
            ts_i, cs_i, um = update(ts_i, cs_i, rollout)
            return ts_i, cs_i, {**cm, **um}

        return jax.vmap(one)(ts, cs)

    return init, train_step
