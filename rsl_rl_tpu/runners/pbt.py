"""Population-based training over the vmapped seed axis — one XLA program.

Extends :mod:`rsl_rl_tpu.runners.multiseed` (N independent runs batched over
a leading seed axis) with PBT's exploit/explore step [Jaderberg et al. 2017,
arXiv:1711.09846]: every ``exploit_interval`` iterations the bottom
``exploit_fraction`` of the population (ranked by smoothed mean episode
reward) copies the full train state of a random top-fraction member and
perturbs its learning rate. Because all mutable state is pytrees, the
"copy worker i's weights to worker j" step of classic PBT — normally a
checkpoint round-trip between processes — is a single gather
(``tree.map(lambda x: x[src_idx])``) inside the jitted train step; no hosts,
no filesystems, no orchestrators.

The reference has no counterpart (its users run PBT via external process
schedulers); this composes with everything the single-seed path has: the
adaptive-KL LR schedule (the perturbed LR is the same carried scalar the KL
rule adapts, reference ppo.py:260-294), RND state, and recurrent carries
(left per-seed on exploit — the cloned policy's hidden flushes within one
rollout window).
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class PBTState(NamedTuple):
    """Population bookkeeping carried across train steps."""

    fitness: jax.Array  #: [S] smoothed mean completed-episode reward
    fitness_valid: jax.Array  #: [S] bool, True once a seed finished an episode
    key: jax.Array  #: PRNG stream for exploit choices and LR perturbation
    exploits: jax.Array  #: [] int32, total number of seeds replaced so far


def make_pbt_train(
    alg,
    env,
    num_steps_per_env: int,
    num_seeds: int,
    *,
    exploit_interval: int = 20,
    exploit_fraction: float = 0.25,
    lr_perturb: tuple[float, float] = (0.8, 1.25),
    fitness_smoothing: float = 0.3,
) -> tuple[Callable, Callable]:
    """Build ``(init, train_step)`` for population-based training.

    ``init(key) -> (ts, cs, pbt)``: ``num_seeds`` independent train/collect
    states stacked on a leading seed axis plus the PBT bookkeeping state.

    ``train_step(ts, cs, pbt) -> (ts, cs, pbt, metrics)``: one vmapped
    training iteration for the whole population; on iterations where
    ``it % exploit_interval == 0`` (and every seed has a fitness reading)
    the truncation-selection exchange runs inside the same program.
    Metrics gain a leading ``[num_seeds]`` axis and PBT adds
    ``PBT/fitness`` ([S]), ``PBT/lr`` ([S]), and ``PBT/exploits`` (scalar).

    Args:
        exploit_interval: iterations between exploit/explore steps.
        exploit_fraction: fraction of the population replaced (and the size
            of the top pool copied from), truncation selection; must be in
            ``[0, 0.5]`` so the bottom and top pools cannot overlap. A
            fraction that rounds to zero seeds disables the exchange.
        lr_perturb: ``(lo, hi)`` log-uniform factor applied to the copied
            learning rate.
        fitness_smoothing: EMA coefficient for the per-iteration mean
            completed-episode reward (iterations with no finished episode
            leave a seed's fitness unchanged).
    """
    if not 0.0 <= exploit_fraction <= 0.5:
        # above 0.5 the bottom and top pools overlap: replaced losers would
        # serve as clone sources, silently degenerating truncation selection
        raise ValueError(
            f"exploit_fraction must be in [0, 0.5], got {exploit_fraction}"
        )
    collect = alg.make_collect_fn(env, num_steps_per_env)
    update = alg.make_update_fn()
    k_exchange = int(math.floor(num_seeds * exploit_fraction))
    log_lo, log_hi = math.log(lr_perturb[0]), math.log(lr_perturb[1])

    def init(key: jax.Array):
        k_seeds, k_pbt = jax.random.split(key)
        keys = jax.random.split(k_seeds, num_seeds)
        ts = jax.vmap(lambda k: alg.init_train_state(k, env.num_envs))(keys)
        cs = jax.vmap(
            lambda k: alg.init_collect_state(jax.random.fold_in(k, 1), env)
        )(keys)
        pbt = PBTState(
            fitness=jnp.zeros((num_seeds,), jnp.float32),
            fitness_valid=jnp.zeros((num_seeds,), bool),
            key=k_pbt,
            exploits=jnp.zeros((), jnp.int32),
        )
        return ts, cs, pbt

    def _exploit(ts, pbt):
        """Truncation selection: bottom-k seeds copy a random top-k member's
        train state and perturb the copied learning rate (log-uniform)."""
        key, k_src, k_lr = jax.random.split(pbt.key, 3)
        order = jnp.argsort(pbt.fitness)  # ascending
        bottom = order[:k_exchange]
        top = order[num_seeds - k_exchange:]
        src_for_bottom = top[
            jax.random.randint(k_src, (k_exchange,), 0, k_exchange)
        ]
        # identity map, overwritten at the bottom seeds
        src_idx = jnp.arange(num_seeds).at[bottom].set(src_for_bottom)

        # the seed's own rng stream and iteration counter stay; everything
        # learned travels: policy (params/norm/aux), optimizer state, the
        # adaptive LR, and RND state
        cloned = ts.replace(
            policy=jax.tree.map(lambda x: x[src_idx], ts.policy),
            opt_state=jax.tree.map(lambda x: x[src_idx], ts.opt_state),
            lr=ts.lr[src_idx],
            rnd=jax.tree.map(lambda x: x[src_idx], ts.rnd),
            rnd_opt_state=jax.tree.map(lambda x: x[src_idx], ts.rnd_opt_state),
        )
        factors = jnp.exp(
            jax.random.uniform(k_lr, (num_seeds,), minval=log_lo, maxval=log_hi)
        )
        is_bottom = jnp.zeros((num_seeds,), bool).at[bottom].set(True)
        cloned = cloned.replace(
            lr=jnp.where(is_bottom, cloned.lr * factors, cloned.lr)
        )
        pbt = pbt._replace(
            fitness=pbt.fitness[src_idx],  # clones inherit source fitness
            key=key,
            exploits=pbt.exploits + k_exchange,
        )
        return cloned, pbt

    @jax.jit
    def train_step(ts, cs, pbt: PBTState):
        def one(ts_i, cs_i):
            ts_i, cs_i, rollout, cm = collect(ts_i, cs_i)
            ts_i, cs_i, um = update(ts_i, cs_i, rollout)
            return ts_i, cs_i, {**cm, **um}

        ts, cs, metrics = jax.vmap(one)(ts, cs)

        # per-seed mean completed-episode reward this iteration; EMA-smooth,
        # holding the previous value on iterations with no finished episode
        count = metrics["ep_count"]
        has_ep = count > 0
        it_fit = metrics["ep_reward_sum"] / jnp.maximum(count, 1.0)
        blended = jnp.where(
            pbt.fitness_valid,
            (1.0 - fitness_smoothing) * pbt.fitness + fitness_smoothing * it_fit,
            it_fit,
        )
        pbt = pbt._replace(
            fitness=jnp.where(has_ep, blended, pbt.fitness),
            fitness_valid=pbt.fitness_valid | has_ep,
        )

        if k_exchange > 0:
            # all seeds share the same it counter (vmapped in lockstep)
            due = (ts.it[0] % exploit_interval == 0) & jnp.all(pbt.fitness_valid)
            ts, pbt = jax.lax.cond(
                due, _exploit, lambda ts_, pbt_: (ts_, pbt_), ts, pbt
            )

        metrics = dict(metrics)
        metrics["PBT/fitness"] = pbt.fitness
        metrics["PBT/lr"] = ts.lr
        metrics["PBT/exploits"] = pbt.exploits
        return ts, cs, pbt, metrics

    return init, train_step
