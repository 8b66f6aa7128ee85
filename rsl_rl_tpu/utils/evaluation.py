"""Deterministic policy evaluation as ONE jitted rollout program.

The reference has no in-library evaluation loop — its users hand-roll
"play" scripts downstream on top of ``get_inference_policy``
(reference: rsl_rl/runners/on_policy_runner.py:326-330). Here the whole
evaluation — deterministic policy forward (``act_inference``), env step,
recurrent-carry resets, and completed-episode bookkeeping — compiles into
a single ``lax.scan`` XLA program, so a periodic eval during training
costs one device dispatch (a Python per-step loop would pay a host
round-trip per step on a tunneled TPU).

Used by :class:`~rsl_rl_tpu.runners.on_policy_runner.OnPolicyRunner` when
``eval_interval`` is set (``Eval/*`` scalars) and by ``examples/play.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_eval_program(env, policy, num_steps: int, random_actions: bool = False):
    """Build ``program(ps, key) -> metrics`` for deterministic evaluation.

    The program resets a fresh copy of ``env`` (the caller's training env
    state is untouched — envs are pure state machines), rolls
    ``num_steps`` with ``policy.act_inference`` (or standard-normal random
    actions for a baseline), and reduces completed episodes on device.

    Returns a dict of scalar ``jax.Array``:

    - ``Eval/episode_count`` — completed episodes within the budget,
    - ``Eval/mean_reward`` / ``Eval/mean_episode_length`` — means over the
      completed episodes (0 when none completed),
    - ``Eval/min_return`` / ``Eval/max_return`` — extremes over completed
      episodes (``±inf`` when none completed).

    Wrap in ``jax.jit`` once and reuse: the closure identity keys the
    compilation cache.
    """

    def program(ps, key):
        k_reset, k_act = jax.random.split(key)
        state, obs = env.reset(k_reset)
        carry0 = policy.initial_carry(env.num_envs)
        cum0 = jnp.zeros((env.num_envs,), jnp.float32)
        len0 = jnp.zeros((env.num_envs,), jnp.float32)

        def step(c, k):
            state, obs, pcarry, cum, length, acc = c
            r_sum, r_cnt, l_sum, r_min, r_max = acc
            if random_actions:
                action = jax.random.normal(k, (env.num_envs, env.num_actions))
            else:
                action, pcarry = policy.act_inference(ps, obs, pcarry)
            state, obs, rew, done, _ = env.step(state, action)
            cum = cum + rew
            length = length + 1.0
            done_f = done.astype(jnp.float32)
            r_sum = r_sum + jnp.sum(cum * done_f)
            r_cnt = r_cnt + jnp.sum(done_f)
            l_sum = l_sum + jnp.sum(length * done_f)
            r_min = jnp.minimum(r_min, jnp.where(done, cum, jnp.inf).min())
            r_max = jnp.maximum(r_max, jnp.where(done, cum, -jnp.inf).max())
            keep = 1.0 - done_f
            cum = cum * keep
            length = length * keep
            pcarry = policy.reset_carry(pcarry, done)
            acc = (r_sum, r_cnt, l_sum, r_min, r_max)
            return (state, obs, pcarry, cum, length, acc), None

        zero = jnp.zeros((), jnp.float32)
        acc0 = (zero, zero, zero,
                jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(-jnp.inf, jnp.float32))
        init = (state, obs, carry0, cum0, len0, acc0)
        (final, _) = jax.lax.scan(step, init, jax.random.split(k_act, num_steps))
        r_sum, r_cnt, l_sum, r_min, r_max = final[5]
        safe = jnp.maximum(r_cnt, 1.0)
        return {
            "Eval/episode_count": r_cnt,
            "Eval/mean_reward": r_sum / safe,
            "Eval/mean_episode_length": l_sum / safe,
            "Eval/min_return": r_min,
            "Eval/max_return": r_max,
        }

    return program


def evaluate_policy(
    env, policy, ps, num_steps: int, key, random_actions: bool = False
) -> dict:
    """One-shot convenience wrapper: jit, run, ``device_get``.

    For repeated evaluation (e.g. inside a training loop) build the
    program once with :func:`make_eval_program` and jit it yourself —
    this wrapper re-jits per call signature and is meant for scripts.
    """
    program = jax.jit(make_eval_program(env, policy, num_steps, random_actions))
    return jax.device_get(program(ps, key))
