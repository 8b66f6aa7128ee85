"""Student-teacher distillation (behavior cloning) algorithm.

TPU-native counterpart of the reference ``Distillation``
(reference: rsl_rl/algorithms/distillation.py:14-185). The rollout records the
sampled student action (used to step the env) and the teacher's action
(``privileged_actions``); the update replays the window sequentially through
the student and accumulates loss over ``gradient_length`` steps before each
optimizer step — truncated BPTT, expressed as an outer ``lax.scan`` over
segments whose body differentiates an inner ``lax.scan`` over the segment's
steps. Hidden state flows between segments through ``stop_gradient`` (the
analog of ``detach_hidden_states``) and rewinds to the window-start carry at
each epoch boundary (the analog of ``reset(hidden_states=last_hidden)``,
reference distillation.py:111-141).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from rsl_rl_tpu.algorithms.ppo import (
    PPO,
    CollectState,
    TrainState,
    collect_extras_logs,
    init_episode_acc,
    init_episode_stats,
    step_episode_stats,
)
from rsl_rl_tpu.ops import distributions
from rsl_rl_tpu.storage.rollout import Rollout
from rsl_rl_tpu.utils.registry import register
from rsl_rl_tpu.utils.resolvers import resolve_optimizer


@register("algorithm")
class Distillation:
    """Behavior cloning of teacher actions with truncated BPTT."""

    def __init__(
        self,
        policy,
        num_learning_epochs: int = 1,
        gradient_length: int = 15,
        learning_rate: float = 1e-3,
        max_grad_norm: float | None = None,
        loss_type: str = "mse",
        optimizer: str = "adam",
        **kwargs,
    ):
        if kwargs:
            print(
                "Distillation.__init__ got unexpected arguments, which will be ignored: "
                + str(list(kwargs.keys()))
            )
        self.policy = policy
        self.num_learning_epochs = num_learning_epochs
        self.gradient_length = gradient_length
        self.learning_rate = learning_rate
        self.max_grad_norm = max_grad_norm

        if loss_type == "mse":
            self._elem_loss = lambda a, b: jnp.square(a - b)
        elif loss_type == "huber":
            self._elem_loss = lambda a, b: optax.huber_loss(a, b, delta=1.0)
        else:
            raise ValueError(
                f"Unknown loss type: {loss_type}. Supported types are: ['mse', 'huber']"
            )
        self.loss_fn = lambda a, b: jnp.mean(self._elem_loss(a, b))

        direction = resolve_optimizer(optimizer)()
        if max_grad_norm:
            # the reference clips only the student MLP parameters
            # (distillation.py:133) — mask the clip to that subtree
            def student_only(params):
                return {
                    k: jax.tree.map(lambda _: k == "student", v) for k, v in params.items()
                }

            self.tx = optax.chain(
                optax.masked(optax.clip_by_global_norm(max_grad_norm), student_only),
                direction,
            )
        else:
            self.tx = direction

    # ------------------------------------------------------------------ init

    def init_train_state(self, key: jax.Array, num_envs: int) -> TrainState:
        k_policy, k_rng = jax.random.split(key)
        policy_state = self.policy.init(k_policy)
        return TrainState(
            policy=policy_state,
            opt_state=self.tx.init(policy_state.params),
            lr=jnp.asarray(self.learning_rate, jnp.float32),
            rnd=None,
            rnd_opt_state=None,
            it=jnp.zeros((), jnp.int32),
            rng=k_rng,
        )

    # collect-state construction is identical to PPO's (same CollectState,
    # same carry/stats init) — share one implementation so boundary fixes
    # apply to both algorithms
    init_collect_state = PPO.init_collect_state
    init_collect_state_from = PPO.init_collect_state_from

    # --------------------------------------------------------------- collect

    def make_collect_fn(self, env, num_steps_per_env: int) -> Callable:
        """Rollout: student acts (sampled), teacher action recorded
        (reference distillation.py:85-103)."""
        policy = self.policy

        def step_fn(carry, _):
            ps, env_state, obs, pol_carry, stats, key, acc = carry
            key, k_act = jax.random.split(key)

            mean, std, pol_carry = policy.act(ps, obs, pol_carry)
            action = distributions.sample(k_act, mean, std)
            privileged_action, pol_carry = policy.evaluate(ps, obs, pol_carry)

            env_state, next_obs, rew, done, extras = env.step(env_state, action)
            done_f = done.astype(jnp.float32)

            ps = policy.update_normalization(ps, next_obs)
            pol_carry = policy.reset_carry(pol_carry, done)

            stats, acc = step_episode_stats(stats, acc, rew, jnp.zeros_like(rew), done_f)
            log_out = collect_extras_logs(extras)

            outputs = (obs, action, privileged_action, rew, done, jnp.mean(std), log_out)
            return (ps, env_state, next_obs, pol_carry, stats, key, acc), outputs

        def collect(ts: TrainState, cs: CollectState):
            acc0 = init_episode_acc()
            carry0 = cs.carry
            init = (ts.policy, cs.env_state, cs.obs, cs.carry, cs.stats, ts.rng, acc0)
            (ps, env_state, obs, pol_carry, stats, key, acc), outs = jax.lax.scan(
                step_fn, init, None, length=num_steps_per_env
            )
            obs_t, actions, privileged_actions, rewards, dones, stds, log_outs = outs

            rollout = Rollout(
                obs=obs_t,
                actions=actions,
                rewards=rewards,
                dones=dones,
                privileged_actions=privileged_actions,
                carry0=carry0 if policy.is_recurrent else None,
            )
            metrics = dict(acc)
            metrics["Policy/mean_noise_std"] = jnp.mean(stds)
            for k, v in log_outs.items():
                metrics[f"extras/{k}"] = jnp.mean(v)

            ts = ts.replace(policy=ps, rng=key)
            cs = CollectState(env_state=env_state, obs=obs, carry=pol_carry, stats=stats)
            return ts, cs, rollout, metrics

        return collect

    # ---------------------------------------------------------- host collect

    def make_host_collect_fn(self, env, num_steps_per_env: int, bridge=None) -> Callable:
        """Collection loop for host (non-JAX) environments — hybrid analog of
        the reference's rollout (distillation_runner.py:94-111). With a
        ``HostShardingBridge``, ``env`` is this process's local shard and
        every jitted step runs globally over the data-sharded batch (see
        ``PPO.make_host_collect_fn``)."""
        import numpy as np

        policy = self.policy

        from rsl_rl_tpu.parallel.host_dp import converters

        to_device, to_host = converters(bridge)

        @jax.jit
        def act_step(ps, obs, carry, key):
            key, k_act = jax.random.split(key)
            mean, std, carry = policy.act(ps, obs, carry)
            action = distributions.sample(k_act, mean, std)
            privileged, carry = policy.evaluate(ps, obs, carry)
            return action, privileged, jnp.mean(std), carry, key

        @jax.jit
        def process_step(ps, next_obs, done, carry):
            ps = policy.update_normalization(ps, next_obs)
            carry = policy.reset_carry(carry, done)
            return ps, carry

        def collect(ts: TrainState, cs: CollectState):
            from rsl_rl_tpu.algorithms.host_collect import HostEpisodeTracker, stack_trajectory

            ps, key = ts.policy, ts.rng
            obs, carry = cs.obs, cs.carry
            carry0 = carry
            tracker = HostEpisodeTracker(cs.stats)
            traj = {k: [] for k in ("obs", "actions", "privileged_actions", "rewards", "dones")}
            stds = []
            zero_irew = np.zeros((env.num_envs,), np.float32)
            for _ in range(num_steps_per_env):
                action, privileged, std_mean, carry, key = act_step(ps, obs, carry, key)
                next_obs, rew_np, done_np, extras = env.step(to_host(action))
                next_obs = to_device({k: np.asarray(v) for k, v in next_obs.items()})
                done = to_device(np.asarray(done_np))
                ps, carry = process_step(ps, next_obs, done, carry)

                traj["obs"].append(obs)
                traj["actions"].append(action)
                traj["privileged_actions"].append(privileged)
                traj["rewards"].append(to_device(np.asarray(rew_np, np.float32)))
                traj["dones"].append(done)
                stds.append(std_mean)
                obs = next_obs
                tracker.step(np.asarray(rew_np), zero_irew, done_np, extras)

            stacked = stack_trajectory(traj)
            if bridge is not None:
                stacked = bridge.constrain_time_major(stacked)
            rollout = Rollout(
                **stacked, carry0=carry0 if policy.is_recurrent else None
            )
            metrics = tracker.metrics()
            metrics["Policy/mean_noise_std"] = jnp.mean(jnp.stack(stds))

            ts = ts.replace(policy=ps, rng=key)
            cs = CollectState(env_state=(), obs=obs, carry=carry, stats=tracker.stats())
            return ts, cs, rollout, metrics

        return collect

    # ---------------------------------------------------------------- update

    # Above this many gradient segments the chunked replay is built with a
    # lax.scan over per-step cells instead of Python-unrolled fused windows,
    # trading kernel fusion for bounded compile time.
    MAX_UNROLLED_SEGMENTS = 32

    def make_update_fn(self) -> Callable:
        """Sequential replay with gradient steps every ``gradient_length``
        steps (reference distillation.py:105-151).

        Two equivalent implementations (same math, verified by
        tests/test_distillation.py::TestChunkedReplayEquivalence):

        - **chunked** (default): the segment between optimizer steps is
          replayed as whole sub-windows through ``policy.student_seq`` — one
          fused Pallas memory call + one batched student-head matmul per
          chunk (chunks split segments at epoch boundaries, where the carry
          rewinds to the window start). This kills the 12x-off-roofline cost
          of per-step RNN cells on TPU.
        - **per-step scan**: the round-1 formulation, kept for configs with
          very many segments where unrolling would blow up compile time.
        """
        policy = self.policy
        G = self.gradient_length

        def update(ts: TrainState, cs: CollectState, rollout: Rollout):
            T = rollout.num_steps
            total_steps = self.num_learning_epochs * T
            num_segments = total_steps // G
            resets = rollout.replay_resets()  # [T, N]
            carry0 = rollout.carry0 if policy.is_recurrent else ()

            if num_segments <= self.MAX_UNROLLED_SEGMENTS:
                return self._update_chunked(
                    ts, cs, rollout, resets, carry0, total_steps, num_segments
                )

            def replay_step(params, pol_carry, s):
                """One BPTT replay step at global step ``s`` (epoch-flattened)."""
                t = s % T
                obs_t = jax.tree.map(lambda x: x[t], rollout.obs)
                # epoch boundary: rewind to window-start carry; else apply
                # done-masked reset (reference distillation.py:112,140)
                if policy.is_recurrent:
                    pol_carry = jax.tree.map(
                        lambda c0, c: jnp.where(t == 0, jax.lax.stop_gradient(c0), c),
                        carry0, pol_carry,
                    )
                    pol_carry = policy.reset_carry(pol_carry, (t != 0) & resets[t])
                ps = ts.policy.replace(params=params)
                action, pol_carry = policy.act_inference(ps, obs_t, pol_carry)
                loss = self.loss_fn(action, rollout.privileged_actions[t])
                return loss, pol_carry

            def segment_loss(params, pol_carry, steps):
                def body(carry, s):
                    pol_carry, acc = carry
                    loss, pol_carry = replay_step(params, pol_carry, s)
                    return (pol_carry, acc + loss), loss

                (pol_carry, total), losses = jax.lax.scan(body, (pol_carry, 0.0), steps)
                return total, (pol_carry, losses)

            def segment_step(carry, steps):
                params, opt_state, pol_carry = carry
                (seg_loss, (pol_carry, losses)), grads = jax.value_and_grad(
                    segment_loss, has_aux=True
                )(params, pol_carry, steps)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(
                    params, jax.tree.map(lambda u: -self.learning_rate * u, updates)
                )
                # detach hidden between segments (reference distillation.py:136)
                pol_carry = jax.lax.stop_gradient(pol_carry)
                return (params, opt_state, pol_carry), losses

            seg_steps = jnp.arange(num_segments * G, dtype=jnp.int32).reshape(num_segments, G)
            carry_init = (ts.policy.params, ts.opt_state, carry0)
            (params, opt_state, pol_carry), seg_losses = jax.lax.scan(
                segment_step, carry_init, seg_steps
            )
            all_losses = [seg_losses.reshape(-1)]

            # trailing steps that never fill a gradient segment still advance
            # the hidden state and count toward the logged mean
            # (reference distillation.py:114-126 counts every step)
            remainder = total_steps - num_segments * G
            if remainder > 0:
                def tail_body(carry, s):
                    pol_carry = carry
                    loss, pol_carry = replay_step(params, pol_carry, s)
                    return pol_carry, loss

                pol_carry, tail_losses = jax.lax.scan(
                    tail_body, pol_carry,
                    jnp.arange(num_segments * G, total_steps, dtype=jnp.int32),
                )
                all_losses.append(tail_losses)

            ts = ts.replace(
                policy=ts.policy.replace(params=params),
                opt_state=opt_state,
                it=ts.it + 1,
            )
            # the policy's acting hidden continues from the end of the replay
            # (reference leaves memory_s at the replay-end state after update)
            if policy.is_recurrent:
                cs = cs.replace(carry=jax.lax.stop_gradient(pol_carry))

            metrics = {"Loss/behavior": jnp.mean(jnp.concatenate(all_losses))}
            return ts, cs, metrics

        return update

    # ------------------------------------------------------- chunked replay

    def _per_step_loss(self, actions: jax.Array, targets: jax.Array) -> jax.Array:
        """Per-timestep loss means for a ``[g, N, A]`` chunk -> ``[g]``
        (Σ over the chunk equals the per-step path's accumulated loss)."""
        err = self._elem_loss(actions, targets)
        return jnp.mean(err, axis=tuple(range(1, err.ndim)))

    def _update_chunked(
        self, ts: TrainState, cs: CollectState, rollout: Rollout,
        resets: jax.Array, carry0, total_steps: int, num_segments: int,
    ):
        """Whole-window replay via ``policy.student_seq`` (see make_update_fn).

        Global replay step ``s`` (epoch-flattened) maps to window step
        ``t = s % T``; each gradient segment ``[seg*G, (seg+1)*G)`` is split
        at epoch boundaries (``t == 0``, where the carry rewinds to the
        window-start ``carry0``, reference distillation.py:112) into chunks of
        contiguous ``t``, each replayed as one fused sub-window. Numerically
        equivalent to the per-step path (same resets, same rewinds, same
        optimizer-step positions, reference distillation.py:105-151).
        """
        policy = self.policy
        G = self.gradient_length
        T = rollout.num_steps

        def chunks_between(s0: int, s1: int) -> list[tuple[int, int]]:
            out, s = [], s0
            while s < s1:
                t = s % T
                n = min(s1 - s, T - t)
                out.append((t, t + n))
                s += n
            return out

        def replay_chunks(params, carry, chunk_list):
            ps = ts.policy.replace(params=params)
            losses = []
            for t0, t1 in chunk_list:
                if t0 == 0:
                    # epoch boundary: rewind to the window-start carry
                    carry = jax.tree.map(jax.lax.stop_gradient, carry0)
                obs_c = jax.tree.map(lambda x: x[t0:t1], rollout.obs)
                actions, carry = policy.student_seq(ps, obs_c, carry, resets[t0:t1])
                losses.append(
                    self._per_step_loss(actions, rollout.privileged_actions[t0:t1])
                )
            return jnp.concatenate(losses) if losses else jnp.zeros((0,)), carry

        def seg_loss(params, carry, chunk_list):
            losses, carry = replay_chunks(params, carry, chunk_list)
            return jnp.sum(losses), (carry, losses)

        params, opt_state = ts.policy.params, ts.opt_state
        carry = jax.tree.map(jax.lax.stop_gradient, carry0)
        all_losses = []
        for seg in range(num_segments):  # static unroll (gated by caller)
            chunk_list = chunks_between(seg * G, (seg + 1) * G)
            (_, (carry, losses)), grads = jax.value_and_grad(
                seg_loss, has_aux=True
            )(params, carry, chunk_list)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(
                params, jax.tree.map(lambda u: -self.learning_rate * u, updates)
            )
            # detach hidden between segments (reference distillation.py:136)
            carry = jax.lax.stop_gradient(carry)
            all_losses.append(losses)

        # trailing steps that never fill a gradient segment still advance the
        # hidden state and count toward the logged mean
        # (reference distillation.py:114-126 counts every step)
        tail_chunks = chunks_between(num_segments * G, total_steps)
        if tail_chunks:
            losses, carry = replay_chunks(params, carry, tail_chunks)
            all_losses.append(jax.lax.stop_gradient(losses))
            carry = jax.lax.stop_gradient(carry)

        if policy.is_recurrent and getattr(policy, "teacher_recurrent", False):
            # the per-step path masks the (rewound) teacher carry at every
            # replayed reset (reset_carry touches both memories, mirroring the
            # reference's policy.reset during replay); student_seq leaves the
            # teacher untouched, so apply the accumulated mask since the last
            # epoch rewind
            from rsl_rl_tpu.networks.memory import mask_carry

            t_end = ((total_steps - 1) % T) + 1
            acc = jnp.any(resets[:t_end], axis=0)
            carry = {**carry, "teacher": mask_carry(carry0["teacher"], acc)}

        ts = ts.replace(
            policy=ts.policy.replace(params=params),
            opt_state=opt_state,
            it=ts.it + 1,
        )
        # the policy's acting hidden continues from the end of the replay
        # (reference leaves memory_s at the replay-end state after update)
        if policy.is_recurrent:
            cs = cs.replace(carry=carry)

        metrics = {"Loss/behavior": jnp.mean(jnp.concatenate(all_losses))}
        return ts, cs, metrics
