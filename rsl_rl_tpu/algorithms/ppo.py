"""Proximal Policy Optimization as a pair of jitted pure functions.

TPU-native counterpart of the reference ``PPO``
(reference: rsl_rl/algorithms/ppo.py:19-469). The reference's imperative
act/process/update cycle becomes:

- ``collect``: one ``lax.scan`` over the rollout window fusing policy forward,
  action sampling, env step, normalizer updates, RND intrinsic reward, timeout
  bootstrapping and episode bookkeeping into a single XLA program
  (replaces ppo.py:129-169 + the runner's Python step loop),
- ``update``: GAE as a reverse scan (replaces rollout_storage.py:127-149)
  followed by a ``lax.scan`` over epochs x minibatches carrying
  ``(params, opt_state, lr, rnd_params, rnd_opt_state)`` — the adaptive-KL
  learning rate is a traced carry scalar, not a Python-side mutation
  (replaces ppo.py:178-422).

Under a data-parallel mesh the global batch means inside the loss make XLA
insert the gradient/KL ``psum``s automatically, replacing the reference's
manual NCCL choreography (ppo.py:428-469).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rsl_rl_tpu.modules import symmetry
from rsl_rl_tpu.modules.policy import PolicyState
from rsl_rl_tpu.modules.rnd import RandomNetworkDistillation, RNDState
from rsl_rl_tpu.ops import distributions
from rsl_rl_tpu.ops.gae import compute_gae
from rsl_rl_tpu.storage.rollout import (
    Rollout,
    recurrent_minibatch_starts,
    slice_envs,
)
from rsl_rl_tpu.utils.registry import register
from rsl_rl_tpu.utils.resolvers import resolve_optimizer, string_to_callable


@struct.dataclass
class EpisodeStats:
    """Per-env episode accumulators, kept on device across iterations
    (replaces the reference's per-step host sync, on_policy_runner.py:113-139).
    """

    cur_reward_sum: jax.Array
    cur_episode_length: jax.Array
    cur_ereward_sum: jax.Array  # extrinsic only (RND logging)
    cur_ireward_sum: jax.Array  # intrinsic only (RND logging)


@struct.dataclass
class CollectState:
    """Everything sharded along the env axis: env state, current obs, policy
    recurrent carry, episode accumulators."""

    env_state: Any
    obs: dict[str, jax.Array]
    carry: Any
    stats: EpisodeStats


@struct.dataclass
class TrainState:
    """Replicated training state."""

    policy: PolicyState
    opt_state: Any
    lr: jax.Array
    rnd: RNDState | None
    rnd_opt_state: Any
    it: jax.Array
    rng: jax.Array


def init_episode_stats(num_envs: int) -> EpisodeStats:
    z = jnp.zeros((num_envs,), jnp.float32)
    return EpisodeStats(z, z, z, z)


ACC_KEYS = ("ep_reward_sum", "ep_length_sum", "ep_ereward_sum", "ep_ireward_sum", "ep_count")


def init_episode_acc() -> dict[str, jax.Array]:
    """Zeroed per-iteration episode totals carried through the collect scan."""
    return {k: jnp.zeros((), jnp.float32) for k in ACC_KEYS}


def step_episode_stats(
    stats: EpisodeStats, acc: dict, rew: jax.Array, irew: jax.Array, done_f: jax.Array
) -> tuple[EpisodeStats, dict]:
    """Advance per-env episode accumulators one step and fold the episodes
    that finished this step into the iteration totals (the on-device
    replacement for the reference's per-step host bookkeeping,
    on_policy_runner.py:113-139). Shared by PPO and Distillation collection.
    """
    stats = EpisodeStats(
        cur_reward_sum=stats.cur_reward_sum + rew + irew,
        cur_episode_length=stats.cur_episode_length + 1.0,
        cur_ereward_sum=stats.cur_ereward_sum + rew,
        cur_ireward_sum=stats.cur_ireward_sum + irew,
    )
    acc = {
        "ep_reward_sum": acc["ep_reward_sum"] + jnp.sum(stats.cur_reward_sum * done_f),
        "ep_length_sum": acc["ep_length_sum"] + jnp.sum(stats.cur_episode_length * done_f),
        "ep_ereward_sum": acc["ep_ereward_sum"] + jnp.sum(stats.cur_ereward_sum * done_f),
        "ep_ireward_sum": acc["ep_ireward_sum"] + jnp.sum(stats.cur_ireward_sum * done_f),
        "ep_count": acc["ep_count"] + jnp.sum(done_f),
    }
    keep = 1.0 - done_f
    stats = EpisodeStats(
        cur_reward_sum=stats.cur_reward_sum * keep,
        cur_episode_length=stats.cur_episode_length * keep,
        cur_ereward_sum=stats.cur_ereward_sum * keep,
        cur_ireward_sum=stats.cur_ireward_sum * keep,
    )
    return stats, acc


def collect_extras_logs(extras: dict) -> dict[str, jax.Array]:
    """Per-step scalar means of the env's ``episode``/``log`` extras.

    ``episode`` takes precedence over ``log`` when both groups are present —
    the reference's elif (on_policy_runner.py:114-117) appends exactly one of
    the two dicts per step, never a merge."""
    if "episode" in extras:
        group = extras["episode"]
    elif "log" in extras:
        group = extras["log"]
    else:
        return {}
    return {k: jnp.mean(jnp.asarray(v, jnp.float32)) for k, v in group.items()}


#: Rows (env-steps) per minibatch at the measured update-throughput optimum
#: (benchmarks/results/sweep_minibatches.json: at 4096 envs x 24 steps the
#: 24.6k-row shape beats both halves and doubles; the README "Throughput"
#: 16384-env study shows the same knee from the other side). ``"auto"``
#: minibatch selection targets this.
ROWS_PER_MINIBATCH_TARGET = 24576


def resolve_num_mini_batches(
    setting, num_steps: int, num_envs: int, recurrent: bool
) -> int:
    """Resolve ``num_mini_batches`` — integers pass through (the reference's
    contract, reference config/example_config.yaml:36); ``"auto"`` picks the
    smallest power-of-two count >= 4 that keeps every minibatch at or under
    :data:`ROWS_PER_MINIBATCH_TARGET` rows, the measured TPU knee, subject
    to divisibility (the recurrent generator slices the env axis, the
    feedforward one flat rows)."""
    if setting != "auto":
        return int(setting)

    def divides(n: int) -> bool:
        return (num_envs % n == 0) if recurrent else ((num_steps * num_envs) % n == 0)

    nb = 4
    while num_steps * num_envs // nb > ROWS_PER_MINIBATCH_TARGET and divides(nb * 2):
        nb *= 2
    return nb


_PACK_SCALAR_FIELDS = ("values", "returns", "advantages", "log_probs")


def pack_minibatch_rows(rollout: "Rollout", returns, advantages, perm):
    """Pack every per-row feedforward minibatch field into ONE shuffled
    ``[T*N, F]`` array; returns ``(packed, unpack)``.

    Shuffle the flattened batch ONCE and hand out contiguous slices: the
    reference draws a single permutation and reuses it across epochs
    (reference rollout_storage.py:163-165), so one up-front gather + dynamic
    slices is equivalent to gathering shuffled rows per minibatch — and ~20x
    cheaper in HBM traffic on TPU. All per-row fields are packed into one
    array first so the random-row gather reads memory contiguously instead
    of once per field.

    The pack is fp32 (concatenate would otherwise promote to the widest
    dtype anyway); narrow groups (uint8 images, bools) get their dtype back
    at unpack so the update sees the same obs dtypes as collection. Measured
    (benchmarks/roofline_ff.py): at the headline shape the pack + gather is
    ~232us of a ~10.8ms learn phase (~2%), and a bf16 pack measured
    end-to-end is a no-op (7.24M vs 7.26M steps/s, inside run noise), so it
    is not worth its quality risk; if a real workload ever carries wide
    image groups, pack those per-dtype to avoid gathering 4x the bytes.

    ``unpack(rows)`` splits a packed row block back into the batch dict;
    scalar fields are squeezed to ``[B]``, multi-dim fields (e.g. image obs
    groups) get their trailing shape restored.
    """
    T, N = rollout.num_steps, rollout.num_envs
    obs_keys = sorted(rollout.obs.keys())
    columns = [("obs." + k, rollout.obs[k]) for k in obs_keys] + [
        ("actions", rollout.actions),
        ("values", rollout.values),
        ("returns", returns),
        ("advantages", advantages),
        ("log_probs", rollout.log_probs),
        ("mu", rollout.mu),
        ("sigma", rollout.sigma),
    ]
    widths, trails, dtypes, flats = [], [], [], []
    for _, v in columns:
        flat = v.reshape(T * N, -1)
        widths.append(flat.shape[1])
        trails.append(v.shape[2:])  # original trailing shape
        dtypes.append(v.dtype)  # restored at unpack
        flats.append(flat.astype(jnp.float32))
    packed = jnp.concatenate(flats, axis=-1)[perm]

    def unpack(rows):
        out, off = {}, 0
        for (name, _), w, trail, dt in zip(columns, widths, trails, dtypes):
            col = rows[:, off : off + w].astype(dt)
            if name in _PACK_SCALAR_FIELDS:
                out[name] = col[:, 0]
            elif len(trail) > 1:
                out[name] = col.reshape((col.shape[0],) + trail)
            else:
                out[name] = col
            off += w
        return {
            "obs": {k: out["obs." + k] for k in obs_keys},
            "resets": None,
            **{k: out[k] for k in
               ("actions", "values", "returns", "advantages",
                "log_probs", "mu", "sigma")},
        }

    return packed, unpack


@register("algorithm")
class PPO:
    """Clipped-surrogate PPO with adaptive-KL LR, RND and symmetry support."""

    def __init__(
        self,
        policy,
        num_learning_epochs: int = 5,
        num_mini_batches: int | str = 4,  # int, or "auto" (measured TPU knee)
        clip_param: float = 0.2,
        gamma: float = 0.99,
        lam: float = 0.95,
        value_loss_coef: float = 1.0,
        entropy_coef: float = 0.01,
        learning_rate: float = 1e-3,
        max_grad_norm: float = 1.0,
        use_clipped_value_loss: bool = True,
        schedule: str = "adaptive",
        desired_kl: float = 0.01,
        normalize_advantage_per_mini_batch: bool = False,
        rnd_cfg: dict | None = None,
        symmetry_cfg: dict | None = None,
        optimizer: str = "adam",
        min_lr: float = 1e-5,
        max_lr: float = 1e-2,
        **kwargs,
    ):
        if kwargs:
            print(
                "PPO.__init__ got unexpected arguments, which will be ignored: "
                + str(list(kwargs.keys()))
            )
        self.policy = policy
        self.num_learning_epochs = num_learning_epochs
        self.num_mini_batches = num_mini_batches
        self.clip_param = clip_param
        self.gamma = gamma
        self.lam = lam
        self.value_loss_coef = value_loss_coef
        self.entropy_coef = entropy_coef
        self.learning_rate = learning_rate
        self.max_grad_norm = max_grad_norm
        self.use_clipped_value_loss = use_clipped_value_loss
        self.schedule = schedule
        self.desired_kl = desired_kl
        self.normalize_advantage_per_mini_batch = normalize_advantage_per_mini_batch
        self.min_lr = min_lr
        self.max_lr = max_lr

        # RND module (reference ppo.py:60-71)
        self.rnd: RandomNetworkDistillation | None = None
        self.rnd_learning_rate = None
        if rnd_cfg is not None:
            rnd_cfg = dict(rnd_cfg)
            self.rnd_learning_rate = rnd_cfg.pop("learning_rate", 1e-3)
            self.rnd = RandomNetworkDistillation(**rnd_cfg)

        # symmetry (reference ppo.py:74-91)
        self.symmetry = None
        if symmetry_cfg is not None:
            symmetry_cfg = dict(symmetry_cfg)
            use_symmetry = symmetry_cfg["use_data_augmentation"] or symmetry_cfg["use_mirror_loss"]
            if not use_symmetry:
                print("Symmetry not used for learning. We will use it for logging instead.")
            if isinstance(symmetry_cfg["data_augmentation_func"], str):
                symmetry_cfg["data_augmentation_func"] = string_to_callable(
                    symmetry_cfg["data_augmentation_func"]
                )
            if symmetry_cfg["use_data_augmentation"] and not callable(
                symmetry_cfg["data_augmentation_func"]
            ):
                raise ValueError(
                    "Data augmentation enabled but the function is not callable:"
                    f" {symmetry_cfg['data_augmentation_func']}"
                )
            self.symmetry = symmetry_cfg

        # optimizer: clip -> direction transform; the -lr scale is applied
        # manually from the carried adaptive learning rate. (A flattened
        # single-vector variant — optax.flatten — was measured at the
        # headline shape and is NOT used: the optimizer accounts for only
        # ~20us of the ~512us minibatch step, so flattening buys nothing and
        # would churn the checkpointed opt_state layout. See
        # benchmarks/roofline_ff.py / README "Throughput".)
        direction = resolve_optimizer(optimizer)()
        if max_grad_norm is not None:
            self.tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), direction)
        else:
            self.tx = direction
        self.rnd_tx = optax.scale_by_adam() if self.rnd is not None else None

    # ------------------------------------------------------------------ init

    def init_train_state(self, key: jax.Array, num_envs: int) -> TrainState:
        k_policy, k_rnd, k_rng = jax.random.split(key, 3)
        policy_state = self.policy.init(k_policy)
        opt_state = self.tx.init(policy_state.params)
        rnd_state = None
        rnd_opt_state = None
        if self.rnd is not None:
            rnd_state = self.rnd.init(k_rnd, num_envs)
            rnd_opt_state = self.rnd_tx.init(rnd_state.predictor)
        return TrainState(
            policy=policy_state,
            opt_state=opt_state,
            lr=jnp.asarray(self.learning_rate, jnp.float32),
            rnd=rnd_state,
            rnd_opt_state=rnd_opt_state,
            it=jnp.zeros((), jnp.int32),
            rng=k_rng,
        )

    def init_collect_state(self, key: jax.Array, env) -> CollectState:
        env_state, obs = env.reset(key)
        return self.init_collect_state_from(env_state, obs, env.num_envs)

    def init_collect_state_from(self, env_state, obs, num_envs: int) -> CollectState:
        return CollectState(
            env_state=env_state,
            obs=obs,
            carry=self.policy.initial_carry(num_envs),
            stats=init_episode_stats(num_envs),
        )

    # --------------------------------------------------------------- collect

    def make_collect_fn(self, env, num_steps_per_env: int) -> Callable:
        """Build the rollout-collection function (one scan over the window).

        Fuses the reference's act / env.step / process_env_step cycle
        (ppo.py:129-169, on_policy_runner.py:100-139) into one XLA program.
        """
        policy = self.policy
        rnd = self.rnd
        gamma = self.gamma

        def step_fn(carry, _):
            ps, rnd_state, env_state, obs, pol_carry, stats, key, acc = carry
            key, k_act = jax.random.split(key)

            # policy forward + sample (reference ppo.py:132-137)
            mean, std, pol_carry = policy.act(ps, obs, pol_carry)
            action = distributions.sample(k_act, mean, std)
            log_p = distributions.log_prob(mean, std, action)
            value, pol_carry = policy.value(ps, obs, pol_carry)

            # env step
            env_state, next_obs, rew, done, extras = env.step(env_state, action)
            done_f = done.astype(jnp.float32)

            # normalizer updates on the post-step obs (reference ppo.py:144-146)
            ps = policy.update_normalization(ps, next_obs)

            # RND intrinsic reward on the post-step obs (reference ppo.py:148-158)
            irew = jnp.zeros_like(rew)
            if rnd is not None:
                rnd_state = rnd.update_normalization(rnd_state, next_obs)
                rnd_state, irew, _ = rnd.get_intrinsic_reward(rnd_state, next_obs)
            total_rew = rew + irew

            # bootstrap on timeouts (reference ppo.py:160-164)
            if "time_outs" in extras:
                total_rew = total_rew + gamma * value * extras["time_outs"].astype(jnp.float32)

            # reset recurrent state of done envs (reference ppo.py:169)
            pol_carry = policy.reset_carry(pol_carry, done)

            # episode bookkeeping, fully on device
            # (replaces on_policy_runner.py:113-139)
            stats, acc = step_episode_stats(stats, acc, rew, irew, done_f)
            log_out = collect_extras_logs(extras)

            outputs = (obs, action, total_rew, done, value, log_p, mean, std, log_out)
            return (ps, rnd_state, env_state, next_obs, pol_carry, stats, key, acc), outputs

        def collect(ts: TrainState, cs: CollectState):
            acc0 = init_episode_acc()
            carry0 = cs.carry
            init = (ts.policy, ts.rnd, cs.env_state, cs.obs, cs.carry, cs.stats, ts.rng, acc0)
            (ps, rnd_state, env_state, obs, pol_carry, stats, key, acc), outs = jax.lax.scan(
                step_fn, init, None, length=num_steps_per_env
            )
            obs_t, actions, rewards, dones, values, log_probs, mu, sigma, log_outs = outs

            rollout = Rollout(
                obs=obs_t,
                actions=actions,
                rewards=rewards,
                dones=dones,
                values=values,
                log_probs=log_probs,
                mu=mu,
                sigma=sigma,
                carry0=carry0 if policy.is_recurrent else None,
            )
            metrics = dict(acc)
            metrics["Policy/mean_noise_std"] = jnp.mean(sigma)
            if rnd is not None:
                metrics["Rnd/weight"] = rnd.current_weight(rnd_state.counter)
            for k, v in log_outs.items():
                metrics[f"extras/{k}"] = jnp.mean(v)

            ts = ts.replace(policy=ps, rnd=rnd_state, rng=key)
            cs = CollectState(env_state=env_state, obs=obs, carry=pol_carry, stats=stats)
            return ts, cs, rollout, metrics

        return collect

    # ---------------------------------------------------------- host collect

    def make_host_collect_fn(self, env, num_steps_per_env: int, bridge=None) -> Callable:
        """Collection loop for host (non-JAX) environments.

        The hybrid analog of the reference's per-step host<->device copies
        (reference on_policy_runner.py:100-139): policy forward and step
        processing are jitted, the env steps on host, and the rollout is
        stacked onto device for the (unchanged) jitted update.

        With a :class:`~rsl_rl_tpu.parallel.host_dp.HostShardingBridge` the
        same loop trains data-parallel: ``env`` is this process's LOCAL env
        shard, every jitted step runs as a global program over the
        data-sharded global batch (so e.g. the normalizer's batch mean is a
        global mean via XLA collectives — math identical to a single-process
        run), and the stacked rollout feeds the unchanged global update. The
        TPU-native counterpart of the reference's per-rank simulators +
        gradient allreduce (reference on_policy_runner.py:353-395,
        ppo.py:441-469).
        """
        import numpy as np

        policy = self.policy
        rnd = self.rnd
        gamma = self.gamma

        from rsl_rl_tpu.parallel.host_dp import converters

        to_device, to_host = converters(bridge)

        @jax.jit
        def act_step(ps, obs, carry, key):
            key, k_act = jax.random.split(key)
            mean, std, carry = policy.act(ps, obs, carry)
            action = distributions.sample(k_act, mean, std)
            log_p = distributions.log_prob(mean, std, action)
            value, carry = policy.value(ps, obs, carry)
            return action, value, log_p, mean, std, carry, key

        @jax.jit
        def process_step(ps, rnd_state, next_obs, value, rew, time_outs, done, carry):
            ps = policy.update_normalization(ps, next_obs)
            irew = jnp.zeros_like(rew)
            if rnd is not None:
                rnd_state = rnd.update_normalization(rnd_state, next_obs)
                rnd_state, irew, _ = rnd.get_intrinsic_reward(rnd_state, next_obs)
            total = rew + irew + gamma * value * time_outs
            carry = policy.reset_carry(carry, done)
            return ps, rnd_state, total, irew, carry

        def collect(ts: TrainState, cs: CollectState):
            from rsl_rl_tpu.algorithms.host_collect import HostEpisodeTracker, stack_trajectory

            ps, rnd_state, key = ts.policy, ts.rnd, ts.rng
            obs, carry = cs.obs, cs.carry
            carry0 = carry
            tracker = HostEpisodeTracker(cs.stats)
            # without RND the intrinsic reward is identically zero: feed the
            # tracker a reused host-side buffer instead of paying a blocking
            # device->host transfer per env step (cf. the distillation loop)
            zero_irew = np.zeros((env.num_envs,), np.float32)
            traj = {k: [] for k in ("obs", "actions", "rewards", "dones", "values",
                                    "log_probs", "mu", "sigma")}
            for _ in range(num_steps_per_env):
                action, value, log_p, mean, std, carry, key = act_step(ps, obs, carry, key)
                next_obs, rew_np, done_np, extras = env.step(to_host(action))
                rew = to_device(np.asarray(rew_np, np.float32))
                done = to_device(np.asarray(done_np))
                time_outs = to_device(
                    np.asarray(extras.get("time_outs", np.zeros_like(done_np)), np.float32)
                )
                next_obs = to_device({k: np.asarray(v) for k, v in next_obs.items()})
                ps, rnd_state, total_rew, irew_dev, carry = process_step(
                    ps, rnd_state, next_obs, value, rew, time_outs, done, carry
                )

                traj["obs"].append(obs)
                traj["actions"].append(action)
                traj["rewards"].append(total_rew)
                traj["dones"].append(done)
                traj["values"].append(value)
                traj["log_probs"].append(log_p)
                traj["mu"].append(mean)
                traj["sigma"].append(std)
                obs = next_obs
                tracker.step(
                    np.asarray(rew_np),
                    to_host(irew_dev) if rnd is not None else zero_irew,
                    done_np,
                    extras,
                )

            stacked = stack_trajectory(traj)
            if bridge is not None:
                stacked = bridge.constrain_time_major(stacked)
            rollout = Rollout(
                **stacked, carry0=carry0 if policy.is_recurrent else None
            )
            metrics = tracker.metrics()
            metrics["Policy/mean_noise_std"] = jnp.mean(rollout.sigma)
            if rnd is not None:
                metrics["Rnd/weight"] = rnd.current_weight(rnd_state.counter)

            ts = ts.replace(policy=ps, rnd=rnd_state, rng=key)
            cs = CollectState(env_state=(), obs=obs, carry=carry, stats=tracker.stats())
            return ts, cs, rollout, metrics

        return collect

    # ---------------------------------------------------------------- update

    def make_update_fn(self) -> Callable:
        """Build the learning-phase function: GAE + epochs x minibatches scan
        (replaces reference ppo.py:171-422)."""
        policy = self.policy
        rnd = self.rnd

        def update(ts: TrainState, cs: CollectState, rollout: Rollout):
            T, N = rollout.num_steps, rollout.num_envs

            # value of the post-rollout obs; for recurrent policies this
            # advances the critic memory, matching the reference's stateful
            # evaluate in compute_returns (ppo.py:171-176)
            last_values, carry = policy.value(ts.policy, cs.obs, cs.carry)
            cs = cs.replace(carry=carry)

            returns, advantages = compute_gae(
                rollout.rewards,
                rollout.values,
                rollout.dones.astype(jnp.float32),
                last_values,
                self.gamma,
                self.lam,
                normalize_advantage=not self.normalize_advantage_per_mini_batch,
            )

            rng, key_perm = jax.random.split(ts.rng)
            ts = ts.replace(rng=rng)

            # "auto" resolves here, where the rollout shape is concrete
            num_mini_batches = resolve_num_mini_batches(
                self.num_mini_batches, T, N, policy.is_recurrent
            )
            nb = N // num_mini_batches

            if policy.is_recurrent:
                data = {
                    "obs": rollout.obs,
                    "actions": rollout.actions,
                    "values": rollout.values,
                    "returns": returns,
                    "advantages": advantages,
                    "log_probs": rollout.log_probs,
                    "mu": rollout.mu,
                    "sigma": rollout.sigma,
                    "resets": rollout.replay_resets(),
                }
                xs = recurrent_minibatch_starts(N, num_mini_batches, self.num_learning_epochs)
            else:
                mb = (T * N) // num_mini_batches
                perm = jax.random.permutation(key_perm, num_mini_batches * mb)
                packed, unpack = pack_minibatch_rows(rollout, returns, advantages, perm)
                starts = jnp.arange(num_mini_batches, dtype=jnp.int32) * mb
                xs = jnp.tile(starts, (self.num_learning_epochs,))

            def minibatch_step(carry, x):
                params, opt_state, lr, rnd_pred, rnd_opt = carry

                if policy.is_recurrent:
                    batch = slice_envs(data, x, nb)
                    batch_carry0 = jax.tree.map(
                        lambda h: jax.lax.dynamic_slice_in_dim(h, x, nb, axis=0),
                        rollout.carry0,
                    )
                else:
                    batch = unpack(jax.lax.dynamic_slice_in_dim(packed, x, mb, axis=0))
                    batch_carry0 = None

                (loss_val, aux), grads = jax.value_and_grad(
                    self._loss, has_aux=True, argnums=(0, 1)
                )(params, rnd_pred, ts.policy, ts.rnd, batch, batch_carry0)
                policy_grads, rnd_grads = grads

                # adaptive-KL learning rate (reference ppo.py:260-294); under
                # a mesh the KL is a global batch mean, so every replica
                # adapts identically — no broadcast needed
                if self.desired_kl is not None and self.schedule == "adaptive":
                    kl_mean = aux["kl"]
                    lr = jnp.where(
                        kl_mean > self.desired_kl * 2.0,
                        jnp.maximum(self.min_lr, lr / 1.5),
                        jnp.where(
                            (kl_mean < self.desired_kl / 2.0) & (kl_mean > 0.0),
                            jnp.minimum(self.max_lr, lr * 1.5),
                            lr,
                        ),
                    )

                updates, opt_state = self.tx.update(policy_grads, opt_state, params)
                # one fused pass per leaf (scale by the carried -lr AND
                # apply), not two (reference lr step: torch optimizer.step())
                params = jax.tree.map(
                    lambda p, u: (p - lr * u).astype(jnp.asarray(p).dtype), params, updates
                )

                if rnd is not None:
                    rnd_updates, rnd_opt = self.rnd_tx.update(rnd_grads, rnd_opt, rnd_pred)
                    rnd_pred = jax.tree.map(
                        lambda p, u: (p - self.rnd_learning_rate * u).astype(
                            jnp.asarray(p).dtype
                        ),
                        rnd_pred,
                        rnd_updates,
                    )

                out = {k: v for k, v in aux.items()}
                out["learning_rate"] = lr
                return (params, opt_state, lr, rnd_pred, rnd_opt), out

            rnd_pred0 = ts.rnd.predictor if rnd is not None else None
            carry_init = (ts.policy.params, ts.opt_state, ts.lr, rnd_pred0, ts.rnd_opt_state)
            (params, opt_state, lr, rnd_pred, rnd_opt), outs = jax.lax.scan(
                minibatch_step, carry_init, xs
            )

            new_policy = ts.policy.replace(params=params)
            new_rnd = ts.rnd.replace(predictor=rnd_pred) if rnd is not None else None
            ts = ts.replace(
                policy=new_policy,
                opt_state=opt_state,
                lr=lr,
                rnd=new_rnd,
                rnd_opt_state=rnd_opt,
                it=ts.it + 1,
            )

            # mean over all epochs x minibatches (reference ppo.py:386-407)
            metrics = {f"Loss/{k}" if not k.startswith("Loss/") else k: jnp.mean(v)
                       for k, v in outs.items() if k != "learning_rate"}
            metrics["Loss/learning_rate"] = outs["learning_rate"][-1]
            return ts, cs, metrics

        return update

    # ------------------------------------------------------------------ loss

    def _loss(self, params, rnd_pred, policy_state: PolicyState, rnd_state, batch, batch_carry0):
        """Per-minibatch PPO loss (reference ppo.py:246-363).

        Shapes: feedforward batches are ``[B, ...]``; recurrent batches are
        ``[T, nb, ...]`` and the policy replays them through its memory. All
        reductions are global means, so the same code serves both — symmetry
        augmentation stacks copies along the batch axis (axis 1 when
        time-major; see modules/symmetry.py).
        """
        policy = self.policy
        ps = policy_state.replace(params=params)

        obs_batch = batch["obs"]
        actions_batch = batch["actions"]
        old_logp = batch["log_probs"]
        old_mu = batch["mu"]
        old_sigma = batch["sigma"]
        target_values = batch["values"]
        returns_batch = batch["returns"]
        advantages_batch = batch["advantages"]
        resets = batch["resets"]

        if self.normalize_advantage_per_mini_batch:
            adv_mean = jnp.mean(advantages_batch)
            adv_std = jnp.std(advantages_batch, ddof=1)
            advantages_batch = (advantages_batch - adv_mean) / (adv_std + 1e-8)

        time_major = policy.is_recurrent
        original_batch = actions_batch.shape[1 if time_major else 0]

        def first(x):
            """The original (non-augmented) part of a batch array."""
            return x[:, :original_batch] if time_major else x[:original_batch]

        def rest(x):
            """The augmented copies of a batch array."""
            return x[:, original_batch:] if time_major else x[original_batch:]

        num_aug = 1
        aug_fn = None
        if self.symmetry is not None and self.symmetry["use_data_augmentation"]:
            # symmetry data augmentation (reference ppo.py:226-244)
            aug_fn = self.symmetry["data_augmentation_func"]
            obs_batch, actions_batch, num_aug = symmetry.apply_augmentation(
                aug_fn, self.symmetry["_env"], obs_batch, actions_batch, time_major
            )
            old_logp = symmetry.tile_batch(old_logp, num_aug, time_major)
            target_values = symmetry.tile_batch(target_values, num_aug, time_major)
            advantages_batch = symmetry.tile_batch(advantages_batch, num_aug, time_major)
            returns_batch = symmetry.tile_batch(returns_batch, num_aug, time_major)
            if time_major:
                resets = symmetry.tile_batch(resets, num_aug, True)
                batch_carry0 = symmetry.tile_carry(batch_carry0, num_aug)

        # one policy call for actor AND critic: lets the recurrent policy fuse
        # its two memory replays into a single Pallas dispatch
        mean, std, value = policy.act_value_seq(ps, obs_batch, batch_carry0, resets)
        logp = distributions.log_prob(mean, std, actions_batch)
        entropy = distributions.entropy(first(std))

        # analytic KL on the original (non-augmented) part (ppo.py:260-269)
        kl = distributions.kl_divergence(
            first(old_mu), first(old_sigma),
            jax.lax.stop_gradient(first(mean)),
            jax.lax.stop_gradient(first(std)),
        )
        kl_mean = jnp.mean(kl)

        # clipped surrogate (ppo.py:296-302)
        ratio = jnp.exp(logp - old_logp)
        surrogate = -advantages_batch * ratio
        surrogate_clipped = -advantages_batch * jnp.clip(
            ratio, 1.0 - self.clip_param, 1.0 + self.clip_param
        )
        surrogate_loss = jnp.mean(jnp.maximum(surrogate, surrogate_clipped))

        # value loss, optionally clipped (ppo.py:304-313)
        if self.use_clipped_value_loss:
            value_clipped = target_values + jnp.clip(
                value - target_values, -self.clip_param, self.clip_param
            )
            value_losses = jnp.square(value - returns_batch)
            value_losses_clipped = jnp.square(value_clipped - returns_batch)
            value_loss = jnp.mean(jnp.maximum(value_losses, value_losses_clipped))
        else:
            value_loss = jnp.mean(jnp.square(returns_batch - value))

        entropy_mean = jnp.mean(entropy)
        loss = (
            surrogate_loss
            + self.value_loss_coef * value_loss
            - self.entropy_coef * entropy_mean
        )

        aux = {
            "value_function": value_loss,
            "surrogate": surrogate_loss,
            "entropy": entropy_mean,
            "kl": kl_mean,
        }

        # symmetry mirror loss (ppo.py:317-348)
        if self.symmetry is not None:
            if aug_fn is None:
                # mirror/logging-only mode: augment now and run the actor on it
                aug_fn = self.symmetry["data_augmentation_func"]
                obs_batch, _, num_aug = symmetry.apply_augmentation(
                    aug_fn, self.symmetry["_env"], obs_batch, None, time_major
                )
                obs_sg = jax.tree.map(jax.lax.stop_gradient, obs_batch)
                if time_major:
                    mean_actions, _ = policy.act_seq(
                        ps,
                        obs_sg,
                        symmetry.tile_carry(batch_carry0, num_aug),
                        symmetry.tile_batch(resets, num_aug, True),
                    )
                else:
                    mean_actions, _ = policy.act_inference(ps, obs_sg, ())
            else:
                # data augmentation already ran: act_seq's mean above covers
                # the full augmented batch with identical params/normalization,
                # so reuse it instead of paying a second actor forward+backward
                mean_actions = mean
            action_mean_orig = first(mean_actions)
            _, actions_mean_symm, _ = symmetry.apply_augmentation(
                aug_fn, self.symmetry["_env"], None, action_mean_orig, time_major
            )
            symmetry_loss = jnp.mean(
                jnp.square(
                    rest(mean_actions)
                    - jax.lax.stop_gradient(rest(actions_mean_symm))
                )
            )
            if self.symmetry["use_mirror_loss"]:
                loss = loss + self.symmetry["mirror_loss_coeff"] * symmetry_loss
            else:
                symmetry_loss = jax.lax.stop_gradient(symmetry_loss)
            aux["symmetry"] = symmetry_loss

        # RND predictor loss on the original batch (ppo.py:350-363)
        if self.rnd is not None:
            orig_obs = jax.tree.map(first, obs_batch)
            rnd_loss = self.rnd.predictor_loss(rnd_pred, rnd_state, orig_obs)
            loss = loss + rnd_loss
            aux["rnd"] = rnd_loss

        return loss, aux
