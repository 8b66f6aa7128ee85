"""On-policy training runner — the user-facing API.

TPU-native counterpart of the reference ``OnPolicyRunner``
(reference: rsl_rl/runners/on_policy_runner.py:22-460). The Python-side loop
only dispatches two jitted functions per iteration (collect, update) and reads
back a small metrics dict — all rollout stepping, bookkeeping, GAE and
minibatch optimization stay on device. Multi-device data parallelism is
configured by sharding the collect state along a ``("data",)`` mesh; there is
no rank logic because every replica computes identical (replicated) training
state by construction.
"""

from __future__ import annotations

import os
import time
import warnings
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

import rsl_rl_tpu
from rsl_rl_tpu.algorithms.ppo import PPO
from rsl_rl_tpu.env.vec_env import VecEnv
from rsl_rl_tpu.modules.rnd import resolve_rnd_config
from rsl_rl_tpu.modules.symmetry import resolve_symmetry_config
from rsl_rl_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicated,
    shard_tree,
)
from rsl_rl_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    restore_typed,
    save_checkpoint,
)
from rsl_rl_tpu.utils.git_state import store_code_state
from rsl_rl_tpu.utils.registry import resolve
from rsl_rl_tpu.utils.resolvers import resolve_obs_groups
from rsl_rl_tpu.utils.writers import make_writer


def _resolve_device(device):
    """Map None / a jax.Device / a string like "cpu" or "tpu:0" to a device."""
    if device is None or not isinstance(device, str):
        return device
    kind, _, idx = device.partition(":")
    matches = jax.devices(kind) if kind else jax.devices()
    return matches[int(idx) if idx else 0]


def _blocking(fn):
    """Wrap a dispatch so it waits for its outputs (see CPU note in __init__)."""

    def wrapped(*args, **kwargs):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        return out

    return wrapped


class OnPolicyRunner:
    """On-policy runner for training and evaluation of actor-critic methods."""

    training_type = "rl"

    def __init__(self, env: VecEnv, train_cfg: dict, log_dir: str | None = None, device=None):
        # shallow-copy so the caller's config template is never mutated (the
        # runner writes resolved obs_groups back into its own copy below)
        self.cfg = dict(train_cfg)
        self.alg_cfg = dict(train_cfg["algorithm"])
        self.policy_cfg = dict(train_cfg["policy"])
        self.env = env
        self.log_dir = log_dir
        self.device = device

        self.num_steps_per_env = self.cfg["num_steps_per_env"]
        self.save_interval = self.cfg["save_interval"]

        # ---- host (non-JAX) envs use the hybrid collection loop
        self.is_jax_env = getattr(env, "is_jax", True)

        # ---- device mesh (data parallelism; SURVEY.md §5.8). By default the
        # mesh spans all devices; a `device` argument (API parity with the
        # reference's cuda:N pinning) restricts it to that single device.
        # `model_parallel_size: M` in the runner config additionally shards
        # wide-policy MLP trunks across an M-way `model` mesh axis
        # (parallel/tp.py; no reference equivalent — the reference is
        # DDP-only, reference ppo.py:428-469).
        self.model_parallel_size = int(self.cfg.get("model_parallel_size", 1))
        if self.model_parallel_size > 1 and not self.is_jax_env:
            raise ValueError(
                "model_parallel_size > 1 requires a JAX-native env: host envs"
                " run the hybrid collection loop whose train state is never"
                " mesh-sharded, so tensor parallelism would be silently inert."
            )
        mesh_devices = None if device is None else [_resolve_device(device)]
        if self.model_parallel_size > 1:
            from rsl_rl_tpu.parallel.tp import make_tp_mesh

            self.mesh = make_tp_mesh(self.model_parallel_size, mesh_devices)
        else:
            self.mesh = make_mesh(mesh_devices)
        self.num_devices = len(self.mesh.devices.flatten())
        num_data_shards = self.mesh.shape.get("data", 1)

        # Host (non-JAX) envs train data-parallel through a sharding bridge:
        # each process steps its LOCAL env shard, jitted steps run globally
        # over the data-sharded batch (the TPU analog of the reference's
        # per-rank simulators + gradient allreduce, on_policy_runner.py:353-395,
        # ppo.py:441-469). env.num_envs is the PER-PROCESS count; the global
        # batch is num_envs * process_count.
        self._host_bridge = None
        if not self.is_jax_env and (self.num_devices > 1 or jax.process_count() > 1):
            if jax.process_count() == 1 and env.num_envs % num_data_shards != 0:
                # Auto-bridging onto all visible devices must not break
                # configs that trained fine single-device before data-parallel
                # host collection existed; an indivisible env count in a
                # single process falls back instead of failing construction.
                # (Multi-process runs fail loudly below: silently dropping DP
                # there would train N independent runs.)
                warnings.warn(
                    f"host env count ({env.num_envs}) is not divisible by the"
                    f" visible device count ({num_data_shards}); training on a"
                    " single device. Make num_envs divisible to train"
                    " data-parallel across devices."
                )
                self.mesh = make_mesh([self.mesh.devices.flatten()[0]])
                self.num_devices = 1
                num_data_shards = 1
            else:
                from rsl_rl_tpu.parallel.host_dp import HostShardingBridge

                self._host_bridge = HostShardingBridge(self.mesh)
        self.num_global_envs = env.num_envs * (
            jax.process_count() if not self.is_jax_env else 1
        )
        if self.num_global_envs % num_data_shards != 0:
            raise ValueError(
                f"global env count ({self.num_global_envs}) must be divisible by"
                f" the data-axis size ({num_data_shards}) for data-parallel"
                " sharding."
            )

        # ---- RNG
        seed = int(self.cfg.get("seed", 1))
        key = jax.random.PRNGKey(seed)
        self._key, key_env, key_state = jax.random.split(key, 3)

        # ---- probe observations + resolve obs sets
        # (reference on_policy_runner.py:40-44)
        if self.is_jax_env:
            self._env_state0, obs = env.reset(key_env)
            obs_local = None
        else:
            self._env_state0 = ()
            # seed offset by process index: each process's env shard must
            # explore independently (reference: per-rank seeding via LOCAL_RANK)
            obs_local = env.reset(seed=seed + jax.process_index())
            obs = {k: jnp.asarray(v) for k, v in obs_local.items()}
        default_sets = ["critic"] if self.training_type == "rl" else ["teacher"]
        if self.training_type == "rl" and self.alg_cfg.get("rnd_cfg") is not None:
            default_sets.append("rnd_state")
        self.cfg["obs_groups"] = resolve_obs_groups(obs, self.cfg["obs_groups"], default_sets)

        # ---- construct policy + algorithm (reference :397-436)
        self.alg = self._construct_algorithm(obs)

        # ---- initial train/collect state, sharded over the mesh
        ts = self.alg.init_train_state(key_state, self.num_global_envs)
        if self._host_bridge is not None:
            from rsl_rl_tpu.algorithms.ppo import CollectState, init_episode_stats

            ts = self._shard_train_state(ts)
            # obs is this process's local shard -> global data-sharded; the
            # recurrent carry lives globally (it is produced by global jitted
            # steps); episode stats stay process-local (reference rank-0
            # logging semantics, on_policy_runner.py:51)
            cs = CollectState(
                env_state=(),
                obs=self._host_bridge.to_global(
                    {k: np.asarray(v) for k, v in obs_local.items()}
                ),
                carry=shard_tree(
                    self.alg.policy.initial_carry(self.num_global_envs),
                    data_sharding(self.mesh),
                ),
                stats=init_episode_stats(env.num_envs),
            )
        else:
            cs = self.alg.init_collect_state_from(self._env_state0, obs, env.num_envs)
            if self.num_devices > 1:
                ts = self._shard_train_state(ts)
                cs = shard_tree(cs, data_sharding(self.mesh))
        self.train_state = ts
        self.collect_state = cs

        # ---- jitted step functions
        # Note: the collect state (env state / obs / carry) is deliberately
        # NOT donated — donating it makes scalar outputs untransferable on the
        # tunneled TPU backend (INVALID_ARGUMENT on device_get), and the
        # buffers are small anyway. Train state and rollout are donated.
        if self.is_jax_env:
            self._collect = jax.jit(
                self.alg.make_collect_fn(env, self.num_steps_per_env), donate_argnums=(0,)
            )
        else:
            # host env: Python step loop with jitted act/process steps
            # (global programs over the data-sharded batch when bridged)
            self._collect = self.alg.make_host_collect_fn(
                env, self.num_steps_per_env, bridge=self._host_bridge
            )
        self._update = jax.jit(self.alg.make_update_fn(), donate_argnums=(0, 2))

        # Fused mode: collect + update compiled into ONE XLA program (cfg
        # "fuse_iteration"). Saves a dispatch round-trip per iteration and lets
        # XLA schedule across the phase boundary; the console/writer then
        # report a single combined iteration time (no collection/learn split).
        # DEFAULT ON for JAX envs on TPU — each dispatch costs ~0.4 ms on a
        # tunneled backend, pure overhead for a fully-on-device iteration.
        # (CPU default stays off: the split path is the better-instrumented
        # debug surface, and multi-device CPU prefers bounded small programs.)
        fuse_default = jax.default_backend() == "tpu"
        self.fuse_iteration = (
            bool(self.cfg.get("fuse_iteration", fuse_default)) and self.is_jax_env
        )

        # "iterations_per_dispatch": K > 1 runs K fused iterations as one
        # lax.scan program with stacked per-iteration metrics — one dispatch
        # + one device_get per K iterations. This amortizes host/tunnel
        # latency, the dominant cost for small configs (e.g. 64-env Pendulum
        # is host-latency-bound at K=1). Logging stays per-iteration (from
        # the stacked metrics); checkpoints land at dispatch-group
        # boundaries. Requires a JAX env (host envs step on host by nature).
        self.iterations_per_dispatch = int(self.cfg.get("iterations_per_dispatch", 1))
        if self.iterations_per_dispatch > 1 and not self.is_jax_env:
            raise ValueError(
                "iterations_per_dispatch > 1 requires a JAX-native env: host"
                " envs step on host, so iterations cannot batch into one"
                " device program."
            )
        if self.iterations_per_dispatch > 1:
            self.fuse_iteration = True
        if self.fuse_iteration:
            collect_fn = self.alg.make_collect_fn(env, self.num_steps_per_env)
            update_fn = self.alg.make_update_fn()

            def _iteration(ts, cs):
                ts, cs, rollout, cm = collect_fn(ts, cs)
                ts, cs, um = update_fn(ts, cs, rollout)
                return ts, cs, {**cm, **um}

            self._train_iteration = jax.jit(_iteration, donate_argnums=(0,))

            def _k_iterations(ts, cs, k: int):
                def body(carry, _):
                    ts, cs = carry
                    ts, cs, m = _iteration(ts, cs)
                    return (ts, cs), m

                (ts, cs), ms = jax.lax.scan(body, (ts, cs), None, length=k)
                return ts, cs, ms

            import functools

            self._k_iterations_cache: dict[int, Any] = {}
            self._make_k_program = lambda k: jax.jit(
                functools.partial(_k_iterations, k=k), donate_argnums=(0,)
            )

        # Periodic deterministic evaluation (no reference counterpart — its
        # users hand-roll play scripts on top of get_inference_policy,
        # reference on_policy_runner.py:326-330): cfg "eval_interval": N
        # rolls a FRESH env copy with act_inference every N iterations as one
        # jitted lax.scan program and logs Eval/* scalars. "eval_num_steps"
        # bounds the rollout (default: the env's max episode length, so every
        # eval env can complete at least one episode).
        self.eval_interval = int(self.cfg.get("eval_interval", 0))
        if self.eval_interval > 0:
            if not self.is_jax_env:
                raise ValueError(
                    "eval_interval requires a JAX-native env: host envs cannot"
                    " roll a second env copy inside a jitted program (evaluate"
                    " host-env policies offline, e.g. examples/play.py)."
                )
            if self.log_dir is None:
                # learn() gates evaluation on a writer existing, so without a
                # log_dir the eval program would be built but never run —
                # surface that instead of silently doing nothing
                warnings.warn(
                    "eval_interval is set but log_dir is None: Eval/* scalars"
                    " have nowhere to go and evaluation will not run. Pass a"
                    " log_dir to enable periodic evaluation.",
                    UserWarning,
                    stacklevel=2,
                )
            from rsl_rl_tpu.utils.evaluation import make_eval_program

            default_steps = int(np.max(np.asarray(env.max_episode_length)))
            eval_steps = int(self.cfg.get("eval_num_steps", default_steps))
            self._eval_prog = jax.jit(
                make_eval_program(env, self.alg.policy, eval_steps)
            )
            # fold_in rather than split: the eval stream must not perturb the
            # training streams (turning eval on cannot change training math)
            self._eval_key = jax.random.fold_in(self._key, 0xEA1)

        # On the CPU backend with >1 device, unbounded async dispatch of
        # programs containing cross-partition collectives can deadlock: the
        # client's execution thread pool fills with executions whose partner
        # partition was never scheduled, and every thread parks at a collective
        # rendezvous (XLA aborts after its 40s termination timeout). Bounding
        # the pipeline to one in-flight program per call avoids the
        # mismatched-schedule state entirely. TPU runtimes schedule one program
        # per core in order, so this throttle is CPU-only.
        if self.num_devices > 1 and jax.devices()[0].platform == "cpu":
            self._collect = _blocking(self._collect)
            self._update = _blocking(self._update)
            if self.fuse_iteration:
                self._train_iteration = _blocking(self._train_iteration)

        # ---- logging state
        self.disable_logs = jax.process_index() != 0
        self.writer = None
        self.logger_type = self.cfg.get("logger", "tensorboard")
        self.tot_timesteps = 0
        self.tot_time = 0.0
        self.current_learning_iteration = 0
        self.git_status_repos = [rsl_rl_tpu.__file__]
        # 100-episode reward/length windows (reference uses per-episode
        # deques, on_policy_runner.py:76-139; we aggregate per iteration on
        # device and window host-side by episode count)
        self._ep_window = deque()  # tuples (rew_sum, len_sum, erew, irew, count)

    # ----------------------------------------------------------- construction

    def _construct_algorithm(self, obs) -> PPO:
        """Build policy + algorithm from config dicts via the registry
        (replaces the reference's ``eval()`` dispatch, :418-424)."""
        self.alg_cfg = resolve_rnd_config(self.alg_cfg, obs, self.cfg["obs_groups"], self.env)
        self.alg_cfg = resolve_symmetry_config(self.alg_cfg, self.env)

        # deprecated `empirical_normalization` shim (reference :406-415)
        if self.cfg.get("empirical_normalization") is not None:
            warnings.warn(
                "The `empirical_normalization` parameter is deprecated. Please set"
                " `actor_obs_normalization` and `critic_obs_normalization` as part of the `policy`"
                " configuration instead.",
                DeprecationWarning,
            )
            if self.policy_cfg.get("actor_obs_normalization") is None:
                self.policy_cfg["actor_obs_normalization"] = self.cfg["empirical_normalization"]
            if self.policy_cfg.get("critic_obs_normalization") is None:
                self.policy_cfg["critic_obs_normalization"] = self.cfg["empirical_normalization"]

        policy_class = resolve("policy", self.policy_cfg.pop("class_name"))
        policy = policy_class(obs, self.cfg["obs_groups"], self.env.num_actions, **self.policy_cfg)

        alg_class = resolve("algorithm", self.alg_cfg.pop("class_name"))
        return alg_class(policy, **self.alg_cfg)

    # ----------------------------------------------------------------- train

    def learn(self, num_learning_iterations: int, init_at_random_ep_len: bool = False) -> None:
        self._prepare_logging_writer()

        if init_at_random_ep_len:
            if self.is_jax_env:
                self._key, k = jax.random.split(self._key)
                env_state = self.env.randomize_episode_length(self.collect_state.env_state, k)
                self.collect_state = self.collect_state.replace(env_state=env_state)
            elif getattr(self.env, "episode_length_buf", None) is not None:
                # Isaac-style host simulators expose a writable elapsed-step
                # buffer; randomize it like the reference
                # (reference runners/on_policy_runner.py:66-69).
                self._key, k = jax.random.split(self._key)
                # decorrelate host-DP shards: every process consumes self._key
                # in lock-step (one split), then folds its own index in — the
                # same scheme env.reset uses, so shards don't share episode
                # phases
                k = jax.random.fold_in(k, jax.process_index())
                buf = self.env.episode_length_buf
                values = np.asarray(
                    jax.random.randint(
                        k, np.shape(buf), 0, int(np.max(self.env.max_episode_length))
                    )
                )
                if isinstance(buf, np.ndarray) and buf.flags.writeable:
                    # write THROUGH the attribute: an env exposing the buffer
                    # as a view into its internal sim state must see the write
                    buf[:] = values.astype(buf.dtype)
                else:
                    # read-only/foreign buffer: replace the attribute (the
                    # env must re-read it each step, see HostVecEnv docs)
                    self.env.episode_length_buf = values.astype(
                        np.asarray(buf).dtype
                    )
            else:
                warnings.warn(
                    "init_at_random_ep_len requires the host env to expose an"
                    " episode_length_buf (reference env/vec_env.py:35); ignoring."
                )

        # optional jax.profiler trace window (SURVEY.md §5.1 TPU equivalent of
        # the reference's wall-clock-only perf accounting): cfg
        # "profiler_trace_iterations": [first, last] captures those iterations
        # into <log_dir>/profile for xprof/tensorboard.
        trace_window = self.cfg.get("profiler_trace_iterations")

        start_iter = self.current_learning_iteration
        tot_iter = start_iter + num_learning_iterations

        if self.iterations_per_dispatch > 1:
            self._learn_k_dispatch(start_iter, tot_iter, trace_window)
            return

        for it in range(start_iter, tot_iter):
            if trace_window and it == trace_window[0] and self.log_dir:
                jax.profiler.start_trace(os.path.join(self.log_dir, "profile"))
                self._trace_active = True
            # Timing syncs on the metric fetch, not block_until_ready: on
            # tunneled/async backends block_until_ready can return before the
            # device work completes, while a value transfer cannot.
            if self.fuse_iteration:
                start = time.time()
                ts, cs, m = self._train_iteration(self.train_state, self.collect_state)
                m = jax.device_get(m)
                collection_time = time.time() - start
                learn_time = 0.0
            else:
                start = time.time()
                ts, cs, rollout, cm = self._collect(self.train_state, self.collect_state)
                cm = jax.device_get(cm)
                collection_time = time.time() - start

                start = time.time()
                ts, cs, um = self._update(ts, cs, rollout)
                um = jax.device_get(um)
                learn_time = time.time() - start
                m = {**cm, **um}

            self.train_state, self.collect_state = ts, cs
            self.current_learning_iteration = it

            # guard on the start having fired in THIS run: a resume past
            # trace_window[0] (start_iter > window start) must not call
            # stop_trace without a start (RuntimeError kills the run)
            if trace_window and it == trace_window[1] and getattr(self, "_trace_active", False):
                jax.profiler.stop_trace()
                self._trace_active = False

            metrics = {k: float(v) for k, v in m.items()}
            if self.log_dir is not None and not self.disable_logs:
                self._log(it, start_iter, tot_iter, metrics, collection_time, learn_time)
                if it % self.save_interval == 0:
                    self.save(os.path.join(self.log_dir, f"model_{it}.ckpt"))
                if self.eval_interval and it % self.eval_interval == 0:
                    self._run_eval(it)
            if it == start_iter and self.log_dir is not None and not self.disable_logs:
                git_file_paths = store_code_state(self.log_dir, self.git_status_repos)
                if self.logger_type in ["wandb", "neptune"] and git_file_paths:
                    for path in git_file_paths:
                        self.writer.save_file(path)

        if self.log_dir is not None and not self.disable_logs:
            self.save(os.path.join(self.log_dir, f"model_{self.current_learning_iteration}.ckpt"))
        if self.writer is not None:
            self.writer.flush()

    def _learn_k_dispatch(self, start_iter: int, tot_iter: int, trace_window) -> None:
        """K-iterations-per-program training: ``lax.scan`` over K fused
        iterations, one dispatch + one metrics ``device_get`` per K. Logging
        is still per-iteration (from the stacked metrics); checkpoints land
        at dispatch-group boundaries (device state only exists there)."""
        it = start_iter
        first_group = True
        while it < tot_iter:
            k = min(self.iterations_per_dispatch, tot_iter - it)
            if trace_window and it <= trace_window[0] < it + k and self.log_dir:
                jax.profiler.start_trace(os.path.join(self.log_dir, "profile"))
                self._trace_active = True
            start = time.time()
            if k == self.iterations_per_dispatch:
                prog = self._k_iterations_cache.get(k)
                if prog is None:
                    prog = self._k_iterations_cache[k] = self._make_k_program(k)
                ts, cs, ms = prog(self.train_state, self.collect_state)
                ms = jax.device_get(ms)
            else:
                # remainder group: run the tail through the single-iteration
                # fused program instead of compiling a one-shot k'-step scan
                # that would execute exactly once
                ts, cs = self.train_state, self.collect_state
                tail = []
                for _ in range(k):
                    ts, cs, m = self._train_iteration(ts, cs)
                    tail.append(jax.device_get(m))
                ms = {key: np.asarray([t[key] for t in tail]) for key in tail[0]}
            elapsed = time.time() - start
            self.train_state, self.collect_state = ts, cs
            if trace_window and it <= trace_window[1] < it + k and getattr(self, "_trace_active", False):
                jax.profiler.stop_trace()
                self._trace_active = False

            save_due = False
            eval_due = False
            for j in range(k):
                self.current_learning_iteration = it + j
                metrics = {key: float(v[j]) for key, v in ms.items()}
                if self.log_dir is not None and not self.disable_logs:
                    self._log(it + j, start_iter, tot_iter, metrics, elapsed / k, 0.0)
                    if (it + j) % self.save_interval == 0:
                        save_due = True
                    if self.eval_interval and (it + j) % self.eval_interval == 0:
                        eval_due = True
            if save_due and self.log_dir is not None and not self.disable_logs:
                self.save(
                    os.path.join(self.log_dir, f"model_{self.current_learning_iteration}.ckpt")
                )
            if eval_due and self.log_dir is not None and not self.disable_logs:
                # device state only exists at dispatch-group boundaries, so
                # the eval reflects the group's final parameters
                self._run_eval(self.current_learning_iteration)
            if first_group and self.log_dir is not None and not self.disable_logs:
                git_file_paths = store_code_state(self.log_dir, self.git_status_repos)
                if self.logger_type in ["wandb", "neptune"] and git_file_paths:
                    for path in git_file_paths:
                        self.writer.save_file(path)
            first_group = False
            it += k

        if self.log_dir is not None and not self.disable_logs:
            self.save(os.path.join(self.log_dir, f"model_{self.current_learning_iteration}.ckpt"))
        if self.writer is not None:
            self.writer.flush()

    # --------------------------------------------------------------- logging

    def _run_eval(self, it: int) -> None:
        """One deterministic evaluation rollout (fresh envs, ``act_inference``
        actions); logs ``Eval/*`` scalars. The eval key is derived per
        iteration from a stream independent of training, so results are
        reproducible and training numerics are unaffected."""
        m = jax.device_get(
            self._eval_prog(
                self.train_state.policy, jax.random.fold_in(self._eval_key, it)
            )
        )
        count = float(m["Eval/episode_count"])
        self.writer.add_scalar("Eval/episode_count", count, it)
        if count > 0:
            for key in (
                "Eval/mean_reward",
                "Eval/mean_episode_length",
                "Eval/min_return",
                "Eval/max_return",
            ):
                self.writer.add_scalar(key, float(m[key]), it)
            print(
                f"Evaluation at iteration {it}: mean return"
                f" {float(m['Eval/mean_reward']):.2f} over {int(count)}"
                f" episodes (deterministic policy)"
            )
        else:
            print(
                f"Evaluation at iteration {it}: no episode completed within"
                " the eval budget (raise eval_num_steps)"
            )

    def _episode_window_stats(self, metrics: dict) -> tuple[float, float, float, float, float]:
        """Maintain an ~100-episode trailing window from per-iteration
        aggregates and return its means."""
        self._ep_window.append(
            (
                metrics.get("ep_reward_sum", 0.0),
                metrics.get("ep_length_sum", 0.0),
                metrics.get("ep_ereward_sum", 0.0),
                metrics.get("ep_ireward_sum", 0.0),
                metrics.get("ep_count", 0.0),
            )
        )
        while (
            len(self._ep_window) > 1
            and sum(e[4] for e in self._ep_window) - self._ep_window[0][4] >= 100
        ):
            self._ep_window.popleft()
        count = sum(e[4] for e in self._ep_window)
        if count == 0:
            return 0.0, 0.0, 0.0, 0.0, 0.0
        return (
            sum(e[0] for e in self._ep_window) / count,
            sum(e[1] for e in self._ep_window) / count,
            sum(e[2] for e in self._ep_window) / count,
            sum(e[3] for e in self._ep_window) / count,
            count,
        )

    def _log(self, it, start_iter, tot_iter, metrics, collection_time, learn_time, width=80, pad=35):
        # global batch per iteration: T * N * world (reference
        # on_policy_runner.py:179 multiplies by world_size the same way)
        collection_size = self.num_steps_per_env * self.num_global_envs
        self.tot_timesteps += collection_size
        iteration_time = collection_time + learn_time
        self.tot_time += iteration_time
        fps = int(collection_size / iteration_time)

        mean_reward, mean_ep_len, mean_erew, mean_irew, ep_count = self._episode_window_stats(metrics)

        loss_items = {
            k.removeprefix("Loss/"): v for k, v in metrics.items() if k.startswith("Loss/")
        }
        for name, value in loss_items.items():
            self.writer.add_scalar(f"Loss/{name}", value, it)
        mean_std = metrics.get("Policy/mean_noise_std", 0.0)
        self.writer.add_scalar("Policy/mean_noise_std", mean_std, it)
        self.writer.add_scalar("Perf/total_fps", fps, it)
        self.writer.add_scalar("Perf/collection time", collection_time, it)
        self.writer.add_scalar("Perf/learning_time", learn_time, it)
        for k, v in metrics.items():
            if k.startswith("extras/"):
                key = k.removeprefix("extras/")
                tag = key if "/" in key else f"Episode/{key}"
                self.writer.add_scalar(tag, v, it)
        if "Rnd/weight" in metrics:
            self.writer.add_scalar("Rnd/weight", metrics["Rnd/weight"], it)
        if ep_count > 0:
            if "Rnd/weight" in metrics:
                self.writer.add_scalar("Rnd/mean_extrinsic_reward", mean_erew, it)
                self.writer.add_scalar("Rnd/mean_intrinsic_reward", mean_irew, it)
            self.writer.add_scalar("Train/mean_reward", mean_reward, it)
            self.writer.add_scalar("Train/mean_episode_length", mean_ep_len, it)
            if self.logger_type != "wandb":
                self.writer.add_scalar("Train/mean_reward/time", mean_reward, self.tot_time)
                self.writer.add_scalar("Train/mean_episode_length/time", mean_ep_len, self.tot_time)

        header = f" \033[1m Learning iteration {it}/{tot_iter} \033[0m "
        log_string = (
            f"""{'#' * width}\n"""
            f"""{header.center(width, ' ')}\n\n"""
            f"""{'Computation:':>{pad}} {fps:.0f} steps/s (collection: {collection_time:.3f}s, learning {learn_time:.3f}s)\n"""
            f"""{'Mean action noise std:':>{pad}} {mean_std:.2f}\n"""
        )
        for name, value in loss_items.items():
            if name in ("kl", "learning_rate"):
                continue
            log_string += f"""{f'Mean {name} loss:':>{pad}} {value:.4f}\n"""
        if ep_count > 0 and "Rnd/weight" in metrics:
            # extrinsic/intrinsic split in the console banner for RND runs
            # (reference on_policy_runner.py:254-258)
            log_string += f"""{'Mean extrinsic reward:':>{pad}} {mean_erew:.2f}\n"""
            log_string += f"""{'Mean intrinsic reward:':>{pad}} {mean_irew:.2f}\n"""
        if ep_count > 0:
            log_string += f"""{'Mean reward:':>{pad}} {mean_reward:.2f}\n"""
            log_string += f"""{'Mean episode length:':>{pad}} {mean_ep_len:.2f}\n"""
        log_string += (
            f"""{'-' * width}\n"""
            f"""{'Total timesteps:':>{pad}} {self.tot_timesteps}\n"""
            f"""{'Iteration time:':>{pad}} {iteration_time:.2f}s\n"""
            f"""{'Time elapsed:':>{pad}} {time.strftime('%H:%M:%S', time.gmtime(self.tot_time))}\n"""
            f"""{'ETA:':>{pad}} {time.strftime('%H:%M:%S', time.gmtime(self.tot_time / (it - start_iter + 1) * (tot_iter - it - 1)))}\n"""
        )
        print(log_string)

    def _prepare_logging_writer(self) -> None:
        if self.log_dir is not None and self.writer is None and not self.disable_logs:
            self.writer = make_writer(self.logger_type, self.log_dir, self.cfg)
            if self.logger_type in ("wandb", "neptune"):
                self.writer.log_config(self.env.cfg, self.cfg, self.alg_cfg, self.policy_cfg)

    # ----------------------------------------------------------- checkpoints

    def _shard_train_state(self, ts):
        """Place the train state on the mesh: replicated (DP) or with MLP
        trunks model-sharded when ``model_parallel_size > 1``."""
        if self.model_parallel_size > 1:
            from rsl_rl_tpu.parallel.tp import shard_tree_tp

            return shard_tree_tp(ts, self.mesh)
        return shard_tree(ts, replicated(self.mesh))

    def save(self, path: str, infos=None) -> None:
        """Save the train state (reference on_policy_runner.py:289-305).

        Writes are synchronous: a failing save (disk full, permissions)
        raises here instead of being discovered at resume time.
        """
        ts = self.train_state
        state = {
            "model": ts.policy,
            "opt_state": ts.opt_state,
            "lr": ts.lr,
            "iter": int(self.current_learning_iteration),
            "infos": infos,
        }
        if ts.rnd is not None:
            state["rnd"] = ts.rnd
            state["rnd_opt_state"] = ts.rnd_opt_state
        uploads = (
            self.logger_type in ["neptune", "wandb"] and not self.disable_logs and self.writer
        )
        save_checkpoint(path, state)
        if uploads:
            self.writer.save_model(path, self.current_learning_iteration)

    def load(self, path: str, load_optimizer: bool = True, map_location=None):
        """Restore a checkpoint; honors the resume-flag protocol
        (reference on_policy_runner.py:307-324).

        The checkpoint holds pure state dicts (see utils/checkpoint.py);
        entries are restored into the live state's types. The model entry
        falls back to its raw state dict when it does not structurally match
        the current policy — that is the teacher-bootstrap case, which
        ``load_state_dict`` remaps itself (reference student_teacher.py:168-206).
        """
        from flax import serialization

        ts = self.train_state
        loaded = load_checkpoint(path)
        structural_err = None
        try:
            loaded_model = serialization.from_state_dict(
                ts.policy, loaded["model"], name="model"
            )
        except (KeyError, ValueError) as err:
            # structurally different model state: usually the
            # teacher-bootstrap case — load_state_dict remaps the raw state
            # dict itself. Remember the original error so a checkpoint that
            # ALSO fails the remap (i.e. is genuinely incompatible/corrupted)
            # surfaces both causes instead of a bare remap error.
            structural_err = err
            loaded_model = loaded["model"]
        try:
            new_policy, resumed = self.alg.policy.load_state_dict(ts.policy, loaded_model)
        except Exception as remap_err:
            if structural_err is not None:
                raise ValueError(
                    f"Checkpoint {path!r} neither restores into the configured"
                    f" policy (typed restore: {structural_err}) nor remaps as a"
                    f" teacher bootstrap ({remap_err}); it is incompatible with"
                    " this configuration or corrupted."
                ) from remap_err
            raise
        if resumed:
            # strict typed restore of the training-state extras (only on a
            # true resume — a teacher-bootstrap checkpoint's extras belong to
            # the teacher's algorithm and are discarded, not restored)
            loaded = restore_typed(
                loaded,
                {"opt_state": ts.opt_state, "lr": ts.lr, "rnd": ts.rnd,
                 "rnd_opt_state": ts.rnd_opt_state},
            )
        ts = ts.replace(policy=new_policy)
        if ts.rnd is not None and resumed:
            # resuming an RND run requires the RND state; restore it strictly
            # (the reference's rnd.load_state_dict(loaded["rnd_state_dict"])
            # likewise fails loudly on absence/mismatch)
            if "rnd" not in loaded:
                raise ValueError(
                    f"Checkpoint {path} has no RND state but this run has RND enabled;"
                    " it was saved by a non-RND configuration."
                )
            from rsl_rl_tpu.modules.policy import check_state_compatible

            check_state_compatible(ts.rnd, loaded["rnd"], "RND state")
            ts = ts.replace(rnd=loaded["rnd"])
        if load_optimizer and resumed:
            ts = ts.replace(opt_state=loaded["opt_state"], lr=jnp.asarray(loaded["lr"]))
            if ts.rnd is not None and "rnd_opt_state" in loaded:
                ts = ts.replace(rnd_opt_state=loaded["rnd_opt_state"])
        if resumed:
            self.current_learning_iteration = loaded["iter"]
            ts = ts.replace(it=jnp.asarray(loaded["iter"], jnp.int32))
        ts = jax.tree.map(jnp.asarray, ts)
        if self.num_devices > 1:
            ts = self._shard_train_state(ts)
        self.train_state = ts
        return loaded["infos"]

    def load_latest(self, log_dir: str | None = None) -> bool:
        """Resume from the newest ``model_<it>.ckpt`` in ``log_dir`` (defaults
        to this runner's log dir). Returns False when no checkpoint exists —
        the auto-resume hook for preempted pod jobs (SURVEY.md §5.3)."""
        path = latest_checkpoint(log_dir or self.log_dir or "")
        if path is None:
            return False
        self.load(path)
        return True

    # ------------------------------------------------------------- inference

    def get_inference_policy(self, device=None):
        """Return a deterministic policy callable ``obs_dict -> action``
        (reference on_policy_runner.py:326-330). For recurrent policies the
        returned callable keeps its hidden state internally; call its
        ``.reset(dones)`` between episodes. ``device`` (a jax.Device or a
        string like ``"cpu"``/``"tpu:0"``) pins the inference computation."""
        policy = self.alg.policy
        ps = self.train_state.policy
        target = _resolve_device(device)
        if target is not None:
            ps = jax.device_put(ps, target)

        infer = jax.jit(lambda ps_, obs, carry: policy.act_inference(ps_, obs, carry))

        def _fresh_carry():
            carry = policy.initial_carry(self.env.num_envs)
            return jax.device_put(carry, target) if target is not None else carry

        carry_holder = {"carry": _fresh_carry()}

        def policy_fn(obs):
            action, carry_holder["carry"] = infer(ps, obs, carry_holder["carry"])
            return action

        def reset(dones=None):
            if dones is None:
                carry_holder["carry"] = _fresh_carry()
            else:
                carry_holder["carry"] = policy.reset_carry(carry_holder["carry"], dones)

        policy_fn.reset = reset
        return policy_fn

    # ------------------------------------------------------------------ misc

    def train_mode(self) -> None:
        """API parity no-op: normalizer updates happen inside the jitted
        collect; inference paths never mutate state."""

    def eval_mode(self) -> None:
        """API parity no-op (see ``train_mode``)."""

    def add_git_repo_to_log(self, repo_file_path: str) -> None:
        self.git_status_repos.append(repo_file_path)
