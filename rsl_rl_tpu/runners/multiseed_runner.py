"""Multi-seed training runner: N independent seeds, one batched program.

Productizes ``runners/multiseed.py`` (the vmap machinery) with everything the
single-seed ``OnPolicyRunner`` provides: config-driven construction, console +
TensorBoard/W&B/Neptune logging of cross-seed ``mean ± std`` curves, stacked
checkpointing with bit-identical resume, and per-seed export to a standard
single-seed checkpoint (so the best seed deploys through the normal
``OnPolicyRunner.load`` / ``get_inference_policy`` path).

No reference equivalent: the reference runs seed studies as N separate torch
processes (one per GPU); here the functional core makes N seeds a single
batched XLA program on one chip — the flagship "what the pytree/pure-function
design buys" capability.

Pass ``pbt={...}`` to turn the study into population-based training
(``runners/pbt.py``): same logging/checkpointing, plus the in-program
exploit/explore exchange and ``PBT/*`` scalars.
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
from rsl_rl_tpu.modules.rnd import resolve_rnd_config
from rsl_rl_tpu.modules.symmetry import resolve_symmetry_config
from rsl_rl_tpu.runners.multiseed import make_multiseed_train
from rsl_rl_tpu.runners.pbt import make_pbt_train
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


class MultiSeedRunner:
    """Train ``num_seeds`` independent runs as one batched program.

    Works with any registered algorithm sharing the collect/update factory
    surface — PPO and Distillation both do (for distillation, bootstrap the
    shared teacher with :meth:`load_teacher` before :meth:`learn`). Config
    schema matches :class:`OnPolicyRunner` (same ``policy`` / ``algorithm`` /
    ``obs_groups`` blocks); ``cfg["seed"]`` seeds the whole study (each
    seed's init/noise streams derive from it). JAX envs only — a host env
    cannot be vmapped.
    """

    def __init__(self, env, train_cfg: dict, num_seeds: int,
                 log_dir: str | None = None, pbt: dict | None = None):
        if not getattr(env, "is_jax", True):
            raise ValueError(
                "MultiSeedRunner requires a JAX-native env: host envs step on"
                " host and cannot be vmapped over the seed axis."
            )
        self.cfg = dict(train_cfg)
        self.alg_cfg = dict(train_cfg["algorithm"])
        self.policy_cfg = dict(train_cfg["policy"])
        self.env = env
        self.num_seeds = int(num_seeds)
        self.log_dir = log_dir
        self.num_steps_per_env = self.cfg["num_steps_per_env"]
        self.save_interval = self.cfg["save_interval"]

        key = jax.random.PRNGKey(int(self.cfg.get("seed", 1)))
        self._key, key_env, key_init = jax.random.split(key, 3)

        # probe obs + resolve groups (reference on_policy_runner.py:40-44)
        _, obs = env.reset(key_env)
        default_sets = ["critic"]
        if self.alg_cfg.get("rnd_cfg") is not None:
            default_sets.append("rnd_state")  # defaulting parity with OnPolicyRunner
        self.cfg["obs_groups"] = resolve_obs_groups(obs, self.cfg["obs_groups"], default_sets)

        # same config resolution as OnPolicyRunner._construct_algorithm —
        # rnd_cfg needs num_states/obs_groups/step_dt filled in, symmetry_cfg
        # the _env handle; without these the configs the single-seed runner
        # accepts would crash here
        self.alg_cfg = resolve_rnd_config(self.alg_cfg, obs, self.cfg["obs_groups"], env)
        self.alg_cfg = resolve_symmetry_config(self.alg_cfg, env)
        policy_class = resolve("policy", self.policy_cfg.pop("class_name"))
        policy = policy_class(obs, self.cfg["obs_groups"], env.num_actions, **self.policy_cfg)
        alg_class = resolve("algorithm", self.alg_cfg.pop("class_name"))
        self.alg = alg_class(policy, **self.alg_cfg)

        self.pbt_cfg = dict(pbt) if pbt is not None else None
        self.pbt_state = None
        if self.pbt_cfg is not None:
            init, self._train_step = make_pbt_train(
                self.alg, env, self.num_steps_per_env, self.num_seeds,
                **self.pbt_cfg,
            )
            self.train_state, self.collect_state, self.pbt_state = init(key_init)
        else:
            init, self._train_step = make_multiseed_train(
                self.alg, env, self.num_steps_per_env, self.num_seeds
            )
            self.train_state, self.collect_state = init(key_init)

        # periodic deterministic evaluation, vmapped over the seed axis:
        # cfg "eval_interval"/"eval_num_steps", same contract as
        # OnPolicyRunner; logs cross-seed mean/std/best of the per-seed
        # deterministic returns (Eval/* scalars)
        self.eval_interval = int(self.cfg.get("eval_interval", 0))
        if self.eval_interval > 0:
            if log_dir is None:
                # same guard as OnPolicyRunner: learn() gates evaluation on a
                # writer existing, so a log_dir-less run would silently build
                # the eval program and never use it
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
                jax.vmap(make_eval_program(env, self.alg.policy, eval_steps))
            )
            self._eval_key = jax.random.fold_in(self._key, 0xEA1)

        # K-iterations-per-dispatch (same cfg key and semantics as
        # OnPolicyRunner): lax.scan over the vmapped train step — the K-scan
        # composes with the seed-vmap for free
        self.iterations_per_dispatch = int(self.cfg.get("iterations_per_dispatch", 1))
        self._k_programs: dict[int, object] = {}

        self.writer = None
        self.logger_type = self.cfg.get("logger", "tensorboard")
        self.current_learning_iteration = 0
        self.tot_timesteps = 0
        self.tot_time = 0.0
        self.git_status_repos: list[str] = [rsl_rl_tpu.__file__]
        # per-seed ~100-episode trailing windows (numpy [S] tuples)
        self._ep_window: deque = deque()

    # ------------------------------------------------------------------ train

    def learn(self, num_learning_iterations: int) -> None:
        # student-teacher policies must have a teacher before distilling —
        # same gate as DistillationRunner.learn (reference
        # distillation_runner.py:61-62); without it every seed would clone a
        # random teacher
        if getattr(self.alg.policy, "loaded_teacher", True) is False:
            raise ValueError(
                "Teacher model parameters not loaded. Please load a teacher"
                " model to distill (MultiSeedRunner.load_teacher)."
            )
        self._prepare_logging_writer()
        # jax.profiler trace window, same cfg contract as OnPolicyRunner:
        # "profiler_trace_iterations": [first, last]
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
            start = time.time()
            if self.pbt_state is not None:
                ts, cs, self.pbt_state, m = self._train_step(
                    self.train_state, self.collect_state, self.pbt_state
                )
            else:
                ts, cs, m = self._train_step(self.train_state, self.collect_state)
            m = jax.device_get(m)  # [S]-leading metrics; the transfer is the fence
            iteration_time = time.time() - start
            self.train_state, self.collect_state = ts, cs
            self.current_learning_iteration = it
            # resume-safe stop guard: only stop a trace THIS run started
            if trace_window and it == trace_window[1] and getattr(self, "_trace_active", False):
                jax.profiler.stop_trace()
                self._trace_active = False

            self.tot_timesteps += (
                self.num_steps_per_env * self.env.num_envs * self.num_seeds
            )
            self.tot_time += iteration_time
            if self.log_dir is not None:
                self._log(it, m, iteration_time)
                if it % self.save_interval == 0:
                    self.save(os.path.join(self.log_dir, f"model_{it}.ckpt"))
                if self.eval_interval and it % self.eval_interval == 0:
                    self._run_eval(it)
            if it == start_iter and self.log_dir is not None:
                self._store_git_state()

        self._finish_learn()

    def _learn_k_dispatch(self, start_iter: int, tot_iter: int, trace_window) -> None:
        """K-iterations-per-program: ``lax.scan`` over the vmapped train step,
        one dispatch + one metrics transfer per K iterations. Logging stays
        per-iteration (from the stacked ``[K, S]`` metrics); checkpoints and
        evaluation land at dispatch-group boundaries, where device state
        exists (same contract as ``OnPolicyRunner._learn_k_dispatch``)."""
        it = start_iter
        first_group = True
        while it < tot_iter:
            k = min(self.iterations_per_dispatch, tot_iter - it)
            if trace_window and it <= trace_window[0] < it + k and self.log_dir:
                jax.profiler.start_trace(os.path.join(self.log_dir, "profile"))
                self._trace_active = True
            start = time.time()
            prog = self._k_programs.get(k)
            if prog is None:
                prog = self._k_programs[k] = self._make_k_program(k)
            if self.pbt_state is not None:
                ts, cs, self.pbt_state, ms = prog(
                    self.train_state, self.collect_state, self.pbt_state
                )
            else:
                ts, cs, ms = prog(self.train_state, self.collect_state)
            ms = jax.device_get(ms)
            elapsed = time.time() - start
            self.train_state, self.collect_state = ts, cs
            if trace_window and it <= trace_window[1] < it + k and getattr(self, "_trace_active", False):
                jax.profiler.stop_trace()
                self._trace_active = False

            save_due = eval_due = False
            for j in range(k):
                self.current_learning_iteration = it + j
                self.tot_timesteps += (
                    self.num_steps_per_env * self.env.num_envs * self.num_seeds
                )
                self.tot_time += elapsed / k
                if self.log_dir is not None:
                    self._log(it + j, {key: v[j] for key, v in ms.items()}, elapsed / k)
                    save_due = save_due or (it + j) % self.save_interval == 0
                    eval_due = eval_due or (
                        self.eval_interval and (it + j) % self.eval_interval == 0
                    )
            if save_due and self.log_dir is not None:
                self.save(
                    os.path.join(self.log_dir, f"model_{self.current_learning_iteration}.ckpt")
                )
            if eval_due and self.log_dir is not None:
                self._run_eval(self.current_learning_iteration)
            if first_group and self.log_dir is not None:
                self._store_git_state()
            first_group = False
            it += k

        self._finish_learn()

    def _make_k_program(self, k: int):
        """Jit a ``lax.scan`` of ``k`` train steps (PBT carries its state)."""
        step = self._train_step
        if self.pbt_state is not None:

            @jax.jit
            def k_steps(ts, cs, pbt):
                def body(carry, _):
                    ts, cs, pbt = carry
                    ts, cs, pbt, m = step(ts, cs, pbt)
                    return (ts, cs, pbt), m

                (ts, cs, pbt), ms = jax.lax.scan(body, (ts, cs, pbt), None, length=k)
                return ts, cs, pbt, ms

            return k_steps

        @jax.jit
        def k_steps(ts, cs):
            def body(carry, _):
                ts, cs = carry
                ts, cs, m = step(ts, cs)
                return (ts, cs), m

            (ts, cs), ms = jax.lax.scan(body, (ts, cs), None, length=k)
            return ts, cs, ms

        return k_steps

    def _finish_learn(self) -> None:
        if self.log_dir is not None:
            self.save(
                os.path.join(self.log_dir, f"model_{self.current_learning_iteration}.ckpt")
            )
        if self.writer is not None:
            self.writer.flush()

    def _prepare_logging_writer(self) -> None:
        """Same writer bootstrap as OnPolicyRunner: W&B/Neptune get the full
        config uploaded once (reference wandb_utils.py:48-55)."""
        if self.log_dir is not None and self.writer is None:
            self.writer = make_writer(self.logger_type, self.log_dir, self.cfg)
            if self.logger_type in ("wandb", "neptune"):
                self.writer.log_config(
                    getattr(self.env, "cfg", {}), self.cfg, self.alg_cfg, self.policy_cfg
                )

    def _store_git_state(self) -> None:
        """Reproducibility snapshot at the first learn() iteration (reference
        on_policy_runner.py:165-171), uploaded to W&B/Neptune like the
        single-seed runner."""
        git_file_paths = store_code_state(self.log_dir, self.git_status_repos)
        if self.logger_type in ("wandb", "neptune") and git_file_paths:
            for path in git_file_paths:
                self.writer.save_file(path)

    def add_git_repo_to_log(self, repo_file_path: str) -> None:
        self.git_status_repos.append(repo_file_path)

    # ---------------------------------------------------------------- logging

    def _run_eval(self, it: int) -> None:
        """Vmapped deterministic evaluation: every seed rolls its OWN fresh
        env copy with its own policy in one batched program; logs cross-seed
        aggregates of the per-seed mean returns."""
        keys = jax.random.split(
            jax.random.fold_in(self._eval_key, it), self.num_seeds
        )
        m = jax.device_get(self._eval_prog(self.train_state.policy, keys))
        counts = np.asarray(m["Eval/episode_count"])
        self.writer.add_scalar("Eval/episode_count", float(counts.sum()), it)
        if (counts > 0).all():
            rew = np.asarray(m["Eval/mean_reward"])
            length = np.asarray(m["Eval/mean_episode_length"])
            self.writer.add_scalar("Eval/mean_reward", float(rew.mean()), it)
            self.writer.add_scalar("Eval/mean_reward_std", float(rew.std()), it)
            self.writer.add_scalar("Eval/best_seed_reward", float(rew.max()), it)
            self.writer.add_scalar(
                "Eval/mean_episode_length", float(length.mean()), it
            )
            print(
                f"Evaluation at iteration {it}: mean return {rew.mean():.2f}"
                f" ± {rew.std():.2f} over {self.num_seeds} seeds"
                " (deterministic policy)"
            )
        else:
            print(
                f"Evaluation at iteration {it}:"
                f" {int((counts == 0).sum())}/{self.num_seeds} seeds completed"
                " no episode within the eval budget (raise eval_num_steps)"
            )

    def _window_stats(self, m) -> tuple[np.ndarray, np.ndarray, float]:
        """Per-seed trailing ~100-episode reward/length means."""
        self._ep_window.append(
            (
                np.asarray(m.get("ep_reward_sum")),
                np.asarray(m.get("ep_length_sum")),
                np.asarray(m.get("ep_count")),
            )
        )
        while (
            len(self._ep_window) > 1
            and float(sum(e[2].sum() for e in self._ep_window) - self._ep_window[0][2].sum())
            >= 100.0 * self.num_seeds
        ):
            self._ep_window.popleft()
        count, rew, length = self._window_reduce()
        return rew, length, float(count.sum())

    def _window_reduce(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Read-only reduction of the current window: per-seed episode
        ``(count, mean reward, mean length)`` — the ONE definition both
        ``_window_stats`` (logging) and ``seed_rewards`` (best-seed export)
        use, so they cannot diverge."""
        count = sum(e[2] for e in self._ep_window)  # [S]
        safe = np.maximum(count, 1.0)
        rew = sum(e[0] for e in self._ep_window) / safe
        length = sum(e[1] for e in self._ep_window) / safe
        return count, rew, length

    def seed_rewards(self) -> tuple[np.ndarray, float]:
        """Per-seed trailing-window mean rewards and the total completed
        episode count in the window (read-only — unlike ``_window_stats``
        this does not advance the window). Use this to pick a best seed for
        :meth:`save_seed` export; a count of 0 means no episode has
        completed and the rewards are meaningless."""
        if not self._ep_window:
            return np.zeros(self.num_seeds), 0.0
        count, rew, _ = self._window_reduce()
        return np.asarray(rew), float(np.asarray(count).sum())

    def _log(self, it: int, m: dict, iteration_time: float) -> None:
        fps = int(
            self.num_steps_per_env * self.env.num_envs * self.num_seeds / iteration_time
        )
        rew, length, ep_count = self._window_stats(m)
        for k, v in m.items():
            if k.startswith("Loss/"):
                vals = np.asarray(v)
                self.writer.add_scalar(k, float(vals.mean()), it)
                self.writer.add_scalar(f"{k}_std", float(vals.std()), it)
        self.writer.add_scalar(
            "Policy/mean_noise_std", float(np.asarray(m["Policy/mean_noise_std"]).mean()), it
        )
        self.writer.add_scalar("Perf/total_fps", fps, it)
        if "PBT/fitness" in m:
            fit = np.asarray(m["PBT/fitness"])
            lr = np.asarray(m["PBT/lr"])
            self.writer.add_scalar("PBT/fitness_best", float(fit.max()), it)
            self.writer.add_scalar("PBT/fitness_median", float(np.median(fit)), it)
            self.writer.add_scalar("PBT/lr_min", float(lr.min()), it)
            self.writer.add_scalar("PBT/lr_max", float(lr.max()), it)
            self.writer.add_scalar("PBT/exploits", float(m["PBT/exploits"]), it)
        if ep_count > 0:
            self.writer.add_scalar("Train/mean_reward", float(rew.mean()), it)
            self.writer.add_scalar("Train/mean_reward_std", float(rew.std()), it)
            self.writer.add_scalar("Train/mean_episode_length", float(length.mean()), it)
            self.writer.add_scalar(
                "Train/mean_episode_length_std", float(length.std()), it
            )
        print(
            f"[multiseed {self.num_seeds}x] it {it}: reward {rew.mean():.2f} +/- "
            f"{rew.std():.2f}  len {length.mean():.1f}  {fps} steps/s"
        )

    # ------------------------------------------------------------ checkpoints

    def save(self, path: str, infos=None) -> None:
        """One stacked checkpoint for the whole study (leading seed axis)."""
        ts = self.train_state
        state = {
            "model": ts.policy,
            "opt_state": ts.opt_state,
            "lr": ts.lr,
            "iter": int(self.current_learning_iteration),
            "num_seeds": self.num_seeds,
            "infos": infos,
        }
        if ts.rnd is not None:
            state["rnd"] = ts.rnd
            state["rnd_opt_state"] = ts.rnd_opt_state
        if self.pbt_state is not None:
            state["pbt"] = self.pbt_state
        save_checkpoint(path, state)
        if self.logger_type in ("wandb", "neptune") and self.writer is not None:
            # model upload parity with OnPolicyRunner.save (reference
            # on_policy_runner.py:303-305)
            self.writer.save_model(path, self.current_learning_iteration)

    def load_latest(self, log_dir: str | None = None) -> bool:
        """Resume the study from the newest ``model_<it>.ckpt`` in ``log_dir``
        (defaults to this runner's log dir). Returns False when no checkpoint
        exists — the auto-resume hook for preempted pod jobs, same contract
        as ``OnPolicyRunner.load_latest``."""
        path = latest_checkpoint(log_dir or self.log_dir or "")
        if path is None:
            return False
        self.load(path)
        return True

    def load(self, path: str):
        """Bit-identical resume of the whole study."""
        ts = self.train_state
        loaded = load_checkpoint(path)
        if int(loaded.get("num_seeds", -1)) != self.num_seeds:
            raise ValueError(
                f"Checkpoint {path!r} holds {loaded.get('num_seeds')} seeds;"
                f" this runner is configured for {self.num_seeds}."
            )
        if ("pbt" in loaded) != (self.pbt_state is not None):
            raise ValueError(
                f"Checkpoint {path!r} and this runner disagree on PBT mode"
                f" (checkpoint {'has' if 'pbt' in loaded else 'lacks'} PBT"
                " state); construct the runner with the matching `pbt=`"
                " argument."
            )
        if ("rnd" in loaded) != (ts.rnd is not None):
            raise ValueError(
                f"Checkpoint {path!r} and this runner disagree on RND"
                f" (checkpoint {'has' if 'rnd' in loaded else 'lacks'} RND"
                " state); construct the runner with the matching"
                " `rnd_cfg` in the algorithm config."
            )
        loaded = restore_typed(
            loaded,
            {
                "model": ts.policy,
                "opt_state": ts.opt_state,
                "lr": ts.lr,
                "rnd": ts.rnd,
                "rnd_opt_state": ts.rnd_opt_state,
                "pbt": self.pbt_state,
            },
        )
        ts = ts.replace(
            policy=loaded["model"], opt_state=loaded["opt_state"],
            lr=jnp.asarray(loaded["lr"]),
        )
        if ts.rnd is not None:
            ts = ts.replace(rnd=loaded["rnd"], rnd_opt_state=loaded["rnd_opt_state"])
        if self.pbt_state is not None:
            self.pbt_state = loaded["pbt"]
        self.current_learning_iteration = int(loaded["iter"])
        ts = ts.replace(it=jnp.full_like(ts.it, loaded["iter"]))
        self.train_state = ts
        return loaded["infos"]

    def load_teacher(self, path: str) -> None:
        """Bootstrap the frozen teacher of a multi-seed distillation study
        from a single-seed RL checkpoint (the ``OnPolicyRunner.save`` schema).

        Every seed gets the SAME teacher; the per-seed students keep their
        independent random inits — N distillation seeds from one teacher in
        one batched program. Reuses the policy's own ``load_state_dict``
        remap (actor->teacher, reference student_teacher.py:168-206) on each
        seed slice, so StudentTeacher and StudentTeacherRecurrent (incl. the
        memory_a->memory_t remap) both work unchanged.
        """
        if not hasattr(self.alg.policy, "loaded_teacher"):
            raise ValueError(
                "load_teacher only applies to student-teacher policies;"
                f" {type(self.alg.policy).__name__} has no teacher."
            )
        loaded = load_checkpoint(path)
        model = loaded["model"]
        params = model["params"] if isinstance(model, dict) else model.params
        if "student" in params:
            raise ValueError(
                f"Checkpoint {path!r} is a distillation checkpoint (student"
                " params present), not an RL teacher. Use load()/load_latest()"
                " to resume a stacked study."
            )
        ts = self.train_state
        slices = []
        for i in range(self.num_seeds):
            ps_i = jax.tree.map(lambda x: x[i], ts.policy)
            new_ps_i, resumed = self.alg.policy.load_state_dict(ps_i, model)
            assert not resumed  # "student" was rejected above
            slices.append(jax.device_get(new_ps_i))
        stacked = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *slices)
        self.train_state = ts.replace(policy=stacked)

    def save_seed(self, path: str, seed_index: int) -> None:
        """Export ONE seed as a standard single-seed checkpoint — the schema
        ``OnPolicyRunner.load`` expects, so the best seed of a study deploys
        (or keeps training) through the normal runner."""
        if not 0 <= seed_index < self.num_seeds:
            raise ValueError(f"seed_index {seed_index} out of range [0, {self.num_seeds})")
        ts = self.train_state
        pick = lambda tree: jax.tree.map(lambda x: x[seed_index], tree)  # noqa: E731
        state = {
            "model": pick(ts.policy),
            "opt_state": pick(ts.opt_state),
            "lr": ts.lr[seed_index],
            "iter": int(self.current_learning_iteration),
            "infos": None,
        }
        if ts.rnd is not None:
            state["rnd"] = pick(ts.rnd)
            state["rnd_opt_state"] = pick(ts.rnd_opt_state)
        save_checkpoint(path, state)
