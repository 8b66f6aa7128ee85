"""Throughput benchmark: PPO on 4096 vectorized JAX environments.

Headline workload: the **N-link pendulum** physics env (``env/nlink.py``) —
every env step assembles the manipulator equation and solves a batched dense
``[5, 5]`` system per substep (4 substeps), so the env carries
physics-grade FLOPs like the MJX workloads the north star names
(BASELINE.json:5), not a closed-form toy update — trained in **bf16** MXU
compute (fp32 params and algorithm math), the TPU-native mode; learning
quality matches fp32 within seed noise (3-seed study, README "Throughput").
fp32 physics, the toy ``Pendulum``, recurrent GRU-256 / LSTM-256 workloads
(fused Pallas BPTT replay, actor+critic replays stream-paired; the LSTM runs
bf16 gate matmuls per the measured roofline study, README "Known
limitations"), and PPO on REAL MuJoCo through the host-env loop are reported
alongside.

Measures aggregate env-steps/s of full PPO training iterations (collection +
learning fused into one XLA program), the reference's ``Perf/total_fps``
metric (reference: rsl_rl/runners/on_policy_runner.py:179,209,220), on
whatever devices JAX exposes (one TPU chip under the driver). The
collection/learning split (reference ``collection_time``/``learn_time``)
comes from separately timing a collect-only program.

Timing methodology: every measured segment ends with a ``jax.device_get`` of a
small output. On the tunneled TPU backend ``block_until_ready`` can return
before device work finishes, so only a value transfer is a trustworthy fence
(a transferred value proves the whole executable ran).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
``vs_baseline`` is the ratio against the 5M env-steps/s north-star target from
BASELINE.json (which targets a v4-16 pod slice; this runs on a single chip).
"""

from __future__ import annotations

import json
import os
import time

import jax

NUM_ENVS = 4096
NUM_STEPS = 24
WARMUP_ITERS = 3
MEASURE_ITERS = 30
TRIALS = 3  # best-of-3 timed loops; the tunneled backend is noisy
NORTH_STAR = 5_000_000.0  # env-steps/s aggregate on v4-16 (BASELINE.json:5)


def _build(env, recurrent: bool = False, dtype=None, num_mini_batches: int = 4,
           noise_std_floor: float | None = None):
    from rsl_rl_tpu.algorithms.ppo import PPO
    from rsl_rl_tpu.modules import ActorCritic, ActorCriticRecurrent
    from rsl_rl_tpu.parallel.mesh import data_sharding, make_mesh, replicated, shard_tree

    _, obs = env.reset(jax.random.PRNGKey(0))
    obs_groups = {"policy": ["policy"], "critic": ["policy"]}
    if recurrent:
        # GRU/LSTM-256 hits the fused Pallas replay path (128-aligned hidden
        # and 4096/4-minibatch batch, actor+critic replays stream-paired);
        # acting inside collect is per-step by nature
        policy = ActorCriticRecurrent(
            obs,
            obs_groups,
            env.num_actions,
            rnn_type=recurrent if isinstance(recurrent, str) else "gru",
            rnn_hidden_dim=256,
            actor_hidden_dims=[256, 256],
            critic_hidden_dims=[256, 256],
            actor_obs_normalization=True,
            critic_obs_normalization=True,
            noise_std_floor=noise_std_floor,
            dtype=dtype,  # bf16 applies to the MLP trunks; memory runs fp32
        )
    else:
        policy = ActorCritic(
            obs,
            obs_groups,
            env.num_actions,
            actor_hidden_dims=[256, 256, 256],
            critic_hidden_dims=[256, 256, 256],
            actor_obs_normalization=True,
            critic_obs_normalization=True,
            noise_std_floor=noise_std_floor,
            dtype=dtype,
        )
    ppo = PPO(policy, num_learning_epochs=5, num_mini_batches=num_mini_batches)
    ts = ppo.init_train_state(jax.random.PRNGKey(1), env.num_envs)
    cs = ppo.init_collect_state(jax.random.PRNGKey(2), env)
    if len(jax.devices()) > 1:
        mesh = make_mesh()
        ts = shard_tree(ts, replicated(mesh))
        cs = shard_tree(cs, data_sharding(mesh))
    return ppo, ts, cs


def measure(env, recurrent: bool = False, dtype=None, num_mini_batches: int = 4) -> dict:
    """Returns {"steps_per_s", "collect_s", "learn_s"} for one workload."""
    import jax.numpy as jnp

    ppo, ts, cs = _build(
        env, recurrent=recurrent, dtype=dtype, num_mini_batches=num_mini_batches
    )
    collect = ppo.make_collect_fn(env, NUM_STEPS)
    update = ppo.make_update_fn()

    # cs is not donated: donating it breaks output transfers on the tunneled
    # TPU backend (see OnPolicyRunner)
    @jax.jit
    def iteration(ts, cs):
        ts, cs, rollout, cm = collect(ts, cs)
        ts, cs, um = update(ts, cs, rollout)
        return ts, cs, um

    collect_jit = jax.jit(collect)

    # ---- headline: fused full iterations. The tunneled backend adds ±5-10%
    # run-to-run noise, so take the best of TRIALS timed loops (compile time
    # dominates the wall clock; extra trials are nearly free).
    for _ in range(WARMUP_ITERS):
        ts, cs, um = iteration(ts, cs)
    jax.device_get(um["Loss/kl"])  # fence: forces all warmup work to finish
    t_full = float("inf")
    for _ in range(TRIALS):
        start = time.perf_counter()
        for _ in range(MEASURE_ITERS):
            ts, cs, um = iteration(ts, cs)
        jax.device_get(um["Loss/kl"])  # fence: iterations chain -> waits for all
        t_full = min(t_full, (time.perf_counter() - start) / MEASURE_ITERS)

    # ---- split: collect-only program (reference collection_time analog)
    ts2, cs2 = ts, cs
    for _ in range(WARMUP_ITERS):
        ts2, cs2, rollout, cm = collect_jit(ts2, cs2)
    jax.device_get(cm["ep_count"])
    t_collect = float("inf")
    for _ in range(TRIALS):
        start = time.perf_counter()
        for _ in range(MEASURE_ITERS):
            ts2, cs2, rollout, cm = collect_jit(ts2, cs2)
        jax.device_get(cm["ep_count"])
        t_collect = min(t_collect, (time.perf_counter() - start) / MEASURE_ITERS)

    actor_net = getattr(ppo.policy, "actor", None)
    return {
        "steps_per_s": NUM_ENVS * NUM_STEPS / t_full,
        "collect_s": t_collect,
        "learn_s": max(t_full - t_collect, 0.0),
        # derived from the policy actually built (not hardcoded) so the bench
        # line tracks the real default if modules/actor_critic.py changes
        "fp32_heads": bool(
            actor_net is not None
            and getattr(actor_net, "head_dtype", None) == jnp.float32
        ),
    }


def measure_small_config(k: int) -> float:
    """BASELINE config #1 (PPO MLP, 64 Pendulum envs) with ``k`` fused
    iterations per dispatch (lax.scan over the fused iteration — the
    runner's ``iterations_per_dispatch`` mode). At 64 envs the workload is
    host-latency-bound, so amortizing the ~0.4 ms tunnel dispatch across k
    iterations is the whole ballgame. Returns env-steps/s."""
    from rsl_rl_tpu.env import Pendulum

    env = Pendulum(num_envs=64)
    ppo, ts, cs = _build(env)
    collect = ppo.make_collect_fn(env, NUM_STEPS)
    update = ppo.make_update_fn()

    def k_iterations(ts, cs):
        def body(carry, _):
            ts, cs = carry
            ts, cs, rollout, cm = collect(ts, cs)
            ts, cs, um = update(ts, cs, rollout)
            return (ts, cs), um["Loss/kl"]

        (ts, cs), kls = jax.lax.scan(body, (ts, cs), None, length=k)
        return ts, cs, kls

    prog = jax.jit(k_iterations)
    for _ in range(2):
        ts, cs, kls = prog(ts, cs)
    jax.device_get(kls)
    dispatches = max(30 // k, 3)
    best = float("inf")
    for _ in range(TRIALS):
        start = time.perf_counter()
        for _ in range(dispatches):
            ts, cs, kls = prog(ts, cs)
        jax.device_get(kls)
        best = min(best, (time.perf_counter() - start) / (dispatches * k))
    return 64 * NUM_STEPS / best


def measure_multiseed(num_seeds: int, num_envs: int = 512) -> float:
    """Vectorized multi-seed training (``runners/multiseed.py``): ``num_seeds``
    independent PPO runs fused into ONE XLA program via ``jax.vmap`` over the
    seed axis. At small env counts a single run leaves the MXU mostly idle, so
    batching seeds recovers the chip — the aggregate env-steps/s across seeds
    is the payoff a reference user gets from running a seed study as one
    program instead of N torch processes. Returns aggregate env-steps/s
    (seeds x envs x steps / iteration time)."""
    from rsl_rl_tpu.env import Pendulum
    from rsl_rl_tpu.runners.multiseed import make_multiseed_train

    env = Pendulum(num_envs=num_envs)
    ppo, _, _ = _build(env)
    init, train_step = make_multiseed_train(ppo, env, NUM_STEPS, num_seeds)
    ts, cs = init(jax.random.PRNGKey(3))
    for _ in range(WARMUP_ITERS):
        ts, cs, m = train_step(ts, cs)
    jax.device_get(m["Loss/kl"])
    best = float("inf")
    for _ in range(TRIALS):
        start = time.perf_counter()
        for _ in range(MEASURE_ITERS):
            ts, cs, m = train_step(ts, cs)
        jax.device_get(m["Loss/kl"])
        best = min(best, (time.perf_counter() - start) / MEASURE_ITERS)
    return num_seeds * num_envs * NUM_STEPS / best


def measure_mujoco_host() -> float:
    """PPO on REAL MuJoCo (CPU, 64 envs) through the host-env hybrid loop —
    the reference's external-simulator deployment shape (policy on
    accelerator, simulator on host, reference on_policy_runner.py:103-107).
    Dynamics identical to the JAX headline env (tests/test_mujoco_conformance
    .py). Host-bound by construction on this 1-core box (serial mj_step +
    one device round-trip per env step); reported as the honest
    real-simulator data point, not a TPU-resident number."""
    from rsl_rl_tpu.env import MuJoCoNLinkEnv
    from rsl_rl_tpu.runners import OnPolicyRunner

    env = MuJoCoNLinkEnv(num_envs=64, num_links=5)
    cfg = {
        "num_steps_per_env": NUM_STEPS,
        "save_interval": 10_000,
        "seed": 1,
        "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
        "policy": {
            "class_name": "ActorCritic",
            "actor_hidden_dims": [256, 256, 256],
            "critic_hidden_dims": [256, 256, 256],
            "actor_obs_normalization": True,
            "critic_obs_normalization": True,
        },
        "algorithm": {"class_name": "PPO", "num_learning_epochs": 5,
                      "num_mini_batches": 4},
    }
    runner = OnPolicyRunner(env, cfg, log_dir=None)
    runner.learn(2)  # compile + warm
    iters = 5
    start = time.perf_counter()
    runner.learn(iters)  # each iteration ends on a metrics device_get
    elapsed = time.perf_counter() - start
    return env.num_envs * NUM_STEPS * iters / elapsed


def _await_backend(budget_s: float = 900.0) -> bool:
    """Probe the device backend in SUBPROCESSES until it answers or the
    budget expires. The axon tunnel flaps: when it is down (or the
    single-tenant TPU is briefly held by another process), backend init in
    THIS process would block forever and cannot be interrupted — but a
    subprocess probe can be timed out and retried, so a tunnel that
    recovers within the budget still yields a real benchmark run instead
    of a dead artifact. Each probe fully exits before returning (the TPU
    is single-tenant; the parent only initializes after a probe succeeds).
    """
    import subprocess
    import sys

    probe = (
        "import jax, jax.numpy as jnp;"
        "jax.device_get(jnp.ones(2) + 1)"
    )
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            res = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=90,
                capture_output=True,
            )
            if res.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            return False
        print(
            f"# bench: backend probe {attempt} failed; retrying"
            f" ({deadline - time.monotonic():.0f}s left)",
            flush=True,
        )
        time.sleep(30)


def _measure_main() -> None:
    """One measurement pass: headline + extras, one JSON line on stdout.

    Runs as a CHILD of :func:`_supervise` (``bench.py --measure``) so a
    tunnel wedge mid-measurement — a blocked ``device_get`` cannot be
    interrupted in-process — is recoverable: the parent kills this whole
    process group and retries. Internal watchdogs make the child
    self-terminating even without the parent."""
    import threading

    import jax.numpy as jnp

    from rsl_rl_tpu.env import NLinkPendulum, Pendulum

    # Startup watchdog, armed BEFORE the first device work: when the axon
    # tunnel is down, backend init / the first device_get blocks forever and
    # cannot be interrupted — without this, the bench would hang with no
    # output at all. On timeout it still emits the one JSON line (value 0,
    # an explicit error field) and exits non-zero, so the driver records a
    # diagnosable failure instead of a killed silent process.
    def _startup_bail():
        print(
            json.dumps(
                {
                    "metric": "ppo_env_steps_per_s_4096envs_nlink5_physics_bf16",
                    "value": 0.0,
                    "unit": "env-steps/s",
                    "vs_baseline": 0.0,
                    "error": "TPU backend unreachable: headline measurement"
                             " did not complete within 600s (axon tunnel down?)",
                }
            ),
            flush=True,
        )
        os._exit(4)

    startup_watchdog = threading.Timer(600.0, _startup_bail)
    startup_watchdog.daemon = True
    startup_watchdog.start()

    # headline: bf16 MXU compute, the TPU-native training mode. Learning
    # quality matches fp32 on this task (3x800-iteration seeds: fp32
    # -234+/-77 vs bf16 -269+/-96 mean episode reward — overlapping bands;
    # see README "Throughput"). fp32 is reported alongside.
    physics_bf16 = measure(
        NLinkPendulum(num_envs=NUM_ENVS, num_links=5), dtype=jnp.bfloat16
    )
    startup_watchdog.cancel()
    result = {
        "metric": "ppo_env_steps_per_s_4096envs_nlink5_physics_bf16",
        "value": round(physics_bf16["steps_per_s"], 1),
        "unit": "env-steps/s",
        "vs_baseline": round(physics_bf16["steps_per_s"] / NORTH_STAR, 4),
        "collect_s_per_iter": round(physics_bf16["collect_s"], 5),
        "learn_s_per_iter": round(physics_bf16["learn_s"], 5),
        # since round 4 reduced-precision policies compute their output heads
        # in fp32 by default (modules/actor_critic.py head_dtype — the
        # sigma-collapse fix, see README "Known limitations"); cost measured
        # ~0, but recorded here so cross-round bench comparisons know which
        # network this is. Derived from the built policy, not hardcoded.
        "bf16_fp32_output_heads": physics_bf16["fp32_heads"],
    }

    # The remaining workloads are context, not the headline. The tunneled
    # TPU backend occasionally wedges (a blocked device_get cannot be
    # interrupted) and can raise transient RPC errors, so the headline is
    # flushed exactly once no matter how the extras end: normally, on a
    # watchdog timeout, or on an exception. The lock serializes the timer
    # thread against result.update()/the final print.
    lock = threading.Lock()
    flushed = [False]

    def _flush(skip_reason: str | None = None) -> None:
        with lock:
            if flushed[0]:
                return
            flushed[0] = True
            if skip_reason is not None:
                result["extras_skipped"] = skip_reason
            print(json.dumps(result), flush=True)

    def _bail():
        _flush("watchdog: extra workloads exceeded 1100s")
        # distinct exit code: the headline was printed but the extras were
        # cut short — automation can detect the degraded run without parsing
        # the JSON (exit 0 is reserved for a fully clean run)
        os._exit(3)

    watchdog = threading.Timer(1100.0, _bail)
    watchdog.daemon = True
    watchdog.start()

    # Each extra is guarded independently: a failure in one workload (e.g. a
    # backend quirk in one kernel configuration) must not discard the others'
    # numbers. A wedged device_get still can't be interrupted — that case is
    # the watchdog's job (it flushes whatever accumulated so far).
    failures: list[str] = []

    def _extra(tag: str, fields_fn) -> None:
        try:
            fields = fields_fn()
        except Exception as e:
            failures.append(f"{tag}: {type(e).__name__}: {e}")
            return
        with lock:
            result.update(fields)

    def _workload(prefix: str, split_prefix: str, with_collect: bool = True, **kw):
        m = measure(NLinkPendulum(num_envs=NUM_ENVS, num_links=5), **kw)
        fields = {
            f"{prefix}_env_steps_per_s": round(m["steps_per_s"], 1),
            f"{split_prefix}_learn_s_per_iter": round(m["learn_s"], 5),
        }
        if with_collect:
            fields[f"{split_prefix}_collect_s_per_iter"] = round(m["collect_s"], 5)
        return fields

    def _toy():
        m = measure(Pendulum(num_envs=NUM_ENVS))
        return {
            "toy_pendulum_env_steps_per_s": round(m["steps_per_s"], 1),
            "toy_collect_s_per_iter": round(m["collect_s"], 5),
            "toy_learn_s_per_iter": round(m["learn_s"], 5),
        }

    _extra("fp32", lambda: _workload("fp32", "fp32"))
    _extra("toy", _toy)
    _extra(
        "recurrent_gru",
        lambda: _workload("recurrent_gru256", "recurrent", recurrent="gru"),
    )
    # LSTM runs bf16 matmul operands (fp32 carries/accumulation): the
    # measured-roofline study (benchmarks/roofline_rnn.py, README
    # "Limitations") shows the paired LSTM kernel is gate-count-bound
    # relative to the GRU (1.31x fwd+bwd time at identical achieved
    # TFLOP/s, = the 4/3 gate ratio); bf16 is the one knob that moves it
    # (+4.7% end-to-end). The GRU's bf16 variant measured within noise of
    # fp32, so the GRU line stays fp32.
    _extra(
        "recurrent_lstm",
        lambda: _workload(
            "recurrent_lstm256_bf16", "recurrent_lstm", with_collect=False,
            recurrent="lstm", dtype=jnp.bfloat16,
        ),
    )
    _extra("config1_k1", lambda: {
        "config1_64env_steps_per_s_k1": round(measure_small_config(1), 1)
    })
    _extra("config1_k20", lambda: {
        "config1_64env_steps_per_s_k20": round(measure_small_config(20), 1)
    })
    _extra("multiseed_1", lambda: {
        "multiseed_512env_steps_per_s_1seed": round(measure_multiseed(1), 1)
    })
    _extra("multiseed_8", lambda: {
        "multiseed_512env_8seeds_aggregate_steps_per_s": round(
            measure_multiseed(8), 1
        )
    })
    _extra("mujoco_host", lambda: {
        "mujoco_host_nlink5_64env_steps_per_s": round(measure_mujoco_host(), 1)
    })

    watchdog.cancel()
    if failures:
        with lock:
            result["extras_failed"] = "; ".join(failures)
    _flush()
    if failures:
        raise SystemExit(3)  # degraded run: some extras missing


HEADLINE_METRIC = "ppo_env_steps_per_s_4096envs_nlink5_physics_bf16"


def _supervise() -> None:
    """Run the measurement suite in a killable child, retrying on a wedge.

    Observed failure mode on the tunneled backend: the probe succeeds, the
    child starts measuring, then the tunnel flaps and a ``device_get``
    blocks forever — uninterruptible from inside the process, so the
    child's watchdog fires and the attempt produces a zero-value headline.
    The fix is process-level: each attempt is a separate child process
    (its own process group); the parent re-probes the backend between
    attempts and accepts only a positive headline value. Only exhausted
    retries yield a zero-value artifact."""
    import signal
    import subprocess
    import sys

    deadline = time.monotonic() + 2700.0  # total budget across attempts
    errors: list[str] = []
    for attempt in range(1, 4):
        left = deadline - time.monotonic()
        if left <= 120.0:
            errors.append(f"attempt {attempt}: skipped, total budget exhausted")
            break
        if not _await_backend(min(600.0, left)):
            errors.append(f"attempt {attempt}: backend probes never succeeded")
            continue
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--measure"],
            stdout=subprocess.PIPE,
            text=True,
            start_new_session=True,  # own process group: killable as a unit
        )
        try:
            # the child's own watchdogs bound it at ~600s pre-headline +
            # 1100s extras; slack beyond that means it is wedged, not slow
            out, _ = child.communicate(
                timeout=min(1900.0, max(180.0, deadline - time.monotonic()))
            )
        except subprocess.TimeoutExpired:
            try:
                os.killpg(child.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                child.kill()
            child.wait()
            errors.append(
                f"attempt {attempt}: child wedged past its own watchdogs (killed)"
            )
            continue
        payload = None
        for cand in (out or "").splitlines():
            cand = cand.strip()
            if cand.startswith("{") and '"metric"' in cand:
                try:
                    payload = json.loads(cand)
                except ValueError:
                    continue
        if payload is not None and payload.get("value", 0) > 0:
            if attempt > 1:
                payload["bench_attempts"] = attempt
            print(json.dumps(payload), flush=True)
            raise SystemExit(child.returncode if child.returncode == 3 else 0)
        err = (payload or {}).get("error", "no headline JSON produced")
        errors.append(f"attempt {attempt}: exit={child.returncode}, {err}")
    print(
        json.dumps(
            {
                "metric": HEADLINE_METRIC,
                "value": 0.0,
                "unit": "env-steps/s",
                "vs_baseline": 0.0,
                "error": "; ".join(errors),
            }
        ),
        flush=True,
    )
    raise SystemExit(4)


def main() -> None:
    import sys

    if "--measure" in sys.argv[1:]:
        _measure_main()
    else:
        _supervise()


if __name__ == "__main__":
    main()
