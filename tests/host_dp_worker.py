"""Worker process for the multi-process HOST-env data-parallel test.

Launched once per process by tests/test_host_dp.py:

    python tests/host_dp_worker.py <process_id> <num_processes> <port>

Each process exposes 2 virtual CPU devices, joins the distributed runtime,
constructs its OWN 8-env shard of the deterministic host-env double, and
trains through the full ``OnPolicyRunner`` (which bridges host collection
onto the 4-device global mesh). Prints the per-iteration ``Loss/*`` dicts —
replicated, so they must agree across processes and with a single-process
run over the unsharded 16-env env.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    process_id, num_processes, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from rsl_rl_tpu.parallel import distributed_init

    ok = distributed_init(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert ok and jax.process_count() == num_processes
    assert jax.device_count() == 2 * num_processes

    from tests.host_env_double import ShardableHostEnv
    from tests.test_host_dp import _ppo_cfg, _train_losses
    from rsl_rl_tpu.runners import OnPolicyRunner

    n_local = 8
    env = ShardableHostEnv(num_envs=n_local, start_id=process_id * n_local)
    runner = OnPolicyRunner(env, _ppo_cfg(), log_dir=None)
    assert runner._host_bridge is not None
    assert runner.num_global_envs == n_local * num_processes

    losses = _train_losses(runner, iters=2)
    print(f"proc{process_id} losses: {[sorted(step.items()) for step in losses]}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
