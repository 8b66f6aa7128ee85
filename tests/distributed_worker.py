"""Worker process for the multi-process distributed-init test.

Launched once per process by tests/test_distributed.py:

    python tests/distributed_worker.py <process_id> <num_processes> <port>

Each process exposes 2 virtual CPU devices, wires up via
``distributed_init(coordinator_address=...)`` (the explicit-kwargs path of
the pod-slice bootstrap, mirroring the reference's torchrun workflow,
reference on_policy_runner.py:353-395), then runs data-parallel PPO train
steps over the GLOBAL mesh and prints the losses — the cross-process analog
of the single-process virtual-device dryrun.
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

    from rsl_rl_tpu.parallel import (
        data_sharding,
        distributed_init,
        make_mesh,
        replicated,
        shard_tree,
    )

    ok = distributed_init(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert ok, "distributed_init returned False despite explicit kwargs"
    assert jax.process_count() == num_processes
    assert jax.device_count() == 2 * num_processes, (
        f"global device count {jax.device_count()}"
    )
    assert jax.local_device_count() == 2

    import __graft_entry__ as graft

    num_envs = 4 * jax.device_count()
    env, alg = graft.make_variant("feedforward", num_envs=num_envs, hidden=16)
    ts = alg.init_train_state(jax.random.PRNGKey(1), num_envs)
    cs = alg.init_collect_state(jax.random.PRNGKey(2), env)
    mesh = make_mesh()  # global mesh spanning both processes
    ts = shard_tree(ts, replicated(mesh))
    cs = shard_tree(cs, data_sharding(mesh))

    collect = jax.jit(alg.make_collect_fn(env, 4))
    update = jax.jit(alg.make_update_fn())
    for _ in range(2):
        ts, cs, rollout, cm = collect(ts, cs)
        ts, cs, um = update(ts, cs, rollout)
    # loss metrics are replicated (identical on every process after the
    # XLA-inserted allreduces) -> safe to fetch anywhere
    losses = {
        k: float(v) for k, v in um.items() if k.startswith("Loss/")
    }
    print(f"proc{process_id} losses: {sorted(losses.items())}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
