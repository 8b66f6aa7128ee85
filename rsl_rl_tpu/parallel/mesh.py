"""Device-mesh utilities for data-parallel training.

TPU-native replacement for the reference's multi-GPU machinery
(reference: rsl_rl/runners/on_policy_runner.py:353-395 NCCL process-group
setup; rsl_rl/algorithms/ppo.py:428-469 manual gradient allreduce). Here data
parallelism is expressed declaratively: a 1-D ``Mesh(("data",))`` over all
devices, environment/rollout arrays sharded along ``data``, training state
replicated. XLA then inserts the gradient/KL collectives over ICI
automatically — there is no explicit broadcast/allreduce code anywhere.

Multi-host pods: call ``distributed_init()`` once per host before building the
mesh; ``jax.devices()`` then spans the pod slice and the same sharding code
scales across DCN-connected hosts.
"""

from __future__ import annotations

import os
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _multi_host_markers_present() -> bool:
    """True when the environment indicates a multi-host pod slice."""
    if any(
        os.environ.get(v)
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "MEGASCALE_COORDINATOR_ADDRESS")
    ):
        return True
    # multi-worker TPU VMs list all worker hostnames comma-separated
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return "," in hostnames


def distributed_init(**kwargs) -> bool:
    """Initialize JAX multi-host coordination when running on a pod slice.

    The equivalent of the reference's ``torch.distributed.init_process_group``
    (on_policy_runner.py:393). Initialization runs when explicit arguments are
    given (e.g. ``coordinator_address=...``) OR when multi-host pod markers
    are present — on multi-host TPU VMs ``jax.distributed.initialize``
    auto-discovers the coordinator from the TPU metadata. Single-host runs
    (no markers) are a no-op, so the same launch script works everywhere.

    Returns True when multi-host coordination was initialized.
    """
    if kwargs:
        jax.distributed.initialize(**kwargs)
        return True
    if _multi_host_markers_present():
        jax.distributed.initialize()
        return True
    return False


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(devices, ("data",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (env) axis along the data mesh axis."""
    return NamedSharding(mesh, P("data"))


def time_major_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the second (env) axis of time-major ``[T, N, ...]`` arrays."""
    return NamedSharding(mesh, P(None, "data"))


def shard_tree(tree: Any, sharding: NamedSharding) -> Any:
    """Place every leaf of a pytree with the given sharding."""
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def tree_shardings(tree: Any, sharding: NamedSharding) -> Any:
    """A pytree of identical shardings matching ``tree``'s structure."""
    return jax.tree.map(lambda _: sharding, tree)
