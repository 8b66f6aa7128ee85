"""Sharded hybrid collection for host (non-JAX) environments.

The reference's multi-GPU path composes with ANY external simulator: each
rank steps its own environment instance and gradients all-reduce per
minibatch (reference: rsl_rl/runners/on_policy_runner.py:353-395,
rsl_rl/algorithms/ppo.py:441-469). The TPU-native analog implemented here:
each process steps its LOCAL :class:`HostVecEnv` shard on host, while every
jitted step (policy forward, normalization update, step processing, the
whole learning phase) runs as a single GLOBAL program over the data-sharded
global batch on the full mesh.

:class:`HostShardingBridge` is the seam between the two worlds. It converts
the host side's process-local numpy arrays ``[n_local, ...]`` into global
jax Arrays ``[n_local * num_processes, ...]`` sharded along the ``data``
mesh axis (and back), so the SAME collection-loop code drives one process
with one device, one process with N devices, or N processes each holding an
env shard. Because every jitted step is a global program, XLA inserts the
cross-device/cross-process collectives (e.g. the normalizer's global batch
mean) automatically — training state stays truly replicated, and the math
is bit-identical for every topology, which the reference's DDP cannot claim
(its per-rank normalizer buffers silently drift, normalization.py has no
collective).

Multi-process contract (mirrors the reference's per-rank envs): with
``jax.process_count() == P``, every process constructs its OWN env shard of
``n_local`` envs; the global batch is ``P * n_local``. Logging/checkpointing
stay process-0-only, with episode statistics local to process 0's shard —
the reference's rank-0 semantics (on_policy_runner.py:51).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def converters(bridge):
    """``(to_device, to_host)`` pair for a possibly-``None`` bridge.

    The single definition both host-collection loops (PPO and Distillation)
    use: without a bridge, plain host<->device conversion; with one, the
    global-shard/local-shard mapping."""
    if bridge is None:
        return (lambda t: jax.tree.map(jnp.asarray, t)), np.asarray
    return bridge.to_global, bridge.to_local_np


class HostShardingBridge:
    """Converts process-local host arrays to data-sharded global arrays
    (and back) over a 1-D ``("data",)``-major mesh."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.num_processes = jax.process_count()

    def global_batch(self, local_batch: int) -> int:
        return local_batch * self.num_processes

    def to_global(self, tree):
        """Process-local ``[n_local, ...]`` pytree -> global jax Arrays
        ``[n_global, ...]`` sharded along ``data`` (process shards are
        concatenated in process order)."""
        return multihost_utils.host_local_array_to_global_array(
            tree, self.mesh, P("data")
        )

    def to_local_np(self, tree):
        """Global data-sharded pytree -> this process's local numpy shard."""
        local = multihost_utils.global_array_to_host_local_array(
            tree, self.mesh, P("data")
        )
        return jax.tree.map(np.asarray, local)

    def replicate(self, tree):
        """Host pytree (identical on every process) -> replicated global
        arrays usable inside global jitted programs."""
        return multihost_utils.host_local_array_to_global_array(
            tree, self.mesh, P()
        )

    def time_major_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(None, "data"))

    def constrain_time_major(self, tree):
        """Pin stacked ``[T, n_global, ...]`` rollout arrays to the
        time-major data sharding the jitted update expects."""
        sharding = self.time_major_sharding()
        return jax.tree.map(
            lambda x: jax.device_put(x, sharding) if hasattr(x, "ndim") and x.ndim >= 2 else x,
            tree,
        )
