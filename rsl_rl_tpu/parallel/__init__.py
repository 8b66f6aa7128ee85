"""Mesh and sharding utilities: data-parallel and (data x model) parallel."""

from rsl_rl_tpu.parallel.mesh import (
    data_sharding,
    distributed_init,
    make_mesh,
    replicated,
    shard_tree,
    time_major_sharding,
    tree_shardings,
)
from rsl_rl_tpu.parallel.tp import make_tp_mesh, shard_tree_tp, tp_tree_shardings

__all__ = [
    "distributed_init",
    "make_mesh",
    "replicated",
    "data_sharding",
    "time_major_sharding",
    "shard_tree",
    "tree_shardings",
    "make_tp_mesh",
    "tp_tree_shardings",
    "shard_tree_tp",
]
