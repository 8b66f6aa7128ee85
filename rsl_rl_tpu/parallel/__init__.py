"""Data-parallel mesh and sharding utilities."""

from rsl_rl_tpu.parallel.mesh import (
    data_sharding,
    distributed_init,
    make_mesh,
    replicated,
    shard_tree,
    time_major_sharding,
    tree_shardings,
)

__all__ = [
    "distributed_init",
    "make_mesh",
    "replicated",
    "data_sharding",
    "time_major_sharding",
    "shard_tree",
    "tree_shardings",
]
