"""Tensor-parallel (model-sharded) policy training over a 2-D device mesh.

Goes beyond the reference, which only supports data parallelism (reference:
rsl_rl/runners/on_policy_runner.py:353-395, ppo.py:428-469 — DDP-style
gradient allreduce). For policies too wide for replicated training to be
efficient (large teacher networks, high-dim proprioception + vision trunks),
the MLP trunks can additionally be sharded across a ``model`` mesh axis in
the Megatron pattern, expressed declaratively:

- even layers are column-parallel: kernel ``[in, out]`` partitioned
  ``P(None, "model")``, bias ``P("model")`` — each device holds a slice of
  the output features,
- odd layers are row-parallel: kernel partitioned ``P("model", None)``,
  bias replicated — XLA inserts the ``psum`` over ICI after the matmul,
- any dimension not divisible by the ``model`` axis (e.g. the tiny final
  action layer) stays replicated; GSPMD re-shards around it automatically.

Because sharding is declarative there is no hand-written collective code:
the same train-step program runs 1-device, data-parallel, or (data x model)
parallel depending only on how the state pytrees are placed. RNN memory
cells and normalizer state are replicated (sequential cell math is ICI
latency-bound, not memory-bound — the fused Pallas kernels cover that axis).

Composes with data parallelism: envs/rollout shard along ``data``, MLP
trunks along ``model``; activations inside the train step are then 2-D
sharded ``[batch/data, features/model]``.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tp_mesh(model: int, devices=None) -> Mesh:
    """2-D ``(data, model)`` mesh with ``model``-way tensor parallelism.

    The model axis is the fastest-varying (innermost) so model-parallel
    collectives ride neighboring ICI links on real slices.
    """
    devices = list(devices if devices is not None else jax.devices())
    if model < 1 or len(devices) % model:
        raise ValueError(
            f"model-axis size {model} must divide the device count {len(devices)}"
        )
    grid = np.array(devices).reshape(len(devices) // model, model)
    return Mesh(grid, ("data", "model"))


def _path_names(path) -> list[str]:
    names = []
    for entry in path:
        if hasattr(entry, "key"):
            names.append(str(entry.key))
        elif hasattr(entry, "name"):
            names.append(str(entry.name))
        else:
            names.append(str(entry))
    return names


def _leaf_spec(path, leaf, model_size: int) -> P:
    """Partition spec for one state leaf (see module docstring for the rules)."""
    if leaf is None or not hasattr(leaf, "ndim"):
        return P()
    names = _path_names(path)
    dense = [n for n in names if n.startswith("dense_")]
    if not dense or names[-1] not in ("kernel", "bias"):
        return P()
    layer = int(dense[-1].rsplit("_", 1)[1])
    column = layer % 2 == 0
    if names[-1] == "kernel":
        if leaf.ndim != 2:
            return P()
        if column and leaf.shape[1] % model_size == 0:
            return P(None, "model")
        if not column and leaf.shape[0] % model_size == 0:
            return P("model", None)
        return P()
    # bias: sharded only for column-parallel layers (row-parallel adds the
    # bias after the psum, so it must be replicated)
    if column and leaf.ndim >= 1 and leaf.shape[-1] % model_size == 0:
        return P("model")
    return P()


def tp_tree_shardings(tree: Any, mesh: Mesh) -> Any:
    """Per-leaf ``NamedSharding``s model-sharding every MLP trunk in ``tree``.

    Works on any pytree that nests flax MLP param dicts (``dense_k ->
    kernel/bias``): ``PolicyState``, the full ``TrainState``, and optax
    optimizer states (whose moment pytrees mirror the param structure, so
    Adam's ``mu``/``nu`` shard exactly like the params they track). Leaves
    that are not MLP kernels/biases — normalizers, RNN cells, std params,
    step counts — come back replicated.
    """
    model_size = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _leaf_spec(path, leaf, model_size)),
        tree,
        is_leaf=lambda x: x is None,
    )


def shard_tree_tp(tree: Any, mesh: Mesh) -> Any:
    """Place ``tree`` with :func:`tp_tree_shardings` (device_put per leaf)."""
    shardings = tp_tree_shardings(tree, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: x if x is None else jax.device_put(x, s),
        tree,
        shardings,
        is_leaf=lambda x: x is None,
    )
