"""Configurable MLP network.

TPU-native counterpart of the reference MLP (reference:
rsl_rl/networks/mlp.py:15-120) with the same conveniences:

- hidden dims of ``-1`` are inferred from the input dimension,
- tuple/list output dims produce a reshaped (unflattened) output,
- an optional activation after the last layer,
- ``init_scales`` switches layers to orthogonal initialization (the analog of
  the reference's ``MLP.init_weights``; reference mlp.py:85-104).

The default initialization reproduces torch's ``nn.Linear`` reset
(kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
kernel and bias) so learning dynamics match the reference out of the box.
"""

from __future__ import annotations

import math
from functools import reduce
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from rsl_rl_tpu.utils.resolvers import resolve_nn_activation


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear default."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class MLP(nn.Module):
    """Multi-layer perceptron.

    Attributes:
        output_dim: Output dimension; a tuple/list reshapes the output
            (reference mlp.py:68-75).
        hidden_dims: Hidden dims; ``-1`` entries are replaced by the input
            dimension (reference mlp.py:56).
        activation: Activation name (reference activation table,
            utils.py:30-43).
        last_activation: Optional activation after the final layer.
        init_scales: When set, layers use orthogonal init with these gains
            (scalar or one gain per linear layer) and zero biases.
        dtype: Compute dtype (params stay float32). Use ``jnp.bfloat16`` to
            run matmuls on the MXU in bf16.
        head_dtype: Compute dtype for the FINAL linear layer only; ``None``
            inherits ``dtype``. ``jnp.float32`` keeps a bf16 trunk but
            computes the output head at full precision — the head is a
            [B, H] @ [H, out] matmul with tiny ``out``, so this costs ~0
            while removing bf16 quantization from the network's output
            (see README "Known limitations" on bf16 sigma collapse).
    """

    output_dim: int | Sequence[int]
    hidden_dims: Sequence[int]
    activation: str = "elu"
    last_activation: str | None = None
    init_scales: float | Sequence[float] | None = None
    dtype: jnp.dtype | None = None
    head_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = resolve_nn_activation(self.activation)
        input_dim = x.shape[-1]
        hidden = [input_dim if d == -1 else d for d in self.hidden_dims]

        if isinstance(self.output_dim, int):
            final_dim = self.output_dim
            out_shape = None
        else:
            out_shape = tuple(self.output_dim)
            final_dim = reduce(lambda a, b: a * b, out_shape)

        dims = [input_dim] + list(hidden) + [final_dim]
        num_linear = len(dims) - 1

        def layer_inits(idx: int, fan_in: int):
            if self.init_scales is None:
                return torch_linear_kernel_init, _torch_bias_init(fan_in)
            if isinstance(self.init_scales, (list, tuple)):
                gain = self.init_scales[idx]
            else:
                gain = self.init_scales
            return nn.initializers.orthogonal(scale=gain), nn.initializers.zeros_init()

        for i in range(num_linear):
            kernel_init, bias_init = layer_inits(i, dims[i])
            is_head = i == num_linear - 1
            layer_dtype = (
                self.head_dtype if (is_head and self.head_dtype is not None) else self.dtype
            )
            x = nn.Dense(
                dims[i + 1],
                kernel_init=kernel_init,
                bias_init=bias_init,
                dtype=layer_dtype,
                name=f"dense_{i}",
            )(x)
            if i < num_linear - 1:
                x = act(x)

        if out_shape is not None:
            x = x.reshape(*x.shape[:-1], *out_shape)
        if self.last_activation is not None:
            x = resolve_nn_activation(self.last_activation)(x)
        # network outputs feed fp32 algorithm math (GAE, losses, sampling);
        # reduced precision stays confined to the matmuls
        if self.dtype is not None and x.dtype != jnp.float32:
            x = x.astype(jnp.float32)
        return x
