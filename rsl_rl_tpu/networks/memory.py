"""Recurrent memory (GRU/LSTM) with explicit carried state.

TPU-native counterpart of the reference ``Memory`` wrapper
(reference: rsl_rl/networks/memory.py:13-70). The reference keeps hidden
states as module attributes, mutates them per step, and replays padded
trajectory batches for BPTT. Here hidden state is an explicit carry pytree:

- single-step acting/inference: ``Memory.step(params, carry, x)`` — NOT
  raw ``apply``: ``step`` honors ``compute_dtype`` with the same
  matmul-operand-cast scheme as the fused replay kernels, keeping act-time
  and replay-time trajectories identical under bf16,
- BPTT replay: ``memory_sequence`` runs a time-major ``lax.scan`` with
  done-masked carry resets, which reproduces the reference's
  split-and-pad-trajectories replay exactly (a trajectory that starts
  mid-window had its hidden zeroed at rollout time, so masked resets at the
  same positions yield identical hidden trajectories) without any padding
  machinery (replaces utils.py:78-141 + rollout_storage.py:206-260).

Weight init follows torch's RNN default: U(-1/sqrt(hidden), 1/sqrt(hidden))
for all kernels and biases.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _torch_rnn_init(hidden_size: int):
    bound = 1.0 / math.sqrt(hidden_size)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Memory(nn.Module):
    """Stacked GRU/LSTM cells, one step per call.

    Attributes:
        hidden_size: Hidden dimension of each layer.
        rnn_type: ``"lstm"`` or ``"gru"`` (reference memory.py:22-24).
        num_layers: Number of stacked layers.
    """

    hidden_size: int = 256
    rnn_type: str = "lstm"
    num_layers: int = 1
    #: ``None`` = exact fp32. ``jnp.bfloat16`` = bf16 matmul operands with
    #: fp32 params/state/gate math on EVERY path (operand casts in the
    #: explicit step math AND inside the Pallas kernels) — the same scheme as
    #: ``MLP(dtype=bfloat16)``, and crucially *the same scheme at act time
    #: and replay time*, so rollout log-probs equal replayed log-probs.
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, carry: Any, x: jax.Array) -> tuple[Any, jax.Array]:
        """One recurrent step (fp32 cells; param creation lives here).

        Use :meth:`step` at call sites — it honors ``compute_dtype`` by
        dispatching to the explicit mixed-precision step math.
        """
        init = _torch_rnn_init(self.hidden_size)
        new_carry = []
        out = x
        for layer in range(self.num_layers):
            if self.rnn_type.lower() == "gru":
                cell = nn.GRUCell(
                    features=self.hidden_size,
                    kernel_init=init,
                    recurrent_kernel_init=init,
                    bias_init=init,
                    name=f"cell_{layer}",
                )
            else:
                cell = nn.OptimizedLSTMCell(
                    features=self.hidden_size,
                    kernel_init=init,
                    recurrent_kernel_init=init,
                    bias_init=init,
                    name=f"cell_{layer}",
                )
            layer_carry, out = cell(carry[layer], out)
            new_carry.append(layer_carry)
        return tuple(new_carry), out

    def step(self, params: Any, carry: Any, x: jax.Array) -> tuple[Any, jax.Array]:
        """One recurrent step honoring ``compute_dtype`` — the acting-mode
        forward (reference: rsl_rl/networks/memory.py:27-38, the
        ``hidden_states is not None`` inference branch).

        With ``compute_dtype=None`` this is exactly ``apply`` (flax cells,
        fp32). Otherwise it runs the explicit per-gate math with matmul
        operands cast to the compute dtype and fp32 accumulation/state —
        bit-matching the scheme inside the fused Pallas replay kernels, so a
        window replayed by the kernels reproduces the acting trajectory.
        """
        if self.compute_dtype is None:
            return self.apply({"params": params}, carry, x)
        step_fn = gru_step_mixed if self.rnn_type.lower() == "gru" else lstm_step_mixed
        new_carry = []
        out = x
        for layer in range(self.num_layers):
            layer_carry, out = step_fn(
                params[f"cell_{layer}"], carry[layer], out, self.compute_dtype
            )
            new_carry.append(layer_carry)
        return tuple(new_carry), out

    def initialize_carry(self, batch_size: int) -> Any:
        """Zero carry: tuple over layers of h (GRU) or (c, h) (LSTM)."""
        shape = (batch_size, self.hidden_size)
        if self.rnn_type.lower() == "gru":
            return tuple(jnp.zeros(shape, jnp.float32) for _ in range(self.num_layers))
        return tuple(
            (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
            for _ in range(self.num_layers)
        )

    def sequence(self, params: Any, carry0: Any, xs: jax.Array, resets: jax.Array) -> jax.Array:
        """BPTT replay of a whole window with done-masked resets.

        Dispatches to the fused Pallas kernels on TPU when the shape gate
        admits it (128-aligned hidden/batch, VMEM-bounded); multi-layer stacks
        run layer-by-layer, each layer one fused full-window call (layer k+1
        consumes layer k's output sequence — identical math to the stacked
        per-step scan). Otherwise runs the generic time-major scan
        (``memory_sequence``). All paths are numerically identical
        (tests/test_pallas_rnn.py).
        """
        return self.sequence_with_carry(params, carry0, xs, resets)[0]

    def sequence_with_carry(
        self, params: Any, carry0: Any, xs: jax.Array, resets: jax.Array
    ) -> tuple[jax.Array, Any]:
        """:meth:`sequence` that also returns the carry after the last step.

        The returned carry is VALUE-ONLY (``stop_gradient``-wrapped on the
        Pallas path) — it exists for truncated-BPTT replay, which detaches the
        carry at segment boundaries (reference distillation.py:136); do not
        differentiate through it.
        """
        from rsl_rl_tpu.ops.pallas_rnn import (
            gru_sequence_with_carry,
            lstm_sequence_with_carry,
            supports_pallas_rnn,
        )

        B = xs.shape[1]
        if supports_pallas_rnn(B, self.hidden_size, self.rnn_type):
            out = xs
            finals = []
            for layer in range(self.num_layers):
                p = params[f"cell_{layer}"]
                if self.rnn_type.lower() == "gru":
                    out, final = gru_sequence_with_carry(
                        p, carry0[layer], out, resets, compute_dtype=self.compute_dtype
                    )
                else:
                    out, final = lstm_sequence_with_carry(
                        p, carry0[layer], out, resets, compute_dtype=self.compute_dtype
                    )
                finals.append(final)
            return out, tuple(finals)
        apply_step = lambda c, x: self.step(params, c, x)
        final_carry, outs = memory_sequence_with_carry(apply_step, carry0, xs, resets)
        return outs, jax.lax.stop_gradient(final_carry)


def paired_sequence(
    mem_a: Memory,
    params_a: Any,
    carry0_a: Any,
    xs_a: jax.Array,
    mem_b: Memory,
    params_b: Any,
    carry0_b: Any,
    xs_b: jax.Array,
    resets: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """BPTT-replay two same-shaped memories, fusing each layer's two replays
    into ONE Pallas dispatch when the paired kernels apply.

    The recurrent PPO update replays the actor and the critic memory over the
    same window (same ``[T, B, D]`` input shape, same resets, independent
    weights) once per minibatch pass; the stream-paired kernels
    (``ops.pallas_rnn.gru_sequence_pair`` / ``lstm_sequence_pair``) run both
    in one kernel, halving the fixed per-call pipeline cost. Falls back to
    two independent :meth:`Memory.sequence` calls whenever the memories are
    not twins (different cell type/width/depth/dtype), the inputs differ in
    shape, or the paired shape gate rejects — so this is always safe to call.

    Equivalent to the reference replaying actor then critic memories back to
    back (reference actor_critic_recurrent.py:159-176); numerically identical
    to the two separate calls (tests/test_pallas_rnn.py::TestPairedReplay).

    Returns ``(outs_a, outs_b)``, each ``[T, B, H]``.
    """
    from rsl_rl_tpu.ops import pallas_rnn

    twins = (
        mem_a.rnn_type.lower() == mem_b.rnn_type.lower()
        and mem_a.hidden_size == mem_b.hidden_size
        and mem_a.num_layers == mem_b.num_layers
        and mem_a.compute_dtype == mem_b.compute_dtype
        and xs_a.shape == xs_b.shape
    )
    B = xs_a.shape[1]
    # layer 0 consumes D, deeper layers consume H: every layer must pass the
    # paired gate for an all-paired stack
    dims = {xs_a.shape[-1]} | ({mem_a.hidden_size} if mem_a.num_layers > 1 else set())
    pairable = (
        twins
        and all(
            pallas_rnn.supports_pallas_rnn_pair(B, mem_a.hidden_size, mem_a.rnn_type, d)
            for d in dims
        )
        # vmapped callers (multiseed) take two independent fused calls: the
        # paired cores' batching behavior is unverified on hardware, while
        # the single cores' is TPU-proven (runners/multiseed.py docstring)
        and not pallas_rnn.under_vmap()
    )
    if not pairable:
        return (
            mem_a.sequence(params_a, carry0_a, xs_a, resets),
            mem_b.sequence(params_b, carry0_b, xs_b, resets),
        )

    pair_fn = (
        pallas_rnn.gru_sequence_pair
        if mem_a.rnn_type.lower() == "gru"
        else pallas_rnn.lstm_sequence_pair
    )
    out_a, out_b = xs_a, xs_b
    for layer in range(mem_a.num_layers):
        out_a, out_b = pair_fn(
            (params_a[f"cell_{layer}"], params_b[f"cell_{layer}"]),
            (carry0_a[layer], carry0_b[layer]),
            (out_a, out_b),
            resets,
            compute_dtype=mem_a.compute_dtype,
        )
    return out_a, out_b


def _mm_mixed(a: jax.Array, w: jax.Array, dt) -> jax.Array:
    """bf16-operand matmul with fp32 accumulation — identical to the
    ``_mm`` helper inside the Pallas kernels (ops/pallas_rnn.py)."""
    return jnp.dot(a.astype(dt), w.astype(dt), preferred_element_type=jnp.float32)


def gru_step_mixed(p: dict, h, x: jax.Array, dt) -> tuple[Any, jax.Array]:
    """One flax-``GRUCell``-equivalent step with mixed-precision matmuls
    (the bf16 variant of the reference's GRU single-step forward,
    reference memory.py:27-38 via torch ``nn.GRU``).

    Gate formulas mirror ``flax.linen.GRUCell`` (``ir/iz/in`` dense-i with
    bias, ``hr/hz`` dense-h without, ``hn`` with); only the matmul operands
    are cast to ``dt`` — gate math, bias adds, and the carry stay fp32,
    exactly like the fused kernel's forward (pallas_rnn._fwd_kernel).
    """
    r = jax.nn.sigmoid(
        _mm_mixed(x, p["ir"]["kernel"], dt) + p["ir"]["bias"]
        + _mm_mixed(h, p["hr"]["kernel"], dt)
    )
    z = jax.nn.sigmoid(
        _mm_mixed(x, p["iz"]["kernel"], dt) + p["iz"]["bias"]
        + _mm_mixed(h, p["hz"]["kernel"], dt)
    )
    n = jnp.tanh(
        _mm_mixed(x, p["in"]["kernel"], dt) + p["in"]["bias"]
        + r * (_mm_mixed(h, p["hn"]["kernel"], dt) + p["hn"]["bias"])
    )
    h_new = (1.0 - z) * n + z * h
    return h_new, h_new


def lstm_step_mixed(p: dict, carry, x: jax.Array, dt) -> tuple[Any, jax.Array]:
    """One flax-``OptimizedLSTMCell``-equivalent step with mixed-precision
    matmuls (``ii/if/ig/io`` without bias, ``hi/hf/hg/ho`` with); same
    operand-cast scheme as :func:`gru_step_mixed` and the LSTM kernel (the
    bf16 variant of the reference's LSTM single-step forward,
    reference memory.py:27-38 via torch ``nn.LSTM``)."""
    c, h = carry
    def gate(k):
        return (
            _mm_mixed(x, p[f"i{k}"]["kernel"], dt)
            + _mm_mixed(h, p[f"h{k}"]["kernel"], dt)
            + p[f"h{k}"]["bias"]
        )
    i = jax.nn.sigmoid(gate("i"))
    f = jax.nn.sigmoid(gate("f"))
    g = jnp.tanh(gate("g"))
    o = jax.nn.sigmoid(gate("o"))
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return (c_new, h_new), h_new


def mask_carry(carry: Any, reset_mask: jax.Array) -> Any:
    """Zero the carry rows where ``reset_mask`` is set.

    Equivalent of resetting hidden states of done envs
    (reference: rsl_rl/networks/memory.py:40-56). ``reset_mask``: [N] bool.
    """
    mask = reset_mask.astype(jnp.float32)[:, None]
    return jax.tree.map(lambda h: h * (1.0 - mask), carry)


def memory_sequence(
    apply_step,
    carry0: Any,
    xs: jax.Array,
    resets: jax.Array,
) -> jax.Array:
    """Replay a window through the memory, resetting carries at dones.

    Args:
        apply_step: ``(carry, x) -> (carry, out)`` single-step closure with
            parameters already bound.
        carry0: Carry entering the first step (the rollout-window start state,
            the analog of the reference's stored per-trajectory-start hiddens
            at rollout_storage.py:239-253).
        xs: ``[T, N, D]`` inputs.
        resets: ``[T, N]`` bool; ``resets[t]`` is the done flag of step
            ``t-1`` (``resets[0]`` must be False — carry0 already reflects any
            reset at the window boundary).

    Returns:
        ``[T, N, H]`` outputs.
    """

    def body(carry, step):
        x, reset = step
        carry = mask_carry(carry, reset)
        carry, out = apply_step(carry, x)
        return carry, out

    _, outs = jax.lax.scan(body, carry0, (xs, resets))
    return outs


def memory_sequence_with_carry(
    apply_step,
    carry0: Any,
    xs: jax.Array,
    resets: jax.Array,
) -> tuple[Any, jax.Array]:
    """:func:`memory_sequence` that also returns the final carry
    (scan-native: ``(final_carry, outs)``)."""

    def body(carry, step):
        x, reset = step
        carry = mask_carry(carry, reset)
        carry, out = apply_step(carry, x)
        return carry, out

    return jax.lax.scan(body, carry0, (xs, resets))
