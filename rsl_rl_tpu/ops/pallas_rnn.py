"""Fused GRU sequence kernels (Pallas, TPU).

The BPTT replay of a recurrent policy is the one hot op in this framework that
XLA's default lowering handles poorly: a `lax.scan` over T timesteps emits T
tiny kernels per minibatch, each re-reading the recurrent weights from HBM and
paying fixed launch overhead (measured: the recurrent PPO update runs ~12x off
the matmul roofline). These kernels fuse the whole time loop: weights stay
resident in VMEM across steps, per-step input projections stream in through
the pallas grid pipeline, and only the truly sequential hidden-state matmuls
run step-by-step.

Structure (see `gru_sequence`):
- the input projection ``x_t @ Wi + bi`` for all steps is ONE big XLA matmul
  (MXU-friendly, differentiable by autodiff as usual),
- the sequential core — gates from the hidden state, done-masked resets, the
  carry chain — is a pallas kernel pair (forward + BPTT backward) wired up
  with ``jax.custom_vjp``.

Math matches ``flax.linen.GRUCell`` exactly (same parameter pytree):

    r  = sigmoid(x_r + h @ W_hr)
    z  = sigmoid(x_z + h @ W_hz)
    n  = tanh(x_n + r * (h @ W_hn + b_hn))
    h' = (1 - z) * n + z * h

with ``h`` pre-masked to zero where ``resets[t]`` is set (the done-masked
carry reset of `rsl_rl_tpu.networks.memory.memory_sequence`).
"""

from __future__ import annotations

import warnings
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ``_under_vmap_raw`` below walks jax internals (``jax._src.core.trace_ctx``
# and the ``BatchTrace`` type name). These privates were verified — by the
# functional self-test in ``_verify_trace_introspection`` AND on real TPU
# hardware — on the jax series listed here. On any other jax the walk may
# silently stop detecting vmap, which would route every vmapped replay to
# the slower (always-correct) xproj cores with only a first-call warning;
# this import-time pin makes the assumption visible BEFORE a benchmark or
# training run starts.
_VERIFIED_JAX_SERIES = ("0.9.",)


def _jax_version_verified(version: str | None = None) -> bool:
    """True when the running jax is a series the trace-walk was verified on."""
    v = jax.__version__ if version is None else version
    return any(v.startswith(p) for p in _VERIFIED_JAX_SERIES)


if not _jax_version_verified():  # pragma: no cover - exercised via unit test
    warnings.warn(
        f"rsl_rl_tpu.ops.pallas_rnn: running on jax {jax.__version__}, which"
        f" is outside the verified series {_VERIFIED_JAX_SERIES} for the"
        " trace-stack introspection that routes vmapped callers to the fused"
        " RNN kernels. The walk is still functionally self-tested on first"
        " use and falls back safely, but re-verify on this jax and extend"
        " _VERIFIED_JAX_SERIES to silence this warning.",
        RuntimeWarning,
        stacklevel=2,
    )


def _pick_block_b(batch: int, max_bb: int = 512) -> int | None:
    """Largest batch block <= max_bb that tiles the batch and the VPU lanes.

    Measured on v5e (GRU H=256, B=1024, T=24 fwd, ~0.43 ms tunnel dispatch
    overhead per standalone call subtracted): BB=512 is optimal — BB=1024
    runs ~0.55 ms slower because the batch-block grid dimension is what
    overlaps the per-step xproj DMA with compute, so one whole-batch block
    exposes the stream latency. Marginal cost is ~12 us/timestep vs ~8 us
    of pure matmul (near-roofline); the remaining fixed ~0.5 ms/call is
    pipeline warmup + the one-shot input projection.
    """
    for bb in (512, 256, 128):
        if bb <= max_bb and batch % bb == 0:
            return bb
    return None


_VMEM_BUDGET_BYTES = 12 * 1024 * 1024  # ~16 MiB/core, leave pipeline headroom


def _gru_pack(cell_params):
    """flax GRUCell param dict -> (wi [D,3H], bi [3H], wh [H,3H], bhn [H]);
    gate ordering r|z|n — the single source of the kernels' weight layout."""
    wi = jnp.concatenate(
        [cell_params["ir"]["kernel"], cell_params["iz"]["kernel"], cell_params["in"]["kernel"]],
        axis=1,
    )
    bi = jnp.concatenate(
        [cell_params["ir"]["bias"], cell_params["iz"]["bias"], cell_params["in"]["bias"]]
    )
    wh = jnp.concatenate(
        [cell_params["hr"]["kernel"], cell_params["hz"]["kernel"], cell_params["hn"]["kernel"]],
        axis=1,
    )
    return wi, bi, wh, cell_params["hn"]["bias"]


def _lstm_pack(cell_params):
    """flax OptimizedLSTMCell param dict -> (wi [D,4H], wh [H,4H], bh [4H]);
    gate ordering i|f|g|o — the single source of the kernels' weight layout."""
    order = ("i", "f", "g", "o")
    wi = jnp.concatenate([cell_params[f"i{k}"]["kernel"] for k in order], axis=1)
    wh = jnp.concatenate([cell_params[f"h{k}"]["kernel"] for k in order], axis=1)
    bh = jnp.concatenate([cell_params[f"h{k}"]["bias"] for k in order])
    return wi, wh, bh


def _vmem_footprint_bytes(batch: int, hidden: int, gates: int) -> int:
    """Conservative VMEM bound for the worst kernel of a sequence (the BPTT
    backward): full-batch carry scratch, weight + weight-grad blocks, and
    double-buffered streamed input/output blocks."""
    bb = _pick_block_b(batch, max_bb=256) or 128
    carry_scratch = (2 if gates == 4 else 1) * batch * hidden
    weight_blocks = 2 * hidden * gates * hidden
    streamed = 2 * (2 * bb * gates * hidden + 6 * bb * hidden)
    return 4 * (carry_scratch + weight_blocks + streamed)


def _under_vmap_raw() -> bool:
    """Walk the ambient trace stack for a ``BatchTrace``. Uses jax internals
    (``jax._src.core.trace_ctx``) — callers must go through
    :func:`under_vmap`, which functionally verifies this walk against the
    running jax version first. The verified jax series is pinned at import
    time in ``_VERIFIED_JAX_SERIES`` above."""
    trace = jax._src.core.trace_ctx.trace  # type: ignore[attr-defined]
    while trace is not None:
        if type(trace).__name__ == "BatchTrace":
            return True
        trace = getattr(trace, "parent_trace", None)
    return False


_INTROSPECTION_OK: bool | None = None  # lazily verified once per process


def _verify_trace_introspection() -> bool:
    """Functional self-test of the private-API walk: adding a real
    ``jax.vmap`` trace must flip the walk to True, and leaving it must
    restore the ambient answer. A jax upgrade that moves ``trace_ctx`` or
    renames ``BatchTrace`` fails this loudly ONCE (warning below) instead of
    silently misrouting kernels forever.

    The test is DELTA-based because the first ``under_vmap()`` call can
    itself happen under an ambient vmap/jit trace (e.g. inside a vmapped
    multiseed train step): the ambient answer is whatever it is; the probe
    vmap must add a detectable BatchTrace on top, and popping it must return
    to the ambient answer."""
    seen = {"inside": False}

    def probe(x):
        seen["inside"] = _under_vmap_raw()
        return x

    try:
        ambient = _under_vmap_raw()
        jax.vmap(probe)(jnp.zeros((2,), jnp.float32))
        after = _under_vmap_raw()
    except Exception:
        return False
    return seen["inside"] and after == ambient


def under_vmap() -> bool:
    """True when tracing under a ``jax.vmap`` transform.

    ``pl.pallas_call``'s batching rule (which prepends a batch grid
    dimension) is TPU-verified for the xproj-streaming cores
    (runners/multiseed.py: 2-seed GRU-128 train step on hardware), but the
    x-streaming and stream-paired cores have not been exercised batched on
    hardware, so vmapped callers dispatch to the xproj cores. Checking leaf
    types is not enough — inside the PPO loss the arrays are grad-trace
    tracers wrapping the batch trace — so walk the ambient trace stack for a
    ``BatchTrace`` (type-name match keeps this robust across jax module
    moves).

    The walk relies on jax internals, so its behavior is verified
    functionally once per process (:func:`_verify_trace_introspection`);
    if the running jax version breaks it, every caller conservatively gets
    True (the xproj cores serve every caller correctly, at a known perf
    cost) and ONE loud warning is emitted.
    tests/test_multiseed.py::test_under_vmap_detection pins the verified
    path end-to-end."""
    global _INTROSPECTION_OK
    if _INTROSPECTION_OK is None:
        _INTROSPECTION_OK = _verify_trace_introspection()
        if not _INTROSPECTION_OK:
            warnings.warn(
                "pallas_rnn.under_vmap: jax trace-stack introspection failed"
                " its self-test (jax internals moved in this jax version);"
                " x-streaming/paired RNN kernels are disabled, falling back"
                " to the (slower, always-correct) xproj cores.",
                RuntimeWarning,
                stacklevel=2,
            )
    if not _INTROSPECTION_OK:
        return True
    return _under_vmap_raw()


def supports_pallas_rnn(batch: int, hidden: int, rnn_type: str = "lstm") -> bool:
    """Shape gate for the fused kernels (fall back to the scan otherwise).

    Besides backend and 128-alignment, bounds the estimated VMEM footprint:
    the kernels allocate full-batch ``(B, H)`` carry scratch, so an oversized
    minibatch x hidden product (e.g. B=8192, H=512) must take the
    ``memory_sequence`` fallback instead of failing at compile time.
    """
    gates = 3 if rnn_type.lower() == "gru" else 4
    return (
        jax.default_backend() == "tpu"
        and hidden % 128 == 0
        and _pick_block_b(batch) is not None
        and _vmem_footprint_bytes(batch, hidden, gates) <= _VMEM_BUDGET_BYTES
    )


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _mm(a, b, dt):
    """Kernel matmul: fp32 accumulate, optionally bf16 operands.

    With ``dt=bfloat16`` the MXU runs at its native (2x) bf16 rate while the
    hidden state, gate math, and all accumulations stay fp32 — the standard
    TPU mixed-precision scheme (same as ``MLP(dtype=bfloat16)``).
    """
    if dt is not None:
        a, b = a.astype(dt), b.astype(dt)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _fwd_kernel(dt, xproj_ref, resets_ref, carry0_ref, wh_ref, bhn_ref, hs_ref, h_scr):
    t = pl.program_id(0)
    b = pl.program_id(1)
    H = carry0_ref.shape[-1]
    BB = carry0_ref.shape[0]
    bs = pl.ds(b * BB, BB)

    @pl.when(t == 0)
    def _():
        h_scr[bs, :] = carry0_ref[:]

    h = h_scr[bs, :] * (1.0 - resets_ref[0, 0, :][:, None])
    x = xproj_ref[0]
    wh = wh_ref[:]
    r = jax.nn.sigmoid(x[:, :H] + _mm(h, wh[:, :H], dt))
    z = jax.nn.sigmoid(x[:, H : 2 * H] + _mm(h, wh[:, H : 2 * H], dt))
    u = _mm(h, wh[:, 2 * H :], dt) + bhn_ref[0]
    n = jnp.tanh(x[:, 2 * H :] + r * u)
    h_new = (1.0 - z) * n + z * h
    h_scr[bs, :] = h_new
    hs_ref[0] = h_new


def _gru_core_fwd_impl(wh, bhn, carry0, xproj, resets, dt=None):
    T, B, H3 = xproj.shape
    H = H3 // 3
    BB = _pick_block_b(B)
    grid = (T, B // BB)
    return pl.pallas_call(
        partial(_fwd_kernel, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BB, 3 * H), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB), lambda t, b: (t, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BB, H), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * 3 * H,
            bytes_accessed=4 * (T * B * 3 * H + T * B * H + H * 3 * H),
            transcendentals=3 * T * B * H,
        ),
    )(xproj, resets, carry0, wh, bhn)


# --------------------------------------------------------------------------
# backward kernel (BPTT, reverse time order)
# --------------------------------------------------------------------------


def _bwd_kernel(
    dt,
    xproj_ref,
    resets_ref,
    carry0_ref,
    wh_ref,
    bhn_ref,
    hs_prev_ref,
    ghs_ref,
    dxproj_ref,
    dcarry0_ref,
    dwh_ref,
    dbhn_ref,
    dh_scr,
    dwh_scr,
    dbhn_scr,
):
    T = pl.num_programs(0)
    g_id = pl.program_id(0)
    t = T - 1 - g_id
    b = pl.program_id(1)
    H = carry0_ref.shape[-1]
    BB = carry0_ref.shape[0]
    bs = pl.ds(b * BB, BB)

    @pl.when(g_id == 0)
    def _():
        dh_scr[bs, :] = jnp.zeros((BB, H), jnp.float32)

    @pl.when((g_id == 0) & (b == 0))
    def _():
        dwh_scr[:] = jnp.zeros_like(dwh_scr)
        dbhn_scr[:] = jnp.zeros_like(dbhn_scr)

    reset = resets_ref[0, 0, :][:, None]
    h_prev_raw = jnp.where(t == 0, carry0_ref[:], hs_prev_ref[0])
    h = h_prev_raw * (1.0 - reset)

    # recompute forward intermediates for step t (same dt casts as forward,
    # so the recomputed activations match the forward pass exactly)
    x = xproj_ref[0]
    wh = wh_ref[:]
    r = jax.nn.sigmoid(x[:, :H] + _mm(h, wh[:, :H], dt))
    z = jax.nn.sigmoid(x[:, H : 2 * H] + _mm(h, wh[:, H : 2 * H], dt))
    u = _mm(h, wh[:, 2 * H :], dt) + bhn_ref[0]
    n = jnp.tanh(x[:, 2 * H :] + r * u)

    # incoming gradient: output grad of this step + carry grad from step t+1
    g = ghs_ref[0] + dh_scr[bs, :]

    dz = g * (h - n) * z * (1.0 - z)
    dn_pre = g * (1.0 - z) * (1.0 - n * n)
    du = dn_pre * r
    dr_pre = dn_pre * u * r * (1.0 - r)

    dxproj_ref[0] = jnp.concatenate([dr_pre, dz, dn_pre], axis=-1)

    dgates = jnp.concatenate([dr_pre, dz, du], axis=-1)  # [BB, 3H]
    dh = g * z + _mm(dgates, wh.T, dt)

    dwh_scr[:] += _mm(h.T, dgates, dt)
    dbhn_scr[0, :] += jnp.sum(du, axis=0)

    dh_prev = dh * (1.0 - reset)
    dh_scr[bs, :] = dh_prev

    @pl.when(t == 0)
    def _():
        dcarry0_ref[:] = dh_prev

    @pl.when((g_id == T - 1) & (b == pl.num_programs(1) - 1))
    def _():
        dwh_ref[:] = dwh_scr[:]
        dbhn_ref[:] = dbhn_scr[:]


def _gru_core_bwd_impl(wh, bhn, carry0, xproj, resets, hs, ghs, dt=None):
    T, B, H3 = xproj.shape
    H = H3 // 3
    # bwd block footprint ~2x fwd's; 256 keeps the worst kernel within the
    # _vmem_footprint_bytes estimate the shape gate admits against
    BB = _pick_block_b(B, max_bb=256)
    grid = (T, B // BB)

    def rev_t(t, b):
        return (T - 1 - t, b, 0)

    # hs_prev block for step t is hs[t-1]; at t==0 the kernel substitutes
    # carry0, so any valid block may be mapped there (use block 0).
    def rev_t_prev(t, b):
        return (jnp.maximum(T - 2 - t, 0), b, 0)

    dxproj, dcarry0, dwh, dbhn = pl.pallas_call(
        partial(_bwd_kernel, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BB, 3 * H), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB), lambda t, b: (T - 1 - t, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), rev_t_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), rev_t, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, 3 * H), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((H, 3 * H), jnp.float32),
            pltpu.VMEM((1, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * T * B * H * 3 * H,
            bytes_accessed=4 * (3 * T * B * 3 * H + 2 * T * B * H + H * 3 * H),
            transcendentals=3 * T * B * H,
        ),
    )(xproj, resets, carry0, wh, bhn, hs, ghs)
    return dwh, dbhn, dcarry0, dxproj


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gru_core(dt, wh, bhn, carry0, xproj, resets):
    return _gru_core_fwd_impl(wh, bhn, carry0, xproj, resets, dt=dt)


def _gru_core_fwd(dt, wh, bhn, carry0, xproj, resets):
    hs = _gru_core_fwd_impl(wh, bhn, carry0, xproj, resets, dt=dt)
    return hs, (wh, bhn, carry0, xproj, resets, hs)


def _gru_core_bwd(dt, res, ghs):
    wh, bhn, carry0, xproj, resets, hs = res
    dwh, dbhn, dcarry0, dxproj = _gru_core_bwd_impl(
        wh, bhn, carry0, xproj, resets, hs, ghs, dt=dt
    )
    return dwh, dbhn, dcarry0, dxproj, jnp.zeros_like(resets)


_gru_core.defvjp(_gru_core_fwd, _gru_core_bwd)


# --------------------------------------------------------------------------
# x-streaming GRU core (small input dims)
#
# The xproj-streaming kernels above move [T, B, 3H] projections through HBM
# three times (fwd read, bwd read, bwd dxproj write) — at GRU-256/B=1024/T=24
# that is ~225 MB per replay and the measured bottleneck (the kernels are
# HBM-bandwidth-bound; bf16 MXU rate changes nothing). When the input dim D
# is small (policy obs, D << 3H), streaming the RAW inputs [T, B, D] instead
# and (re)computing the input projection inside the kernel cuts that traffic
# by ~3H/D: the projection matmul [BB, D] @ [D, 3H] is FLOP-trivial, the
# input-weight grads accumulate in a [D, 3H] VMEM scratch, and the bulk
# xproj/dxproj matmuls outside the kernel disappear entirely. Forward values
# are BIT-IDENTICAL to the xproj path (same dot products, same operand-cast
# scheme; row-wise results do not depend on batch blocking).
# --------------------------------------------------------------------------

#: use the x-streaming kernels when the input dim is at most this (beyond it
#: the resident [D, 3H] weight/grad blocks start to crowd VMEM, and the
#: bandwidth advantage over streaming [*, 3H] projections shrinks anyway)
_X_STREAM_MAX_D = 512


def _x_stream_ok(batch: int, hidden: int, gates: int, d: int) -> bool:
    """Whether the x-streaming core fits: D small enough to pay off AND the
    worst kernel (BPTT backward) fits VMEM with the extra resident
    ``[D, gates*H]`` input-weight + input-weight-grad blocks."""
    bb = _pick_block_b(batch, max_bb=256) or 128
    carry_scratch = (2 if gates == 4 else 1) * batch * hidden
    resident_w = 2 * hidden * gates * hidden + 2 * d * gates * hidden
    # double-buffered streamed blocks: x + dx, plus the [BB, H] hidden-state
    # streams (gru: hs_prev + ghs; lstm: hs_prev + cs_prev + cs + ghs)
    streamed = 2 * (2 * bb * d + (2 if gates == 3 else 4) * bb * hidden)
    return (
        d <= _X_STREAM_MAX_D
        and 4 * (carry_scratch + resident_w + streamed) <= _VMEM_BUDGET_BYTES
    )


def _fwd_kernel_x(
    dt, x_ref, resets_ref, carry0_ref, wx_ref, bx_ref, wh_ref, bhn_ref, hs_ref, h_scr
):
    t = pl.program_id(0)
    b = pl.program_id(1)
    H = carry0_ref.shape[-1]
    BB = carry0_ref.shape[0]
    bs = pl.ds(b * BB, BB)

    @pl.when(t == 0)
    def _():
        h_scr[bs, :] = carry0_ref[:]

    h = h_scr[bs, :] * (1.0 - resets_ref[0, 0, :][:, None])
    x = _mm(x_ref[0], wx_ref[:], dt) + bx_ref[0]
    wh = wh_ref[:]
    r = jax.nn.sigmoid(x[:, :H] + _mm(h, wh[:, :H], dt))
    z = jax.nn.sigmoid(x[:, H : 2 * H] + _mm(h, wh[:, H : 2 * H], dt))
    u = _mm(h, wh[:, 2 * H :], dt) + bhn_ref[0]
    n = jnp.tanh(x[:, 2 * H :] + r * u)
    h_new = (1.0 - z) * n + z * h
    h_scr[bs, :] = h_new
    hs_ref[0] = h_new


def _gru_core_x_fwd_impl(wx, bx, wh, bhn, carry0, xs, resets, dt=None):
    T, B, D = xs.shape
    H = wh.shape[0]
    BB = _pick_block_b(B)
    grid = (T, B // BB)
    return pl.pallas_call(
        partial(_fwd_kernel_x, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BB, D), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB), lambda t, b: (t, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BB, H), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * (H + D) * 3 * H,
            bytes_accessed=4 * (T * B * D + T * B * H + (H + D) * 3 * H),
            transcendentals=3 * T * B * H,
        ),
    )(xs, resets, carry0, wx, bx, wh, bhn)


def _bwd_kernel_x(
    dt,
    x_ref,
    resets_ref,
    carry0_ref,
    wx_ref,
    bx_ref,
    wh_ref,
    bhn_ref,
    hs_prev_ref,
    ghs_ref,
    dx_ref,
    dcarry0_ref,
    dwx_ref,
    dbx_ref,
    dwh_ref,
    dbhn_ref,
    dh_scr,
    dwx_scr,
    dbx_scr,
    dwh_scr,
    dbhn_scr,
):
    T = pl.num_programs(0)
    g_id = pl.program_id(0)
    t = T - 1 - g_id
    b = pl.program_id(1)
    H = carry0_ref.shape[-1]
    BB = carry0_ref.shape[0]
    bs = pl.ds(b * BB, BB)

    @pl.when(g_id == 0)
    def _():
        dh_scr[bs, :] = jnp.zeros((BB, H), jnp.float32)

    @pl.when((g_id == 0) & (b == 0))
    def _():
        dwx_scr[:] = jnp.zeros_like(dwx_scr)
        dbx_scr[:] = jnp.zeros_like(dbx_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)
        dbhn_scr[:] = jnp.zeros_like(dbhn_scr)

    reset = resets_ref[0, 0, :][:, None]
    h_prev_raw = jnp.where(t == 0, carry0_ref[:], hs_prev_ref[0])
    h = h_prev_raw * (1.0 - reset)

    # recompute forward intermediates for step t (same dt casts as forward,
    # so the recomputed activations match the forward pass exactly)
    x_raw = x_ref[0]
    x = _mm(x_raw, wx_ref[:], dt) + bx_ref[0]
    wh = wh_ref[:]
    r = jax.nn.sigmoid(x[:, :H] + _mm(h, wh[:, :H], dt))
    z = jax.nn.sigmoid(x[:, H : 2 * H] + _mm(h, wh[:, H : 2 * H], dt))
    u = _mm(h, wh[:, 2 * H :], dt) + bhn_ref[0]
    n = jnp.tanh(x[:, 2 * H :] + r * u)

    g = ghs_ref[0] + dh_scr[bs, :]

    dz = g * (h - n) * z * (1.0 - z)
    dn_pre = g * (1.0 - z) * (1.0 - n * n)
    du = dn_pre * r
    dr_pre = dn_pre * u * r * (1.0 - r)

    dxproj = jnp.concatenate([dr_pre, dz, dn_pre], axis=-1)  # [BB, 3H]
    dx_ref[0] = _mm(dxproj, wx_ref[:].T, dt)
    dwx_scr[:] += _mm(x_raw.T, dxproj, dt)
    dbx_scr[0, :] += jnp.sum(dxproj, axis=0)

    dgates = jnp.concatenate([dr_pre, dz, du], axis=-1)  # [BB, 3H]
    dh = g * z + _mm(dgates, wh.T, dt)

    dwh_scr[:] += _mm(h.T, dgates, dt)
    dbhn_scr[0, :] += jnp.sum(du, axis=0)

    dh_prev = dh * (1.0 - reset)
    dh_scr[bs, :] = dh_prev

    @pl.when(t == 0)
    def _():
        dcarry0_ref[:] = dh_prev

    @pl.when((g_id == T - 1) & (b == pl.num_programs(1) - 1))
    def _():
        dwx_ref[:] = dwx_scr[:]
        dbx_ref[:] = dbx_scr[:]
        dwh_ref[:] = dwh_scr[:]
        dbhn_ref[:] = dbhn_scr[:]


def _gru_core_x_bwd_impl(wx, bx, wh, bhn, carry0, xs, resets, hs, ghs, dt=None):
    T, B, D = xs.shape
    H = wh.shape[0]
    BB = _pick_block_b(B, max_bb=256)
    grid = (T, B // BB)

    def rev_t(t, b):
        return (T - 1 - t, b, 0)

    def rev_t_prev(t, b):
        return (jnp.maximum(T - 2 - t, 0), b, 0)

    dx, dcarry0, dwx, dbx, dwh, dbhn = pl.pallas_call(
        partial(_bwd_kernel_x, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BB, D), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB), lambda t, b: (T - 1 - t, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), rev_t_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), rev_t, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, D), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((D, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((D, 3 * H), jnp.float32),
            pltpu.VMEM((1, 3 * H), jnp.float32),
            pltpu.VMEM((H, 3 * H), jnp.float32),
            pltpu.VMEM((1, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * T * B * (H + D) * 3 * H,
            bytes_accessed=4 * (2 * T * B * D + 2 * T * B * H + 2 * (H + D) * 3 * H),
            transcendentals=3 * T * B * H,
        ),
    )(xs, resets, carry0, wx, bx, wh, bhn, hs, ghs)
    return dwx, dbx, dwh, dbhn, dcarry0, dx


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gru_core_x(dt, wx, bx, wh, bhn, carry0, xs, resets):
    return _gru_core_x_fwd_impl(wx, bx, wh, bhn, carry0, xs, resets, dt=dt)


def _gru_core_x_fwd(dt, wx, bx, wh, bhn, carry0, xs, resets):
    hs = _gru_core_x_fwd_impl(wx, bx, wh, bhn, carry0, xs, resets, dt=dt)
    return hs, (wx, bx, wh, bhn, carry0, xs, resets, hs)


def _gru_core_x_bwd(dt, res, ghs):
    wx, bx, wh, bhn, carry0, xs, resets, hs = res
    dwx, dbx, dwh, dbhn, dcarry0, dx = _gru_core_x_bwd_impl(
        wx, bx, wh, bhn, carry0, xs, resets, hs, ghs, dt=dt
    )
    return dwx, dbx, dwh, dbhn, dcarry0, dx, jnp.zeros_like(resets)


_gru_core_x.defvjp(_gru_core_x_fwd, _gru_core_x_bwd)


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------


def gru_sequence(
    cell_params: dict, carry0: jax.Array, xs: jax.Array, resets: jax.Array,
    compute_dtype=None,
) -> jax.Array:
    """Run a full GRU window with done-masked resets, fused on TPU.

    Drop-in equivalent of scanning ``flax.linen.GRUCell`` over time with
    :func:`rsl_rl_tpu.networks.memory.mask_carry` resets (verified
    numerically, values and gradients, in tests/test_pallas_rnn.py).

    Args:
        cell_params: flax GRUCell param dict (``ir/iz/in`` with bias,
            ``hr/hz`` without, ``hn`` with).
        carry0: ``[B, H]`` hidden state entering step 0.
        xs: ``[T, B, D]`` inputs.
        resets: ``[T, B]`` bool/float; ``resets[t]`` zeroes the carry before
            step ``t``.
        compute_dtype: ``None`` (exact fp32, matches the scan path
            bit-for-bit) or ``jnp.bfloat16`` — matmul operands cast to bf16
            with fp32 accumulation/state (2x MXU rate; small bounded error,
            tests/test_pallas_rnn.py::TestBf16Compute).

    Returns:
        ``[T, B, H]`` hidden outputs.
    """
    T, B, D = xs.shape
    wi, bi, wh, bhn = _gru_pack(cell_params)  # gate ordering r|z|n
    bhn = bhn[None, :]
    H = wh.shape[0]

    if _x_stream_ok(B, H, 3, D) and not under_vmap():
        # small input dim: stream raw inputs, project inside the kernel —
        # ~3H/D less HBM traffic, bit-identical forward values (see the
        # x-streaming section above). Vmapped callers use the xproj core
        # below (the TPU-verified-batched path; see under_vmap).
        return _gru_core_x(
            compute_dtype,
            wi,
            bi[None, :],
            wh,
            bhn,
            carry0.astype(jnp.float32),
            xs.astype(jnp.float32),
            resets.astype(jnp.float32).reshape(T, 1, B),
        )

    # wide inputs: one bulk MXU matmul for all input projections, stream those
    xproj = _mm(xs.reshape(T * B, -1), wi, compute_dtype) + bi
    return _gru_core(
        compute_dtype,
        wh,
        bhn,
        carry0.astype(jnp.float32),
        xproj.reshape(T, B, 3 * H).astype(jnp.float32),
        resets.astype(jnp.float32).reshape(T, 1, B),
    )


# --------------------------------------------------------------------------
# LSTM (flax OptimizedLSTMCell): i|f|g|o gate order
#
#   i = sigmoid(x_i + h W_hi + b_i)      f = sigmoid(x_f + h W_hf + b_f)
#   g = tanh   (x_g + h W_hg + b_g)      o = sigmoid(x_o + h W_ho + b_o)
#   c' = f*c + i*g                       h' = o * tanh(c')
#
# with (c, h) pre-masked to zero where resets[t] is set.
#
# Measured roofline (v5e, benchmarks/roofline_rnn.py, learn shape T=24
# B=1024 H=256 D=15): paired fwd+bwd 1668 us fp32 / 1592 us bf16 — 1.31x
# the paired GRU at identical achieved TFLOP/s, i.e. exactly the 4/3 gate
# ratio; the LSTM's extra cs stream costs nothing measurable beyond it.
# BB=512 is optimal (1684/1719 us at 256/128), same as the GRU's pick
# above. Conclusion: gate-count-bound relative to the GRU; bf16 operands
# are the remaining knob (+4.7% on the full recurrent iteration).
# --------------------------------------------------------------------------


def _lstm_fwd_kernel(
    dt, xproj_ref, resets_ref, c0_ref, h0_ref, wh_ref, bh_ref, hs_ref, cs_ref, c_scr, h_scr
):
    t = pl.program_id(0)
    b = pl.program_id(1)
    H = h0_ref.shape[-1]
    BB = h0_ref.shape[0]
    bs = pl.ds(b * BB, BB)

    @pl.when(t == 0)
    def _():
        c_scr[bs, :] = c0_ref[:]
        h_scr[bs, :] = h0_ref[:]

    keep = 1.0 - resets_ref[0, 0, :][:, None]
    c = c_scr[bs, :] * keep
    h = h_scr[bs, :] * keep
    gates = xproj_ref[0] + _mm(h, wh_ref[:], dt) + bh_ref[0]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    c_scr[bs, :] = c_new
    h_scr[bs, :] = h_new
    hs_ref[0] = h_new
    cs_ref[0] = c_new


def _lstm_core_fwd_impl(wh, bh, c0, h0, xproj, resets, dt=None):
    T, B, H4 = xproj.shape
    H = H4 // 4
    BB = _pick_block_b(B)
    grid = (T, B // BB)
    return pl.pallas_call(
        partial(_lstm_fwd_kernel, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BB, 4 * H), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB), lambda t, b: (t, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, H), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * 4 * H,
            bytes_accessed=4 * (T * B * 4 * H + 2 * T * B * H + H * 4 * H),
            transcendentals=4 * T * B * H,
        ),
    )(xproj, resets, c0, h0, wh, bh)


def _lstm_bwd_kernel(
    dt,
    xproj_ref,
    resets_ref,
    c0_ref,
    h0_ref,
    wh_ref,
    bh_ref,
    hs_prev_ref,
    cs_prev_ref,
    cs_ref,
    ghs_ref,
    dxproj_ref,
    dc0_ref,
    dh0_ref,
    dwh_ref,
    dbh_ref,
    dc_scr,
    dh_scr,
    dwh_scr,
    dbh_scr,
):
    T = pl.num_programs(0)
    g_id = pl.program_id(0)
    t = T - 1 - g_id
    b = pl.program_id(1)
    H = h0_ref.shape[-1]
    BB = h0_ref.shape[0]
    bs = pl.ds(b * BB, BB)

    @pl.when(g_id == 0)
    def _():
        dc_scr[bs, :] = jnp.zeros((BB, H), jnp.float32)
        dh_scr[bs, :] = jnp.zeros((BB, H), jnp.float32)

    @pl.when((g_id == 0) & (b == 0))
    def _():
        dwh_scr[:] = jnp.zeros_like(dwh_scr)
        dbh_scr[:] = jnp.zeros_like(dbh_scr)

    keep = 1.0 - resets_ref[0, 0, :][:, None]
    c_prev = jnp.where(t == 0, c0_ref[:], cs_prev_ref[0]) * keep
    h_prev = jnp.where(t == 0, h0_ref[:], hs_prev_ref[0]) * keep

    # recompute gates of step t (same dt casts as forward)
    gates = xproj_ref[0] + _mm(h_prev, wh_ref[:], dt) + bh_ref[0]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = cs_ref[0]
    tc = jnp.tanh(c_new)

    gh = ghs_ref[0] + dh_scr[bs, :]
    gc = dc_scr[bs, :] + gh * o * (1.0 - tc * tc)

    do_pre = gh * tc * o * (1.0 - o)
    df_pre = gc * c_prev * f * (1.0 - f)
    di_pre = gc * g * i * (1.0 - i)
    dg_pre = gc * i * (1.0 - g * g)

    dgates = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=-1)
    dxproj_ref[0] = dgates

    dh = _mm(dgates, wh_ref[:].T, dt)
    dc = gc * f

    dwh_scr[:] += _mm(h_prev.T, dgates, dt)
    dbh_scr[0, :] += jnp.sum(dgates, axis=0)

    dh_prev = dh * keep
    dc_prev = dc * keep
    dh_scr[bs, :] = dh_prev
    dc_scr[bs, :] = dc_prev

    @pl.when(t == 0)
    def _():
        dc0_ref[:] = dc_prev
        dh0_ref[:] = dh_prev

    @pl.when((g_id == T - 1) & (b == pl.num_programs(1) - 1))
    def _():
        dwh_ref[:] = dwh_scr[:]
        dbh_ref[:] = dbh_scr[:]


def _lstm_core_bwd_impl(wh, bh, c0, h0, xproj, resets, hs, cs, ghs, dt=None):
    T, B, H4 = xproj.shape
    H = H4 // 4
    BB = _pick_block_b(B, max_bb=256)  # bwd block footprint ~2x fwd's
    grid = (T, B // BB)

    def rev_t(t, b):
        return (T - 1 - t, b, 0)

    def rev_t_prev(t, b):
        return (jnp.maximum(T - 2 - t, 0), b, 0)

    return pl.pallas_call(
        partial(_lstm_bwd_kernel, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BB, 4 * H), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB), lambda t, b: (T - 1 - t, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), rev_t_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), rev_t_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), rev_t, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, 4 * H), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((H, 4 * H), jnp.float32),
            pltpu.VMEM((1, 4 * H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * T * B * H * 4 * H,
            bytes_accessed=4 * (3 * T * B * 4 * H + 4 * T * B * H + H * 4 * H),
            transcendentals=5 * T * B * H,
        ),
    )(xproj, resets, c0, h0, wh, bh, hs, cs, cs, ghs)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lstm_core(dt, wh, bh, c0, h0, xproj, resets):
    """Returns ``(hs, cT)``. ``cT`` (the final cell state) is VALUE-ONLY: its
    cotangent is ignored by the VJP. Public callers get it wrapped in
    ``stop_gradient`` — it exists for truncated-BPTT replay, which detaches
    the carry at segment boundaries anyway (reference distillation.py:136)."""
    hs, cs = _lstm_core_fwd_impl(wh, bh, c0, h0, xproj, resets, dt=dt)
    return hs, cs[-1]


def _lstm_core_fwd(dt, wh, bh, c0, h0, xproj, resets):
    hs, cs = _lstm_core_fwd_impl(wh, bh, c0, h0, xproj, resets, dt=dt)
    return (hs, cs[-1]), (wh, bh, c0, h0, xproj, resets, hs, cs)


def _lstm_core_bwd(dt, res, g):
    ghs, _gcT = g  # cT output is value-only (see _lstm_core docstring)
    wh, bh, c0, h0, xproj, resets, hs, cs = res
    dxproj, dc0, dh0, dwh, dbh = _lstm_core_bwd_impl(
        wh, bh, c0, h0, xproj, resets, hs, cs, ghs, dt=dt
    )
    return dwh, dbh, dc0, dh0, dxproj, jnp.zeros_like(resets)


_lstm_core.defvjp(_lstm_core_fwd, _lstm_core_bwd)


# --------------------------------------------------------------------------
# x-streaming LSTM core (small input dims) — same design as the GRU
# x-streaming section above: stream raw [T, B, D] inputs, recompute the
# input projection inside the kernel, accumulate input-weight grads in a
# [D, 4H] VMEM scratch. Cuts HBM traffic by ~4H/D vs streaming [T, B, 4H]
# projections three times per replay; forward values are bit-identical.
# Flax ``OptimizedLSTMCell`` has no input-side bias, so there is no bx.
# --------------------------------------------------------------------------


def _lstm_fwd_kernel_x(
    dt, x_ref, resets_ref, c0_ref, h0_ref, wx_ref, wh_ref, bh_ref,
    hs_ref, cs_ref, c_scr, h_scr,
):
    t = pl.program_id(0)
    b = pl.program_id(1)
    H = h0_ref.shape[-1]
    BB = h0_ref.shape[0]
    bs = pl.ds(b * BB, BB)

    @pl.when(t == 0)
    def _():
        c_scr[bs, :] = c0_ref[:]
        h_scr[bs, :] = h0_ref[:]

    keep = 1.0 - resets_ref[0, 0, :][:, None]
    c = c_scr[bs, :] * keep
    h = h_scr[bs, :] * keep
    gates = _mm(x_ref[0], wx_ref[:], dt) + _mm(h, wh_ref[:], dt) + bh_ref[0]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    c_scr[bs, :] = c_new
    h_scr[bs, :] = h_new
    hs_ref[0] = h_new
    cs_ref[0] = c_new


def _lstm_core_x_fwd_impl(wx, wh, bh, c0, h0, xs, resets, dt=None):
    T, B, D = xs.shape
    H = wh.shape[0]
    BB = _pick_block_b(B)
    grid = (T, B // BB)
    return pl.pallas_call(
        partial(_lstm_fwd_kernel_x, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BB, D), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB), lambda t, b: (t, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 4 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, H), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * (H + D) * 4 * H,
            bytes_accessed=4 * (T * B * D + 2 * T * B * H + (H + D) * 4 * H),
            transcendentals=4 * T * B * H,
        ),
    )(xs, resets, c0, h0, wx, wh, bh)


def _lstm_bwd_kernel_x(
    dt,
    x_ref,
    resets_ref,
    c0_ref,
    h0_ref,
    wx_ref,
    wh_ref,
    bh_ref,
    hs_prev_ref,
    cs_prev_ref,
    cs_ref,
    ghs_ref,
    dx_ref,
    dc0_ref,
    dh0_ref,
    dwx_ref,
    dwh_ref,
    dbh_ref,
    dc_scr,
    dh_scr,
    dwx_scr,
    dwh_scr,
    dbh_scr,
):
    T = pl.num_programs(0)
    g_id = pl.program_id(0)
    t = T - 1 - g_id
    b = pl.program_id(1)
    H = h0_ref.shape[-1]
    BB = h0_ref.shape[0]
    bs = pl.ds(b * BB, BB)

    @pl.when(g_id == 0)
    def _():
        dc_scr[bs, :] = jnp.zeros((BB, H), jnp.float32)
        dh_scr[bs, :] = jnp.zeros((BB, H), jnp.float32)

    @pl.when((g_id == 0) & (b == 0))
    def _():
        dwx_scr[:] = jnp.zeros_like(dwx_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)
        dbh_scr[:] = jnp.zeros_like(dbh_scr)

    keep = 1.0 - resets_ref[0, 0, :][:, None]
    c_prev = jnp.where(t == 0, c0_ref[:], cs_prev_ref[0]) * keep
    h_prev = jnp.where(t == 0, h0_ref[:], hs_prev_ref[0]) * keep

    # recompute gates of step t (same dt casts as forward)
    x_raw = x_ref[0]
    gates = _mm(x_raw, wx_ref[:], dt) + _mm(h_prev, wh_ref[:], dt) + bh_ref[0]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = cs_ref[0]
    tc = jnp.tanh(c_new)

    gh = ghs_ref[0] + dh_scr[bs, :]
    gc = dc_scr[bs, :] + gh * o * (1.0 - tc * tc)

    do_pre = gh * tc * o * (1.0 - o)
    df_pre = gc * c_prev * f * (1.0 - f)
    di_pre = gc * g * i * (1.0 - i)
    dg_pre = gc * i * (1.0 - g * g)

    dgates = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=-1)
    dx_ref[0] = _mm(dgates, wx_ref[:].T, dt)
    dwx_scr[:] += _mm(x_raw.T, dgates, dt)

    dh = _mm(dgates, wh_ref[:].T, dt)
    dc = gc * f

    dwh_scr[:] += _mm(h_prev.T, dgates, dt)
    dbh_scr[0, :] += jnp.sum(dgates, axis=0)

    dh_prev = dh * keep
    dc_prev = dc * keep
    dh_scr[bs, :] = dh_prev
    dc_scr[bs, :] = dc_prev

    @pl.when(t == 0)
    def _():
        dc0_ref[:] = dc_prev
        dh0_ref[:] = dh_prev

    @pl.when((g_id == T - 1) & (b == pl.num_programs(1) - 1))
    def _():
        dwx_ref[:] = dwx_scr[:]
        dwh_ref[:] = dwh_scr[:]
        dbh_ref[:] = dbh_scr[:]


def _lstm_core_x_bwd_impl(wx, wh, bh, c0, h0, xs, resets, hs, cs, ghs, dt=None):
    T, B, D = xs.shape
    H = wh.shape[0]
    BB = _pick_block_b(B, max_bb=256)
    grid = (T, B // BB)

    def rev_t(t, b):
        return (T - 1 - t, b, 0)

    def rev_t_prev(t, b):
        return (jnp.maximum(T - 2 - t, 0), b, 0)

    dx, dc0, dh0, dwx, dwh, dbh = pl.pallas_call(
        partial(_lstm_bwd_kernel_x, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BB, D), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB), lambda t, b: (T - 1 - t, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 4 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), rev_t_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), rev_t_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), rev_t, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, D), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda t, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 4 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((D, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((D, 4 * H), jnp.float32),
            pltpu.VMEM((H, 4 * H), jnp.float32),
            pltpu.VMEM((1, 4 * H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * T * B * (H + D) * 4 * H,
            bytes_accessed=4 * (2 * T * B * D + 4 * T * B * H + 2 * (H + D) * 4 * H),
            transcendentals=5 * T * B * H,
        ),
    )(xs, resets, c0, h0, wx, wh, bh, hs, cs, cs, ghs)
    return dwx, dwh, dbh, dc0, dh0, dx


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lstm_core_x(dt, wx, wh, bh, c0, h0, xs, resets):
    """x-streaming LSTM core; same value-only ``cT`` contract as
    :func:`_lstm_core`."""
    hs, cs = _lstm_core_x_fwd_impl(wx, wh, bh, c0, h0, xs, resets, dt=dt)
    return hs, cs[-1]


def _lstm_core_x_fwd(dt, wx, wh, bh, c0, h0, xs, resets):
    hs, cs = _lstm_core_x_fwd_impl(wx, wh, bh, c0, h0, xs, resets, dt=dt)
    return (hs, cs[-1]), (wx, wh, bh, c0, h0, xs, resets, hs, cs)


def _lstm_core_x_bwd(dt, res, g):
    ghs, _gcT = g  # cT output is value-only (see _lstm_core docstring)
    wx, wh, bh, c0, h0, xs, resets, hs, cs = res
    dwx, dwh, dbh, dc0, dh0, dx = _lstm_core_x_bwd_impl(
        wx, wh, bh, c0, h0, xs, resets, hs, cs, ghs, dt=dt
    )
    return dwx, dwh, dbh, dc0, dh0, dx, jnp.zeros_like(resets)


_lstm_core_x.defvjp(_lstm_core_x_fwd, _lstm_core_x_bwd)


# --------------------------------------------------------------------------
# stream-paired x-streaming cores: TWO independent recurrences (e.g. the
# actor and critic memories of a recurrent PPO minibatch) in ONE pallas
# dispatch. The stream index is the OUTERMOST grid dimension, so stream 0
# runs its full (T, B) pass before stream 1 starts and the scratch carries
# can be re-initialised per stream — the kernels compute exactly what two
# back-to-back single-stream calls would (verified values AND grads in
# tests/test_pallas_rnn.py::TestPairedReplay), but pay the kernel's fixed
# pipeline-warmup cost once instead of twice. In the recurrent PPO update
# the actor and critic replays (same [T, B, D] shape, same resets, different
# weights) run 2x(epochs x minibatches) times per iteration, so halving the
# per-call overhead acts directly on the learn-phase floor.
# --------------------------------------------------------------------------


def _x_stream_pair_ok(batch: int, hidden: int, gates: int, d: int) -> bool:
    """VMEM bound for the worst paired kernel (the BPTT backward).

    Differs from ``_x_stream_ok``: blocks whose index map was constant in the
    single-stream kernels (weights, biases, carry0, and the weight-grad /
    carry-grad outputs) are stream-indexed here, so the pipeline statically
    allocates a second (double) buffer for each of them."""
    bb = _pick_block_b(batch, max_bb=256) or 128
    carry_scratch = (2 if gates == 4 else 1) * batch * hidden
    weight_scratch = (d + hidden) * gates * hidden
    # double-buffered, stream-indexed: weight + weight-grad blocks (in AND
    # out), carry0 in + dcarry0 out
    dbuf = 2 * (2 * (d + hidden) * gates * hidden + 2 * bb * hidden)
    # double-buffered streamed blocks: x + dx, plus the per-step hidden
    # streams (gru: hs_prev + ghs; lstm: hs_prev + cs_prev + cs + ghs)
    streamed = 2 * (2 * bb * d + (2 if gates == 3 else 4) * bb * hidden)
    return (
        d <= _X_STREAM_MAX_D
        and 4 * (carry_scratch + weight_scratch + dbuf + streamed)
        <= _VMEM_BUDGET_BYTES
    )


def supports_pallas_rnn_pair(
    batch: int, hidden: int, rnn_type: str, d: int
) -> bool:
    """Shape gate for the stream-paired cores: the single-kernel gate plus the
    paired x-streaming VMEM bound (the paired kernels only exist for the
    x-streaming layout; wide-D callers fall back to two independent fused
    calls)."""
    gates = 3 if rnn_type.lower() == "gru" else 4
    return supports_pallas_rnn(batch, hidden, rnn_type) and _x_stream_pair_ok(
        batch, hidden, gates, d
    )


def _fwd_kernel_x_pair(
    dt, x_ref, resets_ref, carry0_ref, wx_ref, bx_ref, wh_ref, bhn_ref, hs_ref, h_scr
):
    t = pl.program_id(1)
    b = pl.program_id(2)
    H = carry0_ref.shape[-1]
    BB = carry0_ref.shape[-2]
    bs = pl.ds(b * BB, BB)

    @pl.when(t == 0)
    def _():
        # new stream: load its window-start carry (stream s's grid steps all
        # run before stream s+1's, so the scratch is free to reuse)
        h_scr[bs, :] = carry0_ref[0]

    h = h_scr[bs, :] * (1.0 - resets_ref[0, 0, :][:, None])
    x = _mm(x_ref[0, 0], wx_ref[0], dt) + bx_ref[0, 0]
    wh = wh_ref[0]
    r = jax.nn.sigmoid(x[:, :H] + _mm(h, wh[:, :H], dt))
    z = jax.nn.sigmoid(x[:, H : 2 * H] + _mm(h, wh[:, H : 2 * H], dt))
    u = _mm(h, wh[:, 2 * H :], dt) + bhn_ref[0, 0]
    n = jnp.tanh(x[:, 2 * H :] + r * u)
    h_new = (1.0 - z) * n + z * h
    h_scr[bs, :] = h_new
    hs_ref[0, 0] = h_new


def _gru_core_x_pair_fwd_impl(wx, bx, wh, bhn, carry0, xs, resets, dt=None):
    S, T, B, D = xs.shape
    H = wh.shape[-2]
    BB = _pick_block_b(B)
    grid = (S, T, B // BB)
    return pl.pallas_call(
        partial(_fwd_kernel_x_pair, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, BB, D), lambda s, t, b: (s, t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB), lambda s, t, b: (t, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), lambda s, t, b: (s, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, 3 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, 3 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, BB, H), lambda s, t, b: (s, t, b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((S, T, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=S * 2 * T * B * (H + D) * 3 * H,
            bytes_accessed=4 * S * (T * B * D + T * B * H + (H + D) * 3 * H),
            transcendentals=S * 3 * T * B * H,
        ),
    )(xs, resets, carry0, wx, bx, wh, bhn)


def _bwd_kernel_x_pair(
    dt,
    x_ref,
    resets_ref,
    carry0_ref,
    wx_ref,
    bx_ref,
    wh_ref,
    bhn_ref,
    hs_prev_ref,
    ghs_ref,
    dx_ref,
    dcarry0_ref,
    dwx_ref,
    dbx_ref,
    dwh_ref,
    dbhn_ref,
    dh_scr,
    dwx_scr,
    dbx_scr,
    dwh_scr,
    dbhn_scr,
):
    T = pl.num_programs(1)
    g_id = pl.program_id(1)
    t = T - 1 - g_id
    b = pl.program_id(2)
    H = carry0_ref.shape[-1]
    BB = carry0_ref.shape[-2]
    bs = pl.ds(b * BB, BB)

    @pl.when(g_id == 0)
    def _():
        dh_scr[bs, :] = jnp.zeros((BB, H), jnp.float32)

    @pl.when((g_id == 0) & (b == 0))
    def _():
        dwx_scr[:] = jnp.zeros_like(dwx_scr)
        dbx_scr[:] = jnp.zeros_like(dbx_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)
        dbhn_scr[:] = jnp.zeros_like(dbhn_scr)

    reset = resets_ref[0, 0, :][:, None]
    h_prev_raw = jnp.where(t == 0, carry0_ref[0], hs_prev_ref[0, 0])
    h = h_prev_raw * (1.0 - reset)

    # recompute forward intermediates for step t (same dt casts as forward)
    x_raw = x_ref[0, 0]
    wx = wx_ref[0]
    x = _mm(x_raw, wx, dt) + bx_ref[0, 0]
    wh = wh_ref[0]
    r = jax.nn.sigmoid(x[:, :H] + _mm(h, wh[:, :H], dt))
    z = jax.nn.sigmoid(x[:, H : 2 * H] + _mm(h, wh[:, H : 2 * H], dt))
    u = _mm(h, wh[:, 2 * H :], dt) + bhn_ref[0, 0]
    n = jnp.tanh(x[:, 2 * H :] + r * u)

    g = ghs_ref[0, 0] + dh_scr[bs, :]

    dz = g * (h - n) * z * (1.0 - z)
    dn_pre = g * (1.0 - z) * (1.0 - n * n)
    du = dn_pre * r
    dr_pre = dn_pre * u * r * (1.0 - r)

    dxproj = jnp.concatenate([dr_pre, dz, dn_pre], axis=-1)  # [BB, 3H]
    dx_ref[0, 0] = _mm(dxproj, wx.T, dt)
    dwx_scr[:] += _mm(x_raw.T, dxproj, dt)
    dbx_scr[0, :] += jnp.sum(dxproj, axis=0)

    dgates = jnp.concatenate([dr_pre, dz, du], axis=-1)  # [BB, 3H]
    dh = g * z + _mm(dgates, wh.T, dt)

    dwh_scr[:] += _mm(h.T, dgates, dt)
    dbhn_scr[0, :] += jnp.sum(du, axis=0)

    dh_prev = dh * (1.0 - reset)
    dh_scr[bs, :] = dh_prev

    @pl.when(t == 0)
    def _():
        dcarry0_ref[0] = dh_prev

    @pl.when((g_id == T - 1) & (b == pl.num_programs(2) - 1))
    def _():
        # end of this stream's pass: flush its weight grads (the out blocks
        # are stream-indexed, so each stream writes its own block)
        dwx_ref[0] = dwx_scr[:]
        dbx_ref[0] = dbx_scr[:]
        dwh_ref[0] = dwh_scr[:]
        dbhn_ref[0] = dbhn_scr[:]


def _gru_core_x_pair_bwd_impl(wx, bx, wh, bhn, carry0, xs, resets, hs, ghs, dt=None):
    S, T, B, D = xs.shape
    H = wh.shape[-2]
    BB = _pick_block_b(B, max_bb=256)
    grid = (S, T, B // BB)

    def rev_t(s, t, b):
        return (s, T - 1 - t, b, 0)

    def rev_t_prev(s, t, b):
        return (s, jnp.maximum(T - 2 - t, 0), b, 0)

    dx, dcarry0, dwx, dbx, dwh, dbhn = pl.pallas_call(
        partial(_bwd_kernel_x_pair, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, BB, D), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB), lambda s, t, b: (T - 1 - t, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), lambda s, t, b: (s, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, 3 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, 3 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB, H), rev_t_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB, H), rev_t, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, BB, D), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), lambda s, t, b: (s, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, 3 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, 3 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, T, B, D), jnp.float32),
            jax.ShapeDtypeStruct((S, B, H), jnp.float32),
            jax.ShapeDtypeStruct((S, D, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((S, 1, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((S, H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((S, 1, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((D, 3 * H), jnp.float32),
            pltpu.VMEM((1, 3 * H), jnp.float32),
            pltpu.VMEM((H, 3 * H), jnp.float32),
            pltpu.VMEM((1, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=S * 6 * T * B * (H + D) * 3 * H,
            bytes_accessed=4 * S * (2 * T * B * D + 2 * T * B * H + 2 * (H + D) * 3 * H),
            transcendentals=S * 3 * T * B * H,
        ),
    )(xs, resets, carry0, wx, bx, wh, bhn, hs, ghs)
    return dwx, dbx, dwh, dbhn, dcarry0, dx


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gru_core_x_pair(dt, wx, bx, wh, bhn, carry0, xs, resets):
    return _gru_core_x_pair_fwd_impl(wx, bx, wh, bhn, carry0, xs, resets, dt=dt)


def _gru_core_x_pair_fwd(dt, wx, bx, wh, bhn, carry0, xs, resets):
    hs = _gru_core_x_pair_fwd_impl(wx, bx, wh, bhn, carry0, xs, resets, dt=dt)
    return hs, (wx, bx, wh, bhn, carry0, xs, resets, hs)


def _gru_core_x_pair_bwd(dt, res, ghs):
    wx, bx, wh, bhn, carry0, xs, resets, hs = res
    dwx, dbx, dwh, dbhn, dcarry0, dx = _gru_core_x_pair_bwd_impl(
        wx, bx, wh, bhn, carry0, xs, resets, hs, ghs, dt=dt
    )
    return dwx, dbx, dwh, dbhn, dcarry0, dx, jnp.zeros_like(resets)


_gru_core_x_pair.defvjp(_gru_core_x_pair_fwd, _gru_core_x_pair_bwd)


def gru_sequence_pair(
    cell_params_pair: tuple,
    carry0_pair: tuple,
    xs_pair: tuple,
    resets: jax.Array,
    compute_dtype=None,
) -> tuple[jax.Array, jax.Array]:
    """Two independent GRU window replays fused into one kernel dispatch.

    Both streams must share shapes (``[T, B, D]`` inputs, ``[B, H]`` carries)
    and the reset mask; weights are independent per stream. Equivalent to two
    :func:`gru_sequence` calls (the paired kernels run the streams
    back-to-back inside one grid) but pays the fixed per-call pipeline
    warmup once. Caller must check :func:`supports_pallas_rnn_pair` first.

    Returns ``(hs_a, hs_b)``, each ``[T, B, H]``.
    """
    T, B, D = xs_pair[0].shape
    packed = [_gru_pack(p) for p in cell_params_pair]
    wx = jnp.stack([p[0] for p in packed])
    bx = jnp.stack([p[1][None, :] for p in packed])
    wh = jnp.stack([p[2] for p in packed])
    bhn = jnp.stack([p[3][None, :] for p in packed])
    carry0 = jnp.stack([c.astype(jnp.float32) for c in carry0_pair])
    xs = jnp.stack([x.astype(jnp.float32) for x in xs_pair])
    hs = _gru_core_x_pair(
        compute_dtype, wx, bx, wh, bhn, carry0, xs,
        resets.astype(jnp.float32).reshape(T, 1, B),
    )
    return hs[0], hs[1]


def _lstm_fwd_kernel_x_pair(
    dt, x_ref, resets_ref, c0_ref, h0_ref, wx_ref, wh_ref, bh_ref,
    hs_ref, cs_ref, c_scr, h_scr,
):
    t = pl.program_id(1)
    b = pl.program_id(2)
    H = h0_ref.shape[-1]
    BB = h0_ref.shape[-2]
    bs = pl.ds(b * BB, BB)

    @pl.when(t == 0)
    def _():
        c_scr[bs, :] = c0_ref[0]
        h_scr[bs, :] = h0_ref[0]

    keep = 1.0 - resets_ref[0, 0, :][:, None]
    c = c_scr[bs, :] * keep
    h = h_scr[bs, :] * keep
    gates = _mm(x_ref[0, 0], wx_ref[0], dt) + _mm(h, wh_ref[0], dt) + bh_ref[0, 0]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    c_scr[bs, :] = c_new
    h_scr[bs, :] = h_new
    hs_ref[0, 0] = h_new
    cs_ref[0, 0] = c_new


def _lstm_core_x_pair_fwd_impl(wx, wh, bh, c0, h0, xs, resets, dt=None):
    S, T, B, D = xs.shape
    H = wh.shape[-2]
    BB = _pick_block_b(B)
    grid = (S, T, B // BB)
    return pl.pallas_call(
        partial(_lstm_fwd_kernel_x_pair, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, BB, D), lambda s, t, b: (s, t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB), lambda s, t, b: (t, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), lambda s, t, b: (s, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), lambda s, t, b: (s, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, 4 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, 4 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, BB, H), lambda s, t, b: (s, t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB, H), lambda s, t, b: (s, t, b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((S, T, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=S * 2 * T * B * (H + D) * 4 * H,
            bytes_accessed=4 * S * (T * B * D + 2 * T * B * H + (H + D) * 4 * H),
            transcendentals=S * 4 * T * B * H,
        ),
    )(xs, resets, c0, h0, wx, wh, bh)


def _lstm_bwd_kernel_x_pair(
    dt,
    x_ref,
    resets_ref,
    c0_ref,
    h0_ref,
    wx_ref,
    wh_ref,
    bh_ref,
    hs_prev_ref,
    cs_prev_ref,
    cs_ref,
    ghs_ref,
    dx_ref,
    dc0_ref,
    dh0_ref,
    dwx_ref,
    dwh_ref,
    dbh_ref,
    dc_scr,
    dh_scr,
    dwx_scr,
    dwh_scr,
    dbh_scr,
):
    T = pl.num_programs(1)
    g_id = pl.program_id(1)
    t = T - 1 - g_id
    b = pl.program_id(2)
    H = h0_ref.shape[-1]
    BB = h0_ref.shape[-2]
    bs = pl.ds(b * BB, BB)

    @pl.when(g_id == 0)
    def _():
        dc_scr[bs, :] = jnp.zeros((BB, H), jnp.float32)
        dh_scr[bs, :] = jnp.zeros((BB, H), jnp.float32)

    @pl.when((g_id == 0) & (b == 0))
    def _():
        dwx_scr[:] = jnp.zeros_like(dwx_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)
        dbh_scr[:] = jnp.zeros_like(dbh_scr)

    keep = 1.0 - resets_ref[0, 0, :][:, None]
    c_prev = jnp.where(t == 0, c0_ref[0], cs_prev_ref[0, 0]) * keep
    h_prev = jnp.where(t == 0, h0_ref[0], hs_prev_ref[0, 0]) * keep

    # recompute gates of step t (same dt casts as forward)
    x_raw = x_ref[0, 0]
    wx = wx_ref[0]
    gates = _mm(x_raw, wx, dt) + _mm(h_prev, wh_ref[0], dt) + bh_ref[0, 0]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = cs_ref[0, 0]
    tc = jnp.tanh(c_new)

    gh = ghs_ref[0, 0] + dh_scr[bs, :]
    gc = dc_scr[bs, :] + gh * o * (1.0 - tc * tc)

    do_pre = gh * tc * o * (1.0 - o)
    df_pre = gc * c_prev * f * (1.0 - f)
    di_pre = gc * g * i * (1.0 - i)
    dg_pre = gc * i * (1.0 - g * g)

    dgates = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=-1)
    dx_ref[0, 0] = _mm(dgates, wx.T, dt)
    dwx_scr[:] += _mm(x_raw.T, dgates, dt)

    dh = _mm(dgates, wh_ref[0].T, dt)
    dc = gc * f

    dwh_scr[:] += _mm(h_prev.T, dgates, dt)
    dbh_scr[0, :] += jnp.sum(dgates, axis=0)

    dh_prev = dh * keep
    dc_prev = dc * keep
    dh_scr[bs, :] = dh_prev
    dc_scr[bs, :] = dc_prev

    @pl.when(t == 0)
    def _():
        dc0_ref[0] = dc_prev
        dh0_ref[0] = dh_prev

    @pl.when((g_id == T - 1) & (b == pl.num_programs(2) - 1))
    def _():
        dwx_ref[0] = dwx_scr[:]
        dwh_ref[0] = dwh_scr[:]
        dbh_ref[0] = dbh_scr[:]


def _lstm_core_x_pair_bwd_impl(wx, wh, bh, c0, h0, xs, resets, hs, cs, ghs, dt=None):
    S, T, B, D = xs.shape
    H = wh.shape[-2]
    BB = _pick_block_b(B, max_bb=256)
    grid = (S, T, B // BB)

    def rev_t(s, t, b):
        return (s, T - 1 - t, b, 0)

    def rev_t_prev(s, t, b):
        return (s, jnp.maximum(T - 2 - t, 0), b, 0)

    dx, dc0, dh0, dwx, dwh, dbh = pl.pallas_call(
        partial(_lstm_bwd_kernel_x_pair, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, BB, D), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB), lambda s, t, b: (T - 1 - t, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), lambda s, t, b: (s, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), lambda s, t, b: (s, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, 4 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, 4 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB, H), rev_t_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB, H), rev_t_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB, H), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB, H), rev_t, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, BB, D), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), lambda s, t, b: (s, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), lambda s, t, b: (s, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, 4 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, 4 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4 * H), lambda s, t, b: (s, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, T, B, D), jnp.float32),
            jax.ShapeDtypeStruct((S, B, H), jnp.float32),
            jax.ShapeDtypeStruct((S, B, H), jnp.float32),
            jax.ShapeDtypeStruct((S, D, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((S, H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((S, 1, 4 * H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((D, 4 * H), jnp.float32),
            pltpu.VMEM((H, 4 * H), jnp.float32),
            pltpu.VMEM((1, 4 * H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=S * 6 * T * B * (H + D) * 4 * H,
            bytes_accessed=4 * S * (2 * T * B * D + 4 * T * B * H + 2 * (H + D) * 4 * H),
            transcendentals=S * 5 * T * B * H,
        ),
    )(xs, resets, c0, h0, wx, wh, bh, hs, cs, cs, ghs)
    return dwx, dwh, dbh, dc0, dh0, dx


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lstm_core_x_pair(dt, wx, wh, bh, c0, h0, xs, resets):
    hs, _cs = _lstm_core_x_pair_fwd_impl(wx, wh, bh, c0, h0, xs, resets, dt=dt)
    return hs


def _lstm_core_x_pair_fwd(dt, wx, wh, bh, c0, h0, xs, resets):
    hs, cs = _lstm_core_x_pair_fwd_impl(wx, wh, bh, c0, h0, xs, resets, dt=dt)
    return hs, (wx, wh, bh, c0, h0, xs, resets, hs, cs)


def _lstm_core_x_pair_bwd(dt, res, ghs):
    wx, wh, bh, c0, h0, xs, resets, hs, cs = res
    dwx, dwh, dbh, dc0, dh0, dx = _lstm_core_x_pair_bwd_impl(
        wx, wh, bh, c0, h0, xs, resets, hs, cs, ghs, dt=dt
    )
    return dwx, dwh, dbh, dc0, dh0, dx, jnp.zeros_like(resets)


_lstm_core_x_pair.defvjp(_lstm_core_x_pair_fwd, _lstm_core_x_pair_bwd)


def lstm_sequence_pair(
    cell_params_pair: tuple,
    carry0_pair: tuple,
    xs_pair: tuple,
    resets: jax.Array,
    compute_dtype=None,
) -> tuple[jax.Array, jax.Array]:
    """Two independent LSTM window replays fused into one kernel dispatch;
    see :func:`gru_sequence_pair`. ``carry0_pair`` holds each stream's
    ``(c0, h0)`` tuple. Returns ``(hs_a, hs_b)``."""
    T, B, D = xs_pair[0].shape
    packed = [_lstm_pack(p) for p in cell_params_pair]
    wx = jnp.stack([p[0] for p in packed])
    wh = jnp.stack([p[1] for p in packed])
    bh = jnp.stack([p[2][None, :] for p in packed])
    c0 = jnp.stack([c[0].astype(jnp.float32) for c in carry0_pair])
    h0 = jnp.stack([c[1].astype(jnp.float32) for c in carry0_pair])
    xs = jnp.stack([x.astype(jnp.float32) for x in xs_pair])
    hs = _lstm_core_x_pair(
        compute_dtype, wx, wh, bh, c0, h0, xs,
        resets.astype(jnp.float32).reshape(T, 1, B),
    )
    return hs[0], hs[1]


def _lstm_call(cell_params, carry0, xs, resets, dt):
    """Shared prep for the lstm_sequence* entry points."""
    T, B, D = xs.shape
    wi, wh, bh = _lstm_pack(cell_params)  # gate ordering i|f|g|o
    bh = bh[None, :]
    H = wh.shape[0]
    c0, h0 = carry0
    rf = resets.astype(jnp.float32).reshape(T, 1, B)

    if _x_stream_ok(B, H, 4, D) and not under_vmap():
        # small input dim: stream raw inputs, project in-kernel (see the
        # x-streaming GRU section; bit-identical forward values). Vmapped
        # callers use the xproj core below (see under_vmap).
        return _lstm_core_x(
            dt,
            wi,
            wh,
            bh,
            c0.astype(jnp.float32),
            h0.astype(jnp.float32),
            xs.astype(jnp.float32),
            rf,
        )

    xproj = _mm(xs.reshape(T * B, -1), wi, dt)
    return _lstm_core(
        dt,
        wh,
        bh,
        c0.astype(jnp.float32),
        h0.astype(jnp.float32),
        xproj.reshape(T, B, 4 * H).astype(jnp.float32),
        rf,
    )


def lstm_sequence(
    cell_params: dict, carry0: tuple, xs: jax.Array, resets: jax.Array,
    compute_dtype=None,
) -> jax.Array:
    """Fused LSTM window replay; see :func:`gru_sequence`.

    Args:
        cell_params: flax OptimizedLSTMCell param dict (``ii/if/ig/io`` without
            bias, ``hi/hf/hg/ho`` with).
        carry0: ``(c0, h0)`` tuple, each ``[B, H]``.
        xs: ``[T, B, D]`` inputs.
        resets: ``[T, B]`` bool/float carry-reset mask.
        compute_dtype: ``None`` (exact fp32) or ``jnp.bfloat16`` matmul
            operands (see :func:`gru_sequence`).

    Returns:
        ``[T, B, H]`` hidden outputs.
    """
    hs, _ = _lstm_call(cell_params, carry0, xs, resets, compute_dtype)
    return hs


def lstm_sequence_with_carry(
    cell_params: dict, carry0: tuple, xs: jax.Array, resets: jax.Array,
    compute_dtype=None,
) -> tuple[jax.Array, tuple]:
    """:func:`lstm_sequence` that also returns the final ``(c, h)`` carry.

    The carry is VALUE-ONLY (wrapped in ``stop_gradient``) — intended for
    truncated-BPTT replay, which detaches the carry at segment boundaries
    (reference distillation.py:136)."""
    hs, cT = _lstm_call(cell_params, carry0, xs, resets, compute_dtype)
    final = (jax.lax.stop_gradient(cT), jax.lax.stop_gradient(hs[-1]))
    return hs, final


def gru_sequence_with_carry(
    cell_params: dict, carry0: jax.Array, xs: jax.Array, resets: jax.Array,
    compute_dtype=None,
) -> tuple[jax.Array, jax.Array]:
    """:func:`gru_sequence` that also returns the final hidden state
    (value-only, ``stop_gradient``-wrapped; see lstm_sequence_with_carry)."""
    hs = gru_sequence(cell_params, carry0, xs, resets, compute_dtype=compute_dtype)
    return hs, jax.lax.stop_gradient(hs[-1])
