"""Numerical parity of the fused Pallas GRU kernels vs the flax scan path.

Runs the kernels in pallas interpret mode (CPU) and checks values AND
gradients against scanning ``flax.linen.GRUCell`` with done-masked resets —
the exact computation `memory_sequence` performs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax.experimental.pallas import tpu as pltpu

from rsl_rl_tpu.networks.memory import Memory, memory_sequence
from rsl_rl_tpu.ops import pallas_rnn

T, B, D, H = 6, 128, 12, 128


@pytest.fixture(scope="module", params=["gru", "lstm"])
def setup(request):
    rnn_type = request.param
    mem = Memory(hidden_size=H, rnn_type=rnn_type, num_layers=1)
    carry0_zero = mem.initialize_carry(B)
    params = mem.init(jax.random.PRNGKey(0), carry0_zero, jnp.zeros((B, D)))["params"]
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.normal(size=(T, B, D)), jnp.float32)
    resets = jnp.asarray(rng.random((T, B)) < 0.15)
    resets = resets.at[0].set(False)
    if rnn_type == "gru":
        carry0 = (jnp.asarray(rng.normal(size=(B, H)), jnp.float32),)
    else:
        carry0 = (
            (
                jnp.asarray(rng.normal(size=(B, H)), jnp.float32),
                jnp.asarray(rng.normal(size=(B, H)), jnp.float32),
            ),
        )
    return mem, params, carry0, xs, resets


def _scan_path(mem, params, carry0, xs, resets):
    apply_step = lambda c, x: mem.apply({"params": params}, c, x)
    return memory_sequence(apply_step, carry0, xs, resets)


def _pallas_path(mem, params, carry0, xs, resets):
    if mem.rnn_type == "gru":
        return pallas_rnn.gru_sequence(params["cell_0"], carry0[0], xs, resets)
    return pallas_rnn.lstm_sequence(params["cell_0"], carry0[0], xs, resets)


class TestForward:
    def test_matches_scan(self, setup):
        mem, params, carry0, xs, resets = setup
        want = _scan_path(mem, params, carry0, xs, resets)
        with pltpu.force_tpu_interpret_mode():
            got = _pallas_path(mem, params, carry0, xs, resets)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


class TestBackward:
    def test_grads_match_scan(self, setup):
        mem, params, carry0, xs, resets = setup

        def loss_scan(params, carry0, xs):
            out = _scan_path(mem, params, carry0, xs, resets)
            return jnp.sum(out * jnp.cos(out))  # nontrivial output grad

        def loss_pallas(params, carry0, xs):
            out = _pallas_path(mem, params, carry0, xs, resets)
            return jnp.sum(out * jnp.cos(out))

        want = jax.grad(loss_scan, argnums=(0, 1, 2))(params, carry0, xs)
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss_pallas, argnums=(0, 1, 2))(params, carry0, xs)

        jax.tree_util.tree_map_with_path(
            lambda p, w, g: np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-5,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(p)}",
            ),
            want,
            got,
        )


def _jit_acting_trajectory(mem, params, carry0, xs, resets):
    """Unrolled per-step acting (Memory.step + mask_carry) under jit — the
    precision-relevant shape of the real collect scan."""
    from rsl_rl_tpu.networks.memory import mask_carry

    def run(params, carry, xs, resets):
        outs = []
        for t in range(xs.shape[0]):
            carry = mask_carry(carry, resets[t])
            carry, out = mem.step(params, carry, xs[t])
            outs.append(out)
        return jnp.stack(outs)

    return jax.jit(run)(params, carry0, xs, resets)


def _pallas_path_bf16(mem, params, carry0, xs, resets):
    if mem.rnn_type == "gru":
        return pallas_rnn.gru_sequence(
            params["cell_0"], carry0[0], xs, resets, compute_dtype=jnp.bfloat16
        )
    return pallas_rnn.lstm_sequence(
        params["cell_0"], carry0[0], xs, resets, compute_dtype=jnp.bfloat16
    )


class TestBf16Compute:
    """bf16 matmul operands (fp32 state/accumulation) introduce a small,
    bounded error vs the exact fp32 path — the kernels' analog of
    ``MLP(dtype=bfloat16)``. bf16 has ~3 decimal digits, so tolerances are
    ~1e-2 for values; gradients are compared by relative L2 error (bf16
    rounding noise is unbiased but per-element tolerances would be brittle
    over a T-step product chain)."""

    def test_values_close_to_fp32(self, setup):
        mem, params, carry0, xs, resets = setup
        want = _scan_path(mem, params, carry0, xs, resets)
        with pltpu.force_tpu_interpret_mode():
            got = _pallas_path_bf16(mem, params, carry0, xs, resets)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-2, atol=3e-2)

    def test_grads_close_to_fp32(self, setup):
        mem, params, carry0, xs, resets = setup

        def loss_scan(params, carry0, xs):
            out = _scan_path(mem, params, carry0, xs, resets)
            return jnp.sum(out * jnp.cos(out))

        def loss_bf16(params, carry0, xs):
            out = _pallas_path_bf16(mem, params, carry0, xs, resets)
            return jnp.sum(out * jnp.cos(out))

        want = jax.grad(loss_scan, argnums=(0, 1, 2))(params, carry0, xs)
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss_bf16, argnums=(0, 1, 2))(params, carry0, xs)

        def rel_l2(p, w, g):
            w, g = np.asarray(w, np.float64), np.asarray(g, np.float64)
            denom = np.linalg.norm(w) + 1e-6
            err = np.linalg.norm(g - w) / denom
            assert err < 5e-2, f"{jax.tree_util.keystr(p)}: relative L2 {err:.3f}"

        jax.tree_util.tree_map_with_path(rel_l2, want, got)

    def test_acting_step_matches_bf16_kernel_replay(self, setup):
        """CRITICAL PPO invariant: the act-time per-step path
        (``Memory.step`` with compute_dtype) and the fused-kernel replay must
        compute the SAME trajectory under bf16 — otherwise replayed
        log-probs drift from behavior log-probs and phantom KL leaks into
        the adaptive-LR schedule. Both use identical operand-cast matmuls
        with fp32 state, so the tolerance is fp32-tight, not bf16-loose."""
        mem, params, carry0, xs, resets = setup
        mem16 = Memory(
            hidden_size=H, rnn_type=mem.rnn_type, num_layers=1,
            compute_dtype=jnp.bfloat16,
        )
        # act-time trajectory: step-by-step with done-masked resets, jitted
        # like the real collect scan (in-jit XLA may fuse the operand casts
        # differently than eager execution, and in-jit is what ships)
        want = _jit_acting_trajectory(mem16, params, carry0, xs, resets)
        assert want.dtype == jnp.float32
        with pltpu.force_tpu_interpret_mode():
            got = _pallas_path_bf16(mem16, params, carry0, xs, resets)
        # ulp-level op-ordering differences amplify through the recurrence;
        # tolerance stays ~60x tighter than the bf16-vs-fp32 error scale
        # (3e-2), which is what distinguishes same-scheme from cross-scheme
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=5e-4)

    def test_scan_fallback_matches_acting_by_construction(self, setup):
        """The non-kernel replay fallback routes through the same
        Memory.step, so replay == acting holds on every backend."""
        mem, params, carry0, xs, resets = setup
        mem16 = Memory(
            hidden_size=H, rnn_type=mem.rnn_type, num_layers=1,
            compute_dtype=jnp.bfloat16,
        )
        # Memory.sequence on CPU takes the scan fallback (gate needs TPU)
        seq = jax.jit(lambda p, c, x, r: mem16.sequence(p, c, x, r))(
            params, carry0, xs, resets
        )
        want = _jit_acting_trajectory(mem16, params, carry0, xs, resets)
        # same ops; jit fusion may reorder fp32 rounding at the ulp level
        np.testing.assert_allclose(
            np.asarray(seq), np.asarray(want), rtol=1e-5, atol=1e-6
        )


class TestVmemGate:
    """The shape gate must bound the kernels' full-batch VMEM scratch
    (ADVICE r1: B=8192, H=512 would exceed VMEM at compile time)."""

    def test_oversized_batch_hidden_rejected(self):
        from rsl_rl_tpu.ops.pallas_rnn import _vmem_footprint_bytes, _VMEM_BUDGET_BYTES

        assert _vmem_footprint_bytes(8192, 512, gates=4) > _VMEM_BUDGET_BYTES
        assert _vmem_footprint_bytes(8192, 512, gates=3) > _VMEM_BUDGET_BYTES

    def test_typical_shapes_admitted(self):
        from rsl_rl_tpu.ops.pallas_rnn import _vmem_footprint_bytes, _VMEM_BUDGET_BYTES

        # the round-1 TPU bench config (512 envs / 4 minibatches, H=256)
        assert _vmem_footprint_bytes(128, 256, gates=4) <= _VMEM_BUDGET_BYTES
        assert _vmem_footprint_bytes(1024, 256, gates=3) <= _VMEM_BUDGET_BYTES


class TestMultiLayer:
    """Multi-layer stacks dispatch layer-by-layer fused calls; each layer
    consumes the previous layer's full output sequence — identical math to
    the stacked per-step scan (Memory.sequence_with_carry layer loop)."""

    @pytest.mark.parametrize("rnn_type", ["gru", "lstm"])
    def test_two_layer_values_and_carry_match_scan(self, rnn_type):
        from rsl_rl_tpu.networks.memory import memory_sequence_with_carry
        from rsl_rl_tpu.ops.pallas_rnn import (
            gru_sequence_with_carry,
            lstm_sequence_with_carry,
        )

        mem = Memory(hidden_size=H, rnn_type=rnn_type, num_layers=2)
        carry0 = mem.initialize_carry(B)
        params = mem.init(jax.random.PRNGKey(2), carry0, jnp.zeros((B, H)))["params"]
        rng = np.random.default_rng(3)
        xs = jnp.asarray(rng.normal(size=(T, B, H)), jnp.float32)
        resets = jnp.asarray(rng.random((T, B)) < 0.2)
        resets = resets.at[0].set(False)

        apply_step = lambda c, x: mem.apply({"params": params}, c, x)
        want_carry, want = memory_sequence_with_carry(apply_step, carry0, xs, resets)

        # replicate Memory.sequence_with_carry's pallas layer loop in
        # interpret mode (the dispatch gate requires a real TPU backend)
        with pltpu.force_tpu_interpret_mode():
            out = xs
            finals = []
            for layer in range(2):
                fn = gru_sequence_with_carry if rnn_type == "gru" else lstm_sequence_with_carry
                out, final = fn(params[f"cell_{layer}"], carry0[layer], out, resets)
                finals.append(final)

        np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5)
        jax.tree_util.tree_map_with_path(
            lambda p, a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
                err_msg=f"final carry mismatch at {jax.tree_util.keystr(p)}",
            ),
            tuple(finals), want_carry,
        )

    def test_two_layer_grads_match_scan(self):
        from rsl_rl_tpu.networks.memory import memory_sequence
        from rsl_rl_tpu.ops.pallas_rnn import gru_sequence

        mem = Memory(hidden_size=H, rnn_type="gru", num_layers=2)
        carry0 = mem.initialize_carry(B)
        params = mem.init(jax.random.PRNGKey(4), carry0, jnp.zeros((B, H)))["params"]
        rng = np.random.default_rng(5)
        xs = jnp.asarray(rng.normal(size=(T, B, H)), jnp.float32)
        resets = jnp.asarray(rng.random((T, B)) < 0.2)
        resets = resets.at[0].set(False)

        def loss_scan(params, xs):
            apply_step = lambda c, x: mem.apply({"params": params}, c, x)
            out = memory_sequence(apply_step, carry0, xs, resets)
            return jnp.sum(out * jnp.cos(out))

        def loss_pallas(params, xs):
            out = xs
            for layer in range(2):
                out = gru_sequence(params[f"cell_{layer}"], carry0[layer], out, resets)
            return jnp.sum(out * jnp.cos(out))

        want = jax.grad(loss_scan, argnums=(0, 1))(params, xs)
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss_pallas, argnums=(0, 1))(params, xs)
        jax.tree_util.tree_map_with_path(
            lambda p, w, g: np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-5,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(p)}",
            ),
            want, got,
        )


class TestEndToEndUpdateThroughKernels:
    """Full recurrent PPO update THROUGH the fused kernels (interpret mode),
    vs the same update on the scan path. Everything between the kernel-level
    parity tests and a real TPU run — Memory.sequence dispatch, the actor and
    critic replay calls inside the minibatch loss, custom-VJP wiring into the
    optimizer step — is otherwise only exercised on TPU hardware."""

    @pytest.mark.parametrize("rnn_type", ["gru", "lstm"])
    def test_update_matches_scan_path(self, rnn_type, monkeypatch):
        from rsl_rl_tpu.algorithms.ppo import PPO
        from rsl_rl_tpu.env import PointMass
        from rsl_rl_tpu.modules import ActorCriticRecurrent

        env = PointMass(num_envs=256, max_episode_length=16)
        _, obs = env.reset(jax.random.PRNGKey(0))
        policy = ActorCriticRecurrent(
            obs, {"policy": ["policy"], "critic": ["policy"]}, env.num_actions,
            rnn_type=rnn_type, rnn_hidden_dim=128,
            actor_hidden_dims=[32], critic_hidden_dims=[32],
        )
        ppo = PPO(policy, num_learning_epochs=1, num_mini_batches=2)
        ts0 = ppo.init_train_state(jax.random.PRNGKey(1), env.num_envs)
        cs0 = ppo.init_collect_state(jax.random.PRNGKey(2), env)
        _, _, rollout, _ = jax.jit(ppo.make_collect_fn(env, 8))(ts0, cs0)
        update = ppo.make_update_fn()

        # scan path (CPU default: supports_pallas_rnn is False off-TPU)
        ts_scan, _, um_scan = update(ts0, cs0, rollout)

        # kernel path: force the gate open, run in interpret mode
        monkeypatch.setattr(pallas_rnn, "supports_pallas_rnn", lambda *a, **k: True)
        with pltpu.force_tpu_interpret_mode():
            ts_pal, _, um_pal = update(ts0, cs0, rollout)

        um_scan, um_pal = jax.device_get((um_scan, um_pal))
        for k in um_scan:
            np.testing.assert_allclose(
                um_pal[k], um_scan[k], rtol=2e-4, atol=2e-5, err_msg=f"loss {k}"
            )
        a_leaves = jax.tree.leaves(jax.device_get(ts_scan.policy.params))
        b_leaves = jax.tree.leaves(jax.device_get(ts_pal.policy.params))
        for a, b in zip(a_leaves, b_leaves):
            np.testing.assert_allclose(b, a, rtol=3e-4, atol=3e-5)


class TestWideInputPath:
    """The GRU dispatches between x-streaming (D <= _X_STREAM_MAX_D) and
    xproj-streaming (wide D) cores; both must match the scan, values and
    grads, and each other."""

    def _setup(self, d_in):
        mem = Memory(hidden_size=H, rnn_type="gru", num_layers=1)
        params = mem.init(
            jax.random.PRNGKey(2), mem.initialize_carry(B), jnp.zeros((B, d_in))
        )["params"]
        rng = np.random.default_rng(3)
        xs = jnp.asarray(rng.normal(size=(4, B, d_in)), jnp.float32)
        resets = jnp.asarray(rng.random((4, B)) < 0.2)
        resets = resets.at[0].set(False)
        carry0 = mem.initialize_carry(B)
        return mem, params, carry0, xs, resets

    def test_wide_input_matches_scan_values_and_grads(self):
        d_wide = pallas_rnn._X_STREAM_MAX_D + 8  # forces the xproj core
        mem, params, carry0, xs, resets = self._setup(d_wide)

        def loss(path):
            def f(params, xs):
                if path == "scan":
                    out = memory_sequence(
                        lambda c, x: mem.apply({"params": params}, c, x),
                        carry0, xs, resets,
                    )
                else:
                    out = pallas_rnn.gru_sequence(
                        params["cell_0"], carry0[0], xs, resets
                    )
                return jnp.sum(out * jnp.cos(out))
            return f

        want = jax.grad(loss("scan"), argnums=(0, 1))(params, xs)
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss("pallas"), argnums=(0, 1))(params, xs)
        jax.tree_util.tree_map_with_path(
            lambda p, w, g: np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4, err_msg=str(p)
            ),
            want, got,
        )

    def test_both_cores_agree(self):
        """x-streaming and xproj-streaming produce the same values/grads on
        the same problem (invoked directly, bypassing the D dispatch)."""
        mem, params, carry0, xs, resets = self._setup(64)
        p = params["cell_0"]
        wi = jnp.concatenate([p["ir"]["kernel"], p["iz"]["kernel"], p["in"]["kernel"]], axis=1)
        bi = jnp.concatenate([p["ir"]["bias"], p["iz"]["bias"], p["in"]["bias"]])
        wh = jnp.concatenate([p["hr"]["kernel"], p["hz"]["kernel"], p["hn"]["kernel"]], axis=1)
        bhn = p["hn"]["bias"][None, :]
        Tl = xs.shape[0]
        r = resets.astype(jnp.float32).reshape(Tl, 1, B)

        def loss_x(wi, bi, xs):
            hs = pallas_rnn._gru_core_x(None, wi, bi[None, :], wh, bhn, carry0[0], xs, r)
            return jnp.sum(jnp.tanh(hs))

        def loss_xproj(wi, bi, xs):
            xproj = xs.reshape(Tl * B, -1) @ wi + bi
            hs = pallas_rnn._gru_core(
                None, wh, bhn, carry0[0], xproj.reshape(Tl, B, 3 * H), r
            )
            return jnp.sum(jnp.tanh(hs))

        with pltpu.force_tpu_interpret_mode():
            va = jax.value_and_grad(loss_x, argnums=(0, 1, 2))(wi, bi, xs)
            vb = jax.value_and_grad(loss_xproj, argnums=(0, 1, 2))(wi, bi, xs)
        np.testing.assert_allclose(float(va[0]), float(vb[0]), rtol=1e-6)
        for a, b in zip(va[1], vb[1]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            )

    def test_lstm_wide_input_matches_scan_values_and_grads(self):
        d_wide = pallas_rnn._X_STREAM_MAX_D + 8  # forces the xproj core
        mem = Memory(hidden_size=H, rnn_type="lstm", num_layers=1)
        params = mem.init(
            jax.random.PRNGKey(4), mem.initialize_carry(B), jnp.zeros((B, d_wide))
        )["params"]
        rng = np.random.default_rng(5)
        xs = jnp.asarray(rng.normal(size=(4, B, d_wide)), jnp.float32)
        resets = jnp.asarray(rng.random((4, B)) < 0.2)
        resets = resets.at[0].set(False)
        carry0 = mem.initialize_carry(B)

        def loss(path):
            def f(params, xs):
                if path == "scan":
                    out = memory_sequence(
                        lambda c, x: mem.apply({"params": params}, c, x),
                        carry0, xs, resets,
                    )
                else:
                    out = pallas_rnn.lstm_sequence(
                        params["cell_0"], carry0[0], xs, resets
                    )
                return jnp.sum(out * jnp.cos(out))
            return f

        want = jax.grad(loss("scan"), argnums=(0, 1))(params, xs)
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss("pallas"), argnums=(0, 1))(params, xs)
        jax.tree_util.tree_map_with_path(
            lambda p, w, g: np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4, err_msg=str(p)
            ),
            want, got,
        )

    def test_lstm_both_cores_agree(self):
        """x-streaming and xproj-streaming LSTM cores produce the same
        values/grads on the same problem (bypassing the D dispatch)."""
        mem = Memory(hidden_size=H, rnn_type="lstm", num_layers=1)
        params = mem.init(
            jax.random.PRNGKey(6), mem.initialize_carry(B), jnp.zeros((B, 64))
        )["params"]
        rng = np.random.default_rng(7)
        xs = jnp.asarray(rng.normal(size=(4, B, 64)), jnp.float32)
        resets = jnp.asarray(rng.random((4, B)) < 0.2)
        resets = resets.at[0].set(False)
        (c0, h0) = (
            jnp.asarray(rng.normal(size=(B, H)), jnp.float32),
            jnp.asarray(rng.normal(size=(B, H)), jnp.float32),
        )
        p = params["cell_0"]
        order = ("i", "f", "g", "o")
        wi = jnp.concatenate([p[f"i{k}"]["kernel"] for k in order], axis=1)
        wh = jnp.concatenate([p[f"h{k}"]["kernel"] for k in order], axis=1)
        bh = jnp.concatenate([p[f"h{k}"]["bias"] for k in order])[None, :]
        Tl = xs.shape[0]
        r = resets.astype(jnp.float32).reshape(Tl, 1, B)

        def loss_x(wi, wh, xs):
            hs, _ = pallas_rnn._lstm_core_x(None, wi, wh, bh, c0, h0, xs, r)
            return jnp.sum(jnp.tanh(hs))

        def loss_xproj(wi, wh, xs):
            xproj = (xs.reshape(Tl * B, -1) @ wi).reshape(Tl, B, 4 * H)
            hs, _ = pallas_rnn._lstm_core(None, wh, bh, c0, h0, xproj, r)
            return jnp.sum(jnp.tanh(hs))

        with pltpu.force_tpu_interpret_mode():
            va = jax.value_and_grad(loss_x, argnums=(0, 1, 2))(wi, wh, xs)
            vb = jax.value_and_grad(loss_xproj, argnums=(0, 1, 2))(wi, wh, xs)
        np.testing.assert_allclose(float(va[0]), float(vb[0]), rtol=1e-6)
        for a, b in zip(va[1], vb[1]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            )


class TestPairedReplay:
    """Stream-paired kernels (actor+critic replays in ONE dispatch) vs two
    independent scan replays — values AND grads, both cell types."""

    def _second(self, mem, carry0, rng):
        params_b = mem.init(
            jax.random.PRNGKey(7), mem.initialize_carry(B), jnp.zeros((B, D))
        )["params"]
        if mem.rnn_type == "gru":
            carry0_b = (jnp.asarray(rng.normal(size=(B, H)), jnp.float32),)
        else:
            carry0_b = (
                (
                    jnp.asarray(rng.normal(size=(B, H)), jnp.float32),
                    jnp.asarray(rng.normal(size=(B, H)), jnp.float32),
                ),
            )
        return params_b, carry0_b

    def test_values_match_two_scans(self, setup, monkeypatch):
        from rsl_rl_tpu.networks.memory import paired_sequence

        mem, params_a, carry0_a, xs_a, resets = setup
        rng = np.random.default_rng(5)
        params_b, carry0_b = self._second(mem, carry0_a, rng)
        xs_b = jnp.asarray(rng.normal(size=(T, B, D)), jnp.float32)

        want_a = _scan_path(mem, params_a, carry0_a, xs_a, resets)
        want_b = _scan_path(mem, params_b, carry0_b, xs_b, resets)

        monkeypatch.setattr(pallas_rnn, "supports_pallas_rnn", lambda *a, **k: True)
        with pltpu.force_tpu_interpret_mode():
            got_a, got_b = paired_sequence(
                mem, params_a, carry0_a, xs_a, mem, params_b, carry0_b, xs_b, resets
            )
        np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b), rtol=1e-5, atol=1e-5)

    def test_grads_match_two_scans(self, setup, monkeypatch):
        from rsl_rl_tpu.networks.memory import paired_sequence

        mem, params_a, carry0_a, xs_a, resets = setup
        rng = np.random.default_rng(6)
        params_b, carry0_b = self._second(mem, carry0_a, rng)
        xs_b = jnp.asarray(rng.normal(size=(T, B, D)), jnp.float32)

        # distinct per-stream output weights so the cotangents differ
        def head(out_a, out_b):
            return jnp.sum(out_a * jnp.cos(out_a)) + jnp.sum(jnp.sin(out_b) * out_b)

        def loss_scan(args):
            pa, ca, xa, pb, cb, xb = args
            return head(
                _scan_path(mem, pa, ca, xa, resets), _scan_path(mem, pb, cb, xb, resets)
            )

        def loss_pair(args):
            pa, ca, xa, pb, cb, xb = args
            out_a, out_b = paired_sequence(
                mem, pa, ca, xa, mem, pb, cb, xb, resets
            )
            return head(out_a, out_b)

        args = (params_a, carry0_a, xs_a, params_b, carry0_b, xs_b)
        want = jax.grad(loss_scan)(args)
        monkeypatch.setattr(pallas_rnn, "supports_pallas_rnn", lambda *a, **k: True)
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss_pair)(args)

        jax.tree_util.tree_map_with_path(
            lambda p, w, g: np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-5,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(p)}",
            ),
            want,
            got,
        )

    def test_non_twin_fallback(self, setup):
        """Different input shapes must take the two-independent-calls path
        (no pairing possible) and still be numerically exact."""
        from rsl_rl_tpu.networks.memory import paired_sequence

        mem, params_a, carry0_a, xs_a, resets = setup
        rng = np.random.default_rng(8)
        D2 = D + 3
        params_b = mem.init(
            jax.random.PRNGKey(9), mem.initialize_carry(B), jnp.zeros((B, D2))
        )["params"]
        carry0_b = jax.tree.map(jnp.zeros_like, carry0_a)
        xs_b = jnp.asarray(rng.normal(size=(T, B, D2)), jnp.float32)

        got_a, got_b = paired_sequence(
            mem, params_a, carry0_a, xs_a, mem, params_b, carry0_b, xs_b, resets
        )
        np.testing.assert_allclose(
            np.asarray(got_a), np.asarray(_scan_path(mem, params_a, carry0_a, xs_a, resets)),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got_b), np.asarray(_scan_path(mem, params_b, carry0_b, xs_b, resets)),
            rtol=1e-5, atol=1e-5,
        )


class TestPairedReplayModes:
    """Paired kernels under the remaining dispatch modes: bf16 compute
    operands and two-layer stacks (pairing applies per layer)."""

    def test_bf16_paired_matches_bf16_singles(self, setup, monkeypatch):
        """bf16 paired replay must match the bf16 single-stream kernels
        exactly: identical dot products, identical operand casts, only the
        dispatch differs."""
        mem, params_a, carry0_a, xs_a, resets = setup
        rng = np.random.default_rng(11)
        params_b = mem.init(
            jax.random.PRNGKey(12), mem.initialize_carry(B), jnp.zeros((B, D))
        )["params"]
        xs_b = jnp.asarray(rng.normal(size=(T, B, D)), jnp.float32)
        carry0_b = jax.tree.map(jnp.zeros_like, carry0_a)

        if mem.rnn_type == "gru":
            single = lambda p, c, x: pallas_rnn.gru_sequence(
                p["cell_0"], c[0], x, resets, compute_dtype=jnp.bfloat16
            )
            pair = lambda: pallas_rnn.gru_sequence_pair(
                (params_a["cell_0"], params_b["cell_0"]),
                (carry0_a[0], carry0_b[0]),
                (xs_a, xs_b),
                resets,
                compute_dtype=jnp.bfloat16,
            )
        else:
            single = lambda p, c, x: pallas_rnn.lstm_sequence(
                p["cell_0"], c[0], x, resets, compute_dtype=jnp.bfloat16
            )
            pair = lambda: pallas_rnn.lstm_sequence_pair(
                (params_a["cell_0"], params_b["cell_0"]),
                (carry0_a[0], carry0_b[0]),
                (xs_a, xs_b),
                resets,
                compute_dtype=jnp.bfloat16,
            )

        with pltpu.force_tpu_interpret_mode():
            want_a = single(params_a, carry0_a, xs_a)
            want_b = single(params_b, carry0_b, xs_b)
            got_a, got_b = pair()
        np.testing.assert_array_equal(np.asarray(got_a), np.asarray(want_a))
        np.testing.assert_array_equal(np.asarray(got_b), np.asarray(want_b))

    @pytest.mark.parametrize("rnn_type", ["gru", "lstm"])
    def test_two_layer_paired_matches_scan(self, rnn_type, monkeypatch):
        from rsl_rl_tpu.networks.memory import paired_sequence

        mem = Memory(hidden_size=H, rnn_type=rnn_type, num_layers=2)
        carry0_a = mem.initialize_carry(B)
        carry0_b = mem.initialize_carry(B)
        params_a = mem.init(jax.random.PRNGKey(3), carry0_a, jnp.zeros((B, D)))["params"]
        params_b = mem.init(jax.random.PRNGKey(4), carry0_b, jnp.zeros((B, D)))["params"]
        rng = np.random.default_rng(13)
        xs_a = jnp.asarray(rng.normal(size=(T, B, D)), jnp.float32)
        xs_b = jnp.asarray(rng.normal(size=(T, B, D)), jnp.float32)
        resets = jnp.asarray(rng.random((T, B)) < 0.2)
        resets = resets.at[0].set(False)

        want_a = _scan_path(mem, params_a, carry0_a, xs_a, resets)
        want_b = _scan_path(mem, params_b, carry0_b, xs_b, resets)

        monkeypatch.setattr(pallas_rnn, "supports_pallas_rnn", lambda *a, **k: True)
        with pltpu.force_tpu_interpret_mode():
            got_a, got_b = paired_sequence(
                mem, params_a, carry0_a, xs_a, mem, params_b, carry0_b, xs_b, resets
            )
        np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b), rtol=1e-5, atol=1e-5)

    def test_bf16_paired_grads_match_bf16_singles(self, setup):
        """The paired bwd kernels recompute with the same dt casts as the
        single-stream bwd kernels — gradients must match them exactly."""
        mem, params_a, carry0_a, xs_a, resets = setup
        rng = np.random.default_rng(14)
        params_b = mem.init(
            jax.random.PRNGKey(15), mem.initialize_carry(B), jnp.zeros((B, D))
        )["params"]
        xs_b = jnp.asarray(rng.normal(size=(T, B, D)), jnp.float32)
        carry0_b = jax.tree.map(jnp.zeros_like, carry0_a)

        def head(out_a, out_b):
            return jnp.sum(out_a * jnp.cos(out_a)) + jnp.sum(jnp.sin(out_b) * out_b)

        if mem.rnn_type == "gru":
            seq = lambda p, c, x: pallas_rnn.gru_sequence(
                p["cell_0"], c[0], x, resets, compute_dtype=jnp.bfloat16
            )
            pair = lambda pa, ca, xa, pb, cb, xb: pallas_rnn.gru_sequence_pair(
                (pa["cell_0"], pb["cell_0"]), (ca[0], cb[0]), (xa, xb), resets,
                compute_dtype=jnp.bfloat16,
            )
        else:
            seq = lambda p, c, x: pallas_rnn.lstm_sequence(
                p["cell_0"], c[0], x, resets, compute_dtype=jnp.bfloat16
            )
            pair = lambda pa, ca, xa, pb, cb, xb: pallas_rnn.lstm_sequence_pair(
                (pa["cell_0"], pb["cell_0"]), (ca[0], cb[0]), (xa, xb), resets,
                compute_dtype=jnp.bfloat16,
            )

        def loss_singles(args):
            pa, ca, xa, pb, cb, xb = args
            return head(seq(pa, ca, xa), seq(pb, cb, xb))

        def loss_pair(args):
            out_a, out_b = pair(*args)
            return head(out_a, out_b)

        args = (params_a, carry0_a, xs_a, params_b, carry0_b, xs_b)
        with pltpu.force_tpu_interpret_mode():
            want = jax.grad(loss_singles)(args)
            got = jax.grad(loss_pair)(args)

        jax.tree_util.tree_map_with_path(
            lambda p, w, g: np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-7,
                err_msg=f"bf16 grad mismatch at {jax.tree_util.keystr(p)}",
            ),
            want,
            got,
        )


class TestPairGate:
    """Shape-gate regressions for the paired kernels."""

    def test_bench_shape_admitted(self):
        # the bench recurrent workload's minibatch: GRU-256, B=4096/4, D=15
        assert pallas_rnn._x_stream_pair_ok(1024, 256, 3, 15)

    def test_double_buffered_weights_counted(self):
        """H=256, D=512, B=1024 passes the single-stream estimate but the
        paired backward double-buffers the stream-indexed weight and
        weight-grad blocks (~4.7 MB extra), overcommitting VMEM — the pair
        gate must reject it (the single gate may keep admitting it)."""
        assert pallas_rnn._x_stream_ok(1024, 256, 3, 512)
        assert not pallas_rnn._x_stream_pair_ok(1024, 256, 3, 512)

    def test_wide_d_rejected(self):
        assert not pallas_rnn._x_stream_pair_ok(1024, 256, 3, 1024)


class TestShortWindow:
    """T=1 windows (the shortest truncated-BPTT tail segment the chunked
    distillation replay can produce): the backward kernels' hs_prev index map
    clamps to block 0 and the kernel substitutes carry0 at t==0 — verify
    values AND grads at the boundary, single and paired cores."""

    @pytest.mark.parametrize("rnn_type", ["gru", "lstm"])
    def test_t1_values_and_grads(self, rnn_type, monkeypatch):
        from rsl_rl_tpu.networks.memory import paired_sequence

        mem = Memory(hidden_size=H, rnn_type=rnn_type, num_layers=1)
        carry0_zero = mem.initialize_carry(B)
        params = mem.init(jax.random.PRNGKey(21), carry0_zero, jnp.zeros((B, D)))["params"]
        params_b = mem.init(jax.random.PRNGKey(22), carry0_zero, jnp.zeros((B, D)))["params"]
        rng = np.random.default_rng(23)
        xs = jnp.asarray(rng.normal(size=(1, B, D)), jnp.float32)
        xs_b = jnp.asarray(rng.normal(size=(1, B, D)), jnp.float32)
        resets = jnp.zeros((1, B), bool)
        if rnn_type == "gru":
            carry0 = (jnp.asarray(rng.normal(size=(B, H)), jnp.float32),)
        else:
            carry0 = ((jnp.asarray(rng.normal(size=(B, H)), jnp.float32),
                       jnp.asarray(rng.normal(size=(B, H)), jnp.float32)),)

        def loss(fn):
            def f(params, carry0, xs):
                out = fn(params, carry0, xs)
                return jnp.sum(out * jnp.cos(out))
            return f

        scan_fn = lambda p, c, x: _scan_path(mem, p, c, x, resets)
        pallas_fn = lambda p, c, x: (
            pallas_rnn.gru_sequence(p["cell_0"], c[0], x, resets)
            if rnn_type == "gru"
            else pallas_rnn.lstm_sequence(p["cell_0"], c[0], x, resets)
        )

        want_v = scan_fn(params, carry0, xs)
        want_g = jax.grad(loss(scan_fn), argnums=(0, 1, 2))(params, carry0, xs)
        with pltpu.force_tpu_interpret_mode():
            got_v = pallas_fn(params, carry0, xs)
            got_g = jax.grad(loss(pallas_fn), argnums=(0, 1, 2))(params, carry0, xs)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), rtol=1e-5, atol=1e-5)
        jax.tree_util.tree_map_with_path(
            lambda p, w, g: np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-5,
                err_msg=f"T=1 grad mismatch at {jax.tree_util.keystr(p)}",
            ),
            want_g, got_g,
        )

        # paired at T=1
        monkeypatch.setattr(pallas_rnn, "supports_pallas_rnn", lambda *a, **k: True)
        with pltpu.force_tpu_interpret_mode():
            pa, pb = paired_sequence(
                mem, params, carry0, xs, mem, params_b, carry0, xs_b, resets
            )
        np.testing.assert_allclose(np.asarray(pa), np.asarray(want_v), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(pb), np.asarray(scan_fn(params_b, carry0, xs_b)),
            rtol=1e-5, atol=1e-5,
        )
