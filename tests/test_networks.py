"""Tests for network primitives: MLP and recurrent Memory."""

import jax
import jax.numpy as jnp
import numpy as np

from rsl_rl_tpu.networks import MLP, Memory, mask_carry, memory_sequence


class TestMLP:
    def test_output_shape(self):
        m = MLP(output_dim=5, hidden_dims=[32, 16])
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((4, 7)))
        y = m.apply(params, jnp.ones((4, 7)))
        assert y.shape == (4, 5)

    def test_minus_one_hidden_dims_inferred(self):
        """-1 hidden dims resolve to the input dim (reference mlp.py:56)."""
        m = MLP(output_dim=2, hidden_dims=[-1, -1])
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 9)))
        k0 = params["params"]["dense_0"]["kernel"]
        k1 = params["params"]["dense_1"]["kernel"]
        assert k0.shape == (9, 9) and k1.shape == (9, 9)

    def test_tuple_output_reshaped(self):
        """Tuple output dim reshapes the final layer (reference mlp.py:68-75)."""
        m = MLP(output_dim=(2, 6), hidden_dims=[16])
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((3, 4)))
        y = m.apply(params, jnp.ones((3, 4)))
        assert y.shape == (3, 2, 6)

    def test_head_dtype_fp32_under_bf16_trunk(self):
        """head_dtype=fp32 computes the final layer at full precision while
        the trunk runs bf16: the output must match a manual fp32 head applied
        to the bf16 trunk activations, and differ (in general) from the
        full-bf16 network."""
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 16)) * 3.0
        m_mixed = MLP(output_dim=4, hidden_dims=[32], dtype=jnp.bfloat16,
                      head_dtype=jnp.float32)
        m_bf16 = MLP(output_dim=4, hidden_dims=[32], dtype=jnp.bfloat16)
        params = m_mixed.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)))
        y_mixed = m_mixed.apply(params, x)
        y_bf16 = m_bf16.apply(params, x)  # same param tree (params stay fp32)
        assert y_mixed.dtype == jnp.float32

        # manual reference: bf16 trunk layer, fp32 head matmul
        import flax.linen as nn

        h = jnp.dot(x.astype(jnp.bfloat16),
                    params["params"]["dense_0"]["kernel"].astype(jnp.bfloat16))
        h = h + params["params"]["dense_0"]["bias"].astype(jnp.bfloat16)
        h = nn.elu(h)
        y_ref = (jnp.dot(h.astype(jnp.float32), params["params"]["dense_1"]["kernel"])
                 + params["params"]["dense_1"]["bias"])
        np.testing.assert_allclose(np.asarray(y_mixed), np.asarray(y_ref),
                                   rtol=1e-6, atol=1e-6)
        # the full-bf16 head rounds the output; outputs should not be
        # bit-identical on generic inputs
        assert not np.array_equal(np.asarray(y_mixed), np.asarray(y_bf16))

    def test_last_activation(self):
        m = MLP(output_dim=4, hidden_dims=[8], last_activation="tanh")
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)))
        y = m.apply(params, 100.0 * jnp.ones((2, 3)))
        assert np.all(np.abs(np.asarray(y)) <= 1.0)

    def test_orthogonal_init(self):
        m = MLP(output_dim=8, hidden_dims=[16], init_scales=2.0)
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)))
        k = np.asarray(params["params"]["dense_0"]["kernel"])
        # orthogonal with gain 2: K^T K = 4 I
        np.testing.assert_allclose(k.T @ k, 4.0 * np.eye(16), atol=1e-4)
        b = np.asarray(params["params"]["dense_0"]["bias"])
        np.testing.assert_allclose(b, 0.0)

    def test_torch_default_init_bounds(self):
        m = MLP(output_dim=4, hidden_dims=[64])
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 100)))
        k = np.asarray(params["params"]["dense_0"]["kernel"])
        bound = 1.0 / np.sqrt(100)
        assert np.abs(k).max() <= bound + 1e-6
        assert np.abs(k).max() > 0.5 * bound  # actually fills the range

    def test_leading_dims_broadcast(self):
        """The MLP must accept [T, N, D] inputs (used in the jitted update)."""
        m = MLP(output_dim=3, hidden_dims=[8])
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((5,)))
        y = m.apply(params, jnp.ones((24, 64, 5)))
        assert y.shape == (24, 64, 3)


class TestMemory:
    def _make(self, rnn_type, num_layers=1):
        mem = Memory(hidden_size=12, rnn_type=rnn_type, num_layers=num_layers)
        carry = mem.initialize_carry(4)
        params = mem.init(jax.random.PRNGKey(0), carry, jnp.zeros((4, 6)))
        return mem, params, carry

    def test_step_shapes_lstm(self):
        mem, params, carry = self._make("lstm", num_layers=2)
        new_carry, out = mem.apply(params, carry, jnp.ones((4, 6)))
        assert out.shape == (4, 12)
        assert len(new_carry) == 2
        c, h = new_carry[0]
        assert c.shape == (4, 12) and h.shape == (4, 12)

    def test_step_shapes_gru(self):
        mem, params, carry = self._make("gru")
        new_carry, out = mem.apply(params, carry, jnp.ones((4, 6)))
        assert out.shape == (4, 12)
        assert new_carry[0].shape == (4, 12)

    def test_sequence_equals_manual_steps(self):
        """memory_sequence with resets == stepping manually with resets."""
        mem, params, carry0 = self._make("lstm")
        T = 7
        xs = jax.random.normal(jax.random.PRNGKey(1), (T, 4, 6))
        dones = np.zeros((T, 4), bool)
        dones[2, 1] = True
        dones[4, 0] = True
        resets = np.zeros((T, 4), bool)
        resets[1:] = dones[:-1]

        step = lambda c, x: mem.apply(params, c, x)
        outs_scan = memory_sequence(step, carry0, xs, jnp.asarray(resets))

        # manual replay
        carry = carry0
        outs = []
        for t in range(T):
            carry = mask_carry(carry, jnp.asarray(resets[t]))
            carry, o = step(carry, xs[t])
            outs.append(o)
        np.testing.assert_allclose(
            np.asarray(outs_scan), np.asarray(jnp.stack(outs)), rtol=1e-6, atol=1e-6
        )

    def test_reset_gives_fresh_start(self):
        """After a reset, the output equals that of a zero carry."""
        mem, params, carry0 = self._make("gru")
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 6))
        # evolve the carry a bit
        carry, _ = mem.apply(params, carry0, x)
        carry, _ = mem.apply(params, carry, x)
        # reset env 0 only
        reset = jnp.asarray([True, False, False, False])
        carry_masked = mask_carry(carry, reset)
        _, out_masked = mem.apply(params, carry_masked, x)
        _, out_fresh = mem.apply(params, carry0, x)
        np.testing.assert_allclose(
            np.asarray(out_masked[0]), np.asarray(out_fresh[0]), rtol=1e-6
        )
        # untouched envs keep their history
        assert not np.allclose(np.asarray(out_masked[1]), np.asarray(out_fresh[1]))
