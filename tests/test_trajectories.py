"""split/pad/unpad trajectory utilities vs the reference's documented example
and a round-trip property (reference utils.py:78-141)."""

import jax
import jax.numpy as jnp
import numpy as np

from rsl_rl_tpu.utils.trajectories import split_and_pad_trajectories, unpad_trajectories


class TestSplitAndPad:
    def test_reference_docstring_example(self):
        """The example from the reference docstring (utils.py:84-93)."""
        # two envs, T=6: env a done after step 4; env b done after 2 and 5
        vals = jnp.arange(1, 13, dtype=jnp.float32).reshape(2, 6).T  # [T, N]
        # a = 1..6, b = 7..12
        dones = jnp.zeros((6, 2), bool).at[3, 0].set(True).at[1, 1].set(True).at[4, 1].set(True)

        padded, mask = split_and_pad_trajectories(vals[..., None], dones)
        padded = np.asarray(padded[..., 0])
        mask = np.asarray(mask)

        # trajectory columns: [a1-a4], [a5,a6], [b1,b2], [b3,b4,b5], [b6]
        want_cols = [
            [1, 2, 3, 4, 0, 0],
            [5, 6, 0, 0, 0, 0],
            [7, 8, 0, 0, 0, 0],
            [9, 10, 11, 0, 0, 0],
            [12, 0, 0, 0, 0, 0],
        ]
        for j, col in enumerate(want_cols):
            np.testing.assert_array_equal(padded[:, j], col)
            np.testing.assert_array_equal(mask[:, j], np.asarray(col) != 0)
        # remaining columns are padding
        assert not mask[:, len(want_cols):].any()

    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        T, N, D = 12, 5, 3
        x = jnp.asarray(rng.normal(size=(T, N, D)), jnp.float32)
        dones = jnp.asarray(rng.random((T, N)) < 0.2)
        padded, mask = split_and_pad_trajectories(x, dones)
        back = unpad_trajectories(padded, mask)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_pytree_input(self):
        rng = np.random.default_rng(1)
        T, N = 8, 3
        tree = {
            "a": jnp.asarray(rng.normal(size=(T, N, 2)), jnp.float32),
            "b": jnp.asarray(rng.normal(size=(T, N, 4)), jnp.float32),
        }
        dones = jnp.asarray(rng.random((T, N)) < 0.25)
        padded, mask = split_and_pad_trajectories(tree, dones)
        back = unpad_trajectories(padded, mask)
        jax.tree.map(
            lambda g, w: np.testing.assert_array_equal(np.asarray(g), np.asarray(w)),
            back,
            tree,
        )

    def test_jittable(self):
        T, N = 6, 4
        x = jnp.ones((T, N, 2))
        dones = jnp.zeros((T, N), bool).at[2, 1].set(True)
        padded, mask = jax.jit(split_and_pad_trajectories)(x, dones)
        assert padded.shape == (T, N * T, 2)
        assert int(mask.sum()) == T * N
