"""Trajectory split/pad/unpad utilities.

JAX counterparts of the reference helpers (reference:
rsl_rl/utils/utils.py:78-141). The training path does NOT need them — the
recurrent BPTT replay uses done-masked scans instead of padded trajectories
(see rsl_rl_tpu/networks/memory.py) — but they are part of the reference's
utils surface and useful for offline trajectory analysis.

Semantics match the reference exactly, with one static-shape deviation: the
reference's padded output has a data-dependent trajectory count; here the
output is padded to the static upper bound ``N * T`` trajectories (the extra
columns have all-False masks), because JAX requires static shapes. Real
trajectories occupy the same leading columns in the same order (env-major,
then time) as the reference.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def split_and_pad_trajectories(tensor: Any, dones: jax.Array) -> tuple[Any, jax.Array]:
    """Split a time-major rollout at dones and zero-pad the trajectories.

    Like the reference (utils.py:96-97), the last step of every env is treated
    as a trajectory end, so each env's window is fully covered.

    Args:
        tensor: ``[T, N, ...]`` array or pytree of such.
        dones: ``[T, N]`` done flags (bool or numeric).

    Returns:
        ``(padded, mask)``: ``padded`` is ``[T, N*T, ...]`` with trajectories
        as columns (env-major, then time order), ``mask`` is ``[T, N*T]`` bool
        marking the valid steps.
    """
    dones = jnp.asarray(dones).astype(bool)
    T, N = dones.shape
    d = dones.T.at[:, -1].set(True)  # [N, T]; forced done at the window end

    # per-step bookkeeping (all [N, T])
    prev_dones = jnp.concatenate(
        [jnp.zeros((N, 1), jnp.int32), jnp.cumsum(d.astype(jnp.int32), axis=1)[:, :-1]],
        axis=1,
    )
    trajs_per_env = jnp.sum(d, axis=1).astype(jnp.int32)
    env_offset = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(trajs_per_env)[:-1]]
    )
    traj_id = prev_dones + env_offset[:, None]

    # index of the most recent done strictly before each step (-1 if none)
    def carry_last_done(carry, col):
        done_col, t = col
        out = carry
        carry = jnp.where(done_col, t, carry)
        return carry, out

    _, last_done = jax.lax.scan(
        carry_last_done,
        jnp.full((N,), -1, jnp.int32),
        (d.T, jnp.arange(T, dtype=jnp.int32)),
    )
    pos = jnp.arange(T, dtype=jnp.int32)[None, :] - last_done.T - 1  # [N, T]

    flat_traj = traj_id.reshape(-1)
    flat_pos = pos.reshape(-1)
    max_traj = N * T

    def scatter(x):
        flat = jnp.swapaxes(x, 0, 1).reshape((N * T,) + x.shape[2:])
        out = jnp.zeros((T, max_traj) + x.shape[2:], x.dtype)
        return out.at[flat_pos, flat_traj].set(flat)

    padded = jax.tree.map(scatter, tensor)
    mask = scatter(jnp.ones((T, N), jnp.bool_))
    return padded, mask


def unpad_trajectories(trajectories: Any, masks: jax.Array) -> Any:
    """Exact inverse of :func:`split_and_pad_trajectories`
    (reference utils.py:134-141).

    Requires ``masks`` produced by our splitter (padded width ``N*T``), from
    which the original env count is recovered statically.
    """
    T, J = masks.shape
    if J % T != 0:
        raise ValueError(
            "masks must come from split_and_pad_trajectories (width N*T);"
            f" got T={T}, width={J}"
        )
    N = J // T
    flat_mask = masks.T.reshape(-1)  # traj-major
    order = jnp.argsort(~flat_mask, stable=True)  # valid rows first

    def gather(x):
        flat = jnp.swapaxes(x, 0, 1).reshape((J * T,) + x.shape[2:])
        valid = flat[order][: N * T]  # exactly N*T valid steps, env-major
        return jnp.swapaxes(valid.reshape((N, T) + x.shape[2:]), 0, 1)

    return jax.tree.map(gather, trajectories)
