"""Symmetry-augmentation configuration resolver.

Mirror of the reference resolver (reference: rsl_rl/modules/symmetry.py:9-24):
injects the environment handle into ``symmetry_cfg`` so the user-supplied
augmentation function can inspect it.

The augmentation function contract matches the reference
(config/example_config.yaml:63-76) with one added requirement: it must be
JAX-traceable (pure, shape-static), because it runs inside the jitted PPO
update. Signature::

    def data_augmentation_func(obs, actions, env) -> (obs_aug, actions_aug)

where ``obs``/``actions`` may each be ``None`` and the returned arrays stack
``num_aug`` symmetric copies along the leading batch axis (the first copy must
be the original). ``num_aug`` is recovered statically from the traced shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resolve_symmetry_config(alg_cfg: dict, env) -> dict:
    if "symmetry_cfg" in alg_cfg and alg_cfg["symmetry_cfg"] is not None:
        # copy so the user's config template is never mutated
        alg_cfg["symmetry_cfg"] = {**alg_cfg["symmetry_cfg"], "_env": env}
    return alg_cfg


def _leading(obs, actions) -> int:
    if actions is not None:
        return actions.shape[0]
    return next(iter(obs.values())).shape[0]


def apply_augmentation(aug_fn, env, obs, actions, time_major: bool):
    """Run the user augmentation function over a minibatch.

    Feedforward batches (``[B, ...]``) pass straight through, matching the
    reference's flat-batch contract (reference ppo.py:226-244). Time-major
    recurrent batches (``[T, nb, ...]``) are flattened to ``[T*nb, ...]`` rows
    first — so augmentation functions written against the flat contract work
    unchanged — and the result is re-folded to ``[T, num_aug*nb, ...]`` with
    copy ``a`` occupying env columns ``[a*nb, (a+1)*nb)``; copy 0 is the
    original. (The reference's own recurrent symmetry path,
    ppo.py:226-257, feeds padded ``[T, nb]`` batches through the same flat
    contract; folding copies onto the env axis is the scan-replay analog.)

    Returns ``(obs_aug, actions_aug, num_aug)``; ``obs``/``actions`` may each
    be ``None``.
    """
    if not time_major:
        base = _leading(obs, actions)
        obs_a, act_a = aug_fn(obs=obs, actions=actions, env=env)
        return obs_a, act_a, _leading(obs_a, act_a) // base

    ref = actions if actions is not None else next(iter(obs.values()))
    T, nb = ref.shape[:2]

    def flat(x):
        return x.reshape((T * nb,) + x.shape[2:])

    obs_f = {k: flat(v) for k, v in obs.items()} if obs is not None else None
    act_f = flat(actions) if actions is not None else None
    obs_a, act_a = aug_fn(obs=obs_f, actions=act_f, env=env)
    num_aug = _leading(obs_a, act_a) // (T * nb)

    def fold(x):
        x = x.reshape((num_aug, T, nb) + x.shape[1:])
        x = jnp.moveaxis(x, 0, 1)
        return x.reshape((T, num_aug * nb) + x.shape[3:])

    obs_out = {k: fold(v) for k, v in obs_a.items()} if obs_a is not None else None
    act_out = fold(act_a) if act_a is not None else None
    return obs_out, act_out, num_aug


def tile_batch(x: jax.Array, num_aug: int, time_major: bool) -> jax.Array:
    """Repeat per-sample targets for each augmented copy, matching the
    aug-major layout of :func:`apply_augmentation` (reference ppo.py:238-244
    ``repeat(num_aug, 1)``). Batch axis is 1 for time-major arrays."""
    if time_major:
        reps = (1, num_aug) + (1,) * (x.ndim - 2)
    else:
        reps = (num_aug,) + (1,) * (x.ndim - 1)
    return jnp.tile(x, reps)


def tile_carry(carry, num_aug: int):
    """Tile a recurrent carry pytree (env-axis-0 leaves) for augmented copies.

    Each symmetric copy replays from the same window-start hidden state —
    the mirrored trajectory's "true" mirrored hidden is unknowable, and the
    reference likewise reuses the stored (unmirrored) hiddens for the
    augmented batch (ppo.py:249-253)."""
    return jax.tree.map(
        lambda h: jnp.tile(h, (num_aug,) + (1,) * (h.ndim - 1)), carry
    )
