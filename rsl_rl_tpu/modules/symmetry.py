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


def resolve_symmetry_config(alg_cfg: dict, env) -> dict:
    if "symmetry_cfg" in alg_cfg and alg_cfg["symmetry_cfg"] is not None:
        # copy so the user's config template is never mutated
        alg_cfg["symmetry_cfg"] = {**alg_cfg["symmetry_cfg"], "_env": env}
    return alg_cfg
