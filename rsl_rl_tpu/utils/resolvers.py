"""Name-to-object resolvers for config-driven construction.

JAX counterparts of the reference resolvers
(reference: rsl_rl/utils/utils.py:18-75, 172-304). Class dispatch uses an
explicit registry (see ``rsl_rl_tpu/utils/registry.py``) rather than the
reference's ``eval()`` of config strings.
"""

from __future__ import annotations

import importlib
import warnings
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

_ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "relu": jax.nn.relu,
    "crelu": jax.nn.celu,  # reference maps "crelu" to torch.nn.CELU (utils.py:34)
    "lrelu": jax.nn.leaky_relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "gelu": jax.nn.gelu,
    "swish": jax.nn.silu,
    "mish": jax.nn.mish,
    "identity": lambda x: x,
}


def resolve_nn_activation(act_name: str) -> Callable[[jax.Array], jax.Array]:
    """Resolve an activation function by name.

    Supports the same twelve names as the reference
    (rsl_rl/utils/utils.py:30-43).
    """
    name = act_name.lower()
    if name not in _ACTIVATIONS:
        raise ValueError(
            f"Invalid activation function '{act_name}'. Valid activations are: {list(_ACTIVATIONS)}"
        )
    return _ACTIVATIONS[name]


def resolve_optimizer(optimizer_name: str) -> Callable[..., optax.GradientTransformation]:
    """Resolve an optimizer *direction transform* factory by name.

    The returned factory builds an ``optax.GradientTransformation`` that
    produces an update direction WITHOUT the learning-rate scale — the
    algorithms apply ``-lr`` themselves so the adaptive-KL schedule can carry
    the learning rate as traced state inside the jitted update
    (reference LR plumbing: rsl_rl/algorithms/ppo.py:260-294).

    Supported names match the reference (rsl_rl/utils/utils.py:64-69):
    adam / adamw / sgd / rmsprop.
    """
    name = optimizer_name.lower()
    if name == "adam":
        return lambda **kw: optax.scale_by_adam(**kw)
    if name == "adamw":
        # torch AdamW default weight decay 1e-2, decoupled (scaled by lr later).
        return lambda weight_decay=1e-2, **kw: optax.chain(
            optax.scale_by_adam(**kw), optax.add_decayed_weights(weight_decay)
        )
    if name == "sgd":
        return lambda **kw: optax.identity()
    if name == "rmsprop":
        # match torch.optim.RMSprop defaults: alpha=0.99, eps added OUTSIDE
        # the sqrt (optax's defaults are decay=0.9 with eps inside)
        return lambda decay=0.99, eps=1e-8, **kw: optax.scale_by_rms(
            decay=decay, eps=eps, eps_in_sqrt=False, **kw
        )
    raise ValueError(
        f"Invalid optimizer '{optimizer_name}'. Valid optimizers are: ['adam', 'adamw', 'sgd', 'rmsprop']"
    )


def string_to_callable(name: str) -> Callable:
    """Resolve a ``"module:attribute"`` string to a callable.

    Same contract as the reference (rsl_rl/utils/utils.py:172-199); used for
    the symmetry data-augmentation function.
    """
    try:
        mod_name, attr_name = name.split(":")
        mod = importlib.import_module(mod_name)
        callable_object = getattr(mod, attr_name)
        if callable(callable_object):
            return callable_object
        raise ValueError(f"The imported object is not callable: '{name}'")
    except AttributeError as e:
        msg = (
            "We could not interpret the entry as a callable object. The format of input should be"
            f" 'module:attribute_name'\nWhile processing input '{name}', received the error:\n {e}."
        )
        raise ValueError(msg)


def resolve_obs_groups(
    obs: dict[str, Any], obs_groups: dict[str, list[str]], default_sets: list[str]
) -> dict[str, list[str]]:
    """Validate the obs-set configuration and default missing sets.

    Pure-Python port of the reference's validation/defaulting logic, including
    its deprecation warnings (reference: rsl_rl/utils/utils.py:202-304):

    1. ``"policy"`` must be configured; if absent but an obs *group* named
       ``"policy"`` exists, that group is assumed (with a warning).
    2. Empty obs-set lists are rejected; unknown group names are rejected.
    3. Each missing default set falls back to a like-named obs group if one
       exists, otherwise to a copy of the ``"policy"`` set (with warnings).
    """
    obs_groups = {k: list(v) for k, v in obs_groups.items()}

    if "policy" not in obs_groups:
        if "policy" in obs:
            obs_groups["policy"] = ["policy"]
            warnings.warn(
                "The observation configuration dictionary 'obs_groups' must contain the 'policy' key."
                " As an observation group with the name 'policy' was found, this is assumed to be the"
                " observation set. Consider adding the 'policy' key to the 'obs_groups' dictionary for"
                " clarity. This behavior will be removed in a future version."
            )
        else:
            raise ValueError(
                "The observation configuration dictionary 'obs_groups' must contain the 'policy' key."
                f" Found keys: {list(obs_groups.keys())}"
            )

    for set_name, groups in obs_groups.items():
        if len(groups) == 0:
            msg = f"The '{set_name}' key in the 'obs_groups' dictionary can not be an empty list."
            if set_name in default_sets:
                if set_name not in obs:
                    msg += " Consider removing the key to default to the observations used for the 'policy' set."
                else:
                    msg += f" Consider removing the key to default to the observation '{set_name}' from the environment."
            raise ValueError(msg)
        for group in groups:
            if group not in obs:
                raise ValueError(
                    f"Observation '{group}' in observation set '{set_name}' not found in the observations"
                    f" from the environment. Available observations from the environment: {list(obs.keys())}"
                )

    for default_set_name in default_sets:
        if default_set_name not in obs_groups:
            if default_set_name in obs:
                obs_groups[default_set_name] = [default_set_name]
                warnings.warn(
                    f"The observation configuration dictionary 'obs_groups' must contain the"
                    f" '{default_set_name}' key. As an observation group with the name"
                    f" '{default_set_name}' was found, this is assumed to be the observation set."
                    f" Consider adding the '{default_set_name}' key to the 'obs_groups' dictionary for"
                    " clarity. This behavior will be removed in a future version."
                )
            else:
                obs_groups[default_set_name] = obs_groups["policy"].copy()
                warnings.warn(
                    f"The observation configuration dictionary 'obs_groups' must contain the"
                    f" '{default_set_name}' key. As the configuration for '{default_set_name}' is"
                    " missing, the observations from the 'policy' set are used. Consider adding the"
                    f" '{default_set_name}' key to the 'obs_groups' dictionary for clarity."
                    " This behavior will be removed in a future version."
                )

    print("-" * 80)
    print("Resolved observation sets: ")
    for set_name, groups in obs_groups.items():
        print("\t", set_name, ": ", groups)
    print("-" * 80)

    return obs_groups
