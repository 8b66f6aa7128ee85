"""Policy export for deployment.

The reference declares ONNX as a dependency but ships no export tooling
(SURVEY.md §2 #25 — export lives downstream). This module provides the
TPU-native deployment story: the deterministic inference policy is exported as
a serialized StableHLO artifact (via ``jax.export``) plus its parameters, so a
runtime without the framework's Python classes can execute it.

The exported function operates on flattened leaf lists (``jax.export`` cannot
serialize custom pytree node types like ``PolicyState``); the pytree
structures are only used at trace time.

Usage::

    export_policy(runner.alg.policy, runner.train_state.policy, obs, path)
    policy_fn = load_policy(path)   # obs_dict -> action (stateful for RNNs)
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def export_policy(policy, policy_state, example_obs: dict, path: str) -> None:
    """Serialize the deterministic inference path of a policy.

    Args:
        policy: A policy module (ActorCritic, StudentTeacher, ...).
        policy_state: Its ``PolicyState`` pytree.
        example_obs: Example obs dict fixing batch size and shapes.
        path: Output file.
    """
    num_envs = next(iter(example_obs.values())).shape[0]
    carry = policy.initial_carry(num_envs)

    ps_leaves, ps_def = jax.tree.flatten(policy_state)
    carry_leaves, carry_def = jax.tree.flatten(carry)

    def infer(ps_leaves, obs, carry_leaves):
        ps = jax.tree.unflatten(ps_def, ps_leaves)
        c = jax.tree.unflatten(carry_def, carry_leaves)
        action, new_carry = policy.act_inference(ps, obs, c)
        return action, jax.tree.leaves(new_carry)

    exported = jax_export.export(jax.jit(infer))(
        ps_leaves, example_obs, carry_leaves
    )
    payload = {
        "stablehlo": exported.serialize(),
        "ps_leaves": [np.asarray(x) for x in ps_leaves],
        "carry_leaves": [np.asarray(x) for x in carry_leaves],
        "example_obs": jax.tree.map(np.asarray, example_obs),
        "is_recurrent": policy.is_recurrent,
        "num_envs": num_envs,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_policy(path: str):
    """Load an exported policy as a stateful callable ``obs_dict -> action``.

    Recurrent policies keep their hidden carry internally; call ``.reset()``
    between episodes.
    """
    with open(path, "rb") as f:
        payload = pickle.load(f)
    exported = jax_export.deserialize(payload["stablehlo"])
    ps_leaves = [jnp.asarray(x) for x in payload["ps_leaves"]]
    carry0 = [jnp.asarray(x) for x in payload["carry_leaves"]]
    state = {"carry": list(carry0)}

    def call(obs):
        action, new_carry = exported.call(ps_leaves, obs, state["carry"])
        state["carry"] = list(new_carry)
        return action

    def reset():
        state["carry"] = list(carry0)

    call.reset = reset
    call.is_recurrent = payload["is_recurrent"]
    return call
