"""Checkpoint save/load for train-state pytrees.

Counterpart of the reference's ``torch.save``/``torch.load`` checkpointing
(reference: rsl_rl/runners/on_policy_runner.py:289-324). A checkpoint is one
file holding the typed state pytree with NumPy leaves:

``{"model": PolicyState, "opt_state", "lr", "iter", "rnd", "rnd_opt_state",
   "infos"}``

The resume-flag protocol is preserved: ``policy.load_state_dict`` inspects the
loaded ``PolicyState`` and decides whether this is a resume (restore optimizer
+ iteration) or a teacher bootstrap for distillation
(reference student_teacher.py:168-206, on_policy_runner.py:307-324).
"""

from __future__ import annotations

import pickle
from typing import Any

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: dict) -> None:
    """Serialize a state dict pytree to ``path``."""
    with open(path, "wb") as f:
        pickle.dump(_to_host(state), f)


def load_checkpoint(path: str) -> dict:
    """Load a checkpoint saved by :func:`save_checkpoint`."""
    with open(path, "rb") as f:
        return pickle.load(f)
