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

Robustness beyond the reference (SURVEY.md §5.3-5.4):
- writes are atomic (temp file + rename), so a preemption mid-save never
  corrupts the latest checkpoint,
- ``save_checkpoint(..., block=False)`` fetches the state synchronously but
  serializes on a background thread, keeping the training loop running,
- ``latest_checkpoint(log_dir)`` finds the newest ``model_<it>.ckpt`` for
  auto-resume after a crash/preemption.
"""

from __future__ import annotations

import itertools
import os
import pickle
import re
import threading
from typing import Any

import jax
import numpy as np

_CKPT_RE = re.compile(r"model_(\d+)\.ckpt$")
_pending: list[threading.Thread] = []
_tmp_counter = itertools.count()


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _write_atomic(path: str, state: dict) -> None:
    # unique temp name: a blocking save may overlap an in-flight async save of
    # the SAME path (e.g. learn()'s final save right after a periodic one);
    # with distinct temp files each os.replace is atomic and last-wins, so the
    # destination is always a complete checkpoint
    tmp = f"{path}.tmp{next(_tmp_counter)}-{threading.get_ident()}"
    with open(tmp, "wb") as f:
        pickle.dump(state, f)
    os.replace(tmp, path)


def save_checkpoint(path: str, state: dict, block: bool = True) -> None:
    """Serialize a state dict pytree to ``path`` (atomically).

    With ``block=False`` the device->host transfer happens now (so the state
    is a consistent snapshot) but serialization runs on a background thread.
    """
    host_state = _to_host(state)
    if block:
        _write_atomic(path, host_state)
        return
    t = threading.Thread(target=_write_atomic, args=(path, host_state), daemon=True)
    t.start()
    _pending.append(t)


def wait_for_saves() -> None:
    """Block until all async checkpoint writes have finished."""
    while _pending:
        _pending.pop().join()


def load_checkpoint(path: str) -> dict:
    """Load a checkpoint saved by :func:`save_checkpoint`."""
    with open(path, "rb") as f:
        return pickle.load(f)


def latest_checkpoint(log_dir: str) -> str | None:
    """Path of the highest-iteration ``model_<it>.ckpt`` in ``log_dir``
    (None when none exist) — the auto-resume entry point."""
    best_it, best_path = -1, None
    try:
        entries = os.listdir(log_dir)
    except FileNotFoundError:
        return None
    for name in entries:
        m = _CKPT_RE.match(name)
        if m and int(m.group(1)) > best_it:
            best_it = int(m.group(1))
            best_path = os.path.join(log_dir, name)
    return best_path
