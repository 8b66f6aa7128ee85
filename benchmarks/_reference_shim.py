"""Import shim for running the UPSTREAM reference library (rsl_rl, torch) in
this image for parity testing.

The reference (`/root/reference`) depends on two packages absent from the
image: ``GitPython`` (only used by its git-snapshot helper, which parity runs
never call) and ``tensordict`` (used as a dict-of-tensors container). This
module installs minimal stand-ins **before** the reference is imported, so the
reference's own algorithm code runs unmodified against them.

The ``TensorDict`` stand-in implements exactly the surface the reference
exercises (verified by grep over /root/reference/rsl_rl):

- construction from a dict with ``batch_size=``/``device=`` kwargs
  (storage/rollout_storage.py:48-52, utils/utils.py:117-119)
- ``items()`` / ``keys()`` / str ``__getitem__`` (modules/actor_critic.py:161)
- int/tensor indexing + assignment over the batch dims
  (rollout_storage.py:83,188)
- ``copy_`` (rollout_storage.py:83), ``flatten(0, 1)``
  (rollout_storage.py:168), ``to(device)`` (on_policy_runner.py:72,107),
  ``batch_size`` (ppo.py:218,237), ``repeat`` (ppo.py:231 symmetry path)

This file exists only for the parity harness; the TPU framework itself never
imports torch or the reference.
"""

from __future__ import annotations

import sys
import types


class TensorDictShim(dict):
    """Minimal dict-of-tensors with the TensorDict surface the reference uses."""

    def __init__(self, data=None, batch_size=None, device=None):
        super().__init__(data or {})
        self.batch_size = list(batch_size) if batch_size is not None else []
        self.device = device

    @property
    def shape(self):
        # TensorDict exposes its batch dims as .shape (rollout_storage.py:114)
        return tuple(self.batch_size)

    # -- container views ----------------------------------------------------
    def __getitem__(self, key):
        if isinstance(key, str):
            return dict.__getitem__(self, key)
        # batch indexing: index every value; batch dims shrink accordingly
        indexed = {k: v[key] for k, v in self.items()}
        if isinstance(key, int):
            new_bs = self.batch_size[1:]
        else:  # tensor / slice indexing keeps one batch dim
            first = next(iter(indexed.values()), None)
            new_bs = [len(first)] if first is not None else []
        return TensorDictShim(indexed, batch_size=new_bs, device=self.device)

    def __setitem__(self, key, value):
        if isinstance(key, str):
            dict.__setitem__(self, key, value)
            return
        for k in self.keys():
            dict.__getitem__(self, k)[key] = value[k]

    # -- tensor-wide ops ----------------------------------------------------
    def copy_(self, other):
        for k in self.keys():
            dict.__getitem__(self, k).copy_(other[k])
        return self

    def flatten(self, start, end):
        flat = {k: v.flatten(start, end) for k, v in self.items()}
        bs = list(self.batch_size)
        merged = 1
        for d in bs[start : end + 1]:
            merged *= d
        new_bs = bs[:start] + [merged] + bs[end + 1 :]
        return TensorDictShim(flat, batch_size=new_bs, device=self.device)

    def repeat(self, *sizes):
        rep = {k: v.repeat(*sizes, *([1] * (v.dim() - len(sizes)))) for k, v in self.items()}
        new_bs = [b * s for b, s in zip(self.batch_size, sizes)]
        return TensorDictShim(rep, batch_size=new_bs, device=self.device)

    def to(self, device):
        return TensorDictShim(
            {k: v.to(device) for k, v in self.items()},
            batch_size=self.batch_size,
            device=device,
        )

    def detach(self):
        # reference symmetry loss detaches the obs batch (ppo.py:328)
        return TensorDictShim(
            {k: v.detach() for k, v in self.items()},
            batch_size=self.batch_size,
            device=self.device,
        )

    def clone(self):
        return TensorDictShim(
            {k: v.clone() for k, v in self.items()},
            batch_size=self.batch_size,
            device=self.device,
        )


def install_reference_shims() -> None:
    """Register the git/tensordict stand-ins and put /root/reference on the path."""
    if "tensordict" not in sys.modules:
        td_mod = types.ModuleType("tensordict")
        td_mod.TensorDict = TensorDictShim
        sys.modules["tensordict"] = td_mod
    if "git" not in sys.modules:
        git_mod = types.ModuleType("git")

        class _Repo:  # never used by parity runs (no git snapshotting)
            def __init__(self, *a, **k):
                raise RuntimeError("git snapshotting is unavailable in the parity harness")

        git_mod.Repo = _Repo
        sys.modules["git"] = git_mod
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
