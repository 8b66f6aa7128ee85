"""Orbax checkpoint format: round-trip, typed restore, malformed-input safety.

The checkpoint is a pure state-dict (no pickled code objects — loading an
untrusted checkpoint can never execute code), written atomically by orbax
(reference semantics: on_policy_runner.py:289-324)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rsl_rl_tpu.modules.actor_critic import ActorCritic
from rsl_rl_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


def _policy_state():
    obs = {"policy": jnp.zeros((4, 3))}
    pol = ActorCritic(
        obs, {"policy": ["policy"], "critic": ["policy"]}, 2,
        actor_hidden_dims=[8], critic_hidden_dims=[8],
        actor_obs_normalization=True,
    )
    return pol.init(jax.random.PRNGKey(0))


class TestRoundTrip:
    def test_raw_and_typed_restore(self, tmp_path):
        ps = _policy_state()
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.scale_by_adam())
        opt_state = tx.init(ps.params)
        state = {
            "model": ps,
            "opt_state": opt_state,
            "lr": jnp.float32(3e-4),
            "iter": 7,
            "infos": None,
        }
        path = str(tmp_path / "model_7.ckpt")
        save_checkpoint(path, state)
        assert os.path.isdir(path)

        raw = load_checkpoint(path)
        # pure containers: no custom classes anywhere in the raw tree
        def _check(node):
            assert isinstance(node, (dict, list, tuple, np.ndarray, np.generic,
                                     int, float, str, bytes, type(None))), type(node)
            if isinstance(node, dict):
                for v in node.values():
                    _check(v)
        _check(raw)
        assert raw["iter"] == 7
        assert raw["infos"] is None

        typed = load_checkpoint(path, target={"model": ps, "opt_state": opt_state})
        assert type(typed["model"]) is type(ps)
        assert type(typed["model"].norm["actor"]) is type(ps.norm["actor"])
        np.testing.assert_allclose(
            np.asarray(typed["model"].params["actor"]["dense_0"]["kernel"]),
            np.asarray(ps.params["actor"]["dense_0"]["kernel"]),
        )
        # optax chain state round-trips into its namedtuple types
        assert type(typed["opt_state"]) is type(opt_state)

    def test_overwrite_same_path(self, tmp_path):
        path = str(tmp_path / "model_1.ckpt")
        save_checkpoint(path, {"a": jnp.ones(2)})
        save_checkpoint(path, {"a": 2.0 * jnp.ones(2)})
        np.testing.assert_allclose(load_checkpoint(path)["a"], [2.0, 2.0])


class TestMalformedInputs:
    def test_missing_path_raises_filenotfound(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_checkpoint(str(tmp_path / "nope.ckpt"))

    def test_plain_file_rejected(self, tmp_path):
        p = tmp_path / "model_3.ckpt"
        p.write_bytes(b"\x80\x04not a checkpoint")  # e.g. a stale pickle
        with pytest.raises(ValueError, match="not an rsl_rl_tpu checkpoint"):
            load_checkpoint(str(p))

    def test_garbage_directory_fails_safely(self, tmp_path):
        d = tmp_path / "model_4.ckpt"
        d.mkdir()
        (d / "junk").write_text("junk")
        with pytest.raises(ValueError, match="Failed to read checkpoint"):
            load_checkpoint(str(d))


class TestLatest:
    def test_latest_finds_highest_iteration_directory(self, tmp_path):
        for it in (1, 5, 30):
            save_checkpoint(str(tmp_path / f"model_{it}.ckpt"), {"it": it})
        assert latest_checkpoint(str(tmp_path)).endswith("model_30.ckpt")
        assert load_checkpoint(latest_checkpoint(str(tmp_path)))["it"] == 30

    def test_empty_dir_and_missing_dir(self, tmp_path):
        assert latest_checkpoint(str(tmp_path)) is None
        assert latest_checkpoint(str(tmp_path / "missing")) is None
