"""Torch deployment bridge: trained JAX policies as torch modules / ONNX.

The reference's users deploy policies through the torch ecosystem — its
downstream frameworks export the trained ``actor`` (plus its observation
normalizer) to ONNX/TorchScript for the robot runtime, and the reference
itself declares ``onnx`` as a dependency for exactly that workflow
(SURVEY.md §2 #25; reference pyproject.toml:28-35). This module closes the
migration loop in the other direction: :func:`as_torch_policy` converts a
trained rsl_rl_tpu policy into a numerically identical ``torch.nn.Module``
(normalizer + memory + actor, deterministic inference path — the analog of
``act_inference``, reference actor_critic.py:148-151 /
actor_critic_recurrent.py:166-170 / student_teacher.py:133-137), so the
user's existing torch/ONNX/TorchScript deployment pipeline keeps working
unchanged after training on TPU. :func:`export_onnx` wraps
``torch.onnx.export`` on top.

The mirror is fp32 regardless of the training ``dtype`` — bf16 is an MXU
compute optimization; deployed parameters are the fp32 master copies, which
matches the reference (it trains and deploys fp32).

Weight-layout notes (verified value-level in tests/test_torch_deploy.py):

- flax ``Dense`` kernels are ``[in, out]`` → transposed into ``nn.Linear``.
- flax ``GRUCell`` splits torch's fused gates into ``ir/iz/in`` (input,
  with bias) and ``hr/hz/hn`` (hidden; only ``hn`` has a bias) — torch's
  ``bias_hh`` rows for r/z are therefore zero.
- flax ``OptimizedLSTMCell`` puts all biases on the hidden-side denses
  (``hi/hf/hg/ho``) — torch's ``bias_ih`` is zero.
- ``jax.nn.gelu`` defaults to the tanh approximation → ``nn.GELU(approximate
  ="tanh")``.

For the inverse direction (serving without Python), see
``utils/export.py`` (StableHLO).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

__all__ = ["as_torch_policy", "export_onnx"]


def _np(x) -> np.ndarray:
    # np.array (not asarray): device_get can hand back read-only views,
    # which torch.from_numpy rejects with a warning
    return np.array(jax.device_get(x), dtype=np.float32)


def _torch_activation(name: str):
    """Torch module equivalent of ``utils.resolvers._ACTIVATIONS[name]``."""
    import torch.nn as nn

    table = {
        "elu": nn.ELU(),
        "selu": nn.SELU(),
        "relu": nn.ReLU(),
        "crelu": nn.CELU(),  # reference maps "crelu" to torch.nn.CELU
        "lrelu": nn.LeakyReLU(),
        "tanh": nn.Tanh(),
        "sigmoid": nn.Sigmoid(),
        "softplus": nn.Softplus(),
        # jax.nn.gelu defaults to approximate=True
        "gelu": nn.GELU(approximate="tanh"),
        "swish": nn.SiLU(),
        "mish": nn.Mish(),
        "identity": nn.Identity(),
    }
    return table[name.lower()]


def _mlp_to_torch(mlp, params: dict, trim_output_to: int | None = None):
    """flax ``networks.mlp.MLP`` params → ``nn.Sequential`` (fp32).

    ``trim_output_to``: keep only the first K outputs of the final linear —
    the deterministic path of a state-dependent-std actor, whose ``[2, A]``
    output reshape puts the mean in the first A columns
    (modules/actor_critic.py:151-154).
    """
    import torch
    import torch.nn as nn

    names = sorted(params.keys(), key=lambda s: int(s.split("_")[1]))
    layers: list[nn.Module] = []
    for i, name in enumerate(names):
        kernel = _np(params[name]["kernel"])  # [in, out]
        bias = _np(params[name]["bias"])
        if i == len(names) - 1 and trim_output_to is not None:
            kernel = kernel[:, :trim_output_to]
            bias = bias[:trim_output_to]
        lin = nn.Linear(kernel.shape[0], kernel.shape[1])
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(kernel.T.copy()))
            lin.bias.copy_(torch.from_numpy(bias))
        layers.append(lin)
        if i < len(names) - 1:
            layers.append(_torch_activation(mlp.activation))
    if mlp.last_activation is not None:
        layers.append(_torch_activation(mlp.last_activation))
    return nn.Sequential(*layers)


def _normalizer_to_torch(norm_state):
    """``RunningNormState`` → torch module computing ``(x-mean)/(std+eps)``
    (ops/running_norm.py:66-68; reference normalization.py:44-47)."""
    import torch
    import torch.nn as nn

    class _Normalizer(nn.Module):
        def __init__(self, mean, std, eps):
            super().__init__()
            self.register_buffer("mean", torch.from_numpy(mean))
            self.register_buffer("std", torch.from_numpy(std))
            self.eps = eps

        def forward(self, x):
            return (x - self.mean) / (self.std + self.eps)

    return _Normalizer(
        _np(norm_state.mean), _np(norm_state.std), float(norm_state.eps)
    )


def _memory_to_torch(input_size: int, hidden_size: int, num_layers: int,
                     rnn_type: str, mem_params: dict):
    """flax ``networks.memory.Memory`` params → ``nn.GRU`` / ``nn.LSTM``.

    Gate formulas line up exactly (networks/memory.py:257-302 mirrors the
    torch cells); only the bias placement differs — see module docstring.
    """
    import torch
    import torch.nn as nn

    is_gru = rnn_type.lower() == "gru"
    rnn = (nn.GRU if is_gru else nn.LSTM)(
        input_size=input_size, hidden_size=hidden_size, num_layers=num_layers
    )
    H = hidden_size
    with torch.no_grad():
        for layer in range(num_layers):
            p = mem_params[f"cell_{layer}"]

            def k(name):  # flax kernel [in, out] -> torch rows [out, in]
                return torch.from_numpy(_np(p[name]["kernel"]).T.copy())

            def b(name):
                return torch.from_numpy(_np(p[name]["bias"]))

            zero = torch.zeros(H)
            if is_gru:  # torch gate order: r, z, n
                w_ih = torch.cat([k("ir"), k("iz"), k("in")])
                b_ih = torch.cat([b("ir"), b("iz"), b("in")])
                w_hh = torch.cat([k("hr"), k("hz"), k("hn")])
                b_hh = torch.cat([zero, zero, b("hn")])
            else:  # torch gate order: i, f, g, o
                w_ih = torch.cat([k("ii"), k("if"), k("ig"), k("io")])
                b_ih = torch.cat([zero, zero, zero, zero])
                w_hh = torch.cat([k("hi"), k("hf"), k("hg"), k("ho")])
                b_hh = torch.cat([b("hi"), b("hf"), b("hg"), b("ho")])
            getattr(rnn, f"weight_ih_l{layer}").copy_(w_ih)
            getattr(rnn, f"bias_ih_l{layer}").copy_(b_ih)
            getattr(rnn, f"weight_hh_l{layer}").copy_(w_hh)
            getattr(rnn, f"bias_hh_l{layer}").copy_(b_hh)
    return rnn


def as_torch_policy(policy, policy_state) -> "torch.nn.Module":  # noqa: F821
    """Convert a trained policy into a deterministic-inference torch module.

    Supports ``ActorCritic`` / ``StudentTeacher`` (feedforward: ``forward(obs)
    -> action``) and their recurrent variants (``forward(obs, hidden=None) ->
    (action, hidden)`` with torch-layout hidden state — ``[L, B, H]`` for GRU,
    an ``(h, c)`` tuple for LSTM; ``None`` means zeros). ``obs`` is the
    CONCATENATED policy obs set ``[B, obs_dim]``, unnormalized — the
    normalizer (when configured) runs inside the module, mirroring
    ``act_inference`` (reference actor_critic.py:148-151). Concatenation
    order is recorded on the module as ``obs_names``.
    """
    import torch.nn as nn

    is_student = hasattr(policy, "student")
    actor_mlp = policy.student if is_student else policy.actor
    norm_key = "student" if is_student else "actor"
    actor_params = policy_state.params["student" if is_student else "actor"]
    obs_dim = policy.num_student_obs if is_student else policy.num_actor_obs

    trim = None
    if getattr(policy, "state_dependent_std", False):
        trim = policy.num_actions
    head = _mlp_to_torch(actor_mlp, actor_params, trim_output_to=trim)

    normalizer = None
    if policy_state.norm.get(norm_key) is not None:
        normalizer = _normalizer_to_torch(policy_state.norm[norm_key])

    obs_names = list(policy.obs_groups["policy"])

    if not policy.is_recurrent:

        class TorchPolicy(nn.Module):
            """Deterministic feedforward policy (normalizer + actor MLP)."""

            is_recurrent = False

            def __init__(self):
                super().__init__()
                self.normalizer = normalizer or nn.Identity()
                self.actor = head
                self.obs_names = obs_names

            def forward(self, obs):
                return self.actor(self.normalizer(obs))

        return TorchPolicy()

    mem_key = "memory_s" if is_student else "memory_a"
    rnn = _memory_to_torch(
        obs_dim, policy.rnn_hidden_dim, policy.rnn_num_layers,
        policy.rnn_type, policy_state.params[mem_key],
    )
    is_lstm = policy.rnn_type.lower() != "gru"

    class TorchRecurrentPolicy(nn.Module):
        """Deterministic recurrent policy (normalizer + memory + actor MLP).

        Single-step stateful inference: ``forward(obs [B, obs_dim], hidden)
        -> (action [B, A], hidden)``. Reset an env's hidden by zeroing its
        batch column (reference memory.py:40-56).
        """

        is_recurrent = True

        def __init__(self):
            super().__init__()
            self.normalizer = normalizer or nn.Identity()
            self.memory = rnn
            self.actor = head
            self.obs_names = obs_names

        def forward(self, obs, hidden=None):
            x = self.normalizer(obs).unsqueeze(0)  # [1, B, D], seq-major
            out, hidden = self.memory(x, hidden)
            return self.actor(out.squeeze(0)), hidden

    module = TorchRecurrentPolicy()
    module.is_lstm = is_lstm
    return module


def export_onnx(policy, policy_state, path: str, *, batch_size: int = 1,
                **export_kwargs) -> None:
    """Export the deterministic inference path to ONNX.

    Builds the :func:`as_torch_policy` mirror and runs ``torch.onnx.export``
    on it (the same path the reference's downstream exporters use on the
    torch ``actor``). Recurrent policies export with explicit hidden-state
    inputs/outputs (``h_in``/``h_out``, plus ``c_in``/``c_out`` for LSTM).

    Requires the ``onnx`` package (as the reference's export workflow does,
    reference pyproject.toml:28-35); raises a clear error when it is absent.
    """
    try:
        import onnx  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "export_onnx requires the 'onnx' package (pip install onnx). "
            "For an ONNX-free deployment artifact use utils.export.export_policy "
            "(StableHLO), or as_torch_policy + torch.save."
        ) from e
    import torch

    module = as_torch_policy(policy, policy_state).eval()
    obs_dim = (
        policy.num_student_obs if hasattr(policy, "student") else policy.num_actor_obs
    )
    obs = torch.zeros(batch_size, obs_dim)

    if not policy.is_recurrent:
        torch.onnx.export(
            module, (obs,), path, input_names=["obs"], output_names=["action"],
            dynamo=False, **export_kwargs,
        )
        return

    h = torch.zeros(policy.rnn_num_layers, batch_size, policy.rnn_hidden_dim)
    if module.is_lstm:
        args = (obs, (h, h.clone()))
        names = (["obs", "h_in", "c_in"], ["action", "h_out", "c_out"])
    else:
        args = (obs, h)
        names = (["obs", "h_in"], ["action", "h_out"])
    torch.onnx.export(
        module, args, path, input_names=names[0], output_names=names[1],
        dynamo=False, **export_kwargs,
    )
