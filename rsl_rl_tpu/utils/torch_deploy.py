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

import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "as_torch_policy",
    "export_onnx",
    "import_torch_state_dict",
    "import_torch_checkpoint",
    "export_torch_state_dict",
]


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


def _mlp_linears(params: dict) -> list[tuple[np.ndarray, np.ndarray]]:
    """flax MLP params -> ordered ``[(kernel [in,out], bias)]`` fp32 list
    (single source of the dense_<i> ordering for export AND the module
    mirror)."""
    names = sorted(params.keys(), key=lambda s: int(s.split("_")[1]))
    return [(_np(params[n]["kernel"]), _np(params[n]["bias"])) for n in names]


def _cell_to_torch_gates(p: dict, rnn_type: str, hidden_size: int):
    """One flax GRU/LSTM cell's params -> torch-layout gate stacks
    ``(w_ih [G*H, D], b_ih, w_hh [G*H, H], b_hh)`` as numpy.

    The single source of the gate order and bias placement for BOTH
    directions of the bridge (module mirror and state-dict export; the
    importer applies the exact inverse). torch gate order: (r, z, n) for
    GRU, (i, f, g, o) for LSTM; flax GRU carries no bias on hr/hz (-> zero
    b_hh rows), flax LSTM none on i* (-> zero b_ih).
    """
    H = hidden_size

    def k(name):
        return _np(p[name]["kernel"]).T

    def b(name):
        return _np(p[name]["bias"])

    zero = np.zeros(H, np.float32)
    if rnn_type.lower() == "gru":
        w_ih = np.concatenate([k("ir"), k("iz"), k("in")])
        b_ih = np.concatenate([b("ir"), b("iz"), b("in")])
        w_hh = np.concatenate([k("hr"), k("hz"), k("hn")])
        b_hh = np.concatenate([zero, zero, b("hn")])
    else:
        w_ih = np.concatenate([k("ii"), k("if"), k("ig"), k("io")])
        b_ih = np.concatenate([zero, zero, zero, zero])
        w_hh = np.concatenate([k("hi"), k("hf"), k("hg"), k("ho")])
        b_hh = np.concatenate([b("hi"), b("hf"), b("hg"), b("ho")])
    return w_ih, b_ih, w_hh, b_hh


def _mlp_to_torch(mlp, params: dict, trim_output_to: int | None = None):
    """flax ``networks.mlp.MLP`` params → ``nn.Sequential`` (fp32).

    ``trim_output_to``: keep only the first K outputs of the final linear —
    the deterministic path of a state-dependent-std actor, whose ``[2, A]``
    output reshape puts the mean in the first A columns
    (modules/actor_critic.py:151-154).
    """
    import torch
    import torch.nn as nn

    linears = _mlp_linears(params)
    layers: list[nn.Module] = []
    for i, (kernel, bias) in enumerate(linears):
        if i == len(linears) - 1 and trim_output_to is not None:
            kernel = kernel[:, :trim_output_to]
            bias = bias[:trim_output_to]
        lin = nn.Linear(kernel.shape[0], kernel.shape[1])
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(kernel.T.copy()))
            lin.bias.copy_(torch.from_numpy(bias))
        layers.append(lin)
        if i < len(linears) - 1:
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
    with torch.no_grad():
        for layer in range(num_layers):
            w_ih, b_ih, w_hh, b_hh = _cell_to_torch_gates(
                mem_params[f"cell_{layer}"], rnn_type, hidden_size
            )
            getattr(rnn, f"weight_ih_l{layer}").copy_(torch.from_numpy(w_ih))
            getattr(rnn, f"bias_ih_l{layer}").copy_(torch.from_numpy(b_ih))
            getattr(rnn, f"weight_hh_l{layer}").copy_(torch.from_numpy(w_hh))
            getattr(rnn, f"bias_hh_l{layer}").copy_(torch.from_numpy(b_hh))
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

    def _export(args, in_names, out_names):
        # torch >= 2.5 needs dynamo=False to pin the torchscript exporter;
        # older torch (which defaults to it) rejects the kwarg
        kw = dict(input_names=in_names, output_names=out_names, **export_kwargs)
        try:
            torch.onnx.export(module, args, path, dynamo=False, **kw)
        except TypeError:
            torch.onnx.export(module, args, path, **kw)

    if not policy.is_recurrent:
        _export((obs,), ["obs"], ["action"])
        return

    h = torch.zeros(policy.rnn_num_layers, batch_size, policy.rnn_hidden_dim)
    if module.is_lstm:
        _export((obs, (h, h.clone())), ["obs", "h_in", "c_in"],
                ["action", "h_out", "c_out"])
    else:
        _export((obs, h), ["obs", "h_in"], ["action", "h_out"])


# --------------------------------------------------------------------------
# torch -> JAX: import reference checkpoints
# --------------------------------------------------------------------------


def _sd_array(v) -> np.ndarray:
    """state-dict value (torch tensor or array-like) -> fp32 numpy."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.array(v, dtype=np.float32)


def _import_mlp(sd: dict, prefix: str) -> dict:
    """``<prefix>.<i>.weight/bias`` (torch ``nn.Sequential`` with interleaved
    activations, reference networks/mlp.py:15-80) -> flax ``dense_k`` params."""
    pat = re.compile(rf"^{re.escape(prefix)}\.(\d+)\.weight$")
    idxs = sorted(int(m.group(1)) for k in sd if (m := pat.match(k)))
    if not idxs:
        raise KeyError(f"no '{prefix}.<i>.weight' entries in the state dict")
    return {
        f"dense_{i}": {
            "kernel": jnp.asarray(_sd_array(sd[f"{prefix}.{n}.weight"]).T),
            "bias": jnp.asarray(_sd_array(sd[f"{prefix}.{n}.bias"])),
        }
        for i, n in enumerate(idxs)
    }


def _import_norm(sd: dict, prefix: str, template):
    """``EmpiricalNormalization`` buffers (``_mean``/``_var``/``count`` with a
    leading singleton, reference normalization.py:31-34) -> RunningNormState."""
    for key in ("_mean", "_var", "count"):
        if f"{prefix}.{key}" not in sd:
            raise KeyError(
                f"checkpoint has no '{prefix}.{key}' — the reference model was"
                " saved without this observation normalizer; disable the"
                " corresponding *_obs_normalization flag to import it"
            )
    return template.replace(
        mean=jnp.asarray(_sd_array(sd[f"{prefix}._mean"]).reshape(template.mean.shape)),
        var=jnp.asarray(_sd_array(sd[f"{prefix}._var"]).reshape(template.var.shape)),
        count=jnp.asarray(_sd_array(sd[f"{prefix}.count"]).reshape(())),
    )


def _import_memory(sd: dict, prefix: str, rnn_type: str, num_layers: int,
                   hidden_size: int) -> dict:
    """torch ``nn.GRU``/``nn.LSTM`` tensors (``<prefix>.weight_ih_l<k>`` ...,
    reference networks/memory.py:24) -> flax cell params.

    torch applies both ``bias_ih`` and ``bias_hh`` inside each gate, flax one
    bias per gate — the two biases fold into one by addition (exact):
    GRU r/z gates get ``b_ih + b_hh`` on the input dense (flax ``hr``/``hz``
    carry no bias), the n gate keeps them split (both exist in flax); LSTM
    folds everything onto the hidden dense (flax ``i*`` carry no bias).
    """
    H = hidden_size
    is_gru = rnn_type.lower() == "gru"
    out = {}
    for layer in range(num_layers):
        w_ih = _sd_array(sd[f"{prefix}.weight_ih_l{layer}"])
        b_ih = _sd_array(sd[f"{prefix}.bias_ih_l{layer}"])
        w_hh = _sd_array(sd[f"{prefix}.weight_hh_l{layer}"])
        b_hh = _sd_array(sd[f"{prefix}.bias_hh_l{layer}"])

        def g(m, i):  # gate slice i of a stacked matrix/vector
            return m[i * H:(i + 1) * H]

        if is_gru:  # torch gate order r, z, n
            cell = {
                "ir": {"kernel": g(w_ih, 0).T, "bias": g(b_ih, 0) + g(b_hh, 0)},
                "iz": {"kernel": g(w_ih, 1).T, "bias": g(b_ih, 1) + g(b_hh, 1)},
                "in": {"kernel": g(w_ih, 2).T, "bias": g(b_ih, 2)},
                "hr": {"kernel": g(w_hh, 0).T},
                "hz": {"kernel": g(w_hh, 1).T},
                "hn": {"kernel": g(w_hh, 2).T, "bias": g(b_hh, 2)},
            }
        else:  # torch gate order i, f, g, o
            cell = {}
            for i, name in enumerate("ifgo"):
                cell[f"i{name}"] = {"kernel": g(w_ih, i).T}
                cell[f"h{name}"] = {
                    "kernel": g(w_hh, i).T,
                    "bias": g(b_ih, i) + g(b_hh, i),
                }
        out[f"cell_{layer}"] = jax.tree.map(jnp.asarray, cell)
    return out


def _reject_orphan_norm(sd: dict, prefix: str, flag: str) -> None:
    """A checkpoint trained WITH a normalizer imported into a policy built
    without one would silently feed raw observations into weights trained on
    normalized ones — fail as loudly as the opposite direction does."""
    if f"{prefix}._mean" in sd:
        raise ValueError(
            f"checkpoint contains '{prefix}' statistics but the target policy"
            f" was built with {flag}=False — its weights expect normalized"
            " observations; enable the flag to import this model"
        )


def _import_std(policy, sd: dict):
    if getattr(policy, "state_dependent_std", False):
        return None
    key = "std" if policy.noise_std_type == "scalar" else "log_std"
    if key not in sd:
        raise KeyError(
            f"checkpoint has no '{key}' parameter — was the reference model"
            f" built with noise_std_type='{policy.noise_std_type}'?"
        )
    return jnp.asarray(_sd_array(sd[key]))


def import_torch_state_dict(policy, policy_state, state_dict: dict):
    """Import a reference (torch rsl_rl) ``model_state_dict`` into a policy.

    The inverse of :func:`as_torch_policy`: maps the reference's parameter/
    buffer naming (``actor.0.weight``, ``memory_a.rnn.weight_ih_l0``,
    ``actor_obs_normalizer._mean``, ``std``/``log_std`` — reference
    modules/actor_critic.py:40-93, networks/memory.py:24,
    networks/normalization.py:31-34) onto the rsl_rl_tpu pytree layout, with
    the torch↔flax weight-layout transforms applied (transposed kernels,
    gate-stacked RNN matrices split, paired RNN biases folded — exact, no
    information loss). Supports ``ActorCritic``/``ActorCriticRecurrent``
    (actor, critic, std, memories, normalizers) and ``StudentTeacher``/
    ``StudentTeacherRecurrent`` (student, frozen teacher + their memories
    and normalizers).

    Args:
        policy: The target policy module (architecture must match the
            checkpoint; shape mismatches raise).
        policy_state: Its current ``PolicyState`` (the template: untouched
            fields keep their values).
        state_dict: The reference's ``model_state_dict`` (torch tensors or
            arrays).

    Returns:
        A new ``PolicyState`` carrying the imported weights.
    """
    from rsl_rl_tpu.modules.policy import check_state_compatible

    sd = state_dict
    ps = policy_state
    is_student = hasattr(policy, "student")

    if is_student:
        params = dict(ps.params)
        params["student"] = _import_mlp(sd, "student")
        params["std"] = _import_std(policy, sd)
        aux = dict(ps.aux)
        aux["teacher"] = _import_mlp(sd, "teacher")
        if policy.is_recurrent:
            params["memory_s"] = _import_memory(
                sd, "memory_s.rnn", policy.rnn_type, policy.rnn_num_layers,
                policy.rnn_hidden_dim,
            )
            if policy.teacher_recurrent:
                aux["memory_t"] = _import_memory(
                    sd, "memory_t.rnn", policy.rnn_type, policy.rnn_num_layers,
                    policy.rnn_hidden_dim,
                )
        norm = dict(ps.norm)
        if norm["student"] is not None:
            norm["student"] = _import_norm(sd, "student_obs_normalizer", norm["student"])
        else:
            _reject_orphan_norm(sd, "student_obs_normalizer", "student_obs_normalization")
        if aux.get("teacher_norm") is not None:
            aux["teacher_norm"] = _import_norm(sd, "teacher_obs_normalizer", aux["teacher_norm"])
        else:
            _reject_orphan_norm(sd, "teacher_obs_normalizer", "teacher_obs_normalization")
        new_ps = ps.replace(params=params, norm=norm, aux=aux)
    else:
        params = dict(ps.params)
        params["actor"] = _import_mlp(sd, "actor")
        params["critic"] = _import_mlp(sd, "critic")
        params["std"] = _import_std(policy, sd)
        if policy.is_recurrent:
            params["memory_a"] = _import_memory(
                sd, "memory_a.rnn", policy.rnn_type, policy.rnn_num_layers,
                policy.rnn_hidden_dim,
            )
            params["memory_c"] = _import_memory(
                sd, "memory_c.rnn", policy.rnn_type, policy.rnn_num_layers,
                policy.rnn_hidden_dim,
            )
        norm = dict(ps.norm)
        if norm["actor"] is not None:
            norm["actor"] = _import_norm(sd, "actor_obs_normalizer", norm["actor"])
        else:
            _reject_orphan_norm(sd, "actor_obs_normalizer", "actor_obs_normalization")
        if norm["critic"] is not None:
            norm["critic"] = _import_norm(sd, "critic_obs_normalizer", norm["critic"])
        else:
            _reject_orphan_norm(sd, "critic_obs_normalizer", "critic_obs_normalization")
        new_ps = ps.replace(params=params, norm=norm)

    # strict shape/structure validation against the configured architecture
    check_state_compatible(ps, new_ps)
    return new_ps


def import_torch_checkpoint(policy, policy_state, path: str):
    """Load a reference ``.pt`` checkpoint file and import its model weights.

    Reads the reference ``OnPolicyRunner.save`` layout
    (``{"model_state_dict", "optimizer_state_dict", "iter", ...}``, reference
    on_policy_runner.py:289-305) with ``torch.load(weights_only=True)`` — a
    tensor-only safe load, no pickled code execution — and returns
    ``(new_policy_state, saved_iteration)``. The torch optimizer state is NOT
    imported (optax moments are structured differently; resuming resets the
    optimizer, which the reference's own cross-framework users accept when
    migrating).
    """
    import torch

    loaded = torch.load(path, map_location="cpu", weights_only=True)
    sd = loaded.get("model_state_dict", loaded)
    it = int(loaded.get("iter", 0)) if isinstance(loaded, dict) else 0
    return import_torch_state_dict(policy, policy_state, sd), it


def export_torch_state_dict(policy, policy_state) -> dict:
    """Export a reference-compatible torch ``state_dict`` of the FULL policy.

    The exact inverse of :func:`import_torch_state_dict`: produces the
    parameter/buffer dict the reference's modules load with strict
    ``load_state_dict`` — actor AND critic (or student AND teacher),
    memories, noise std, and normalizer buffers under the reference's names
    (``actor.<2i>.weight`` — linears sit at even indices of the reference's
    ``nn.Sequential`` MLP, reference networks/mlp.py:59-80;
    ``memory_a.rnn.weight_ih_l<k>``; ``actor_obs_normalizer._mean`` with the
    leading singleton and a long ``count``, reference normalization.py:31-34).
    Use it to hand a TPU-trained model back to a torch rsl_rl setup (e.g. to
    keep using reference-based evaluation or export tooling end to end):

        ref_model.load_state_dict(export_torch_state_dict(policy, ts.policy))

    Round-trip ``import_torch_state_dict(export_torch_state_dict(...))`` is
    the identity (strict-load tested against real upstream modules in
    tests/test_torch_import.py).
    """
    import torch

    sd: dict = {}

    def put_mlp(prefix: str, params: dict) -> None:
        for i, (kernel, bias) in enumerate(_mlp_linears(params)):
            sd[f"{prefix}.{2 * i}.weight"] = torch.from_numpy(kernel.T.copy())
            sd[f"{prefix}.{2 * i}.bias"] = torch.from_numpy(bias)

    def put_norm(prefix: str, norm_state) -> None:
        sd[f"{prefix}._mean"] = torch.from_numpy(_np(norm_state.mean)[None])
        sd[f"{prefix}._var"] = torch.from_numpy(_np(norm_state.var)[None])
        sd[f"{prefix}._std"] = torch.from_numpy(np.sqrt(_np(norm_state.var))[None])
        sd[f"{prefix}.count"] = torch.tensor(
            int(np.asarray(jax.device_get(norm_state.count))), dtype=torch.long
        )

    def put_memory(prefix: str, mem_params: dict, rnn_type: str, H: int) -> None:
        for layer in range(len(mem_params)):
            w_ih, b_ih, w_hh, b_hh = _cell_to_torch_gates(
                mem_params[f"cell_{layer}"], rnn_type, H
            )
            sd[f"{prefix}.weight_ih_l{layer}"] = torch.from_numpy(w_ih)
            sd[f"{prefix}.bias_ih_l{layer}"] = torch.from_numpy(b_ih)
            sd[f"{prefix}.weight_hh_l{layer}"] = torch.from_numpy(w_hh)
            sd[f"{prefix}.bias_hh_l{layer}"] = torch.from_numpy(b_hh)

    def put_std(params: dict) -> None:
        if getattr(policy, "state_dependent_std", False):
            return
        key = "std" if policy.noise_std_type == "scalar" else "log_std"
        sd[key] = torch.from_numpy(_np(params["std"]))

    ps = policy_state
    if hasattr(policy, "student"):
        put_mlp("student", ps.params["student"])
        put_mlp("teacher", ps.aux["teacher"])
        put_std(ps.params)
        if policy.is_recurrent:
            put_memory("memory_s.rnn", ps.params["memory_s"], policy.rnn_type,
                       policy.rnn_hidden_dim)
            if getattr(policy, "teacher_recurrent", False):
                put_memory("memory_t.rnn", ps.aux["memory_t"], policy.rnn_type,
                           policy.rnn_hidden_dim)
        if ps.norm.get("student") is not None:
            put_norm("student_obs_normalizer", ps.norm["student"])
        if ps.aux.get("teacher_norm") is not None:
            put_norm("teacher_obs_normalizer", ps.aux["teacher_norm"])
    else:
        put_mlp("actor", ps.params["actor"])
        put_mlp("critic", ps.params["critic"])
        put_std(ps.params)
        if policy.is_recurrent:
            put_memory("memory_a.rnn", ps.params["memory_a"], policy.rnn_type,
                       policy.rnn_hidden_dim)
            put_memory("memory_c.rnn", ps.params["memory_c"], policy.rnn_type,
                       policy.rnn_hidden_dim)
        if ps.norm.get("actor") is not None:
            put_norm("actor_obs_normalizer", ps.norm["actor"])
        if ps.norm.get("critic") is not None:
            put_norm("critic_obs_normalizer", ps.norm["critic"])
    return sd
