"""Export a trained checkpoint through every deployment path.

Usage::

    python examples/export_policy.py --ckpt logs/pendulum/model_199.ckpt \
        --out-dir deploy/ [--config cfg.yaml]

Produces, from one checkpoint:

- ``policy.stablehlo`` — the Python-free serving artifact
  (``utils.export.export_policy``; load with ``load_policy``), and verifies
  it reproduces the live policy's actions;
- ``policy.pt`` — a ``torch.save``d state dict of the numerically identical
  torch mirror module (``utils.torch_deploy.as_torch_policy``), verified
  against the JAX inference path here, for torch/TorchScript pipelines;
- ``reference_state_dict.pt`` — the reference-layout state dict
  (``export_torch_state_dict``) that upstream rsl_rl modules strict-load;
- ``policy.onnx`` — when the ``onnx`` package is installed
  (``export_onnx``); skipped with a notice otherwise.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from rsl_rl_tpu.runners import OnPolicyRunner
from rsl_rl_tpu.utils.config import load_train_cfg
from rsl_rl_tpu.utils.registry import resolve
from rsl_rl_tpu.utils.torch_deploy import (
    as_torch_policy,
    export_onnx,
    export_torch_state_dict,
)

DEFAULT_CFG = {
    "num_steps_per_env": 24,
    "save_interval": 50,
    "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
    "logger": "tensorboard",
    "policy": {
        "class_name": "ActorCritic",
        "actor_hidden_dims": [256, 256, 256],
        "critic_hidden_dims": [256, 256, 256],
        "actor_obs_normalization": True,
        "critic_obs_normalization": True,
    },
    "algorithm": {"class_name": "PPO"},
}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--out-dir", type=str, required=True)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--env", type=str, default="Pendulum")
    parser.add_argument("--num-envs", type=int, default=4)
    args = parser.parse_args()

    cfg = load_train_cfg(args.config) if args.config else dict(DEFAULT_CFG)
    env = resolve("env", args.env)(num_envs=args.num_envs)
    runner = OnPolicyRunner(env, cfg, log_dir=None)
    runner.load(args.ckpt, load_optimizer=False)
    policy, ps = runner.alg.policy, runner.train_state.policy
    _, obs = env.reset(jax.random.PRNGKey(0))
    want, _ = policy.act_inference(ps, obs, policy.initial_carry(args.num_envs))
    want = np.asarray(jax.device_get(want))
    os.makedirs(args.out_dir, exist_ok=True)

    # ---- StableHLO (Python-free serving)
    from rsl_rl_tpu.utils.export import export_policy, load_policy

    hlo_path = os.path.join(args.out_dir, "policy.stablehlo")
    export_policy(policy, ps, obs, hlo_path)
    got = np.asarray(load_policy(hlo_path)(obs))
    np.testing.assert_allclose(got, want, atol=1e-5)
    print(f"wrote {hlo_path} (verified vs live policy)")

    # ---- torch mirror (existing torch/TorchScript pipelines)
    import torch

    module = as_torch_policy(policy, ps).eval()
    flat = np.concatenate(
        [np.asarray(jax.device_get(obs[g])) for g in module.obs_names], -1
    )
    with torch.no_grad():
        out = module(torch.from_numpy(flat).float())
        got = (out[0] if policy.is_recurrent else out).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
    pt_path = os.path.join(args.out_dir, "policy.pt")
    torch.save(module.state_dict(), pt_path)
    print(f"wrote {pt_path} (torch mirror verified vs live policy)")

    # ---- reference-layout state dict (hand back to upstream rsl_rl)
    ref_path = os.path.join(args.out_dir, "reference_state_dict.pt")
    torch.save(export_torch_state_dict(policy, ps), ref_path)
    print(f"wrote {ref_path} (strict-loads into reference modules)")

    # ---- ONNX (optional dependency)
    onnx_path = os.path.join(args.out_dir, "policy.onnx")
    try:
        export_onnx(policy, ps, onnx_path)
        print(f"wrote {onnx_path}")
    except RuntimeError as e:
        print(f"skipped ONNX: {e}")


if __name__ == "__main__":
    main()
