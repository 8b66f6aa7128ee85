"""Data-parallel training across a multi-host TPU pod slice.

The TPU-native replacement for the reference's torchrun/NCCL workflow
(reference on_policy_runner.py:353-395): launch this SAME script once per host
(e.g. with `gcloud compute tpus tpu-vm ssh --worker=all`). There is no rank
logic in user code:

- `distributed_init()` wires the hosts together: it calls
  `jax.distributed.initialize()` when pod-slice environment markers
  (TPU_WORKER_HOSTNAMES / JAX_COORDINATOR_ADDRESS / ...) are present or when
  --coordinator is given; the coordinator is auto-discovered from the TPU
  metadata on Cloud TPU pods,
- `jax.devices()` then spans the whole slice, `OnPolicyRunner` builds its
  `Mesh(("data",))` over it, shards env state along `data`, and XLA inserts
  the gradient/KL all-reduces over ICI,
- logging/checkpointing happens on process 0 only (the runner checks
  `jax.process_index()`).

Usage (identical command on every host)::

    python examples/train_multihost.py --num-envs 32768 --iterations 1000

On a single host this degrades gracefully to all local devices.

The multi-process path is executed for real by ``tests/test_distributed.py``:
two OS processes x 2 virtual CPU devices each, wired via
``distributed_init(coordinator_address=...)``, training over the global
4-device mesh with XLA collectives crossing the process boundary — and the
losses match a single-process run of the same global configuration.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from rsl_rl_tpu.env import Pendulum
from rsl_rl_tpu.parallel import distributed_init
from rsl_rl_tpu.runners import OnPolicyRunner


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-envs", type=int, default=32768, help="GLOBAL env count")
    parser.add_argument("--iterations", type=int, default=1000)
    parser.add_argument("--log-dir", type=str, default="logs/pendulum_pod")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--coordinator", type=str, default=None,
                        help="host:port of process 0 (optional; TPU metadata is used when unset)")
    args = parser.parse_args()

    # multi-host wiring; no-op when single-host and no coordinator configured
    if args.coordinator:
        distributed_init(coordinator_address=args.coordinator)
    else:
        distributed_init()

    if jax.process_index() == 0:
        print(f"processes={jax.process_count()} devices={len(jax.devices())}")

    train_cfg = {
        "num_steps_per_env": 24,
        "save_interval": 100,
        "seed": args.seed,
        "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
        "logger": "tensorboard",
        "fuse_iteration": True,
        "policy": {
            "class_name": "ActorCritic",
            "actor_obs_normalization": True,
            "critic_obs_normalization": True,
            "actor_hidden_dims": [256, 256, 256],
            "critic_hidden_dims": [256, 256, 256],
        },
        "algorithm": {"class_name": "PPO", "schedule": "adaptive", "desired_kl": 0.01},
    }

    env = Pendulum(num_envs=args.num_envs)
    runner = OnPolicyRunner(env, train_cfg, log_dir=args.log_dir)
    runner.learn(args.iterations)


if __name__ == "__main__":
    main()
