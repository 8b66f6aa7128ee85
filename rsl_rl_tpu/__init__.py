"""TPU-native RSL-RL: on-policy RL for robotics in JAX.

A from-scratch, TPU-first framework with the capabilities of the reference
rsl_rl library (see SURVEY.md): PPO and student-teacher distillation over a
JAX-native vectorized-environment contract, feedforward and recurrent
(GRU/LSTM) policies, RND intrinsic rewards, symmetry augmentation, empirical
normalization, adaptive-KL LR scheduling, checkpoint/resume and
TensorBoard/W&B/Neptune logging — with the whole train iteration compiled into
jitted XLA programs and data parallelism expressed as mesh sharding.
"""

__version__ = "0.1.0"

from rsl_rl_tpu import algorithms, env, modules, networks, ops, parallel, runners, storage, utils

__all__ = [
    "algorithms",
    "env",
    "modules",
    "networks",
    "ops",
    "parallel",
    "runners",
    "storage",
    "utils",
    "__version__",
]
