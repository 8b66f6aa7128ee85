"""Training runners: the user-facing API."""

from rsl_rl_tpu.runners.distillation_runner import DistillationRunner
from rsl_rl_tpu.runners.multiseed_runner import MultiSeedRunner
from rsl_rl_tpu.runners.on_policy_runner import OnPolicyRunner
from rsl_rl_tpu.runners.pbt import make_pbt_train

__all__ = [
    "OnPolicyRunner",
    "DistillationRunner",
    "MultiSeedRunner",
    "make_pbt_train",
]
