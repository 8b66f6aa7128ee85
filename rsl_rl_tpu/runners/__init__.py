"""Training runners: the user-facing API."""

from rsl_rl_tpu.runners.distillation_runner import DistillationRunner
from rsl_rl_tpu.runners.multiseed_runner import MultiSeedRunner
from rsl_rl_tpu.runners.on_policy_runner import OnPolicyRunner

__all__ = ["OnPolicyRunner", "DistillationRunner", "MultiSeedRunner"]
