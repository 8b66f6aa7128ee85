"""Pure-function compute ops: distribution math, GAE, running normalization."""

from rsl_rl_tpu.ops import distributions
from rsl_rl_tpu.ops.gae import compute_gae, whiten
from rsl_rl_tpu.ops.running_norm import (
    DiscountedVariationNormState,
    RunningNormState,
    denormalize,
    init_discounted_variation_norm,
    init_running_norm,
    normalize,
    normalize_reward,
    update_running_norm,
)

__all__ = [
    "distributions",
    "compute_gae",
    "whiten",
    "RunningNormState",
    "DiscountedVariationNormState",
    "init_running_norm",
    "init_discounted_variation_norm",
    "normalize",
    "denormalize",
    "normalize_reward",
    "update_running_norm",
]
