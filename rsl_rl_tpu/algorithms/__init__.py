"""Training algorithms: PPO and student-teacher Distillation."""

from rsl_rl_tpu.algorithms.distillation import Distillation
from rsl_rl_tpu.algorithms.ppo import PPO, CollectState, EpisodeStats, TrainState

__all__ = ["PPO", "Distillation", "CollectState", "EpisodeStats", "TrainState"]
