"""Distillation runner: student-teacher behavior cloning.

TPU-native counterpart of the reference ``DistillationRunner``
(reference: rsl_rl/runners/distillation_runner.py:21-179). It reuses the
entire on-policy loop (collect -> update -> log -> save) with the
distillation algorithm; the only differences are the default obs set
(``teacher``), the skipped RND/symmetry resolution, and the
teacher-must-be-loaded check before training.
"""

from __future__ import annotations

from rsl_rl_tpu.runners.on_policy_runner import OnPolicyRunner
from rsl_rl_tpu.utils.registry import resolve


class DistillationRunner(OnPolicyRunner):
    """On-policy runner for teacher-student training."""

    training_type = "distillation"

    def _construct_algorithm(self, obs):
        """Build StudentTeacher policy + Distillation algorithm
        (reference distillation_runner.py:156-179)."""
        policy_class = resolve("policy", self.policy_cfg.pop("class_name"))
        policy = policy_class(obs, self.cfg["obs_groups"], self.env.num_actions, **self.policy_cfg)
        alg_class = resolve("algorithm", self.alg_cfg.pop("class_name"))
        return alg_class(policy, **self.alg_cfg)

    def learn(self, num_learning_iterations: int, init_at_random_ep_len: bool = False) -> None:
        # the teacher must be loaded before distilling
        # (reference distillation_runner.py:61-62)
        if not self.alg.policy.loaded_teacher:
            raise ValueError(
                "Teacher model parameters not loaded. Please load a teacher model to distill."
            )
        super().learn(num_learning_iterations, init_at_random_ep_len)
