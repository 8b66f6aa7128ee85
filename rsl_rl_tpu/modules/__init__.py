"""Policy modules: actor-critics, student-teachers, RND, symmetry."""

from rsl_rl_tpu.modules.actor_critic import ActorCritic
from rsl_rl_tpu.modules.actor_critic_recurrent import ActorCriticRecurrent
from rsl_rl_tpu.modules.policy import PolicyState, concat_obs, obs_set_dim
from rsl_rl_tpu.modules.rnd import RandomNetworkDistillation, RNDState, resolve_rnd_config
from rsl_rl_tpu.modules.student_teacher import StudentTeacher
from rsl_rl_tpu.modules.student_teacher_recurrent import StudentTeacherRecurrent
from rsl_rl_tpu.modules.symmetry import resolve_symmetry_config

__all__ = [
    "ActorCritic",
    "ActorCriticRecurrent",
    "StudentTeacher",
    "StudentTeacherRecurrent",
    "PolicyState",
    "concat_obs",
    "obs_set_dim",
    "RandomNetworkDistillation",
    "RNDState",
    "resolve_rnd_config",
    "resolve_symmetry_config",
]
