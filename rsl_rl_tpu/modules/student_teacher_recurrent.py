"""Recurrent student-teacher distillation policy.

TPU-native counterpart of the reference ``StudentTeacherRecurrent``
(reference: rsl_rl/modules/student_teacher_recurrent.py:16-249): recurrent
student (``memory_s``) and optionally a recurrent teacher (``memory_t``,
enabled by ``teacher_recurrent``). When loading an RL checkpoint, the teacher
memory weights map from the RL policy's ``memory_a``
(reference student_teacher_recurrent.py:230-235).
"""

from __future__ import annotations

import warnings
from typing import Any

import jax
import jax.numpy as jnp

from rsl_rl_tpu.modules.policy import PolicyState, check_state_compatible
from rsl_rl_tpu.modules.student_teacher import StudentTeacher, _remap_teacher_norm
from rsl_rl_tpu.networks.memory import Memory, mask_carry
from rsl_rl_tpu.ops.running_norm import init_running_norm
from rsl_rl_tpu.utils.registry import register


@register("policy")
class StudentTeacherRecurrent(StudentTeacher):
    is_recurrent = True

    def __init__(
        self,
        obs,
        obs_groups,
        num_actions,
        rnn_type: str = "lstm",
        rnn_hidden_dim: int = 256,
        rnn_num_layers: int = 1,
        teacher_recurrent: bool = False,
        **kwargs,
    ):
        if "rnn_hidden_size" in kwargs:
            warnings.warn(
                "The argument `rnn_hidden_size` is deprecated and will be removed in a future"
                " version. Please use `rnn_hidden_dim` instead.",
                DeprecationWarning,
            )
            if rnn_hidden_dim == 256:
                rnn_hidden_dim = kwargs.pop("rnn_hidden_size")
        super().__init__(obs, obs_groups, num_actions, **kwargs)
        self.rnn_type = rnn_type
        self.rnn_hidden_dim = rnn_hidden_dim
        self.rnn_num_layers = rnn_num_layers
        self.teacher_recurrent = teacher_recurrent
        mem_dtype = kwargs.get("dtype")  # policy compute dtype drives memories too
        self.memory_s = Memory(hidden_size=rnn_hidden_dim, rnn_type=rnn_type,
                               num_layers=rnn_num_layers, compute_dtype=mem_dtype)
        self.memory_t = (
            Memory(hidden_size=rnn_hidden_dim, rnn_type=rnn_type,
                   num_layers=rnn_num_layers, compute_dtype=mem_dtype)
            if teacher_recurrent
            else None
        )

    # ------------------------------------------------------------------ init

    def init(self, key: jax.Array) -> PolicyState:
        k_student, k_teacher, k_mem_s, k_mem_t = jax.random.split(key, 4)
        student_params = self.student.init(k_student, jnp.zeros((1, self.rnn_hidden_dim)))["params"]
        mem_s_params = self.memory_s.init(
            k_mem_s, self.memory_s.initialize_carry(1), jnp.zeros((1, self.num_student_obs))
        )["params"]

        # a recurrent teacher's MLP sees the memory output
        # (reference student_teacher_recurrent.py:81-86)
        teacher_in = self.rnn_hidden_dim if self.teacher_recurrent else self.num_teacher_obs
        teacher_params = self.teacher.init(k_teacher, jnp.zeros((1, teacher_in)))["params"]
        mem_t_params = None
        if self.teacher_recurrent:
            mem_t_params = self.memory_t.init(
                k_mem_t, self.memory_t.initialize_carry(1), jnp.zeros((1, self.num_teacher_obs))
            )["params"]

        if self.noise_std_type == "scalar":
            std_param = self.init_noise_std * jnp.ones((self.num_actions,), jnp.float32)
        else:
            std_param = jnp.log(self.init_noise_std * jnp.ones((self.num_actions,), jnp.float32))

        params = {"student": student_params, "memory_s": mem_s_params, "std": std_param}
        norm = {
            "student": init_running_norm(self.num_student_obs)
            if self.student_obs_normalization
            else None,
        }
        # note: with a recurrent teacher, the reference normalizes the raw
        # teacher obs before the memory; the normalizer keeps obs shape
        aux = {
            "teacher": teacher_params,
            "memory_t": mem_t_params,
            "teacher_norm": init_running_norm(self.num_teacher_obs)
            if self.teacher_obs_normalization
            else None,
        }
        return PolicyState(params=params, norm=norm, aux=aux)

    # ------------------------------------------------------------- carries

    def initial_carry(self, num_envs: int) -> Any:
        carry = {"student": self.memory_s.initialize_carry(num_envs)}
        carry["teacher"] = (
            self.memory_t.initialize_carry(num_envs) if self.teacher_recurrent else ()
        )
        return carry

    def reset_carry(self, carry: Any, dones: jax.Array) -> Any:
        out = {"student": mask_carry(carry["student"], dones)}
        out["teacher"] = (
            mask_carry(carry["teacher"], dones) if self.teacher_recurrent else ()
        )
        return out

    # ------------------------------------------------------------- forward

    def act(self, ps: PolicyState, obs, carry):
        x = self._student_in(ps, obs)
        new_s, features = self.memory_s.step(
            ps.params["memory_s"], carry["student"], x
        )
        mean = self.student.apply({"params": ps.params["student"]}, features)
        return mean, self._std(ps, mean), {**carry, "student": new_s}

    def evaluate(self, ps: PolicyState, obs, carry):
        x = self._teacher_in(ps, obs)
        new_t = carry["teacher"]
        if self.teacher_recurrent:
            new_t, x = self.memory_t.step(
                jax.lax.stop_gradient(ps.aux["memory_t"]), carry["teacher"], x
            )
        out = self.teacher.apply({"params": jax.lax.stop_gradient(ps.aux["teacher"])}, x)
        return jax.lax.stop_gradient(out), {**carry, "teacher": new_t}

    def act_inference(self, ps: PolicyState, obs, carry):
        x = self._student_in(ps, obs)
        new_s, features = self.memory_s.step(
            ps.params["memory_s"], carry["student"], x
        )
        mean = self.student.apply({"params": ps.params["student"]}, features)
        return mean, {**carry, "student": new_s}

    def student_seq(self, ps: PolicyState, obs, carry0, resets):
        """Whole-window student replay through the memory (fused Pallas path
        on TPU when the shape gate admits; see Memory.sequence_with_carry).
        The teacher carry passes through untouched — the replay only drives
        the student (reference distillation.py:111-141)."""
        x = self._student_in(ps, obs)
        features, final_s = self.memory_s.sequence_with_carry(
            ps.params["memory_s"], carry0["student"], x, resets
        )
        mean = self.student.apply({"params": ps.params["student"]}, features)
        return mean, {**carry0, "student": final_s}

    # ---------------------------------------------------------- checkpoint

    def load_state_dict(self, ps: PolicyState, loaded: Any) -> tuple[PolicyState, bool]:
        loaded_params = loaded.params if isinstance(loaded, PolicyState) else loaded["params"]
        if "actor" in loaded_params:
            aux = dict(ps.aux)
            check_state_compatible(aux["teacher"], loaded_params["actor"], "teacher network")
            aux["teacher"] = loaded_params["actor"]
            loaded_norm = loaded.norm if isinstance(loaded, PolicyState) else loaded["norm"]
            aux["teacher_norm"] = _remap_teacher_norm(loaded_norm, aux.get("teacher_norm"))
            # teacher memory weights come from the RL policy's actor memory
            # (reference student_teacher_recurrent.py:230-235)
            if self.teacher_recurrent:
                if "memory_a" not in loaded_params:
                    raise ValueError(
                        "teacher_recurrent=True requires an RL checkpoint from a recurrent policy"
                        " (missing 'memory_a' parameters)"
                    )
                aux["memory_t"] = loaded_params["memory_a"]
            self.loaded_teacher = True
            return ps.replace(aux=aux), False
        if "student" in loaded_params:
            check_state_compatible(ps, loaded)
            self.loaded_teacher = True
            return loaded, True
        raise ValueError("state does not contain student or teacher parameters")
