"""Student-teacher distillation policy (feedforward).

TPU-native counterpart of the reference ``StudentTeacher``
(reference: rsl_rl/modules/student_teacher.py:15-206): a trainable student MLP
and a frozen teacher MLP. The teacher's parameters and normalizer live in
``PolicyState.aux`` so the optimizer never sees them (the reference instead
relies on the teacher receiving no gradients).

Checkpoint remapping: loading an RL (ActorCritic) checkpoint maps
``actor -> teacher`` and ``actor_obs_normalizer -> teacher_obs_normalizer``
and reports "not a resume"; loading a distillation checkpoint restores
everything and reports "resume" (reference student_teacher.py:168-206).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from rsl_rl_tpu.modules.policy import (
    PolicyState,
    check_state_compatible,
    concat_obs,
    obs_set_dim,
)
from rsl_rl_tpu.networks.mlp import MLP
from rsl_rl_tpu.ops.running_norm import init_running_norm, normalize, update_running_norm
from rsl_rl_tpu.utils.registry import register


def _remap_teacher_norm(loaded_norm: dict, current_teacher_norm):
    """Map the RL actor's obs-normalizer stats onto the teacher.

    Mirrors the reference's strict ``load_state_dict`` into the teacher
    normalizer (reference student_teacher.py:182-197): a teacher trained WITH
    normalization must receive the stats, and a teacher trained WITHOUT must
    not silently get raw-obs semantics changed — mismatches raise instead of
    silently producing a teacher that normalizes differently than it was
    trained.
    """
    loaded = loaded_norm.get("actor")
    if (loaded is None) != (current_teacher_norm is None):
        raise ValueError(
            "Teacher obs-normalization mismatch: the RL checkpoint's actor "
            f"{'has' if loaded is not None else 'has no'} normalizer stats but the "
            f"distillation policy was configured with teacher_obs_normalization="
            f"{current_teacher_norm is not None}. Set teacher_obs_normalization to "
            "match how the teacher was trained."
        )
    if loaded is not None and isinstance(loaded, dict):
        # raw checkpoint state dict (orbax format): revive into the typed
        # RunningNormState of the configured teacher normalizer
        from flax import serialization

        loaded = serialization.from_state_dict(current_teacher_norm, loaded)
    return loaded


@register("policy")
class StudentTeacher:
    is_recurrent = False

    def __init__(
        self,
        obs: dict[str, jax.Array],
        obs_groups: dict[str, list[str]],
        num_actions: int,
        student_obs_normalization: bool = False,
        teacher_obs_normalization: bool = False,
        student_hidden_dims: list[int] = (256, 256, 256),
        teacher_hidden_dims: list[int] = (256, 256, 256),
        activation: str = "elu",
        init_noise_std: float = 0.1,
        noise_std_type: str = "scalar",
        dtype: Any = None,
        **kwargs,
    ):
        if kwargs:
            print(
                "StudentTeacher.__init__ got unexpected arguments, which will be ignored: "
                + str(list(kwargs.keys()))
            )
        self.obs_groups = obs_groups
        self.num_actions = num_actions
        self.num_student_obs = obs_set_dim(obs, obs_groups["policy"])
        self.num_teacher_obs = obs_set_dim(obs, obs_groups["teacher"])
        self.student_obs_normalization = student_obs_normalization
        self.teacher_obs_normalization = teacher_obs_normalization
        self.init_noise_std = init_noise_std
        self.noise_std_type = noise_std_type
        if noise_std_type not in ("scalar", "log"):
            raise ValueError(
                f"Unknown standard deviation type: {noise_std_type}. Should be 'scalar' or 'log'"
            )
        self.loaded_teacher = False

        # fp32 output heads under reduced-precision trunks (same rationale
        # as ActorCritic: keep quantization out of the action interface)
        head = jnp.float32 if dtype is not None else None
        self.student = MLP(
            output_dim=num_actions, hidden_dims=list(student_hidden_dims),
            activation=activation, dtype=dtype, head_dtype=head,
        )
        self.teacher = MLP(
            output_dim=num_actions, hidden_dims=list(teacher_hidden_dims),
            activation=activation, dtype=dtype, head_dtype=head,
        )

    # ------------------------------------------------------------------ init

    def init(self, key: jax.Array) -> PolicyState:
        k_student, k_teacher = jax.random.split(key)
        student_params = self.student.init(k_student, jnp.zeros((1, self.num_student_obs)))["params"]
        teacher_params = self.teacher.init(k_teacher, jnp.zeros((1, self.num_teacher_obs)))["params"]

        if self.noise_std_type == "scalar":
            std_param = self.init_noise_std * jnp.ones((self.num_actions,), jnp.float32)
        else:
            std_param = jnp.log(self.init_noise_std * jnp.ones((self.num_actions,), jnp.float32))

        params = {"student": student_params, "std": std_param}
        norm = {
            "student": init_running_norm(self.num_student_obs)
            if self.student_obs_normalization
            else None,
        }
        aux = {
            "teacher": teacher_params,
            "teacher_norm": init_running_norm(self.num_teacher_obs)
            if self.teacher_obs_normalization
            else None,
        }
        return PolicyState(params=params, norm=norm, aux=aux)

    # ------------------------------------------------------------- carries

    def initial_carry(self, num_envs: int) -> Any:
        return ()

    def reset_carry(self, carry: Any, dones: jax.Array) -> Any:
        return carry

    # ------------------------------------------------------------- forward

    def _student_in(self, ps: PolicyState, obs) -> jax.Array:
        x = concat_obs(obs, self.obs_groups["policy"])
        if ps.norm["student"] is not None:
            x = normalize(ps.norm["student"], x)
        return x

    def _teacher_in(self, ps: PolicyState, obs) -> jax.Array:
        x = concat_obs(obs, self.obs_groups["teacher"])
        if ps.aux["teacher_norm"] is not None:
            x = normalize(ps.aux["teacher_norm"], x)
        return x

    def _std(self, ps: PolicyState, mean: jax.Array) -> jax.Array:
        p = ps.params["std"]
        std = p if self.noise_std_type == "scalar" else jnp.exp(p)
        return jnp.broadcast_to(std, mean.shape)

    def act(self, ps: PolicyState, obs, carry):
        """Student action distribution (reference student_teacher.py:121-126)."""
        mean = self.student.apply({"params": ps.params["student"]}, self._student_in(ps, obs))
        return mean, self._std(ps, mean), carry

    def evaluate(self, ps: PolicyState, obs, carry):
        """Teacher mean action, no gradients
        (reference student_teacher.py:133-137)."""
        out = self.teacher.apply(
            {"params": jax.lax.stop_gradient(ps.aux["teacher"])}, self._teacher_in(ps, obs)
        )
        return jax.lax.stop_gradient(out), carry

    def act_inference(self, ps: PolicyState, obs, carry: Any = ()):
        mean = self.student.apply({"params": ps.params["student"]}, self._student_in(ps, obs))
        return mean, carry

    def student_seq(self, ps: PolicyState, obs, carry0, resets):
        """Student actions for a whole time-major ``[T, N, ...]`` window.

        The batched replay primitive of the distillation update: for the
        feedforward student this is one batched forward (time folds into the
        batch); the recurrent subclass overrides it with the fused memory
        replay. Returns ``(actions [T, N, A], carry_after)``; the carry is
        value-only (truncated BPTT detaches it at segment boundaries,
        reference distillation.py:136).
        """
        mean = self.student.apply({"params": ps.params["student"]}, self._student_in(ps, obs))
        return mean, carry0

    # -------------------------------------------------------- normalization

    def update_normalization(self, ps: PolicyState, obs) -> PolicyState:
        """Only the student normalizer updates during distillation
        (reference student_teacher.py:166-169)."""
        norm = dict(ps.norm)
        if norm["student"] is not None:
            norm["student"] = update_running_norm(
                norm["student"], concat_obs(obs, self.obs_groups["policy"])
            )
        return ps.replace(norm=norm)

    # ---------------------------------------------------------- checkpoint

    def load_state_dict(self, ps: PolicyState, loaded: Any) -> tuple[PolicyState, bool]:
        """Restore from either an RL checkpoint (teacher bootstrap) or a
        distillation checkpoint (resume).

        Mirrors reference student_teacher.py:168-206: an ActorCritic-style
        state (with an ``actor`` params key) maps actor->teacher and returns
        ``False`` (not a resume); a StudentTeacher-style state restores fully
        and returns ``True``.
        """
        loaded_params = loaded.params if isinstance(loaded, PolicyState) else loaded["params"]
        if "actor" in loaded_params:
            aux = dict(ps.aux)
            check_state_compatible(aux["teacher"], loaded_params["actor"], "teacher network")
            aux["teacher"] = loaded_params["actor"]
            loaded_norm = loaded.norm if isinstance(loaded, PolicyState) else loaded["norm"]
            aux["teacher_norm"] = _remap_teacher_norm(loaded_norm, aux.get("teacher_norm"))
            self.loaded_teacher = True
            return ps.replace(aux=aux), False
        if "student" in loaded_params:
            check_state_compatible(ps, loaded)
            self.loaded_teacher = True
            return loaded, True
        raise ValueError("state does not contain student or teacher parameters")
