"""Recurrent (GRU/LSTM) Gaussian actor-critic policy.

TPU-native counterpart of the reference ``ActorCriticRecurrent``
(reference: rsl_rl/modules/actor_critic_recurrent.py:16-218): a ``Memory``
module in front of both actor and critic MLPs. Hidden state is an explicit
carry ``{"actor": ..., "critic": ...}``; the BPTT replay path is a time-major
scan with done-masked resets (see ``rsl_rl_tpu.networks.memory``), replacing
the reference's pad/mask machinery.
"""

from __future__ import annotations

import warnings
from typing import Any

import jax
import jax.numpy as jnp

from rsl_rl_tpu.modules.actor_critic import ActorCritic
from rsl_rl_tpu.modules.policy import PolicyState
from rsl_rl_tpu.networks.memory import Memory, mask_carry, paired_sequence
from rsl_rl_tpu.ops.running_norm import init_running_norm
from rsl_rl_tpu.utils.registry import register


@register("policy")
class ActorCriticRecurrent(ActorCritic):
    is_recurrent = True

    def __init__(
        self,
        obs,
        obs_groups,
        num_actions,
        rnn_type: str = "lstm",
        rnn_hidden_dim: int = 256,
        rnn_num_layers: int = 1,
        **kwargs,
    ):
        # deprecated `rnn_hidden_size` shim
        # (reference actor_critic_recurrent.py:37-44)
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
        # the policy-wide compute dtype also drives the memory matmuls
        # (bf16 operands / fp32 state, both scan and Pallas paths)
        mem_dtype = kwargs.get("dtype")
        self.memory_a = Memory(hidden_size=rnn_hidden_dim, rnn_type=rnn_type,
                               num_layers=rnn_num_layers, compute_dtype=mem_dtype)
        self.memory_c = Memory(hidden_size=rnn_hidden_dim, rnn_type=rnn_type,
                               num_layers=rnn_num_layers, compute_dtype=mem_dtype)

    # ------------------------------------------------------------------ init

    def init(self, key: jax.Array) -> PolicyState:
        k_actor, k_critic, k_mem_a, k_mem_c = jax.random.split(key, 4)
        # the MLPs see the memory output (reference actor_critic_recurrent.py:64-84)
        actor_params = self.actor.init(k_actor, jnp.zeros((1, self.rnn_hidden_dim)))["params"]
        critic_params = self.critic.init(k_critic, jnp.zeros((1, self.rnn_hidden_dim)))["params"]
        mem_a_params = self.memory_a.init(
            k_mem_a, self.memory_a.initialize_carry(1), jnp.zeros((1, self.num_actor_obs))
        )["params"]
        mem_c_params = self.memory_c.init(
            k_mem_c, self.memory_c.initialize_carry(1), jnp.zeros((1, self.num_critic_obs))
        )["params"]

        if self.state_dependent_std:
            actor_params = self._init_state_dependent_std(actor_params)
            std_param = None
        elif self.noise_std_type == "scalar":
            std_param = self.init_noise_std * jnp.ones((self.num_actions,), jnp.float32)
        else:
            std_param = jnp.log(self.init_noise_std * jnp.ones((self.num_actions,), jnp.float32))

        params = {
            "actor": actor_params,
            "critic": critic_params,
            "memory_a": mem_a_params,
            "memory_c": mem_c_params,
            "std": std_param,
        }
        norm = {
            "actor": init_running_norm(self.num_actor_obs) if self.actor_obs_normalization else None,
            "critic": init_running_norm(self.num_critic_obs) if self.critic_obs_normalization else None,
        }
        return PolicyState(params=params, norm=norm, aux=None)

    # ------------------------------------------------------------- carries

    def initial_carry(self, num_envs: int) -> Any:
        return {
            "actor": self.memory_a.initialize_carry(num_envs),
            "critic": self.memory_c.initialize_carry(num_envs),
        }

    def reset_carry(self, carry: Any, dones: jax.Array) -> Any:
        """Zero hidden states of done envs (reference memory.py:40-56)."""
        return {
            "actor": mask_carry(carry["actor"], dones),
            "critic": mask_carry(carry["critic"], dones),
        }

    # ------------------------------------------------------------- forward

    def _mem_step(self, ps, which: str):
        mem = self.memory_a if which == "memory_a" else self.memory_c
        params = ps.params[which]
        # Memory.step honors compute_dtype with the SAME matmul-operand-cast
        # scheme the fused replay kernels use, keeping act-time and
        # replay-time trajectories identical under bf16
        return lambda c, x: mem.step(params, c, x)

    def act(self, ps: PolicyState, obs, carry):
        x = self._actor_in(ps, obs)
        new_a, features = self._mem_step(ps, "memory_a")(carry["actor"], x)
        mean, std = self._dist_from_features(ps.params, features)
        return mean, std, {**carry, "actor": new_a}

    def value(self, ps: PolicyState, obs, carry):
        x = self._critic_in(ps, obs)
        new_c, features = self._mem_step(ps, "memory_c")(carry["critic"], x)
        v = self.critic.apply({"params": ps.params["critic"]}, features)
        return jnp.squeeze(v, -1), {**carry, "critic": new_c}

    def act_seq(self, ps, obs, carry0, resets):
        """BPTT replay of the window through the actor memory.

        Equivalent to the reference's masked padded-trajectory replay from
        stored hidden states (actor_critic_recurrent.py:159-165 +
        rollout_storage.py:206-260): ``carry0`` is the window-start hidden and
        ``resets[t] = done[t-1]`` reproduces the rollout-time resets.
        """
        x = self._actor_in(ps, obs)
        features = self.memory_a.sequence(ps.params["memory_a"], carry0["actor"], x, resets)
        return self._dist_from_features(ps.params, features)

    def value_seq(self, ps, obs, carry0, resets):
        x = self._critic_in(ps, obs)
        features = self.memory_c.sequence(ps.params["memory_c"], carry0["critic"], x, resets)
        v = self.critic.apply({"params": ps.params["critic"]}, features)
        return jnp.squeeze(v, -1)

    def act_value_seq(self, ps, obs, carry0, resets):
        """Actor distribution AND value for the update batch, with the two
        memory replays fused into ONE Pallas dispatch when the stream-paired
        kernels apply (``networks.memory.paired_sequence``; falls back to two
        independent replays otherwise — numerically identical either way).

        Same math as the reference replaying the actor then the critic memory
        back to back per minibatch (actor_critic_recurrent.py:159-176)."""
        fa, fc = paired_sequence(
            self.memory_a, ps.params["memory_a"], carry0["actor"],
            self._actor_in(ps, obs),
            self.memory_c, ps.params["memory_c"], carry0["critic"],
            self._critic_in(ps, obs),
            resets,
        )
        mean, std = self._dist_from_features(ps.params, fa)
        v = self.critic.apply({"params": ps.params["critic"]}, fc)
        return mean, std, jnp.squeeze(v, -1)

    def act_inference(self, ps: PolicyState, obs, carry):
        """Stateful single-step deterministic action
        (reference actor_critic_recurrent.py:166-170)."""
        x = self._actor_in(ps, obs)
        new_a, features = self._mem_step(ps, "memory_a")(carry["actor"], x)
        out = self.actor.apply({"params": ps.params["actor"]}, features)
        if self.state_dependent_std:
            out = out[..., 0, :]
        return out, {**carry, "actor": new_a}
