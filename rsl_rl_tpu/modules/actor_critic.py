"""Feedforward Gaussian actor-critic policy.

TPU-native counterpart of the reference ``ActorCritic``
(reference: rsl_rl/modules/actor_critic.py:15-195): MLP actor + MLP critic
over concatenated observation sets, with scalar / log / state-dependent action
noise and optional empirical observation normalization. All state lives in a
``PolicyState`` pytree; every method is pure.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from rsl_rl_tpu.networks.mlp import MLP
from rsl_rl_tpu.modules.policy import (
    PolicyState,
    check_state_compatible,
    concat_obs,
    obs_set_dim,
)
from rsl_rl_tpu.ops.running_norm import (
    init_running_norm,
    normalize,
    update_running_norm,
)
from rsl_rl_tpu.utils.registry import register


@register("policy")
class ActorCritic:
    """Gaussian MLP actor + MLP critic."""

    is_recurrent = False

    def __init__(
        self,
        obs: dict[str, jax.Array],
        obs_groups: dict[str, list[str]],
        num_actions: int,
        actor_obs_normalization: bool = False,
        critic_obs_normalization: bool = False,
        actor_hidden_dims: list[int] = (256, 256, 256),
        critic_hidden_dims: list[int] = (256, 256, 256),
        activation: str = "elu",
        init_noise_std: float = 1.0,
        noise_std_type: str = "scalar",
        state_dependent_std: bool = False,
        noise_std_floor: float | None = None,
        dtype: Any = None,
        **kwargs,
    ):
        if kwargs:
            print(
                "ActorCritic.__init__ got unexpected arguments, which will be ignored: "
                + str(list(kwargs.keys()))
            )
        self.obs_groups = obs_groups
        self.num_actions = num_actions
        self.num_actor_obs = obs_set_dim(obs, obs_groups["policy"])
        self.num_critic_obs = obs_set_dim(obs, obs_groups["critic"])
        self.actor_obs_normalization = actor_obs_normalization
        self.critic_obs_normalization = critic_obs_normalization
        self.init_noise_std = init_noise_std
        self.noise_std_type = noise_std_type
        self.state_dependent_std = state_dependent_std
        self.noise_std_floor = noise_std_floor
        if noise_std_type not in ("scalar", "log"):
            raise ValueError(
                f"Unknown standard deviation type: {noise_std_type}. Should be 'scalar' or 'log'"
            )

        # actor outputs [2, A] when the std is state-dependent
        # (reference: actor_critic.py:51-56)
        actor_out = [2, num_actions] if state_dependent_std else num_actions
        # Reduced precision stays in the trunk; the output heads compute in
        # fp32 (cost ~0: [B, H] @ [H, A] with tiny A). Measured: a full-bf16
        # actor head biases the sigma gradient and collapses sigma to NaN on
        # long runs (sigma_min 0.50 -> 0.004 -> NaN by ~iter 1400 at the
        # headline scale); with the fp32 head the same seed stabilizes at
        # sigma_min 0.15-0.36, matching full-fp32 behavior (README "Known
        # limitations", benchmarks/convergence_tpu.py).
        head = jnp.float32 if dtype is not None else None
        self.actor = MLP(
            output_dim=actor_out, hidden_dims=list(actor_hidden_dims),
            activation=activation, dtype=dtype, head_dtype=head,
        )
        self.critic = MLP(
            output_dim=1, hidden_dims=list(critic_hidden_dims),
            activation=activation, dtype=dtype, head_dtype=head,
        )

    # ------------------------------------------------------------------ init

    def init(self, key: jax.Array) -> PolicyState:
        k_actor, k_critic = jax.random.split(key)
        actor_params = self.actor.init(k_actor, jnp.zeros((1, self.num_actor_obs)))["params"]
        critic_params = self.critic.init(k_critic, jnp.zeros((1, self.num_critic_obs)))["params"]

        if self.state_dependent_std:
            actor_params = self._init_state_dependent_std(actor_params)
            std_param = None
        elif self.noise_std_type == "scalar":
            std_param = self.init_noise_std * jnp.ones((self.num_actions,), jnp.float32)
        else:  # log
            std_param = jnp.log(self.init_noise_std * jnp.ones((self.num_actions,), jnp.float32))

        params = {"actor": actor_params, "critic": critic_params, "std": std_param}
        norm = {
            "actor": init_running_norm(self.num_actor_obs) if self.actor_obs_normalization else None,
            "critic": init_running_norm(self.num_critic_obs) if self.critic_obs_normalization else None,
        }
        return PolicyState(params=params, norm=norm, aux=None)

    def _init_state_dependent_std(self, actor_params):
        """Zero the std-half of the last layer and set its bias.

        Mirrors the surgical init at reference actor_critic.py:79-88: with the
        final layer producing ``2*A`` outputs reshaped to ``[2, A]``, the std
        rows (outputs ``A:``) get zero weights and a bias of
        ``init_noise_std`` (scalar mode) or ``log(init_noise_std + 1e-7)``
        (log mode).
        """
        last = f"dense_{self._num_actor_linears() - 1}"
        kernel = actor_params[last]["kernel"]
        bias = actor_params[last]["bias"]
        a = self.num_actions
        kernel = kernel.at[:, a:].set(0.0)
        if self.noise_std_type == "scalar":
            bias = bias.at[a:].set(self.init_noise_std)
        else:
            bias = bias.at[a:].set(jnp.log(self.init_noise_std + 1e-7))
        actor_params = dict(actor_params)
        actor_params[last] = {"kernel": kernel, "bias": bias}
        return actor_params

    def _num_actor_linears(self) -> int:
        return len(self.actor.hidden_dims) + 1

    # ------------------------------------------------------------- carries

    def initial_carry(self, num_envs: int) -> Any:
        """Feedforward policies carry nothing."""
        return ()

    def reset_carry(self, carry: Any, dones: jax.Array) -> Any:
        return carry

    # ------------------------------------------------------------- forward

    def _dist_from_features(self, params, features: jax.Array):
        """Map actor features to (mean, std).

        Reproduces ``update_distribution`` (reference actor_critic.py:118-140)
        for all three noise modes. Note the scalar mode uses the raw parameter
        as std (it can drift negative, as in the reference).

        ``noise_std_floor`` (opt-in, default ``None`` = reference parity)
        clamps the std from below. Neither framework bounds sigma (reference
        actor_critic.py:89-91,140); 2000-iteration at-scale runs showed that
        under bf16 compute sigma can decay monotonically and, below ~3e-3,
        the PPO importance ratio explodes faster than the adaptive-KL LR
        floor can brake, NaN-ing the run — fp32 self-stabilizes on the same
        seeds, so set the floor for long bf16 runs (README "Known
        limitations", benchmarks/convergence_tpu.py).
        """
        out = self.actor.apply({"params": params["actor"]}, features)
        if self.state_dependent_std:
            mean = out[..., 0, :]
            raw = out[..., 1, :]
            std = raw if self.noise_std_type == "scalar" else jnp.exp(raw)
        else:
            mean = out
            p = params["std"]
            std = p if self.noise_std_type == "scalar" else jnp.exp(p)
            std = jnp.broadcast_to(std, mean.shape)
        if self.noise_std_floor is not None:
            std = jnp.maximum(std, jnp.asarray(self.noise_std_floor, std.dtype))
        return mean, std

    def _actor_in(self, ps: PolicyState, obs: dict[str, jax.Array]) -> jax.Array:
        x = concat_obs(obs, self.obs_groups["policy"])
        if ps.norm["actor"] is not None:
            x = normalize(ps.norm["actor"], x)
        return x

    def _critic_in(self, ps: PolicyState, obs: dict[str, jax.Array]) -> jax.Array:
        x = concat_obs(obs, self.obs_groups["critic"])
        if ps.norm["critic"] is not None:
            x = normalize(ps.norm["critic"], x)
        return x

    def act(self, ps: PolicyState, obs: dict[str, jax.Array], carry: Any):
        """Single-step distribution: returns ``(mean, std, carry)``."""
        mean, std = self._dist_from_features(ps.params, self._actor_in(ps, obs))
        return mean, std, carry

    def value(self, ps: PolicyState, obs: dict[str, jax.Array], carry: Any):
        """Single-step value estimate: returns ``(v, carry)``; v has no
        trailing singleton (reference keeps ``[N, 1]``; we use ``[N]``)."""
        v = self.critic.apply({"params": ps.params["critic"]}, self._critic_in(ps, obs))
        return jnp.squeeze(v, -1), carry

    def act_seq(self, ps, obs, carry0, resets):
        """Batch/sequence distribution for the update; FF just broadcasts."""
        mean, std = self._dist_from_features(ps.params, self._actor_in(ps, obs))
        return mean, std

    def value_seq(self, ps, obs, carry0, resets):
        v = self.critic.apply({"params": ps.params["critic"]}, self._critic_in(ps, obs))
        return jnp.squeeze(v, -1)

    def act_value_seq(self, ps, obs, carry0, resets):
        """Actor distribution AND value for the update batch in one call:
        ``(mean, std, value)``. The recurrent subclass overrides this to fuse
        the two memory replays into one kernel dispatch; here it simply
        chains :meth:`act_seq` and :meth:`value_seq`."""
        mean, std = self.act_seq(ps, obs, carry0, resets)
        return mean, std, self.value_seq(ps, obs, carry0, resets)

    def act_inference(self, ps: PolicyState, obs: dict[str, jax.Array], carry: Any = ()):
        """Deterministic action (mean), the deployment path
        (reference actor_critic.py:148-151)."""
        mean, _ = self._dist_from_features(ps.params, self._actor_in(ps, obs))
        return mean, carry

    # -------------------------------------------------------- normalization

    def update_normalization(self, ps: PolicyState, obs: dict[str, jax.Array]) -> PolicyState:
        """Fold a batch of observations into the normalizer moments
        (reference actor_critic.py:173-179)."""
        norm = dict(ps.norm)
        if norm["actor"] is not None:
            norm["actor"] = update_running_norm(
                norm["actor"], concat_obs(obs, self.obs_groups["policy"])
            )
        if norm["critic"] is not None:
            norm["critic"] = update_running_norm(
                norm["critic"], concat_obs(obs, self.obs_groups["critic"])
            )
        return ps.replace(norm=norm)

    # ---------------------------------------------------------- checkpoint

    def load_state_dict(self, ps: PolicyState, loaded: PolicyState) -> tuple[PolicyState, bool]:
        """Restore policy state from a checkpoint.

        Returns the resume flag consumed by ``OnPolicyRunner.load``
        (reference actor_critic.py:181-195: always resumes). Raises when the
        checkpoint does not structurally match the configured model, like
        torch's strict ``load_state_dict``.
        """
        check_state_compatible(ps, loaded)
        return loaded, True
