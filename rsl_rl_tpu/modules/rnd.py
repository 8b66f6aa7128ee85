"""Random Network Distillation intrinsic reward.

TPU-native counterpart of the reference ``RandomNetworkDistillation``
(reference: rsl_rl/modules/rnd.py:14-209): a frozen random ``target`` MLP and a
trained ``predictor`` MLP; the intrinsic reward is the L2 distance between
their embeddings of the (optionally normalized) ``rnd_state`` obs set, with
constant / step / linear weight schedules driven by an env-step counter. All
mutable pieces (predictor params, normalizer moments, counter) live in an
``RNDState`` pytree; schedules are traced ``jnp.where`` expressions so the
whole thing composes under ``lax.scan``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from rsl_rl_tpu.modules.policy import concat_obs
from rsl_rl_tpu.networks.mlp import MLP
from rsl_rl_tpu.ops.running_norm import (
    init_discounted_variation_norm,
    init_running_norm,
    normalize,
    normalize_reward,
    update_running_norm,
)


@struct.dataclass
class RNDState:
    predictor: Any
    target: Any
    state_norm: Any  # RunningNormState | None
    reward_norm: Any  # DiscountedVariationNormState | None
    counter: jax.Array  # int32 env-step counter driving the weight schedule


class RandomNetworkDistillation:
    """RND module: intrinsic reward + predictor loss."""

    def __init__(
        self,
        num_states: int,
        obs_groups: dict[str, list[str]],
        num_outputs: int,
        predictor_hidden_dims: list[int],
        target_hidden_dims: list[int],
        activation: str = "elu",
        weight: float = 0.0,
        state_normalization: bool = False,
        reward_normalization: bool = False,
        weight_schedule: dict | None = None,
        dtype: Any = None,
        **kwargs,
    ):
        self.num_states = num_states
        self.obs_groups = obs_groups
        self.num_outputs = num_outputs
        self.initial_weight = weight
        self.state_normalization = state_normalization
        self.reward_normalization = reward_normalization
        self.weight_schedule = weight_schedule
        if weight_schedule is not None and weight_schedule.get("mode") not in (
            "constant",
            "step",
            "linear",
        ):
            raise ValueError(f"Unknown RND weight schedule mode: {weight_schedule}")

        # -1 hidden dims resolve to num_states inside the MLP
        self.predictor = MLP(
            output_dim=num_outputs, hidden_dims=list(predictor_hidden_dims),
            activation=activation, dtype=dtype,
        )
        self.target = MLP(
            output_dim=num_outputs, hidden_dims=list(target_hidden_dims),
            activation=activation, dtype=dtype,
        )

    # ------------------------------------------------------------------ init

    def init(self, key: jax.Array, num_envs: int) -> RNDState:
        k_pred, k_target = jax.random.split(key)
        x0 = jnp.zeros((1, self.num_states))
        return RNDState(
            predictor=self.predictor.init(k_pred, x0)["params"],
            target=self.target.init(k_target, x0)["params"],
            # the reference freezes both RND normalizers at 1e8 samples
            # (reference rnd.py:88-95)
            state_norm=init_running_norm(self.num_states, until=1.0e8)
            if self.state_normalization
            else None,
            reward_norm=init_discounted_variation_norm(num_envs, until=1.0e8)
            if self.reward_normalization
            else None,
            counter=jnp.zeros((), jnp.int32),
        )

    # --------------------------------------------------------------- weight

    def current_weight(self, counter: jax.Array) -> jax.Array:
        """Scheduled weight as a traced function of the step counter
        (reference rnd.py:168-182)."""
        w0 = jnp.asarray(self.initial_weight, jnp.float32)
        cfg = self.weight_schedule
        if cfg is None or cfg["mode"] == "constant":
            return w0
        step = counter.astype(jnp.float32)
        if cfg["mode"] == "step":
            return jnp.where(step < cfg["final_step"], w0, cfg["final_value"])
        # linear
        frac = (step - cfg["initial_step"]) / (cfg["final_step"] - cfg["initial_step"])
        frac = jnp.clip(frac, 0.0, 1.0)
        return w0 + (cfg["final_value"] - w0) * frac

    # -------------------------------------------------------------- forward

    def get_rnd_state(self, obs: dict[str, jax.Array]) -> jax.Array:
        return concat_obs(obs, self.obs_groups["rnd_state"])

    def get_intrinsic_reward(
        self, state: RNDState, obs: dict[str, jax.Array]
    ) -> tuple[RNDState, jax.Array, jax.Array]:
        """Intrinsic reward for one env step.

        Mirrors reference rnd.py:113-135: counter increments once per call,
        the rnd obs is state-normalized (without updating the moments here),
        the reward is ``||target(x) - predictor(x)||_2``, optionally
        normalized by the discounted-variation normalizer, then scaled by the
        scheduled weight.

        Returns ``(new_state, scaled_reward [N], weight)``.
        """
        counter = state.counter + 1
        x = self.get_rnd_state(obs)
        if state.state_norm is not None:
            x = normalize(state.state_norm, x)
        target_emb = self.target.apply({"params": state.target}, x)
        pred_emb = self.predictor.apply({"params": state.predictor}, x)
        reward = jnp.linalg.norm(
            jax.lax.stop_gradient(target_emb) - jax.lax.stop_gradient(pred_emb), axis=-1
        )
        reward_norm = state.reward_norm
        if reward_norm is not None:
            reward_norm, reward = normalize_reward(reward_norm, reward)
        weight = self.current_weight(counter)
        state = state.replace(counter=counter, reward_norm=reward_norm)
        return state, reward * weight, weight

    def update_normalization(self, state: RNDState, obs: dict[str, jax.Array]) -> RNDState:
        """Fold the rnd obs into the state normalizer (reference rnd.py:166-169)."""
        if state.state_norm is None:
            return state
        return state.replace(
            state_norm=update_running_norm(state.state_norm, self.get_rnd_state(obs))
        )

    def predictor_loss(
        self, predictor_params: Any, state: RNDState, obs: dict[str, jax.Array]
    ) -> jax.Array:
        """MSE between predictor and frozen target embeddings on normalized
        rnd obs (reference ppo.py:350-363). Differentiable in
        ``predictor_params`` only."""
        x = self.get_rnd_state(obs)
        if state.state_norm is not None:
            x = normalize(state.state_norm, x)
        x = jax.lax.stop_gradient(x)
        pred = self.predictor.apply({"params": predictor_params}, x)
        target = jax.lax.stop_gradient(self.target.apply({"params": state.target}, x))
        return jnp.mean(jnp.square(pred - target))


def resolve_rnd_config(alg_cfg: dict, obs, obs_groups, env) -> dict:
    """Fill in ``num_states``/``obs_groups`` and scale the weight by the env
    step dt (reference rnd.py:185-209).

    Works on a COPY of ``rnd_cfg``: the user's config dict is never mutated,
    so constructing several runners from one config template doesn't compound
    the ``weight * step_dt`` scaling (a latent footgun in the reference's
    in-place version)."""
    if "rnd_cfg" in alg_cfg and alg_cfg["rnd_cfg"] is not None:
        rnd_cfg = dict(alg_cfg["rnd_cfg"])
        num_rnd_state = 0
        for obs_group in obs_groups["rnd_state"]:
            assert len(obs[obs_group].shape) == 2, "The RND module only supports 1D observations."
            num_rnd_state += obs[obs_group].shape[-1]
        rnd_cfg["num_states"] = num_rnd_state
        rnd_cfg["obs_groups"] = obs_groups
        step_dt = getattr(getattr(env, "unwrapped", env), "step_dt", None)
        if step_dt is not None:
            rnd_cfg["weight"] = rnd_cfg["weight"] * step_dt
        alg_cfg["rnd_cfg"] = rnd_cfg
    return alg_cfg
