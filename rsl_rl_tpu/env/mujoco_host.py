"""Real-MuJoCo host environment: the N-link swing-up on the actual simulator.

The reference library positions itself as the training loop on top of real
rigid-body simulators (reference README.md:6-10 — Isaac Lab, Legged Gym,
MuJoCo Playground). ``mujoco-mjx`` (the JAX frontend) is not installable in
this image (no network egress; transcript in docs/mjx_conformance.md), but
base CPU MuJoCo is — so this module provides the same 5-link swing-up task
as the in-tree JAX env (``env/nlink.py``) backed by the **real simulator**,
through the stateful :class:`HostVecEnv` contract (the analog of the
reference's external-simulator boundary, reference
runners/on_policy_runner.py:103-107).

Dynamics identity with ``NLinkPendulum`` (proven to fp32 precision by
``tests/test_mujoco_conformance.py``):

- the chain is built of point masses at link tips with hinge joints, exactly
  the manipulator equation the JAX env assembles;
- MuJoCo's ``Euler`` integrator is the same semi-implicit Euler as
  ``NLinkPendulum._substep`` at the same sub-timestep;
- joint motor torques in MuJoCo's relative coordinates are *identically* the
  JAX env's joint torques ``u`` (the generalized-force transform
  ``f_q = Aᵀ f_θ`` of ``τ_i = u_i − u_{i+1}`` collapses back to ``u``);
- the JAX env's viscous damping acts on ABSOLUTE angular velocity
  ``f_θ = −c·ω``; in relative coordinates that is ``f_q = −c·AᵀA·q̇``,
  applied here through ``qfrc_applied`` each substep (explicit, like the
  JAX env's — MuJoCo treats applied forces explicitly under Euler).

The only deliberate difference: the JAX env clips ``ω`` to ``max_speed``
*between* the velocity and position half-updates of each substep; here the
clip is applied after the full substep. It is a safety rail that never
engages below 20 rad/s in normal swing-up operation, so trajectories match
until an env is driven far outside the task regime.

Angles map as ``θ = A·q`` with ``A = tril(ones)`` (absolute = cumulative sum
of relative hinge angles; hinge axis −y makes positive ``q`` positive ``θ``).
"""

from __future__ import annotations

import numpy as np

from rsl_rl_tpu.env.host_env import HostVecEnv


def nlink_mjcf(
    num_links: int, lengths: np.ndarray, timestep: float, masses: np.ndarray | None = None
) -> str:
    """MJCF for a planar chain of point masses at link tips, hinges about −y.

    ``θ = 0`` hangs straight down (−z); gravity 9.81 −z; no geoms, so no
    contacts — the conservative dynamics are exactly the JAX env's
    manipulator equation (env/nlink.py:14-22). Point masses carry a 1e-9
    rotational inertia (MuJoCo requires positive-definite body inertia);
    relative to the ``m·l²`` terms this perturbs the mass matrix by ~1e-8,
    below fp32 resolution.
    """
    if masses is None:
        masses = np.ones(num_links)

    def body(i: int) -> str:
        inner = body(i + 1) if i + 1 < num_links else ""
        pos = "0 0 0" if i == 0 else f"0 0 {-lengths[i - 1]}"
        return (
            f'<body name="l{i}" pos="{pos}">'
            f'<joint name="j{i}" type="hinge" axis="0 -1 0" damping="0"/>'
            f'<inertial pos="0 0 {-lengths[i]}" mass="{masses[i]}"'
            f' diaginertia="1e-9 1e-9 1e-9"/>'
            f"{inner}</body>"
        )

    motors = "".join(f'<motor joint="j{i}" gear="1"/>' for i in range(num_links))
    return (
        "<mujoco>"
        f'<option timestep="{timestep}" integrator="Euler" gravity="0 0 -9.81"/>'
        f"<worldbody>{body(0)}</worldbody>"
        f"<actuator>{motors}</actuator>"
        "</mujoco>"
    )


class MuJoCoNLinkEnv(HostVecEnv):
    """N-link swing-up on real CPU MuJoCo, same task definition as
    ``NLinkPendulum`` (env/nlink.py): same constants, init distribution,
    reward, timeout-only termination and auto-reset.

    Host-side and stateful per the :class:`HostVecEnv` contract — the runner
    drives it through the hybrid collection loop like any external simulator
    (reference runners/on_policy_runner.py:103-107).
    """

    g = 9.81
    damping = 0.05
    max_torque = 10.0
    max_speed = 20.0
    dt = 0.02
    n_substeps = 4

    def __init__(
        self,
        num_envs: int,
        num_links: int = 5,
        max_episode_length: int = 400,
        seed: int = 0,
        cfg: dict | None = None,
    ):
        import mujoco  # deferred: the package imports without mujoco installed

        self._mujoco = mujoco
        self.num_envs = num_envs
        self.num_links = num_links
        self.num_actions = num_links
        self.max_episode_length = int(max_episode_length)
        self.step_dt = self.dt
        self.cfg = cfg or {}
        self.lengths = np.ones(num_links) / num_links
        self._total_len = float(self.lengths.sum())
        self.model = mujoco.MjModel.from_xml_string(
            nlink_mjcf(num_links, self.lengths, self.dt / self.n_substeps)
        )
        self.data = [mujoco.MjData(self.model) for _ in range(num_envs)]
        # absolute-omega damper in relative coords: f_q = −c·(AᵀA)·q̇
        A = np.tril(np.ones((num_links, num_links)))
        self._damp = self.damping * (A.T @ A)
        self.episode_length_buf = np.zeros(num_envs, np.int32)
        self._rng = np.random.default_rng(seed)
        self.reset()

    # ------------------------------------------------------------- coords

    @staticmethod
    def _to_relative(x: np.ndarray) -> np.ndarray:
        """θ (absolute) → q (relative): q_i = θ_i − θ_{i−1} (A⁻¹ = first diff)."""
        return np.diff(x, prepend=0.0)

    @staticmethod
    def _to_absolute(x: np.ndarray) -> np.ndarray:
        """q (relative) → θ (absolute): cumulative sum (A = tril(ones))."""
        return np.cumsum(x)

    def _state(self) -> tuple[np.ndarray, np.ndarray]:
        theta = np.stack([self._to_absolute(d.qpos) for d in self.data])
        omega = np.stack([self._to_absolute(d.qvel) for d in self.data])
        return theta, omega

    def _obs_from(self, theta: np.ndarray, omega: np.ndarray) -> dict[str, np.ndarray]:
        # same obs layout as NLinkPendulum._obs (env/nlink.py:148-152)
        return {
            "policy": np.concatenate(
                [np.cos(theta), np.sin(theta), 0.1 * omega], axis=-1
            ).astype(np.float32)
        }

    def _sample_into(self, idx: np.ndarray) -> None:
        """Re-initialize envs ``idx`` from the JAX env's init distribution
        (env/nlink.py:154-158)."""
        for i in np.flatnonzero(idx):
            theta = self._rng.uniform(-0.1, 0.1, self.num_links)
            omega = self._rng.uniform(-0.05, 0.05, self.num_links)
            d = self.data[i]
            d.qpos[:] = self._to_relative(theta)
            d.qvel[:] = self._to_relative(omega)
            self._mujoco.mj_forward(self.model, d)

    # ------------------------------------------------------------- contract

    def reset(self, seed: int | None = None) -> dict[str, np.ndarray]:
        if seed is not None:
            self._rng = np.random.default_rng(seed)
        self._sample_into(np.ones(self.num_envs, bool))
        self.episode_length_buf[:] = 0
        return self._obs_from(*self._state())

    def step(self, actions: np.ndarray):
        u = np.clip(np.asarray(actions, np.float64), -self.max_torque, self.max_torque)
        for i, d in enumerate(self.data):
            d.ctrl[:] = u[i]
            for _ in range(self.n_substeps):
                d.qfrc_applied[:] = -self._damp @ d.qvel
                self._mujoco.mj_step(self.model, d)
                omega = self._to_absolute(d.qvel)
                if np.any(np.abs(omega) > self.max_speed):  # safety rail
                    d.qvel[:] = self._to_relative(
                        np.clip(omega, -self.max_speed, self.max_speed)
                    )

        theta, omega = self._state()
        height = -np.sum(self.lengths * np.cos(theta), axis=-1) / self._total_len
        reward = (
            height
            - 0.05 * np.mean(omega**2, axis=-1)
            - 0.01 * np.mean(u**2, axis=-1)
        ).astype(np.float32)

        self.episode_length_buf += 1
        time_out = self.episode_length_buf >= self.max_episode_length
        done = time_out.copy()  # timeout-only termination, like the JAX env
        if done.any():
            self._sample_into(done)
            self.episode_length_buf[done] = 0
            theta, omega = self._state()

        extras = {
            "time_outs": time_out,
            "log": {"nlink/tip_height": height.astype(np.float32)},
        }
        return self._obs_from(theta, omega), reward, done, extras
