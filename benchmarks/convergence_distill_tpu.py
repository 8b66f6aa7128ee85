"""At-scale distillation on the real chip: privileged teacher -> blind student.

The reference's flagship distillation workflow (reference
distillation_runner.py + student_teacher.py:182-197 checkpoint remap) at the
flagship scale: a PPO teacher that SEES the randomized link masses
(``DomainRandomizedNLink``'s privileged obs group) is trained at 4096 envs,
then distilled into a student that only sees the proprioceptive base
observation — the canonical sim-to-real recipe the reference exists to serve
(reference README.md:6-10).

Both phases run K-iterations-per-dispatch on the real TPU and record mean
completed-episode reward curves; the distillation phase additionally records
the behavior-cloning loss. The student's reward approaching the teacher's is
the at-scale proof that the distillation path trains, not just parity-tests.

Usage (TPU box): python benchmarks/convergence_distill_tpu.py
Writes benchmarks/results/convergence_distill_tpu.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 50  # iterations per dispatch

TEACHER_GROUPS = {"policy": ["privileged"], "critic": ["privileged"]}
STUDENT_GROUPS = {"policy": ["policy"], "teacher": ["privileged"]}


def _curve(ms) -> list[float]:
    import jax

    ms = jax.device_get(ms)
    return [
        round(float(r) / float(c), 2) if c > 0 else float("nan")
        for r, c in zip(ms["rew_sum"], ms["ep_count"])
    ]


def run_seed(seed: int, teacher_iters: int, distill_iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    import bench
    from rsl_rl_tpu.algorithms.distillation import Distillation
    from rsl_rl_tpu.algorithms.ppo import PPO
    from rsl_rl_tpu.env import DomainRandomizedNLink
    from rsl_rl_tpu.modules import ActorCritic, StudentTeacher

    env = DomainRandomizedNLink(num_envs=bench.NUM_ENVS, num_links=5)
    _, obs = env.reset(jax.random.PRNGKey(0))

    # ---- phase 1: privileged PPO teacher (headline config, sigma-floored)
    teacher_policy = ActorCritic(
        obs,
        TEACHER_GROUPS,
        env.num_actions,
        actor_hidden_dims=[256, 256, 256],
        critic_hidden_dims=[256, 256, 256],
        actor_obs_normalization=True,
        critic_obs_normalization=True,
        noise_std_floor=0.01,
        dtype=jnp.bfloat16,
    )
    ppo = PPO(teacher_policy, num_learning_epochs=5, num_mini_batches=4)
    ts = ppo.init_train_state(jax.random.PRNGKey(1), env.num_envs)
    ts = ts.replace(rng=jax.random.fold_in(ts.rng, seed))
    cs = ppo.init_collect_state(jax.random.PRNGKey(2), env)
    collect = ppo.make_collect_fn(env, bench.NUM_STEPS)
    update = ppo.make_update_fn()

    @jax.jit
    def k_teacher(ts, cs):
        def body(carry, _):
            ts, cs = carry
            ts, cs, rollout, cm = collect(ts, cs)
            ts, cs, _ = update(ts, cs, rollout)
            return (ts, cs), {"rew_sum": cm["ep_reward_sum"], "ep_count": cm["ep_count"]}

        (ts, cs), ms = jax.lax.scan(body, (ts, cs), None, length=K)
        return ts, cs, ms

    t0 = time.perf_counter()
    teacher_curve = []
    for _ in range(teacher_iters // K):
        ts, cs, ms = k_teacher(ts, cs)
        teacher_curve.extend(_curve(ms))
    teacher_wall = time.perf_counter() - t0

    # ---- phase 2: distill into a student that sees only the base obs.
    # In-memory equivalent of the runner's checkpoint remap
    # (student_teacher.py:182-197 / our utils/checkpoint remap): the trained
    # actor + its normalizer become the frozen teacher in `aux`.
    st_policy = StudentTeacher(
        obs,
        STUDENT_GROUPS,
        env.num_actions,
        student_hidden_dims=[256, 256, 256],
        teacher_hidden_dims=[256, 256, 256],
        student_obs_normalization=True,
        teacher_obs_normalization=True,
        dtype=jnp.bfloat16,
    )
    dist = Distillation(st_policy, gradient_length=15, learning_rate=1e-3)
    dts = dist.init_train_state(jax.random.PRNGKey(3), env.num_envs)
    dts = dts.replace(rng=jax.random.fold_in(dts.rng, seed))
    st_ps = dts.policy.replace(
        aux={"teacher": ts.policy.params["actor"], "teacher_norm": ts.policy.norm["actor"]}
    )
    dts = dts.replace(policy=st_ps)
    dcs = dist.init_collect_state(jax.random.PRNGKey(4), env)
    dcollect = dist.make_collect_fn(env, bench.NUM_STEPS)
    dupdate = dist.make_update_fn()

    @jax.jit
    def k_distill(dts, dcs):
        def body(carry, _):
            dts, dcs = carry
            dts, dcs, rollout, cm = dcollect(dts, dcs)
            dts, dcs, um = dupdate(dts, dcs, rollout)
            return (dts, dcs), {
                "rew_sum": cm["ep_reward_sum"],
                "ep_count": cm["ep_count"],
                "bc": um["Loss/behavior"],
            }

        (dts, dcs), ms = jax.lax.scan(body, (dts, dcs), None, length=K)
        return dts, dcs, ms

    t0 = time.perf_counter()
    student_curve, bc_curve = [], []
    for _ in range(distill_iters // K):
        dts, dcs, ms = k_distill(dts, dcs)
        student_curve.extend(_curve(ms))
        bc_curve.extend(round(float(v), 5) for v in jax.device_get(ms["bc"]))
    distill_wall = time.perf_counter() - t0

    import numpy as np

    def tail100(c):
        a = np.asarray(c, dtype=float)
        a = a[-100:][~np.isnan(a[-100:])]
        return round(float(a.mean()), 1) if a.size else float("nan")

    return {
        "seed": seed,
        "teacher_final_reward_100": tail100(teacher_curve),
        "student_final_reward_100": tail100(student_curve),
        "bc_loss_first": bc_curve[0],
        "bc_loss_final": bc_curve[-1],
        "teacher_wall_s": round(teacher_wall, 1),
        "distill_wall_s": round(distill_wall, 1),
        "distill_steps_per_s": round(
            distill_iters * bench.NUM_ENVS * bench.NUM_STEPS / distill_wall, 1
        ),
        "teacher_curve": [round(v, 1) for v in teacher_curve],
        "student_curve": [round(v, 1) for v in student_curve],
        "bc_curve": bc_curve,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--teacher-iterations", type=int, default=1000)
    p.add_argument("--distill-iterations", type=int, default=500)
    p.add_argument("--seeds", type=int, nargs="+", default=[1, 2])
    args = p.parse_args()

    runs = []
    for seed in args.seeds:
        r = run_seed(seed, args.teacher_iterations, args.distill_iterations)
        runs.append(r)
        print(
            json.dumps({k: v for k, v in r.items() if not k.endswith("curve")}),
            flush=True,
        )

    out = {
        "workload": "distill_privileged_teacher_to_blind_student_dr_nlink5_4096envs_bf16",
        "teacher_iterations": args.teacher_iterations,
        "distill_iterations": args.distill_iterations,
        "runs": runs,
    }
    path = "benchmarks/results/convergence_distill_tpu.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"-> {path}")


if __name__ == "__main__":
    main()
