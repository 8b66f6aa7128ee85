"""Benchmark suite: the BASELINE.json config list on in-tree JAX envs.

The driver's config list (BASELINE.md configs #1-#4) prescribes MJX/Brax
tasks; those simulators are not in this image, so each config runs on the
closest in-tree JAX env with the prescribed algorithm/scale:

1. PPO MLP actor-critic, 64 Pendulum envs, 24-step rollouts (CPU-runnable).
2. PPO + recurrent LSTM actor-critic, 512 partially observable Pendulum envs.
3. PPO + RND intrinsic reward on the sparse-reward goal-reach task
   (run twice — with and without RND — to show the exploration effect).
4. Student-teacher distillation + symmetry-augmented teacher, 2048 PointMass
   envs.

Each config trains end-to-end and prints one JSON line with throughput
(`fps`, the reference's Perf/total_fps) and a learning-outcome metric.
Timing is fenced with jax.device_get (see bench.py).

Usage:
    python benchmarks/bench_configs.py [--configs 1 2 3 4] [--out results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def _train(runner, iterations: int):
    """Drive collect/update directly; returns (fps, per-iteration metrics)."""
    ts, cs = runner.train_state, runner.collect_state
    # compile + warmup
    ts, cs, rollout, cm = runner._collect(ts, cs)
    ts, cs, um = runner._update(ts, cs, rollout)
    jax.device_get(jax.tree.leaves(um)[0])

    history = []
    t0 = time.perf_counter()
    for _ in range(iterations):
        ts, cs, rollout, cm = runner._collect(ts, cs)
        ts, cs, um = runner._update(ts, cs, rollout)
        history.append((cm, um))
    jax.device_get(jax.tree.leaves(history[-1][1])[0])  # fence (calls chain)
    elapsed = time.perf_counter() - t0

    runner.train_state, runner.collect_state = ts, cs
    fps = runner.env.num_envs * runner.num_steps_per_env * iterations / elapsed
    return fps, [
        {k: float(v) for k, v in jax.device_get({**cm, **um}).items()}
        for cm, um in history
    ]


def _mean_ep_reward(history, tail=20):
    rew = sum(m["ep_reward_sum"] for m in history[-tail:])
    cnt = sum(m["ep_count"] for m in history[-tail:])
    return rew / cnt if cnt else float("nan")


def config1(iterations=300):
    """PPO MLP, 64 Pendulum envs (BASELINE config #1)."""
    from rsl_rl_tpu.env import Pendulum
    from rsl_rl_tpu.runners import OnPolicyRunner

    cfg = {
        "num_steps_per_env": 24, "save_interval": 10_000, "seed": 1,
        "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
        "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [256, 256, 256],
                   "critic_hidden_dims": [256, 256, 256], "actor_obs_normalization": True,
                   "critic_obs_normalization": True},
        "algorithm": {"class_name": "PPO", "schedule": "adaptive", "desired_kl": 0.01},
    }
    runner = OnPolicyRunner(Pendulum(num_envs=64), cfg, log_dir=None)
    fps, history = _train(runner, iterations)
    return {"config": "ppo_mlp_pendulum_64", "fps": round(fps),
            "mean_ep_reward": round(_mean_ep_reward(history), 1)}


def config2(iterations=300):
    """PPO + recurrent LSTM, 512 partially observable Pendulum envs
    (BASELINE config #2 analog; MJX ant unavailable in-image)."""
    from rsl_rl_tpu.env import PartiallyObservablePendulum
    from rsl_rl_tpu.runners import OnPolicyRunner

    cfg = {
        "num_steps_per_env": 24, "save_interval": 10_000, "seed": 1,
        "obs_groups": {"policy": ["policy"], "critic": ["policy"]},
        "policy": {"class_name": "ActorCriticRecurrent", "rnn_type": "lstm",
                   "rnn_hidden_dim": 128, "actor_hidden_dims": [128, 128],
                   "critic_hidden_dims": [128, 128], "actor_obs_normalization": True,
                   "critic_obs_normalization": True},
        "algorithm": {"class_name": "PPO", "schedule": "adaptive", "desired_kl": 0.01},
    }
    runner = OnPolicyRunner(PartiallyObservablePendulum(num_envs=512), cfg, log_dir=None)
    fps, history = _train(runner, iterations)
    return {"config": "ppo_lstm_po_pendulum_512", "fps": round(fps),
            "mean_ep_reward": round(_mean_ep_reward(history), 1)}


def config3(iterations=400):
    """PPO +/- RND on the sparse-reward goal task (BASELINE config #3)."""
    from rsl_rl_tpu.env import SparseGoalReach
    from rsl_rl_tpu.runners import OnPolicyRunner

    def run(rnd: bool):
        alg = {"class_name": "PPO", "schedule": "adaptive", "desired_kl": 0.01,
               "entropy_coef": 0.01}
        if rnd:
            alg["rnd_cfg"] = {
                "weight": 2.0, "predictor_hidden_dims": [64, 64],
                "target_hidden_dims": [64, 64], "num_outputs": 16,
                "state_normalization": True, "reward_normalization": True,
                "learning_rate": 1e-3,
            }
        cfg = {
            "num_steps_per_env": 24, "save_interval": 10_000, "seed": 1,
            "obs_groups": {"policy": ["policy"], "critic": ["policy"],
                           **({"rnd_state": ["policy"]} if rnd else {})},
            "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [128, 128],
                       "critic_hidden_dims": [128, 128], "actor_obs_normalization": True,
                       "critic_obs_normalization": True},
            "algorithm": alg,
        }
        env = SparseGoalReach(num_envs=512, goal_dist=6.0, max_episode_length=100)
        runner = OnPolicyRunner(env, cfg, log_dir=None)
        fps, history = _train(runner, iterations)
        # extrinsic episode reward == success rate on this env
        erew = sum(m["ep_ereward_sum"] for m in history[-40:])
        cnt = sum(m["ep_count"] for m in history[-40:])
        return fps, (erew / cnt if cnt else 0.0)

    fps_rnd, success_rnd = run(rnd=True)
    _, success_plain = run(rnd=False)
    return {"config": "ppo_rnd_sparse_goal_512", "fps": round(fps_rnd),
            "success_rate_rnd": round(success_rnd, 3),
            "success_rate_no_rnd": round(success_plain, 3)}


def config4(iterations=150):
    """Teacher (symmetry-augmented PPO) -> student distillation, 2048 PointMass
    envs (BASELINE config #4 analog)."""
    import tempfile

    from rsl_rl_tpu.env import PointMass
    from rsl_rl_tpu.runners import DistillationRunner, OnPolicyRunner

    teacher_cfg = {
        "num_steps_per_env": 24, "save_interval": 10_000, "seed": 1,
        "obs_groups": {"policy": ["policy", "privileged"],
                       "critic": ["policy", "privileged"]},
        "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [128, 128],
                   "critic_hidden_dims": [128, 128], "actor_obs_normalization": True},
        "algorithm": {"class_name": "PPO", "schedule": "adaptive", "desired_kl": 0.01,
                      "symmetry_cfg": {
                          "use_data_augmentation": True, "use_mirror_loss": False,
                          "data_augmentation_func":
                              "rsl_rl_tpu.env.toy:point_mass_symmetry",
                      }},
    }
    env = PointMass(num_envs=2048)
    teacher = OnPolicyRunner(env, teacher_cfg, log_dir=None)
    fps_teacher, t_hist = _train(teacher, iterations)
    ckpt = os.path.join(tempfile.mkdtemp(prefix="bench_c4_"), "teacher.ckpt")
    teacher.save(ckpt)

    student_cfg = {
        "num_steps_per_env": 24, "save_interval": 10_000, "seed": 2,
        "obs_groups": {"policy": ["policy"], "teacher": ["policy", "privileged"]},
        "policy": {"class_name": "StudentTeacher", "student_hidden_dims": [128, 128],
                   "teacher_hidden_dims": [128, 128], "student_obs_normalization": True,
                   "teacher_obs_normalization": True},
        "algorithm": {"class_name": "Distillation", "learning_rate": 1e-3,
                      "gradient_length": 12, "num_learning_epochs": 1},
    }
    student = DistillationRunner(PointMass(num_envs=2048), student_cfg, log_dir=None)
    student.load(ckpt)
    fps_student, s_hist = _train(student, iterations)
    return {"config": "distill_symmetry_pointmass_2048",
            "fps_teacher": round(fps_teacher), "fps_student": round(fps_student),
            "teacher_ep_reward": round(_mean_ep_reward(t_hist), 2),
            "behavior_loss_first": round(s_hist[0]["Loss/behavior"], 4),
            "behavior_loss_last": round(s_hist[-1]["Loss/behavior"], 4)}


def config5(iterations=150):
    """Recurrent student distilled from a feedforward privileged teacher,
    2048 PointMass envs — the recurrent-distillation throughput line. The
    update takes the chunked segment replay (one fused Pallas GRU call per
    segment chunk, algorithms/distillation.py) since hidden=128 and the full
    2048-env replay batch are 128-aligned."""
    import tempfile

    from rsl_rl_tpu.env import PointMass
    from rsl_rl_tpu.runners import DistillationRunner, OnPolicyRunner

    teacher_cfg = {
        "num_steps_per_env": 24, "save_interval": 10_000, "seed": 1,
        "obs_groups": {"policy": ["policy", "privileged"],
                       "critic": ["policy", "privileged"]},
        "policy": {"class_name": "ActorCritic", "actor_hidden_dims": [128, 128],
                   "critic_hidden_dims": [128, 128], "actor_obs_normalization": True},
        "algorithm": {"class_name": "PPO", "schedule": "adaptive", "desired_kl": 0.01},
    }
    env = PointMass(num_envs=2048)
    teacher = OnPolicyRunner(env, teacher_cfg, log_dir=None)
    _train(teacher, iterations // 2)
    ckpt = os.path.join(tempfile.mkdtemp(prefix="bench_c5_"), "teacher.ckpt")
    teacher.save(ckpt)

    student_cfg = {
        "num_steps_per_env": 24, "save_interval": 10_000, "seed": 2,
        "obs_groups": {"policy": ["policy"], "teacher": ["policy", "privileged"]},
        "policy": {"class_name": "StudentTeacherRecurrent", "rnn_type": "gru",
                   "rnn_hidden_dim": 128, "student_hidden_dims": [128, 128],
                   "teacher_hidden_dims": [128, 128], "student_obs_normalization": True,
                   "teacher_obs_normalization": True},
        "algorithm": {"class_name": "Distillation", "learning_rate": 1e-3,
                      "gradient_length": 12, "num_learning_epochs": 1},
    }
    student = DistillationRunner(PointMass(num_envs=2048), student_cfg, log_dir=None)
    student.load(ckpt)
    fps_student, s_hist = _train(student, iterations)
    return {"config": "distill_recurrent_pointmass_2048",
            "fps_student": round(fps_student),
            "behavior_loss_first": round(s_hist[0]["Loss/behavior"], 4),
            "behavior_loss_last": round(s_hist[-1]["Loss/behavior"], 4)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", type=int, nargs="+", default=[1, 2, 3, 4, 5])
    p.add_argument("--out", type=str, default="benchmarks/results/configs.json")
    args = p.parse_args()

    fns = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5}
    results = []
    for c in args.configs:
        r = fns[c]()
        print(json.dumps(r), flush=True)
        results.append(r)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
