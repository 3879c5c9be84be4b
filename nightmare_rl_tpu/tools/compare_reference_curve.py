"""Learning-curve cross-validation against the reference environment.

BASELINE.md's criterion is "PPO learning curve within seed variance of
reference train.py".  rsl_rl (the reference's PPO) is not installable in
this container, but the reference ENV runs on CPU (mujoco + torch-cpu).
This tool therefore trains the SAME PPO — ours, which implements rsl_rl
v1.0.2 semantics verbatim (rl/ppo.py docstring, tests/test_ppo.py) —
through the identical host-loop driver (rl/external.py) against:

    --side ref   the reference env, imported from /root/reference
                 (envs/nightmare_v3_env.py — imported, not copied)
    --side tpu   our env (envs/nightmare_v3.py)

and logs identical per-iteration metrics to <out>/metrics.jsonl.  With env
semantics equal (golden-trajectory + reward-term parity tests) and PPO
semantics equal, curve overlap within seed variance discharges the
criterion; scripts/analyze_curve_compare.py summarizes the overlay.

    python -m nightmare_rl_tpu.tools.compare_reference_curve \
        --side ref --envs 256 --iters 100 --seed 1 --out logs/curvecmp/ref_s1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def make_ref_env(num_envs: int, num_threads: int):
    """Instantiate the reference env headless (render/recording off) and
    wrap it into the external-driver callback protocol."""
    sys.path.insert(0, "/root/reference")
    from envs.nightmare_v3_config import NightmareV3Config  # noqa: E402
    from envs.nightmare_v3_env import NightmareV3Env  # noqa: E402

    import numpy as np
    import torch

    cfg = NightmareV3Config()
    cfg.env.num_envs = num_envs
    cfg.env.model_path = "/root/reference/models/nightmare_v3/mjmodel.xml"
    cfg.viewer.render = False
    cfg.viewer.record_states = False
    env = NightmareV3Env(cfg, log_dir=None, num_threads=num_threads)
    obs = env.reset()[0].numpy()

    def step(actions: np.ndarray):
        obs, _, rew, dones, extras = env.step(
            torch.from_numpy(np.asarray(actions, np.float32))
        )
        time_out = extras.get("time_outs")
        time_out = (time_out.numpy() if time_out is not None
                    else np.zeros(num_envs, np.float32))
        # per-term means over envs that reset this step (reset_idx :363-367)
        n_reset = int((dones.numpy() != 0).sum())
        ep = {
            k: float(v) for k, v in extras.get("episode", {}).items()
        } if n_reset else {}
        return (obs.numpy(), rew.numpy(), dones.numpy(), time_out,
                (n_reset, ep))

    return env, obs, step


def make_tpu_env(num_envs: int):
    import numpy as np

    from nightmare_rl_tpu.core.config import EnvCfg, NightmareV3Cfg
    from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env

    env = NightmareV3Env(
        NightmareV3Cfg().replace(env=EnvCfg(num_envs=num_envs))
    )
    state, obs = env.reset(0)
    box = {"state": state}

    def step(actions: np.ndarray):
        import jax.numpy as jnp

        out = env._step_batch(box["state"], jnp.asarray(actions, jnp.float32))
        box["state"] = out.state
        fin = np.asarray(out.finished_episode_sums)  # (N, nterms) nan=open
        finished = ~np.isnan(fin[:, 0])
        n_reset = int(finished.sum())
        ep = {}
        if n_reset:
            means = fin[finished].mean(axis=0) / env.max_episode_length_s
            ep = {
                f"rew_{name}": float(v)
                for name, v in zip(env.active_rewards, means)
            }
        return (np.asarray(out.obs), np.asarray(out.reward),
                np.asarray(out.done), np.asarray(out.time_out),
                (n_reset, ep))

    return env, np.asarray(obs), step


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--side", choices=["ref", "tpu"], required=True)
    p.add_argument("--envs", type=int, default=256)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--threads", type=int, default=2)
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()

    import numpy as np

    np.random.seed(args.seed)  # the reference env uses global np.random

    from nightmare_rl_tpu.core.config import PPOCfg
    from nightmare_rl_tpu.rl.external import ExternalPPO

    if args.side == "ref":
        env, obs0, step = make_ref_env(args.envs, args.threads)
        num_obs = env.num_obs
        num_actions = env.num_actions
    else:
        env, obs0, step = make_tpu_env(args.envs)
        num_obs = env.num_obs
        num_actions = env.num_actions

    trainer = ExternalPPO(num_obs, num_actions, args.envs,
                          PPOCfg().replace(seed=args.seed))
    ts = trainer.init(args.seed, obs0)

    os.makedirs(args.out, exist_ok=True)
    f = open(os.path.join(args.out, "metrics.jsonl"), "w")

    # per-iteration episode metrics: reset-count-weighted means of the
    # per-step per-term episode means both sides emit identically
    ep_acc: dict = {}
    ep_n = 0

    def step_and_collect(actions):
        nonlocal ep_acc, ep_n
        obs, rew, done, time_out, (n_reset, ep) = step(actions)
        if n_reset:
            ep_n += n_reset
            for k, v in ep.items():
                ep_acc[k] = ep_acc.get(k, 0.0) + v * n_reset
        return obs, rew, done, time_out

    t0 = time.time()
    for it in range(1, args.iters + 1):
        ep_acc, ep_n = {}, 0
        ts, stats = trainer.learn_iteration(ts, step_and_collect)
        row = {
            "iter": it,
            "mean_reward": float(stats["mean_reward"]),
            "loss": float(stats["loss"]),
            "kl": float(stats["kl"]),
            "lr": float(stats["lr"]),
            "mean_noise_std": float(stats["mean_noise_std"]),
            "dones": int(stats["dones"]),
        }
        for k, v in ep_acc.items():
            row[k] = v / max(ep_n, 1)
        f.write(json.dumps(row) + "\n")
        f.flush()
        if it % 10 == 0 or it == 1:
            rate = it * trainer.cfg.runner.num_steps_per_env * args.envs / (
                time.time() - t0
            )
            print(f"[{args.side}] iter {it}: reward "
                  f"{row['mean_reward']:+.4f} kl {row['kl']:.4f} "
                  f"std {row['mean_noise_std']:.3f} ({rate:,.0f} steps/s)")
    f.close()
    print(f"wrote {args.out}/metrics.jsonl")


if __name__ == "__main__":
    main()
