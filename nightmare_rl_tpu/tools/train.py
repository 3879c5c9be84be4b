"""Train nightmare_v3 PPO on TPU.

Usage mirrors the reference train.py (nightmare_rl train.py:8-19):

    python -m nightmare_rl_tpu.tools.train -e 4096 -n 1000 [-r] [-p PATH]

-n here is the number of learning iterations (the reference ran open-ended;
model_2000.pt is its known artifact).  Multi-device: pass --mesh to shard
envs over all visible devices.
"""

from __future__ import annotations

import argparse
import datetime
import os


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-e", "--envs", type=int, default=2048, dest="num_envs")
    p.add_argument("-n", "--iterations", type=int, default=1000)
    p.add_argument("-r", "--resume", action="store_true", default=False)
    p.add_argument("-p", "--resume_path", type=str, default=None)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--mesh", action="store_true", help="shard envs over all devices")
    p.add_argument("--robot", type=str, default="nightmare_v3",
                   choices=["nightmare_v3", "anymal_c"])
    p.add_argument("--log_root", type=str, default=None)
    p.add_argument("--profile", type=str, default=None,
                   help="write a jax.profiler trace of iterations 2-4 here")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (pod slices)")
    p.add_argument("--std_floor", type=float, default=0.0,
                   help="exploration floor on the action std (flag-gated "
                        "deviation from rsl_rl; 0 = parity config — see "
                        "core/config.py PolicyCfg.std_floor)")
    p.add_argument("--max_ang_vel", type=float, default=None,
                   help="override the sampled |wz| command range "
                        "(reference default 0.8 rad/s; the platform's "
                        "achievable yaw rate is ~0.1-0.3 — see BENCH_NOTES "
                        "'yaw-tracking gap'.  Flag-gated deviation; unset "
                        "= parity)")
    args = p.parse_args()

    if args.multihost:
        import jax as _jax

        _jax.distributed.initialize()

    from nightmare_rl_tpu.core.config import EnvCfg, NightmareV3Cfg, PPOCfg
    from nightmare_rl_tpu.rl.runner import OnPolicyRunner, get_load_path
    from nightmare_rl_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

    log_root = args.log_root or os.path.join("logs", args.robot)
    log_dir = os.path.join(log_root, str(datetime.datetime.now()))
    print(f"Logging to {log_dir}")

    pcfg = PPOCfg().replace(seed=args.seed)
    if args.std_floor > 0.0:
        import dataclasses

        pcfg = pcfg.replace(policy=dataclasses.replace(
            pcfg.policy, std_floor=args.std_floor))

    if args.robot == "anymal_c":
        from nightmare_rl_tpu.envs.anymal_c import AnymalCCfg, AnymalCEnv

        env = AnymalCEnv(AnymalCCfg(num_envs=args.num_envs))
    else:
        from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env

        cfg = NightmareV3Cfg().replace(env=EnvCfg(num_envs=args.num_envs))
        if args.max_ang_vel is not None:
            import dataclasses

            cfg = cfg.replace(commands=dataclasses.replace(
                cfg.commands, ranges=dataclasses.replace(
                    cfg.commands.ranges, max_ang_vel=args.max_ang_vel)))
        env = NightmareV3Env(cfg)

    mesh = None
    if args.mesh:
        from nightmare_rl_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"mesh: {mesh}")

    runner = OnPolicyRunner(env, pcfg, log_dir=log_dir, mesh=mesh)
    runner.init(args.seed)
    if args.resume:
        root = args.resume_path if args.resume_path else log_root
        path = get_load_path(root)
        print(f"Loading model from: {path}")
        runner.load(path)
    runner.learn(args.iterations, init_at_random_ep_len=True,
                 profile_dir=args.profile)


if __name__ == "__main__":
    main()
