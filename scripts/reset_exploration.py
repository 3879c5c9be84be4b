"""Reset a trained policy's exploration noise and re-launch training.

PPO with rsl_rl's free-parameter action std can collapse into a standing
local optimum: the policy solves termination/orientation/default-position
terms, the std shrinks to ~0.08, and with exploration gone the tracking
terms plateau (observed on the 2000-iteration nightmare_v3 run: falls=0 but
achieved vx ~= 0 under a vx=0.3 command, while the classical gait engine
walks fine in the same physics — tools/custom_play.py).  The standard remedy
is to restart exploration from the stable policy: reset the std parameter to
a large value and re-init the optimizer moments, keeping everything else
(actor/critic weights, env state, adaptive lr, iteration counter).

    python scripts/reset_exploration.py <src_ckpt> <dst_log_root> \
        [--robot nightmare_v3|anymal_c] [--std 0.8]

Writes <dst_log_root>/0000_reset_from_<iter>/model_<iter> in the runner's
own orbax format; `train.py -r -p <dst_log_root>` (or
scripts/train_supervised.sh) continues from it directly.  The run-dir name
sorts lexicographically BEFORE the datetime dirs the continuation creates,
so get_load_path (which picks the newest run dir containing a checkpoint —
the reference helpers.py quirk, preserved) resolves the reset checkpoint
first and the continuation's own checkpoints afterwards.  The destination
must therefore be a FRESH log root: if it already holds run dirs with
checkpoints, those would shadow the reset and every resume would snap back
to the pre-reset policy — the script refuses unless --force.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("src", help="path to model_<iter> checkpoint dir")
    p.add_argument("dst", help="FRESH log root for the continuation run")
    p.add_argument("--robot", type=str, default="nightmare_v3",
                   choices=["nightmare_v3", "anymal_c"])
    p.add_argument("--std", type=float, default=0.8)
    p.add_argument("--envs", type=int, default=2048)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--force", action="store_true",
                   help="allow a dst that already contains checkpoints "
                        "(they will shadow or be shadowed — see docstring)")
    args = p.parse_args()

    existing = glob.glob(os.path.join(args.dst, "*", "model_*"))
    if existing and not args.force:
        p.error(
            f"{args.dst} already holds checkpoints ({existing[0]}, ...); "
            "resume resolution would not see the reset checkpoint as "
            "newest.  Use a fresh log root, or --force if you know better."
        )

    from nightmare_rl_tpu.core.config import EnvCfg, NightmareV3Cfg, PPOCfg
    from nightmare_rl_tpu.rl.runner import OnPolicyRunner

    if args.robot == "anymal_c":
        from nightmare_rl_tpu.envs.anymal_c import AnymalCCfg, AnymalCEnv

        env = AnymalCEnv(AnymalCCfg(num_envs=args.envs))
    else:
        from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env

        env = NightmareV3Env(
            NightmareV3Cfg().replace(env=EnvCfg(num_envs=args.envs))
        )
    runner = OnPolicyRunner(env, PPOCfg().replace(seed=args.seed),
                            log_dir=None)
    runner.init(args.seed)
    runner.load(args.src)
    ts = runner.ts

    params = jax.tree_util.tree_map(lambda x: x, ts.params)  # shallow copy
    std = params["params"]["std"]
    print(f"std before: {jnp.asarray(std).min():.4f}.."
          f"{jnp.asarray(std).max():.4f}")
    params["params"]["std"] = jnp.full_like(std, args.std)
    opt_state = runner.ppo.tx.init(params)
    runner.ts = ts.replace(params=params, opt_state=opt_state)

    it = int(ts.iteration)
    run_dir = os.path.join(args.dst, f"0000_reset_from_{it}")
    os.makedirs(run_dir, exist_ok=True)
    runner.log_dir = run_dir
    runner.save(it)
    print(f"wrote {run_dir}/model_{it} with std={args.std}, fresh optimizer")


if __name__ == "__main__":
    main()
