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

    python scripts/reset_exploration.py <src_ckpt> <dst_log_dir> [--std 0.8]

Writes <dst_log_dir>/model_<iter> in the runner's own orbax format, so
`train.py -r -p <dst_root>` (or scripts/train_supervised.sh) continues from
it directly.

NB get_load_path resolves the *lexicographically newest* run dir (the
reference helpers.py quirk, preserved): place the reset checkpoint in a dir
that sorts BEFORE the datetime dirs the continuation will create (e.g. an
earlier datetime-shaped name), or move it out of the log root after the
first continuation chunk has saved its own checkpoints — otherwise every
resume snaps back to the reset point.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("src", help="path to model_<iter> checkpoint dir")
    p.add_argument("dst", help="run dir to write the reset checkpoint into")
    p.add_argument("--std", type=float, default=0.8)
    p.add_argument("--envs", type=int, default=2048)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    from nightmare_rl_tpu.core.config import EnvCfg, NightmareV3Cfg, PPOCfg
    from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env
    from nightmare_rl_tpu.rl.runner import OnPolicyRunner

    import jax.numpy as jnp

    env = NightmareV3Env(
        NightmareV3Cfg().replace(env=EnvCfg(num_envs=args.envs))
    )
    runner = OnPolicyRunner(env, PPOCfg().replace(seed=args.seed),
                            log_dir=args.dst)
    runner.init(args.seed)
    runner.load(args.src)
    ts = runner.ts

    params = jax.tree_util.tree_map(lambda x: x, ts.params)  # shallow copy
    std = params["params"]["std"]
    print(f"std before: {jnp.asarray(std).min():.4f}..{jnp.asarray(std).max():.4f}")
    params["params"]["std"] = jnp.full_like(std, args.std)
    opt_state = runner.ppo.tx.init(params)
    runner.ts = ts.replace(params=params, opt_state=opt_state)

    it = int(ts.iteration)
    os.makedirs(args.dst, exist_ok=True)
    runner.save(it)
    print(f"wrote {args.dst}/model_{it} with std={args.std}, fresh optimizer")


if __name__ == "__main__":
    import jax  # noqa: E402  (after path setup)

    main()
