"""Export a trained policy to the reference's torch checkpoint format.

Writes a ``model_<iter>.pt`` loadable by the reference's own play.py
(play.py:65-72: ``ActorCritic(...).load_state_dict(
torch.load(path)['model_state_dict'])``) — a policy trained on TPU here
can be teleoperated by the unmodified reference stack.

    python -m nightmare_rl_tpu.tools.export_torch \
        --ckpt artifacts/model_3000 --out /tmp/model_3000.pt
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="orbax model_<iter> dir")
    p.add_argument("--out", required=True, help="output .pt path")
    p.add_argument("--robot", default="nightmare_v3",
                   choices=["nightmare_v3", "anymal_c"])
    p.add_argument("--envs", type=int, default=1)
    args = p.parse_args()

    from nightmare_rl_tpu.core.config import EnvCfg, NightmareV3Cfg, PPOCfg
    from nightmare_rl_tpu.rl.ppo import PPO
    from nightmare_rl_tpu.utils import checkpoint as ckpt
    from nightmare_rl_tpu.utils.torch_io import save_pt

    if args.robot == "anymal_c":
        from nightmare_rl_tpu.envs.anymal_c import AnymalCCfg, AnymalCEnv

        env = AnymalCEnv(AnymalCCfg(num_envs=args.envs))
    else:
        from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env

        env = NightmareV3Env(
            NightmareV3Cfg().replace(env=EnvCfg(num_envs=args.envs))
        )
    ppo = PPO(env, PPOCfg())
    ts = ckpt.restore(args.ckpt, ppo.init(0))
    save_pt(args.out, ts.params, iteration=int(ts.iteration))
    print(f"wrote {args.out} (iteration {int(ts.iteration)}) — loadable by "
          "the reference play.py")


if __name__ == "__main__":
    main()
