"""Drive the hexapod with the classical gait engine inside the TPU physics.

Equivalent of the reference's custom_play.py (nikengine FSM instead of a NN,
action-rate limit + kp=12 proportional control, contact-force printouts, FPS
meter — custom_play.py:44-151) and custom_play_mult.py (the same engine over
many envs — trivially expressed here as a vmap).

    python -m nightmare_rl_tpu.tools.custom_play --steps 400 --lin 0.08 \
        [--envs 4] [--out /tmp/gait.pkl] [--view]
"""

from __future__ import annotations

import argparse
import pickle
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--lin", type=float, default=0.08)
    p.add_argument("--ang", type=float, default=0.0)
    p.add_argument("--envs", type=int, default=1)
    p.add_argument("--gait", type=str, default="tripod",
                   choices=["tripod", "ripple", "wave"])
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--view", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nightmare_rl_tpu.engine import gait as G
    from nightmare_rl_tpu.physics import loader, pipeline
    from nightmare_rl_tpu.physics import system as S

    sys = S.tree_cast(loader.load_system("nightmare_v3"), jnp.float32)
    import dataclasses

    sys = dataclasses.replace(sys, max_contacts=16)
    dt = float(sys.timestep)
    decimation = 2
    engine_fps = 1.0 / (dt * decimation)  # engine ticks once per control step
    cfg = G.make_cfg(gait=args.gait, engine_fps=engine_fps)

    N = args.envs
    phys = jax.vmap(lambda _: pipeline.make_state(sys))(jnp.arange(N))
    es = jax.vmap(lambda _: G.init_state(cfg))(jnp.arange(N))

    kp = 12.0
    rate_limit = 0.08  # action-rate limit (custom_play.py:72-74)

    @jax.jit
    def step(phys, es, limited, t):
        def one(ph, e, lim):
            e, angles = G.update(
                cfg, e, t, jnp.float32(args.lin), jnp.float32(args.ang),
                jnp.int32(G.CMD_AWAKE), jnp.int32(G.MODE_WALK),
            )
            lim = lim + jnp.clip(angles - lim, -rate_limit, rate_limit)
            ctrl = (lim - ph.qpos[7:]) * kp
            ph = pipeline.step(sys, ph, ctrl, decimation)
            return ph, e, lim
        return jax.vmap(one)(phys, es, limited)

    limited = jnp.zeros((N, 18), jnp.float32)
    traj = []
    t = 0.0
    t_wall = time.time()
    for k in range(args.steps):
        t += dt * decimation
        phys, es, limited = step(phys, es, limited, jnp.float32(t))
        traj.append(
            (t, np.asarray(phys.qpos[0]).astype(np.float64),
             np.asarray(phys.qvel[0]).astype(np.float64), np.zeros(0))
        )
        if (k + 1) % 100 == 0:
            fps = (k + 1) / (time.time() - t_wall)
            forces = np.asarray(phys.sensordata[0])
            print(f"step {k+1}: {fps:.1f} ctrl-steps/s  base z "
                  f"{float(phys.qpos[0][2]):.3f}  feet forces "
                  f"{forces[6:12].round(2)}")

    print(f"final base pos {np.asarray(phys.qpos[0][:3]).round(3)}")
    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(traj, f)
        print(f"saved {args.out}")
    if args.view:
        from nightmare_rl_tpu.tools.play import replay_in_viewer

        replay_in_viewer(traj)


if __name__ == "__main__":
    main()
