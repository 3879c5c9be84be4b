"""Anymal-C policy evaluation: fixed-command rollout with gait stats.

The play.py CLI is hexapod-specific (66-obs layout, 6-foot gait metrics);
this is its quadruped counterpart for the anymal_c env.

    python scripts/eval_anymal.py --ckpt logs/anymal1000/<run>/model_N \
        [--vx 0.5] [--steps 400] [--stochastic]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--vx", type=float, default=0.5)
    p.add_argument("--vy", type=float, default=0.0)
    p.add_argument("--wz", type=float, default=0.0)
    p.add_argument("--stochastic", action="store_true")
    p.add_argument("--out", type=str, default=None, help="npz trajectory")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nightmare_rl_tpu.core.config import PPOCfg
    from nightmare_rl_tpu.envs.anymal_c import AnymalCCfg, AnymalCEnv
    from nightmare_rl_tpu.rl.ppo import PPO
    from nightmare_rl_tpu.utils import checkpoint as ckpt

    env = AnymalCEnv(AnymalCCfg(num_envs=1))
    ppo = PPO(env, PPOCfg())
    ts = ckpt.restore(args.ckpt, ppo.init(0))
    print(f"loaded {args.ckpt} (iteration {int(ts.iteration)})")
    params = ts.params

    state, obs = env.reset(0)
    cmd = jnp.tile(jnp.array([args.vx, args.vy, args.wz], jnp.float32), (1, 1))

    @jax.jit
    def step(params, state, obs, key):
        mu, std, _ = ppo.net.apply(params, obs)
        act = (mu + std * jax.random.normal(key, mu.shape, mu.dtype)
               if args.stochastic else mu)
        out = env._step_batch(state.replace(commands=cmd), act)
        return out.state, out.obs, out.done[0], out.time_out[0]

    key = jax.random.PRNGKey(11)
    falls = timeouts = 0
    base, feet = [], []
    traj = []
    t = 0.0
    for _ in range(args.steps):
        key, k = jax.random.split(key)
        state, obs, done, time_out = step(params, state, obs, k)
        qp = np.asarray(state.phys.qpos[0], np.float64)
        base.append((qp[:3], np.asarray(state.phys.qvel[0][:3])))
        feet.append(np.asarray(state.phys.sensordata[0]))
        traj.append((t, qp, np.asarray(state.phys.qvel[0], np.float64),
                     np.zeros(0)))
        if bool(done):
            falls += 0 if bool(time_out) else 1
            timeouts += 1 if bool(time_out) else 0
        t += env.dt
    pos = np.stack([b[0] for b in base])
    settle = min(int(1.0 / env.dt), len(pos) // 2)
    # achieved velocity from displacement (world frame ~ body frame while
    # heading stays near zero)
    v_avg = (pos[-1] - pos[settle]) / ((len(pos) - settle) * env.dt)
    contact = np.stack(feet) > 1e-6
    duty = contact.mean(axis=0)
    print(f"eval: cmd ({args.vx:+.2f},{args.vy:+.2f},{args.wz:+.2f}) | "
          f"displacement v ({v_avg[0]:+.3f},{v_avg[1]:+.3f}) m/s | "
          f"falls={falls} timeouts={timeouts}")
    print("gait: duty=" + "/".join(f"{d:.2f}" for d in duty)
          + f" | feet_down mean={contact.sum(axis=1).mean():.2f}"
          + f" | base_z mean={pos[settle:, 2].mean():.3f} "
          + f"min={pos[settle:, 2].min():.3f}")
    if args.out:
        from nightmare_rl_tpu.tools.replay import save_npz

        save_npz(args.out, traj)
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
