"""Run a trained policy in the TPU env and (optionally) replay it in the
host-side MuJoCo viewer.

Equivalent of the reference's play.py (checkpoint load, obs assembly, action
law, camera-follow viewer, FPS meter — nightmare_rl play.py:62-172), but
TPU-native: the rollout runs batched/jitted on device; visualization happens
afterwards (or live at low rate) by streaming qpos into a passive
mujoco.viewer on the host, since TPU hosts have no GPU/GL stack in the hot
path.

    python -m nightmare_rl_tpu.tools.play --ckpt logs/nightmare_v3/<run>/model_1000 \
        [--view] [--vx 0.3] [--wz 0.0] [--steps 500]
"""

from __future__ import annotations

import argparse
import pickle


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, default=None,
                   help="orbax checkpoint dir (model_<iter>); random policy if unset")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--vx", type=float, default=0.3)
    p.add_argument("--wz", type=float, default=0.0)
    p.add_argument("--view", action="store_true",
                   help="replay in mujoco.viewer (needs a display)")
    p.add_argument("--live", action="store_true",
                   help="interactive viewer + keyboard teleop while the "
                        "policy runs (needs display; keys è/à = vx±, "
                        "ò/ù = wz± like the reference play.py:36-47)")
    p.add_argument("--out", type=str, default=None,
                   help="save the trajectory to this .pkl (replay format)")
    p.add_argument("--stochastic", action="store_true",
                   help="sample actions from the policy distribution like "
                        "the reference's play.py:122 does (its .act() "
                        "samples); default is the deterministic mean — a "
                        "stricter eval than the reference's own demo")
    p.add_argument("--grid", action="store_true",
                   help="batched command-envelope eval: one env per command "
                        "over {vx±0.3, wz±0.4, combined, zero}, vectorized "
                        "on device (the round-5 done-criterion table)")
    args = p.parse_args()

    if args.grid:
        grid_eval(args)
        return
    if args.live:
        live_teleop(args)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nightmare_rl_tpu.core.config import EnvCfg, NightmareV3Cfg, PPOCfg
    from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env
    from nightmare_rl_tpu.models.actor_critic import ActorCritic
    from nightmare_rl_tpu.utils import checkpoint as ckpt
    from nightmare_rl_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    cfg = NightmareV3Cfg().replace(env=EnvCfg(num_envs=1))
    env = NightmareV3Env(cfg)
    net = ActorCritic(num_actions=env.num_actions)
    obs0 = jnp.zeros((1, env.num_obs), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), obs0)
    if args.ckpt and args.ckpt.endswith(".pt"):
        # reference torch checkpoint (rsl_rl format, play.py:65-72)
        from nightmare_rl_tpu.utils.torch_io import load_pt

        params = load_pt(args.ckpt, params)
        print(f"loaded reference torch checkpoint {args.ckpt}")
    elif args.ckpt:
        from nightmare_rl_tpu.rl.ppo import PPO

        ppo = PPO(env, PPOCfg())
        ts = ppo.init(0)
        ts = ckpt.restore(args.ckpt, ts)
        params = ts.params
        print(f"loaded {args.ckpt}")

    state, obs = env.reset(0)
    # pin the command (teleop equivalent: fixed velocity command)
    cmd = jnp.tile(jnp.array([args.vx, 0.0, args.wz], jnp.float32), (1, 1))
    state = state.replace(commands=cmd)

    @jax.jit
    def policy_step(params, state, obs, key):
        mu, std, _ = net.apply(params, obs)
        if args.stochastic:
            mu = mu + std * jax.random.normal(key, mu.shape, mu.dtype)
        out = env._step_batch(state.replace(commands=cmd), mu)
        # body-frame velocities the tracking rewards see: obs[0:3] is
        # lin_vel * 2.0, obs[3:6] is ang_vel * 0.25 (obs scales,
        # reference nightmare_v3_config.py:67-72)
        vel = jnp.concatenate([out.obs[0, :3] / 2.0, out.obs[0, 3:6] / 0.25])
        # foot touch sensors (sensordata slots 6:12, mjmodel.xml:156-170)
        feet = out.state.phys.sensordata[0, 6:12]
        return (out.state, out.obs, out.reward, out.done[0], out.time_out[0],
                vel, feet)

    traj, vels, feet_f = [], [], []
    falls = timeouts = 0
    t = 0.0
    key = jax.random.PRNGKey(17)
    for k in range(args.steps):
        key, k_act = jax.random.split(key)
        state, obs, rew, done, time_out, vel, feet = policy_step(
            params, state, obs, k_act)
        traj.append(
            (t, np.asarray(state.phys.qpos[0]).astype(np.float64),
             np.asarray(state.phys.qvel[0]).astype(np.float64), np.zeros(0))
        )
        vels.append(np.asarray(vel))
        feet_f.append(np.asarray(feet))
        if bool(done):
            if bool(time_out):
                timeouts += 1
            else:
                falls += 1
        t += env.dt
    vels = np.stack(vels)
    # skip the first second (reset transient / getting into gait)
    settle = min(int(1.0 / env.dt), len(vels) // 2)
    vx_mean, wz_mean = vels[settle:, 0].mean(), vels[settle:, 5].mean()
    # the reward tracks the full ‖Δv_xy‖, so body-frame vy error is
    # first-class: report it plus the world-frame lateral drift and heading
    # drift the vx/wz numbers can hide (round-4 verdict: the det walk
    # drifted +0.86 m sideways unreported)
    vy_mean = vels[settle:, 1].mean()
    qpos_final = np.asarray(state.phys.qpos[0])
    w, x, y, z = qpos_final[3:7]
    yaw_final = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    print(f"rolled out {args.steps} steps ({args.steps * env.dt:.1f} s); "
          f"final base pos {qpos_final[:3].round(3)}")
    print(f"eval: cmd vx={args.vx:+.2f} wz={args.wz:+.2f} | achieved "
          f"vx={vx_mean:+.3f} vy={vy_mean:+.3f} wz={wz_mean:+.3f} "
          f"(mean after {settle} steps) | falls={falls} timeouts={timeouts}")
    print(f"drift: lateral y={qpos_final[1]:+.3f} m "
          f"(vy err {vy_mean:+.3f} m/s vs cmd 0) | "
          f"heading {np.degrees(yaw_final):+.1f} deg"
          + ("" if abs(args.wz) > 1e-6 else " (vs cmd 0)"))
    print_gait_metrics(
        np.stack(feet_f)[settle:],
        np.stack([q for (_, q, _, _) in traj])[settle:, 2], env.dt)

    if args.out:
        if args.out.endswith(".npz"):
            from nightmare_rl_tpu.tools.replay import save_npz

            save_npz(args.out, traj)
        else:  # reference-compatible pkl (open_custom_play.py reads it)
            with open(args.out, "wb") as f:
                pickle.dump(traj, f)
        print(f"saved trajectory to {args.out}")

    if args.view:
        replay_in_viewer(traj)


def grid_eval(args) -> None:
    """Command-envelope eval: one env per grid command, stepped in lockstep
    on device (a single vmapped rollout — TPU-native, ~as fast as one env).
    This is the teleop envelope the reference demos by hand
    (play.py:36-47 binds keys to vx AND ωz): the policy must track both.
    Prints achieved vx/vy/wz vs command, falls, and base height per row."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nightmare_rl_tpu.core.config import EnvCfg, NightmareV3Cfg, PPOCfg
    from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env
    from nightmare_rl_tpu.models.actor_critic import ActorCritic
    from nightmare_rl_tpu.utils import checkpoint as ckpt
    from nightmare_rl_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    grid = np.array([
        [+0.3, 0.0, 0.0],
        [-0.3, 0.0, 0.0],
        [0.0, 0.0, +0.4],
        [0.0, 0.0, -0.4],
        [+0.3, 0.0, +0.4],
        [+0.3, 0.0, -0.4],
        [0.0, 0.0, 0.0],
    ], np.float32)
    G = len(grid)
    env = NightmareV3Env(NightmareV3Cfg().replace(env=EnvCfg(num_envs=G)))
    net = ActorCritic(num_actions=env.num_actions)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((G, env.num_obs), jnp.float32))
    if args.ckpt and args.ckpt.endswith(".pt"):
        from nightmare_rl_tpu.utils.torch_io import load_pt

        params = load_pt(args.ckpt, params)
    elif args.ckpt:
        from nightmare_rl_tpu.rl.ppo import PPO

        ts = PPO(env, PPOCfg()).init(0)
        params = ckpt.restore(args.ckpt, ts).params
    print(f"grid eval: {args.ckpt or 'random policy'} | {G} commands x "
          f"{args.steps} steps ({args.steps * env.dt:.1f} s), "
          f"{'stochastic' if args.stochastic else 'deterministic mean'}")

    cmd = jnp.asarray(grid)
    state, obs = env.reset(0)
    state = state.replace(commands=cmd)

    @jax.jit
    def step(params, state, obs, key):
        mu, std, _ = net.apply(params, obs)
        if args.stochastic:
            mu = mu + std * jax.random.normal(key, mu.shape, mu.dtype)
        out = env._step_batch(state.replace(commands=cmd), mu)
        vel = jnp.concatenate(
            [out.obs[:, :3] / 2.0, out.obs[:, 3:6] / 0.25], axis=1)
        fall = out.done & ~out.time_out
        return out.state, out.obs, vel, fall, out.state.phys.qpos[:, 2]

    vels, falls, zs = [], np.zeros(G, int), []
    key = jax.random.PRNGKey(17)
    for _ in range(args.steps):
        key, k = jax.random.split(key)
        state, obs, vel, fall, z = step(params, state, obs, k)
        vels.append(np.asarray(vel))
        falls += np.asarray(fall).astype(int)
        zs.append(np.asarray(z))
    vels, zs = np.stack(vels), np.stack(zs)          # (T, G, 6), (T, G)
    settle = min(int(1.0 / env.dt), len(vels) // 2)
    v = vels[settle:]
    print(f"{'cmd vx':>7} {'wz':>6} | {'vx':>7} {'vy':>7} {'wz':>7} |"
          f" {'vx%':>5} {'wz%':>5} | {'falls':>5} {'base_z':>6}")
    for i, (cvx, _, cwz) in enumerate(grid):
        ax, ay, az = v[:, i, 0].mean(), v[:, i, 1].mean(), v[:, i, 5].mean()
        pvx = 100 * ax / cvx if abs(cvx) > 1e-6 else float("nan")
        pwz = 100 * az / cwz if abs(cwz) > 1e-6 else float("nan")
        print(f"{cvx:+7.2f} {cwz:+6.2f} | {ax:+7.3f} {ay:+7.3f} {az:+7.3f} |"
              f" {pvx:5.0f} {pwz:5.0f} | {falls[i]:5d}"
              f" {zs[settle:, i].mean():6.3f}")


def print_gait_metrics(feet_force, base_z, dt: float) -> None:
    """Gait-quality summary from foot touch forces + base height: a
    tracking-only eval cannot tell a gait from a crouching shuffle (the
    round-3 failure mode) — these numbers can.  Healthy engine-walk
    reference (tools/custom_play.py): duty ~0.5-0.8 per foot with regular
    swings, alternating tripods, base height ~0.09 m; a stander shows
    duty 1.0, zero swings, alternation ~0.

    feet_force: (T, 6) touch forces, base_z: (T,), both post-settle."""
    import numpy as np

    contact = feet_force > 1e-6                       # (T, 6)
    duty = contact.mean(axis=0)
    # swing (air-time) episodes per foot: runs of no-contact
    swing_counts, air_times = [], []
    for leg in range(contact.shape[1]):
        c = contact[:, leg]
        starts = np.flatnonzero(~c[1:] & c[:-1]) + 1  # contact -> air
        ends = np.flatnonzero(c[1:] & ~c[:-1]) + 1    # air -> contact
        swing_counts.append(len(starts))
        for s in starts:
            e = ends[ends > s]
            if len(e):
                air_times.append((e[0] - s) * dt)
    # tripod alternation: the gait engine's tripod groups are legs
    # (1,3,5) vs (2,4,6) (nikengine/engine.py:215, sensor order leg_1..6,
    # mjmodel.xml:163-168) — anticorrelated support = alternating gait,
    # 0 = static stance
    a = contact[:, [0, 2, 4]].mean(axis=1)
    b = contact[:, [1, 3, 5]].mean(axis=1)
    altern = float(np.mean(np.abs(a - b)))
    air = np.asarray(air_times) if air_times else np.zeros(1)
    print(
        "gait: duty=" + "/".join(f"{d:.2f}" for d in duty)
        + f" | swings/foot={np.mean(swing_counts):.1f}"
        + f" | air_time mean={air.mean():.3f}s p90={np.quantile(air, 0.9):.3f}s"
        + f" | feet_down mean={contact.sum(axis=1).mean():.2f}"
        + f" | tripod_alternation={altern:.2f}"
        + f" | base_z mean={base_z.mean():.3f} min={base_z.min():.3f}"
    )


def draw_command_arrow(viewer, qpos, cmd) -> None:
    """Draw the commanded-velocity arrow in the viewer's user scene, like the
    reference does during policy play (play.py:143-156): world-frame vector =
    base_quat · [vx, −ωz, 0], white arrow anchored 0.5 m above the base."""
    import mujoco as mj
    import numpy as np

    vec = np.array([cmd[0], -cmd[2], 0.0])
    mj.mju_rotVecQuat(vec, vec, np.asarray(qpos[3:7], np.float64))
    scn = viewer.user_scn
    scn.ngeom = 0
    if np.linalg.norm(vec) < 1e-6:
        return
    base = np.array([qpos[0], qpos[1], qpos[2] + 0.5])
    g = scn.geoms[0]
    mj.mjv_initGeom(
        g, type=mj.mjtGeom.mjGEOM_ARROW,
        size=np.array([0.02, 0.02, 1.0]),
        pos=np.zeros(3), mat=np.eye(3).flatten(),
        rgba=np.array([1.0, 1.0, 1.0, 1.0], np.float32),
    )
    mj.mjv_connector(g, mj.mjtGeom.mjGEOM_ARROW, 0.02, base, base + vec)
    scn.ngeom = 1


def live_teleop(args):
    """Interactive policy teleop: the policy steps our TPU physics while a
    passive mujoco.viewer mirrors env 0 by state injection and pynput keys
    adjust the velocity command (reference play.py:36-47,141-171)."""
    import time as _time

    import jax
    import jax.numpy as jnp
    import mujoco as mj
    import mujoco.viewer as mjv
    import numpy as np
    from pynput import keyboard

    from nightmare_rl_tpu.core.config import EnvCfg, NightmareV3Cfg, PPOCfg
    from nightmare_rl_tpu.envs.nightmare_v3 import NightmareV3Env
    from nightmare_rl_tpu.models.actor_critic import ActorCritic
    from nightmare_rl_tpu.utils import checkpoint as ckpt

    cfg = NightmareV3Cfg().replace(env=EnvCfg(num_envs=1))
    env = NightmareV3Env(cfg)
    net = ActorCritic(num_actions=env.num_actions)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, env.num_obs), jnp.float32))
    if args.ckpt:
        from nightmare_rl_tpu.rl.ppo import PPO

        ts = PPO(env, PPOCfg()).init(0)
        params = ckpt.restore(args.ckpt, ts).params

    cmd = np.array([0.0, 0.0, 0.0], np.float32)

    def on_press(key):
        try:
            c = key.char
        except AttributeError:
            return
        if c == "è":
            cmd[0] += 0.1
        elif c == "à":
            cmd[0] -= 0.1
        elif c == "ò":
            cmd[2] += 0.1
        elif c == "ù":
            cmd[2] -= 0.1

    keyboard.Listener(on_press=on_press).start()

    m = mj.MjModel.from_xml_path(
        "/root/reference/models/nightmare_v3/mjmodel.xml"
    )
    d = mj.MjData(m)

    @jax.jit
    def policy_step(params, state, obs, command):
        state = state.replace(commands=command[None])
        mu = net.apply(params, obs, method=ActorCritic.act_inference)
        out = env._step_batch(state, mu)
        return out.state, out.obs

    state, obs = env.reset(0)
    with mjv.launch_passive(m, d) as viewer:
        frames, t0 = 0, _time.time()
        while viewer.is_running():
            state, obs = policy_step(params, state, obs, jnp.array(cmd))
            d.qpos[:] = np.asarray(state.phys.qpos[0])
            d.qvel[:] = np.asarray(state.phys.qvel[0])
            mj.mj_forward(m, d)
            draw_command_arrow(viewer, d.qpos, cmd)
            viewer.cam.lookat = d.qpos[:3]
            viewer.sync()
            frames += 1
            if frames % 1000 == 0:
                print(f"fps {1000 / (_time.time() - t0):.1f} cmd {cmd}")
                t0 = _time.time()
            _time.sleep(max(0.0, env.dt - 0.001))


def replay_in_viewer(traj, xml="/root/reference/models/nightmare_v3/mjmodel.xml",
                     rate: float = 1.0):
    """Host-side visualization by state injection (open_custom_play.py:50-66)."""
    import time as _time

    import mujoco as mj
    import mujoco.viewer as mjv

    m = mj.MjModel.from_xml_path(xml)
    d = mj.MjData(m)
    with mjv.launch_passive(m, d) as viewer:
        t_prev = None
        for (t, qpos, qvel, _act) in traj:
            d.qpos[:] = qpos
            d.qvel[:] = qvel
            mj.mj_forward(m, d)
            viewer.sync()
            if t_prev is not None:
                _time.sleep(max(0.0, (t - t_prev) / rate))
            t_prev = t


if __name__ == "__main__":
    main()
