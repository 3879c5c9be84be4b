"""Gait engine parity vs the reference nikengine implementation (oracle).

Drives both engines through the same FSM journey (idle → get up → walk) with
identical commands and simulated clocks and compares the 18 joint angles.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/reference")

from nightmare_rl_tpu.engine import gait as G

nikengine = pytest.importorskip("nikengine.engine")


@pytest.fixture()
def ref_engine():
    nikengine.set_time_s(0.0)
    return nikengine.EngineNode()


def drive_both(ref, fps, script):
    """script: list of (num_ticks, lin, ang, state, mode)."""
    nikengine.config.ENGINE_FPS = fps  # reference default is 51
    cfg = G.make_cfg(engine_fps=fps)
    es = G.init_state(cfg)
    step = jax.jit(G.update)
    t = 0.0
    dt = 1.0 / fps
    ref_angles, our_angles = [], []
    for (ticks, lin, ang, state_s, mode_s) in script:
        cmd_state = G.CMD_AWAKE if state_s == "awake" else G.CMD_IDLE
        cmd_mode = G.MODE_WALK if mode_s == "walk" else G.MODE_STAND
        for _ in range(ticks):
            t += dt
            nikengine.set_time_s(t)
            ra = ref.update(lin, ang, state_s, mode_s)
            es, oa = step(cfg, es, jnp.float64(t), jnp.float64(lin),
                          jnp.float64(ang), jnp.int32(cmd_state),
                          jnp.int32(cmd_mode))
            ref_angles.append(np.asarray(ra))
            our_angles.append(np.asarray(oa))
    return np.array(ref_angles), np.array(our_angles)


def test_getup_and_stand(ref_engine):
    fps = 50.0
    ref, ours = drive_both(
        ref_engine, fps,
        [(5, 0.0, 0.0, "idle", "stand"),
         (200, 0.0, 0.0, "awake", "stand")],
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_walk_straight(ref_engine):
    fps = 50.0
    ref, ours = drive_both(
        ref_engine, fps,
        [(180, 0.0, 0.0, "awake", "stand"),     # get up fully
         (150, 0.08, 0.0, "awake", "walk")],    # walk forward
    )
    np.testing.assert_allclose(ours, ref, atol=5e-3)


def test_walk_turn(ref_engine):
    fps = 50.0
    ref, ours = drive_both(
        ref_engine, fps,
        [(180, 0.0, 0.0, "awake", "stand"),
         (120, 0.05, 0.25, "awake", "walk")],
    )
    np.testing.assert_allclose(ours, ref, atol=5e-3)
