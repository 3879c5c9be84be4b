"""Golden-trajectory checks vs reference MuJoCo (BASELINE configs 1-2).

Config 1: single-env random-action rollout (the simple_test.py path), fixed
seed — our pipeline vs mj_step from identical initial state and controls.
Config 2: scripted-gait playback — both engines driven by the same nikengine
angle targets through the same control law.

Contact-rich trajectories diverge at the documented PGS-ordering transient
(PARITY.md), so the checks are tolerance windows over a bounded horizon plus
qualitative invariants (no explosion, same support pattern), with the
airborne phase held to float64 tightness by tests/test_solver.py already.
"""

import sys

import mujoco as mj
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nightmare_rl_tpu.physics import loader, pipeline

XML = "/root/reference/models/nightmare_v3/mjmodel.xml"

sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def ctx():
    m = mj.MjModel.from_xml_path(XML)
    return m, mj.MjData(m), loader.system_from_mjmodel(m)


def test_random_action_rollout_stays_close(ctx):
    """Config 1: 250 physics steps (2 s) of random velocity commands."""
    m, d, sysj = ctx
    rng = np.random.default_rng(42)
    ctrls = rng.uniform(-2, 2, size=(250, m.nu))

    mj.mj_resetData(m, d)
    st = pipeline.make_state(sysj)
    step = jax.jit(lambda s, c: pipeline.step(sysj, s, c, 1))

    max_base_err = 0.0
    for k in range(250):
        d.ctrl[:] = ctrls[k]
        mj.mj_step(m, d)
        st = step(st, jnp.array(ctrls[k]))
        base_err = float(np.linalg.norm(np.asarray(st.qpos[:3]) - d.qpos[:3]))
        max_base_err = max(max_base_err, base_err)
    # bounded divergence over 2 s of contact-rich random flailing
    assert max_base_err < 0.05, max_base_err
    # same qualitative end state: robot on the ground, upright-ish
    assert abs(float(st.qpos[2]) - d.qpos[2]) < 0.02
    assert np.isfinite(np.asarray(st.qpos)).all()


def test_scripted_gait_playback(ctx):
    """Config 2: nikengine walk driven through both engines (custom_play law:
    rate-limited targets, kp=12, decimation 2 — custom_play.py:69-76)."""
    m, d, sysj = ctx
    import nikengine.engine as ne

    dt = m.opt.timestep
    decim = 2
    ne.config.ENGINE_FPS = 1.0 / (dt * decim)
    ne.set_time_s(0.0)
    engine = ne.EngineNode()

    mj.mj_resetData(m, d)
    st = pipeline.make_state(sysj)
    step = jax.jit(lambda s, c: pipeline.step(sysj, s, c, decim))

    limited_ref = np.zeros(18)
    limited_our = np.zeros(18)
    t = 0.0
    errs = []
    for k in range(300):  # 0.96 s getup + walk onset
        t += dt * decim
        ne.set_time_s(t)
        state_s = "awake"
        mode_s = "walk" if k > 150 else "stand"
        angles = engine.update(0.06, 0.0, state_s, mode_s)

        limited_ref += np.clip(angles - limited_ref, -0.08, 0.08)
        d.ctrl[:] = (limited_ref - d.qpos[7:]) * 12.0
        mj.mj_step(m, d, decim)

        limited_our += np.clip(angles - limited_our, -0.08, 0.08)
        ctrl = (limited_our - np.asarray(st.qpos[7:])) * 12.0
        st = step(st, jnp.array(ctrl, dtype=st.qpos.dtype))
        errs.append(np.abs(np.asarray(st.qpos[7:]) - d.qpos[7:]).max())

    errs = np.array(errs)
    # joint tracking stays within a few degrees of the reference engine's
    assert errs.max() < 0.15, errs.max()
    # base height agrees
    assert abs(float(st.qpos[2]) - d.qpos[2]) < 0.03
