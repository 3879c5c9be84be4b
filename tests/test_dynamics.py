"""CRB / RNE / actuation / smooth-dynamics parity vs MuJoCo."""

import mujoco as mj
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nightmare_rl_tpu.physics import loader, kinematics, dynamics

XML = "/root/reference/models/nightmare_v3/mjmodel.xml"


@pytest.fixture(scope="module")
def ctx():
    m = mj.MjModel.from_xml_path(XML)
    return m, mj.MjData(m), loader.system_from_mjmodel(m)


def random_state(m, rng):
    qpos = m.qpos0.copy()
    qpos[:3] += rng.normal(size=3) * 0.2
    q = rng.normal(size=4)
    qpos[3:7] = q / np.linalg.norm(q)
    qpos[7:] = rng.normal(size=m.nq - 7) * 0.8
    qvel = rng.normal(size=m.nv) * 1.5
    return qpos, qvel


def test_mass_matrix(ctx):
    m, d, sys = ctx
    rng = np.random.default_rng(10)
    for _ in range(3):
        qpos, qvel = random_state(m, rng)
        d.qpos[:], d.qvel[:] = qpos, qvel
        mj.mj_forward(m, d)
        M_ref = np.zeros((m.nv, m.nv))
        mj.mj_fullM(m, d, M_ref)
        kin = kinematics.kinematics(sys, jnp.array(qpos))
        M = dynamics.crb(sys, kin)
        np.testing.assert_allclose(np.asarray(M), M_ref, atol=1e-12)


def test_bias_force(ctx):
    m, d, sys = ctx
    rng = np.random.default_rng(11)
    for _ in range(3):
        qpos, qvel = random_state(m, rng)
        d.qpos[:], d.qvel[:] = qpos, qvel
        mj.mj_forward(m, d)
        kin = kinematics.kinematics(sys, jnp.array(qpos))
        vel = kinematics.com_vel(sys, kin, jnp.array(qvel))
        bias = dynamics.rne_bias(sys, kin, vel, jnp.array(qvel))
        np.testing.assert_allclose(np.asarray(bias), d.qfrc_bias, atol=1e-10)


def test_actuation_velocity_servo(ctx):
    m, d, sys = ctx
    rng = np.random.default_rng(12)
    qpos, qvel = random_state(m, rng)
    ctrl = rng.normal(size=m.nu) * 12.0  # beyond ctrlrange to test clamping
    d.qpos[:], d.qvel[:] = qpos, qvel
    d.ctrl[:] = ctrl
    mj.mj_forward(m, d)
    act = dynamics.actuation(sys, jnp.array(qpos), jnp.array(qvel), jnp.array(ctrl))
    np.testing.assert_allclose(
        np.asarray(act.qfrc_actuator), d.qfrc_actuator, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(act.actuator_force), d.actuator_force, atol=1e-12
    )


def test_qacc_smooth(ctx):
    m, d, sys = ctx
    rng = np.random.default_rng(13)
    qpos, qvel = random_state(m, rng)
    ctrl = rng.normal(size=m.nu) * 3.0
    d.qpos[:], d.qvel[:] = qpos, qvel
    d.ctrl[:] = ctrl
    mj.mj_forward(m, d)
    kin = kinematics.kinematics(sys, jnp.array(qpos))
    vel = kinematics.com_vel(sys, kin, jnp.array(qvel))
    M = dynamics.crb(sys, kin)
    L = jnp.linalg.cholesky(M)
    bias = dynamics.rne_bias(sys, kin, vel, jnp.array(qvel))
    act = dynamics.actuation(sys, jnp.array(qpos), jnp.array(qvel), jnp.array(ctrl))
    qfrc = act.qfrc_actuator + dynamics.passive(sys, jnp.array(qvel)) - bias
    qacc = jax.scipy.linalg.cho_solve((L, True), qfrc)
    np.testing.assert_allclose(np.asarray(qacc), d.qacc_smooth, atol=1e-8)
