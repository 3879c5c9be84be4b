"""physics.kinematics parity vs mj_kinematics / mj_comPos / mj_comVel."""

import mujoco as mj
import numpy as np
import jax.numpy as jnp
import pytest

from nightmare_rl_tpu.physics import loader, kinematics

XML = "/root/reference/models/nightmare_v3/mjmodel.xml"


@pytest.fixture(scope="module")
def mjc():
    m = mj.MjModel.from_xml_path(XML)
    return m, mj.MjData(m)


@pytest.fixture(scope="module")
def sys(mjc):
    return loader.system_from_mjmodel(mjc[0])


def random_state(m, rng):
    qpos = m.qpos0.copy()
    qpos[:3] += rng.normal(size=3) * 0.2
    q = rng.normal(size=4)
    qpos[3:7] = q / np.linalg.norm(q)
    qpos[7:] = rng.normal(size=m.nq - 7) * 0.8
    qvel = rng.normal(size=m.nv) * 1.5
    return qpos, qvel


def test_fk_matches_mujoco(mjc, sys):
    m, d = mjc
    rng = np.random.default_rng(1)
    for _ in range(5):
        qpos, qvel = random_state(m, rng)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mj.mj_forward(m, d)
        kin = kinematics.kinematics(sys, jnp.array(qpos))
        np.testing.assert_allclose(np.asarray(kin.xpos), d.xpos, atol=1e-10)
        np.testing.assert_allclose(np.asarray(kin.xipos), d.xipos, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(kin.ximat).reshape(-1, 9), d.ximat, atol=1e-9
        )
        # quats up to sign
        ours = np.asarray(kin.xquat)
        sign = np.sign(np.sum(ours * d.xquat, axis=-1, keepdims=True))
        np.testing.assert_allclose(ours * sign, d.xquat, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(kin.subtree_com), d.subtree_com, atol=1e-10
        )
        np.testing.assert_allclose(np.asarray(kin.xanchor), d.xanchor, atol=1e-10)
        np.testing.assert_allclose(np.asarray(kin.xaxis), d.xaxis, atol=1e-10)


def test_cdof_matches_mujoco(mjc, sys):
    m, d = mjc
    rng = np.random.default_rng(2)
    qpos, qvel = random_state(m, rng)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    mj.mj_forward(m, d)
    kin = kinematics.kinematics(sys, jnp.array(qpos))
    np.testing.assert_allclose(np.asarray(kin.cdof), d.cdof, atol=1e-9)


def test_cinert_matches_mujoco(mjc, sys):
    m, d = mjc
    rng = np.random.default_rng(3)
    qpos, qvel = random_state(m, rng)
    d.qpos[:] = qpos
    mj.mj_forward(m, d)
    kin = kinematics.kinematics(sys, jnp.array(qpos))
    ours = np.asarray(kin.cinert)
    # mjData.cinert packs (10,): [Ixx Iyy Izz Ixy Ixz Iyz, m*cx m*cy m*cz, m]
    for b in range(1, m.nbody):
        p = d.cinert[b]
        I = np.array(
            [
                [p[0], p[3], p[4]],
                [p[3], p[1], p[5]],
                [p[4], p[5], p[2]],
            ]
        )
        np.testing.assert_allclose(ours[b, :3, :3], I, atol=1e-9)
        np.testing.assert_allclose(
            ours[b, 3:, 3:], p[9] * np.eye(3), atol=1e-10
        )
        # off-diagonal block = skew(m*c)
        mc = p[6:9]
        skew = np.array(
            [[0, -mc[2], mc[1]], [mc[2], 0, -mc[0]], [-mc[1], mc[0], 0]]
        )
        np.testing.assert_allclose(ours[b, :3, 3:], skew, atol=1e-10)


def test_cvel_cdofdot_match_mujoco(mjc, sys):
    m, d = mjc
    rng = np.random.default_rng(4)
    for _ in range(3):
        qpos, qvel = random_state(m, rng)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mj.mj_forward(m, d)
        kin = kinematics.kinematics(sys, jnp.array(qpos))
        vel = kinematics.com_vel(sys, kin, jnp.array(qvel))
        np.testing.assert_allclose(np.asarray(vel.cvel), d.cvel, atol=1e-9)
        np.testing.assert_allclose(np.asarray(vel.cdof_dot), d.cdof_dot, atol=1e-9)
