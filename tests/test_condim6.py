"""Condim-6 pyramidal contacts + impratio vs the MuJoCo oracle.

The anymal_c feet are condim-6 spheres (torsional + rolling friction,
reference models/anymal_c/anymal_c.xml:20) and the scene sets impratio=100.
The reference runs them under Newton/elliptic; PGS-exactness is defined
against MuJoCo's own PGS+pyramidal path, which these tests pin down:

- efc row assembly (J facets incl. rotational directions, aref, R with the
  2μ₀²(1+μ₀²)/impratio regularization) must match mjData.efc_* exactly;
- full stepping on a synthetic sphere model (exact primitive collision) must
  track mj_step.
"""

import os

import jax.numpy as jnp
import mujoco as mj
import numpy as np
import pytest

from nightmare_rl_tpu.physics import collision, kinematics, loader, pipeline
from nightmare_rl_tpu.physics import solver
from nightmare_rl_tpu.physics import system as S

ANYMAL_DIR = "/root/reference/models/anymal_c"


def _dense_J(m, d):
    if mj.mj_isSparse(m):
        J = np.zeros((d.nefc, m.nv))
        mj.mju_sparse2dense(J, d.efc_J, d.efc_J_rownnz, d.efc_J_rowadr,
                            d.efc_J_colind)
        return J
    return d.efc_J.reshape(d.nefc, m.nv)


def _settled_anymal():
    cwd = os.getcwd()
    os.chdir(ANYMAL_DIR)
    try:
        m = mj.MjModel.from_xml_path("scene.xml")
    finally:
        os.chdir(cwd)
    m.opt.solver = mj.mjtSolver.mjSOL_PGS
    m.opt.cone = mj.mjtCone.mjCONE_PYRAMIDAL
    m.opt.noslip_iterations = 0
    d = mj.MjData(m)
    for _ in range(200):
        mj.mj_step(m, d)
    mj.mj_forward(m, d)
    return m, d


pytestmark = pytest.mark.slow

def test_anymal_condim6_efc_rows_exact():
    m, d = _settled_anymal()
    sys = loader.system_from_mjmodel(m, max_points_per_geom={"*": 4})
    assert sys.impratio == 100.0
    condim = np.asarray(sys.cpoint_condim)
    c6 = np.nonzero(condim == 6)[0]
    assert len(c6) == 4  # the four feet

    kin = kinematics.kinematics(sys, jnp.asarray(d.qpos))
    con = collision.find_contacts(sys, kin)
    qvel = jnp.asarray(d.qvel)

    # build the condim-6 group rows exactly as solve_contacts does
    iw_full = jnp.asarray(sys.body_invweight)[
        jnp.asarray(sys.cpoint_bodyid, dtype=jnp.int32), 0
    ]
    mu = jnp.asarray(sys.cpoint_friction)[c6]
    mu_rot = jnp.asarray(sys.cpoint_friction_rot)[c6]
    Jn, fdirs, mus = solver._fdirs(
        con.jac[c6], con.jac_rot[c6], mu, mu_rot, 6
    )
    efc = solver._pyramid_rows(
        Jn, fdirs, mus, con.dist[c6], con.active[c6],
        jnp.asarray(sys.cpoint_solref)[c6], jnp.asarray(sys.cpoint_solimp)[c6],
        iw_full[c6], sys.impratio, qvel,
    )
    J_ours = np.asarray(efc.J).reshape(len(c6), 10, sys.nv)
    aref_ours = np.asarray(efc.aref).reshape(len(c6), 10)
    R_ours = np.asarray(efc.R).reshape(len(c6), 10)

    J_ref = _dense_J(m, d)
    assert d.ncon == 4 and all(d.contact[i].dim == 6 for i in range(d.ncon))
    matched = 0
    cp_body = np.asarray(sys.cpoint_bodyid)
    for i in range(d.ncon):
        c = d.contact[i]
        body = int(m.geom_bodyid[c.geom2])
        # match by body (one condim-6 point per foot body)
        js = [k for k in range(len(c6)) if cp_body[c6[k]] == body]
        assert len(js) == 1
        k = js[0]
        adr = c.efc_address
        np.testing.assert_allclose(
            J_ours[k], J_ref[adr : adr + 10], atol=1e-9,
            err_msg=f"J facets, contact {i}",
        )
        np.testing.assert_allclose(
            aref_ours[k], d.efc_aref[adr : adr + 10], atol=1e-9,
            err_msg=f"aref, contact {i}",
        )
        np.testing.assert_allclose(
            R_ours[k], d.efc_R[adr : adr + 10], rtol=1e-9,
            err_msg=f"R, contact {i}",
        )
        matched += 1
    assert matched == 4


_SPHERES_XML = """
<mujoco>
  <option solver="PGS" cone="pyramidal" impratio="7" timestep="0.002"
          iterations="100" noslip_iterations="0"/>
  <worldbody>
    <geom type="plane" size="5 5 .1"/>
    <body pos="0 0 0.045">
      <freejoint/>
      <geom type="sphere" size="0.05" friction="0.5 0.02 0.01" condim="3"
            priority="1" mass="1"/>
    </body>
    <body pos="1 0 0.045">
      <freejoint/>
      <geom type="sphere" size="0.05" friction="0.5 0.03 0.015" condim="6"
            priority="1" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_synthetic_condim6_stepping_matches_mujoco():
    """Full trajectory vs mj_step on a model whose collision set (spheres on
    a plane) our candidate-point scheme represents exactly; mixed condim and
    impratio=7 exercise the general pyramid path.  Spinning/rolling initial
    velocities make the rotational friction rows active."""
    m = mj.MjModel.from_xml_string(_SPHERES_XML)
    d = mj.MjData(m)
    # spin about z (torsional) + roll about y (rolling) + slide along x
    d.qvel[3:6] = [0.0, 4.0, 8.0]
    d.qvel[0] = 0.5
    d.qvel[9:12] = [0.0, 4.0, 8.0]
    d.qvel[6] = 0.5

    sys = loader.system_from_mjmodel(m)
    assert tuple(sys.cpoint_condim) == (3, 6)
    state = pipeline.make_state(sys)
    # NB jnp.array, not asarray: asarray zero-copies on CPU and would alias
    # the buffers mj_step mutates in place
    state = state.replace(qpos=jnp.array(d.qpos), qvel=jnp.array(d.qvel))

    ctrl = jnp.zeros(0)
    for step in range(50):
        mj.mj_step(m, d)
        state = pipeline.step(sys, state, ctrl, 1)
    np.testing.assert_allclose(
        np.asarray(state.qpos), d.qpos, atol=5e-5,
        err_msg="qpos after 50 steps",
    )
    np.testing.assert_allclose(
        np.asarray(state.qvel), d.qvel, atol=5e-4,
        err_msg="qvel after 50 steps",
    )
    # the spheres must actually be in contact for the test to mean anything
    assert d.ncon == 2
