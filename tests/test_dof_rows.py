"""Joint-limit and dof-friction constraint rows: exactness vs a MuJoCo PGS
oracle on a minimal limited+frictional hinge model."""

import dataclasses

import mujoco as mj
import numpy as np
import jax.numpy as jnp
import pytest

from nightmare_rl_tpu.physics import loader, solver

XML = """
<mujoco>
  <option solver="PGS" iterations="10" timestep="0.005"/>
  <worldbody>
    <geom name="floor" type="plane" size="0 0 1" pos="0 0 -5"/>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" range="-0.5 0.5"
             limited="true" frictionloss="0.2" damping="0.1"/>
      <geom type="capsule" size="0.05" fromto="0 0 0 0.4 0 0" mass="1"
            contype="0" conaffinity="0"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.fixture(scope="module")
def ctx():
    m = mj.MjModel.from_xml_string(XML)
    return m, mj.MjData(m), loader.system_from_mjmodel(m)


def test_dof_rows_exact(ctx):
    m, d, sys = ctx
    d.qpos[0] = 0.55  # beyond the (radian-compiled) upper limit
    d.qvel[0] = 1.3
    mj.mj_forward(m, d)
    assert d.nefc == 2  # friction + one active limit

    efc = solver.make_dof_efc(sys, jnp.array(d.qpos), jnp.array(d.qvel))
    # our layout: [friction, limit-lo, limit-hi]; mujoco: [friction, limit-hi]
    J = np.asarray(efc.J)
    aref = np.asarray(efc.aref)
    R = np.asarray(efc.R)
    lo, hi = np.asarray(efc.lo), np.asarray(efc.hi)

    J_ref = d.efc_J.reshape(d.nefc, m.nv)
    # friction row
    np.testing.assert_allclose(J[0], J_ref[0], atol=1e-12)
    np.testing.assert_allclose(aref[0], d.efc_aref[0], rtol=1e-9)
    np.testing.assert_allclose(R[0], d.efc_R[0], rtol=1e-9)
    np.testing.assert_allclose([lo[0], hi[0]], [-0.2, 0.2], atol=1e-12)
    # lower-limit row inactive (bounds pinned to zero)
    assert hi[1] == 0.0
    # upper-limit row matches mujoco's single limit row
    np.testing.assert_allclose(J[2], J_ref[1], atol=1e-12)
    np.testing.assert_allclose(aref[2], d.efc_aref[1], rtol=1e-8)
    np.testing.assert_allclose(R[2], d.efc_R[1], rtol=1e-9)

    # solve and compare forces (no contacts in this model)
    M = np.zeros((m.nv, m.nv))
    mj.mj_fullM(m, d, M)
    L = jnp.linalg.cholesky(jnp.array(M))
    sol = solver.solve(
        dataclasses.replace(sys, solver_iterations=10, noslip_iterations=0),
        efc, L, jnp.array(d.qacc_smooth), ns_offset=efc.J.shape[0],
    )
    f = np.asarray(sol.force)
    np.testing.assert_allclose(f[0], d.efc_force[0], rtol=1e-6)
    np.testing.assert_allclose(f[2], d.efc_force[1], rtol=1e-3)
