"""Full-step parity probe: our pipeline.step vs mj_step.

Case A: airborne state (no contacts) — implicitfast integration must match to
float64 roundoff.
Case B: contact-rich state with MuJoCo's own contact points injected — bounded
by the known PGS ordering transient.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses

import mujoco as mj
import numpy as np
import jax.numpy as jnp

from nightmare_rl_tpu.physics import loader, pipeline

np.set_printoptions(precision=6, suppress=True, linewidth=200)

XML = "/root/reference/models/nightmare_v3/mjmodel.xml"
m = mj.MjModel.from_xml_path(XML)
d = mj.MjData(m)
sys0 = loader.system_from_mjmodel(m)


def run_case(name, qpos, qvel, ctrl, nstep, sysx):
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    d.ctrl[:] = ctrl
    for _ in range(nstep):
        mj.mj_step(m, d)
    st = pipeline.make_state(sysx).replace(
        qpos=jnp.array(qpos), qvel=jnp.array(qvel)
    )
    st = pipeline.step(sysx, st, jnp.array(ctrl), nstep)
    qe = np.abs(np.asarray(st.qpos) - d.qpos).max()
    ve = np.abs(np.asarray(st.qvel) - d.qvel).max()
    se = np.abs(np.asarray(st.sensordata) - d.sensordata).max()
    print(f"{name}: qpos err {qe:.3e}  qvel err {ve:.3e}  sensor err {se:.3e}")
    return st


# ---- case A: airborne ----
rng = np.random.default_rng(0)
qpos = m.qpos0.copy()
qpos[2] = 1.0  # high up, free fall
q = rng.normal(size=4)
qpos[3:7] = q / np.linalg.norm(q)
qpos[7:] = rng.normal(size=18) * 0.5
qvel = rng.normal(size=m.nv) * 1.0
ctrl = rng.normal(size=m.nu) * 2
run_case("airborne 1 step ", qpos, qvel, ctrl, 1, sys0)
run_case("airborne 5 steps", qpos, qvel, ctrl, 5, sys0)

# ---- case B: grounded, MuJoCo's contact points injected ----
mj.mj_resetData(m, d)
rng = np.random.default_rng(0)
for i in range(120):
    d.ctrl[:] = rng.normal(size=m.nu) * 2
    mj.mj_step(m, d)
qpos, qvel, ctrl = d.qpos.copy(), d.qvel.copy(), d.ctrl.copy()
mj.mj_forward(m, d)
cp_body, cp_pos = [], []
for c in d.contact[: d.ncon]:
    b = int(m.geom_bodyid[c.geom2])
    R = d.xmat[b].reshape(3, 3)
    vertex = c.pos + np.array([0, 0, c.dist / 2])
    cp_body.append(b)
    cp_pos.append(R.T @ (vertex - d.xpos[b]))
ncp = len(cp_body)
sysP = dataclasses.replace(
    sys0.replace(
        cpoint_pos=jnp.array(cp_pos),
        cpoint_radius=jnp.zeros(ncp),
        cpair_a=np.zeros(0, np.int32),
        cpair_b=np.zeros(0, np.int32),
        cpair_friction=jnp.zeros(0),
        cpair_solref=jnp.zeros((0, 2)),
        cpair_solimp=jnp.zeros((0, 5)),
        cpoint_friction=jnp.full(ncp, 1.0),
        cpoint_solref=jnp.tile(jnp.array([0.02, 1.0]), (ncp, 1)),
        cpoint_solimp=jnp.tile(jnp.array([0.9, 0.95, 0.001, 0.5, 2.0]), (ncp, 1)),
        sensor_cpoint_matrix=jnp.zeros((sys0.nsensor, ncp)),
    ),
    ncp=ncp,
    cpoint_bodyid=tuple(cp_body),
    cpoint_sensor=tuple([-1] * ncp),
)
d.qpos[:] = qpos
d.qvel[:] = qvel
run_case("grounded 1 step ", qpos, qvel, ctrl, 1, sysP)
d.qpos[:] = qpos
d.qvel[:] = qvel
run_case("grounded 2 steps", qpos, qvel, ctrl, 2, sysP)
