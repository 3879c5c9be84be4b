"""Empirical calibration probe: run our efc assembly + PGS against MuJoCo's
internals on identical states/contact sets, printing per-stage errors.

Not a test — a development tool to pin down solver semantics (warmstart
init, noslip update rule) by direct comparison.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import mujoco as mj
import numpy as np
import jax.numpy as jnp

from nightmare_rl_tpu.physics import loader, kinematics, collision, solver, dynamics

np.set_printoptions(precision=6, suppress=True, linewidth=200)

XML = "/root/reference/models/nightmare_v3/mjmodel.xml"
m = mj.MjModel.from_xml_path(XML)
d = mj.MjData(m)
sys0 = loader.system_from_mjmodel(m)

# settle to a contact-rich state
rng = np.random.default_rng(0)
for i in range(120):
    d.ctrl[:] = rng.normal(size=m.nu) * 2
    mj.mj_step(m, d)
qpos, qvel = d.qpos.copy(), d.qvel.copy()
warm = d.qacc_warmstart.copy()
mj.mj_forward(m, d)

ncon = d.ncon
print("ncon", ncon, "nefc", d.nefc)
J_ref = d.efc_J.reshape(d.nefc, m.nv)

# ---- rebuild our System with THEIR contact points (in body frames) ----
cp_body, cp_pos = [], []
for c in d.contact[:ncon]:
    b = int(m.geom_bodyid[c.geom2])
    R = d.xmat[b].reshape(3, 3)
    # their contact pos sits at mid-penetration (z = dist/2); the body vertex
    # generating it is at z = dist
    vertex = c.pos + np.array([0, 0, c.dist / 2])
    lp = R.T @ (vertex - d.xpos[b])
    cp_body.append(b)
    cp_pos.append(lp)
ncp = len(cp_body)
sysP = sys0.replace(
    cpoint_pos=jnp.array(cp_pos),
        cpoint_radius=jnp.zeros(ncp),
        cpair_a=np.zeros(0, np.int32),
        cpair_b=np.zeros(0, np.int32),
        cpair_friction=jnp.zeros(0),
        cpair_solref=jnp.zeros((0, 2)),
        cpair_solimp=jnp.zeros((0, 5)),
    cpoint_friction=jnp.full(ncp, float(d.contact[0].friction[0])),
    cpoint_solref=jnp.tile(jnp.array(d.contact[0].solref), (ncp, 1)),
    cpoint_solimp=jnp.tile(jnp.array(d.contact[0].solimp), (ncp, 1)),
    sensor_cpoint_matrix=jnp.zeros((sys0.nsensor, ncp)),
)
object.__setattr__  # noqa
sysP = sysP.replace()
import dataclasses
sysP = dataclasses.replace(
    sysP,
    ncp=ncp,
    cpoint_bodyid=tuple(cp_body),
    cpoint_sensor=tuple([-1] * ncp),
)

kin = kinematics.kinematics(sysP, jnp.array(qpos))
con = collision.find_contacts(sysP, kin)
print("dist ours vs theirs:")
print(np.asarray(con.dist))
print(np.array([c.dist for c in d.contact[:ncon]]))
print("contact frames (theirs):", d.contact[0].frame)

efc = solver.make_efc(sysP, con, jnp.array(qvel))
print("J err:", np.abs(np.asarray(efc.J) - J_ref).max())
print("aref err:", np.abs(np.asarray(efc.aref) - d.efc_aref).max())
print("R err:", np.abs(1.0 / np.asarray(efc.R) - d.efc_D).max() / np.abs(d.efc_D).max())

# ---- solver comparison using their state ----
M = np.zeros((m.nv, m.nv))
mj.mj_fullM(m, d, M)
Mj = dynamics.crb(sysP, kin)
print("M err:", np.abs(np.asarray(Mj) - M).max())
L = jnp.linalg.cholesky(Mj)
vel = kinematics.com_vel(sysP, kin, jnp.array(qvel))
bias = dynamics.rne_bias(sysP, kin, vel, jnp.array(qvel))
print("bias err:", np.abs(np.asarray(bias) - d.qfrc_bias).max())
act = dynamics.actuation(sysP, jnp.array(qpos), jnp.array(qvel), jnp.array(d.ctrl))
print("act err:", np.abs(np.asarray(act.qfrc_actuator) - d.qfrc_actuator).max())
qfrc_smooth = act.qfrc_actuator - bias
print("smooth err:", np.abs(np.asarray(qfrc_smooth) - d.qfrc_smooth).max())
qacc_smooth = jax.scipy.linalg.cho_solve((L, True), qfrc_smooth)
print("qacc_smooth err:", np.abs(np.asarray(qacc_smooth) - d.qacc_smooth).max())

sol = solver.solve(sysP, efc, L, qacc_smooth)
print("force ours:  ", np.asarray(sol.force)[:16])
print("force theirs:", d.efc_force[:16])
print("force err:", np.abs(np.asarray(sol.force) - d.efc_force).max(),
      "rel:", np.abs(np.asarray(sol.force) - d.efc_force).max() / max(1e-9, np.abs(d.efc_force).max()))
print("qacc err:", np.abs(np.asarray(sol.qacc) - d.qacc).max())
