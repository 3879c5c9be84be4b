"""Row-by-row comparison of our assembled Newton system vs mjData on the
settled anymal_c, plus force-law evaluation at MuJoCo's converged qacc."""
import os, sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import mujoco as mj

sys.path.insert(0, "/root/repo")
from nightmare_rl_tpu.physics import collision, kinematics, loader, newton
from nightmare_rl_tpu.physics import solver
from tests.test_newton import _anymal, _dense_J

m, d = _anymal()
sysm = loader.system_from_mjmodel(m, max_points_per_geom={"*": 4})
kin = kinematics.kinematics(sysm, jnp.asarray(d.qpos))
con = collision.find_contacts(sysm, kin)
asm = solver.assemble(sysm, con, jnp.asarray(d.qpos), jnp.asarray(d.qvel))
nefc = asm.nefc

J_ours = np.asarray(nefc.J)
aref_ours = np.asarray(nefc.aref)
R_ours = np.asarray(nefc.R)
fl_ours = np.asarray(nefc.fl)
act_ours = np.asarray(nefc.quad_active)

J_ref = _dense_J(m, d)
print("nefc ours:", J_ours.shape[0], "ref:", d.nefc)
print("active rows ours:",
      int((act_ours | (fl_ours > 0)).sum()
          + sum(int(np.asarray(g.active).sum()) * g.dim for g in nefc.cones)))

# match rows: for each ref row, find our row with closest J
used = set()
perm = []
for i in range(d.nefc):
    dist = np.abs(J_ours - J_ref[i]).sum(axis=1)
    order = np.argsort(dist)
    k = next(int(o) for o in order if int(o) not in used)
    used.add(k)
    perm.append(k)
    if dist[k] > 1e-8:
        print(f"ref row {i} (type {d.efc_type[i]}): best J match {k} "
              f"dist {dist[k]:.2e}")
perm = np.array(perm)
print("J all matched:", np.abs(J_ours[perm] - J_ref).max())
print("aref err:", np.abs(aref_ours[perm] - d.efc_aref).max())
print("R err:", np.abs(R_ours[perm] - d.efc_R).max() / np.abs(d.efc_R).max())
fl_ref = np.where(d.efc_type == 1, d.efc_frictionloss, 0.0)
print("fl err:", np.abs(fl_ours[perm] - fl_ref).max())

# evaluate our force law at MuJoCo's converged solution
jar_ref = J_ours @ d.qacc - aref_ours
f_ours, _ = newton.forces(nefc, jnp.asarray(jar_ref))
f_ours = np.asarray(f_ours)
df = f_ours[perm] - d.efc_force
print("\nforce-law eval at ref qacc: max |f_ours - efc_force| =",
      np.abs(df).max())
for i in np.argsort(-np.abs(df))[:8]:
    print(f"  ref row {i} type {d.efc_type[i]} state {d.efc_state[i]}: "
          f"ours {f_ours[perm][i]:+.6e} ref {d.efc_force[i]:+.6e} "
          f"jar {jar_ref[perm][i]:+.6e} R {d.efc_R[i]:.3e}")

# gradient of our objective at ref solution
M_ = np.zeros((m.nv, m.nv))
mj.mj_fullM(m, M_, d.qM)
grad = M_ @ (d.qacc - d.qacc_smooth) - J_ours.T @ f_ours
print("\n|grad our objective at ref qacc| max:", np.abs(grad).max())
# and at our converged solution, MuJoCo's qfrc_constraint check
print("ref qfrc_constraint check:",
      np.abs(J_ref.T @ d.efc_force - d.qfrc_constraint).max())
