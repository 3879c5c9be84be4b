"""Oracle probe: MuJoCo Newton-solver + elliptic-cone efc semantics.

Dumps the efc layout / aref / R / force structure MuJoCo produces on the
anymal_c model (cone=elliptic, impratio=100, solver=Newton — reference
models/anymal_c/anymal_c.xml:4) and the nightmare mjx model (solver=Newton,
pyramidal), to pin assembly semantics for physics/newton.py numerically.
"""
import numpy as np
import mujoco as mj

np.set_printoptions(precision=6, suppress=True, linewidth=200)

REF = "/root/reference/models"


def probe(path, drop=0.02, settle=0):
    m = mj.MjModel.from_xml_path(path)
    d = mj.MjData(m)
    mj.mj_resetData(m, d)
    d.qpos[2] -= drop  # push into the floor a bit
    for _ in range(settle):
        mj.mj_step(m, d)
    mj.mj_forward(m, d)
    print(f"== {path}")
    print(f" solver={m.opt.solver} cone={m.opt.cone} impratio={m.opt.impratio}"
          f" iters={m.opt.iterations} ls_iters={m.opt.ls_iterations}"
          f" tol={m.opt.tolerance} ls_tol={m.opt.ls_tolerance}")
    print(f" ncon={d.ncon} nefc={d.nefc}")
    print(" efc_type:", d.efc_type[: d.nefc])
    for i in range(min(d.ncon, 2)):
        c = d.contact[i]
        print(f" contact {i}: dim={c.dim} mu={c.mu:.6f} friction={c.friction}"
              f" dist={c.dist:.6f} solref={c.solref} solimp={c.solimp}")
        adr = c.efc_address
        nrow = c.dim if m.opt.cone == 1 else 2 * (c.dim - 1)
        print(f"  efc_address={adr} rows={nrow}")
        print("  efc_pos :", d.efc_pos[adr : adr + nrow])
        print("  efc_aref:", d.efc_aref[adr : adr + nrow])
        print("  efc_R   :", d.efc_R[adr : adr + nrow])
        print("  efc_D   :", d.efc_D[adr : adr + nrow])
        print("  efc_vel :", d.efc_vel[adr : adr + nrow])
        print("  efc_frc :", d.efc_force[adr : adr + nrow])
        print("  efc_margin:", d.efc_margin[adr : adr + nrow])
        # friction-row jacobians vs contact frame
        J = d.efc_J.reshape(d.nefc, m.nv)[adr : adr + nrow]
        print("  |J| rows:", np.linalg.norm(J, axis=1))
        print("  frame:", c.frame)
    # dof friction rows?
    nfr = int((d.efc_type[: d.nefc] == mj.mjtConstraint.mjCNSTR_FRICTION_DOF).sum())
    print(" n dof-friction rows:", nfr)
    if nfr:
        idx = np.nonzero(d.efc_type[: d.nefc] == mj.mjtConstraint.mjCNSTR_FRICTION_DOF)[0][:3]
        print("  fri aref:", d.efc_aref[idx], " R:", d.efc_R[idx],
              " frictionloss:", d.efc_frictionloss[idx], " force:", d.efc_force[idx])
    print(" qacc:", d.qacc[:9])
    print(" qfrc_constraint:", d.qfrc_constraint[:9])
    print(" solver_niter:", d.solver_niter[0])
    print()
    return m, d


probe(f"{REF}/anymal_c/scene.xml", drop=0.02)
probe(f"{REF}/anymal_c/scene.xml", drop=0.0, settle=100)
probe(f"{REF}/nightmare_v3/mjmodel_mjx.xml", drop=0.01)
