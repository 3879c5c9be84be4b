"""Smooth dynamics: CRB mass matrix, RNE bias forces, actuation.

Re-derivation of MuJoCo's mj_crb / mj_rne / mj_fwdActuation /
mj_fwdAcceleration stages for the velocity-stage quantities the PPO env's
physics needs.  The mass matrix uses the composite-rigid-body algorithm over
the com-based quantities from ``kinematics``; the ancestor-mask formulation
turns the tree-structured accumulation into one dense einsum that batches
perfectly under vmap (the MXU-friendly layout, vs MuJoCo's sparse row sweeps).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nightmare_rl_tpu.core import spatial as sp
from nightmare_rl_tpu.physics import system as S
from nightmare_rl_tpu.physics.kinematics import KinOut, VelOut


def crb(sys: S.System, kin: KinOut) -> jnp.ndarray:
    """Dense joint-space mass matrix M (nv, nv)."""
    # composite inertias: bottom-up accumulation (static unroll)
    crb_inert = list(kin.cinert)
    for b in range(sys.nbody - 1, 0, -1):
        p = sys.body_parent[b]
        if p > 0:
            crb_inert[p] = crb_inert[p] + crb_inert[b]
    crb_arr = jnp.stack(crb_inert)  # (nbody, 6, 6)

    # F[d] = crb[body(d)] @ cdof[d]
    dof_body = jnp.array(sys.dof_bodyid)
    F = jnp.einsum("dij,dj->di", crb_arr[dof_body], kin.cdof)  # (nv, 6)
    # M[i, j] = cdof_i · F_j where i is an ancestor of j (or equal); the mask
    # (static 0/1) zeroes non-tree pairs, symmetry fills the rest.
    M = jnp.einsum("ik,jk->ij", kin.cdof, F)
    mask = sys.dof_ancestor_mask  # mask[i, j] = 1 iff dof i ancestor of dof j
    tri = M * mask  # keep cdof_i · crb[body_j]·cdof_j where i is the ancestor
    M = tri + tri.T - jnp.diag(jnp.diag(tri))
    # armature adds to the diagonal
    M = M + jnp.diag(sys.dof_armature)
    return M


def rne_bias(
    sys: S.System, kin: KinOut, vel: VelOut, qvel: jnp.ndarray
) -> jnp.ndarray:
    """qfrc_bias = C(q, v)·v + g(q)  (mj_rne with flg_acc=0)."""
    dtype = qvel.dtype
    # forward: com-based accelerations, seeded with -gravity
    cacc = [jnp.concatenate([jnp.zeros(3, dtype), -sys.gravity])]
    for b in range(1, sys.nbody):
        p = sys.body_parent[b]
        a = cacc[p]
        jadr, jnum = sys.body_jntadr[b], sys.body_jntnum[b]
        for j in range(jadr, jadr + jnum):
            d = sys.jnt_dofadr[j]
            n = 6 if sys.jnt_type[j] == S.FREE else 1
            for k in range(n):
                a = a + vel.cdof_dot[d + k] * qvel[d + k]
        cacc.append(a)
    cacc = jnp.stack(cacc)

    # body forces: f = I a + v ×f (I v)
    Iv = jnp.einsum("bij,bj->bi", kin.cinert, vel.cvel)
    cfrc = jnp.einsum("bij,bj->bi", kin.cinert, cacc) + sp.force_cross(
        vel.cvel, Iv
    )

    # backward accumulate to ancestors, project on cdof
    cfrc_l = list(cfrc)
    for b in range(sys.nbody - 1, 0, -1):
        p = sys.body_parent[b]
        if p > 0:
            cfrc_l[p] = cfrc_l[p] + cfrc_l[b]
    cfrc_tot = jnp.stack(cfrc_l)
    dof_body = jnp.array(sys.dof_bodyid)
    return jnp.einsum("di,di->d", kin.cdof, cfrc_tot[dof_body])


class ActOut(NamedTuple):
    qfrc_actuator: jnp.ndarray  # (nv,)
    actuator_force: jnp.ndarray  # (nu,)
    # d(actuator joint force)/d(qvel) diagonal contribution, for implicitfast
    vel_deriv: jnp.ndarray       # (nv,)


def actuation(
    sys: S.System, qpos: jnp.ndarray, qvel: jnp.ndarray, ctrl: jnp.ndarray
) -> ActOut:
    """MuJoCo "general" actuators on joint transmissions.

    force = gain·ctrl + b0 + b1·length + b2·velocity, clamped to forcerange;
    qfrc = gearᵀ·force.  Covers <velocity> (gain=kv, b2=-kv — the nightmare
    model, mjmodel.xml:136-153) and <position> (gain=kp, b1=-kp — anymal_c).
    """
    if sys.nu == 0:  # passive model
        z = jnp.zeros_like(qvel)
        return ActOut(z, jnp.zeros(0, qvel.dtype), z)
    trn_dof = jnp.array([sys.jnt_dofadr[j] for j in sys.actuator_trnid])
    trn_qadr = jnp.array([sys.jnt_qposadr[j] for j in sys.actuator_trnid])
    length = qpos[trn_qadr] * sys.actuator_gear
    velocity = qvel[trn_dof] * sys.actuator_gear

    c = jnp.where(
        sys.actuator_ctrllimited,
        jnp.clip(ctrl, sys.actuator_ctrlrange[:, 0], sys.actuator_ctrlrange[:, 1]),
        ctrl,
    )
    force = (
        sys.actuator_gainprm * c
        + sys.actuator_biasprm[:, 0]
        + sys.actuator_biasprm[:, 1] * length
        + sys.actuator_biasprm[:, 2] * velocity
    )
    force = jnp.where(
        sys.actuator_forcelimited,
        jnp.clip(force, sys.actuator_forcerange[:, 0], sys.actuator_forcerange[:, 1]),
        force,
    )
    qfrc = jnp.zeros_like(qvel).at[trn_dof].add(sys.actuator_gear * force)
    # ∂qfrc/∂qvel (diagonal): gear² · b2  (zero when force is clamped)
    dvel = jnp.zeros_like(qvel).at[trn_dof].add(
        sys.actuator_gear**2 * sys.actuator_biasprm[:, 2]
    )
    return ActOut(qfrc, force, dvel)


def passive(sys: S.System, qvel: jnp.ndarray) -> jnp.ndarray:
    """qfrc_passive: joint damping (springs/frictionloss handled elsewhere)."""
    return -sys.dof_damping * qvel
