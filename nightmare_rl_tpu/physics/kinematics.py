"""Forward kinematics and com-based quantities.

Re-derivation of the MuJoCo position/velocity stages the reference consumes
through ``data.qpos/xipos/cvel`` (nightmare_rl ``envs/nightmare_v3_env.py:216-226``):

- body frames (xpos/xquat) from joint transforms,
- inertial frames (xipos/ximat),
- subtree centers of mass,
- com-based spatial inertias (cinert), dof motion axes (cdof) and their
  velocity derivatives (cdof_dot), body velocities (cvel).

All spatial vectors are [angular; linear] in world axes, about the origin
``subtree_com[root]`` of each body's kinematic tree (MuJoCo's convention, so
``cvel`` is directly comparable to ``data.cvel``).

Everything is a pure function of (System, qpos[, qvel]); tree loops unroll at
trace time (nbody ≈ 20), so under vmap each op is a fused batched primitive.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from nightmare_rl_tpu.core import quat as Q
from nightmare_rl_tpu.core import spatial as sp
from nightmare_rl_tpu.physics import system as S


class KinOut(NamedTuple):
    xpos: jnp.ndarray        # (nbody, 3)
    xquat: jnp.ndarray       # (nbody, 4)
    xipos: jnp.ndarray       # (nbody, 3)
    ximat: jnp.ndarray       # (nbody, 3, 3)
    xanchor: jnp.ndarray     # (njnt, 3)
    xaxis: jnp.ndarray       # (njnt, 3)
    subtree_com: jnp.ndarray  # (nbody, 3)
    cinert: jnp.ndarray      # (nbody, 6, 6)
    cdof: jnp.ndarray        # (nv, 6)


def kinematics(sys: S.System, qpos: jnp.ndarray) -> KinOut:
    dtype = qpos.dtype
    xpos = [jnp.zeros(3, dtype)]
    xquat = [jnp.array([1.0, 0, 0, 0], dtype)]
    xanchor = [None] * sys.njnt
    xaxis = [None] * sys.njnt

    for b in range(1, sys.nbody):
        p = sys.body_parent[b]
        pos = xpos[p] + Q.rotate(sys.body_pos[b], xquat[p])
        qt = Q.mul(xquat[p], sys.body_quat[b])
        jadr, jnum = sys.body_jntadr[b], sys.body_jntnum[b]
        for j in range(jadr, jadr + jnum):
            jt = sys.jnt_type[j]
            if jt == S.FREE:
                qadr = sys.jnt_qposadr[j]
                pos = qpos[qadr : qadr + 3]
                qt = Q.normalize(qpos[qadr + 3 : qadr + 7])
                xanchor[j] = pos
                xaxis[j] = sys.jnt_axis[j]  # MuJoCo: free-joint axis unrotated
            elif jt == S.HINGE:
                qadr = sys.jnt_qposadr[j]
                anchor = pos + Q.rotate(sys.jnt_pos[j], qt)
                axis_w = Q.rotate(sys.jnt_axis[j], qt)
                dq = Q.from_axis_angle(sys.jnt_axis[j], qpos[qadr] )
                qt = Q.mul(qt, dq)
                pos = anchor - Q.rotate(sys.jnt_pos[j], qt)
                xanchor[j] = anchor
                xaxis[j] = axis_w
            elif jt == S.SLIDE:
                qadr = sys.jnt_qposadr[j]
                axis_w = Q.rotate(sys.jnt_axis[j], qt)
                pos = pos + axis_w * qpos[qadr]
                xanchor[j] = pos
                xaxis[j] = axis_w
            else:
                raise NotImplementedError(f"joint type {jt}")
        xpos.append(pos)
        xquat.append(qt)

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xanchor = jnp.stack([a if a is not None else jnp.zeros(3, dtype) for a in xanchor]) if sys.njnt else jnp.zeros((0, 3), dtype)
    xaxis = jnp.stack([a if a is not None else jnp.zeros(3, dtype) for a in xaxis]) if sys.njnt else jnp.zeros((0, 3), dtype)

    # inertial frames
    xipos = xpos + Q.rotate(sys.body_ipos, xquat)
    ximat = Q.to_mat(Q.mul(xquat, sys.body_iquat))

    # subtree com (bottom-up accumulation)
    mass = sys.body_mass
    sub_mass = list(mass)
    sub_mom = [mass[b] * xipos[b] for b in range(sys.nbody)]
    for b in range(sys.nbody - 1, 0, -1):
        p = sys.body_parent[b]
        sub_mass[p] = sub_mass[p] + sub_mass[b]
        sub_mom[p] = sub_mom[p] + sub_mom[b]
    subtree_com = jnp.stack(
        [sub_mom[b] / jnp.maximum(sub_mass[b], 1e-12) for b in range(sys.nbody)]
    )

    # root of each body's tree = first body under world on its path; for a
    # single-robot model this is body with parent 0.  Compute statically.
    root = _body_root(sys)
    com_origin = subtree_com[jnp.array(root)]  # (nbody, 3)

    # cinert: spatial inertia about com_origin, world axes
    inert_world = ximat @ (sys.body_inertia[..., None] * ximat.swapaxes(-1, -2))
    cinert = sp.inertia_matrix(mass, inert_world, xipos - com_origin)

    # cdof: per-dof motion axes about the dof's tree com origin
    cdof = []
    for j in range(sys.njnt):
        b = sys.jnt_bodyid[j]
        o = subtree_com[root[b]]
        jt = sys.jnt_type[j]
        if jt == S.FREE:
            eye = jnp.eye(3, dtype=dtype)
            for i in range(3):
                cdof.append(jnp.concatenate([jnp.zeros(3, dtype), eye[i]]))
            R = Q.to_mat(xquat[b])
            for i in range(3):
                ax = R[:, i]
                cdof.append(jnp.concatenate([ax, jnp.cross(ax, o - xpos[b])]))
        elif jt == S.HINGE:
            ax = xaxis[j]
            cdof.append(jnp.concatenate([ax, jnp.cross(ax, o - xanchor[j])]))
        elif jt == S.SLIDE:
            cdof.append(jnp.concatenate([jnp.zeros(3, dtype), xaxis[j]]))
    cdof = jnp.stack(cdof) if cdof else jnp.zeros((0, 6), dtype)

    return KinOut(xpos, xquat, xipos, ximat, xanchor, xaxis, subtree_com, cinert, cdof)


def _body_root(sys: S.System):
    """Static: root body (child of world) of each body's kinematic tree."""
    root = [0] * sys.nbody
    for b in range(1, sys.nbody):
        p = sys.body_parent[b]
        root[b] = b if p == 0 else root[p]
    return root


class VelOut(NamedTuple):
    cvel: jnp.ndarray      # (nbody, 6)
    cdof_dot: jnp.ndarray  # (nv, 6)


def com_vel(sys: S.System, kin: KinOut, qvel: jnp.ndarray) -> VelOut:
    """Body com-velocities and cdof time-derivatives (mj_comVel semantics)."""
    dtype = qvel.dtype
    cvel = [jnp.zeros(6, dtype)]
    cdof_dot = [jnp.zeros(6, dtype)] * sys.nv
    for b in range(1, sys.nbody):
        p = sys.body_parent[b]
        v = cvel[p]
        jadr, jnum = sys.body_jntadr[b], sys.body_jntnum[b]
        for j in range(jadr, jadr + jnum):
            jt = sys.jnt_type[j]
            d = sys.jnt_dofadr[j]
            if jt == S.FREE:
                # translation dofs: constant axes, cdof_dot = 0
                v = v + kin.cdof[d] * qvel[d] + kin.cdof[d + 1] * qvel[d + 1] + kin.cdof[d + 2] * qvel[d + 2]
                # rotation dofs: axes rotate with the body; MuJoCo computes
                # cdof_dot = v_translated × cdof with the velocity accumulated
                # so far (translation included)
                for k in range(3, 6):
                    cdof_dot[d + k] = sp.motion_cross(v, kin.cdof[d + k])
                v = v + kin.cdof[d + 3] * qvel[d + 3] + kin.cdof[d + 4] * qvel[d + 4] + kin.cdof[d + 5] * qvel[d + 5]
            else:
                ndof = 1
                for k in range(ndof):
                    cdof_dot[d + k] = sp.motion_cross(v, kin.cdof[d + k])
                    v = v + kin.cdof[d + k] * qvel[d + k]
        cvel.append(v)
    return VelOut(jnp.stack(cvel), jnp.stack(cdof_dot))
