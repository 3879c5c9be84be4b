"""Contact generation: body-attached candidate points vs the ground plane.

The TPU-native replacement for MuJoCo's mesh↔plane narrowphase: candidate
points are fixed body-frame support vertices extracted at model-compile time
(physics/loader.py), so detection is a fixed-shape batched transform — no
dynamic contact counts, no host sync.  Matches the contact set the reference
actually exercises (floor vs tibia meshes + base,
models/nightmare_v3/mjmodel.xml:32-47; the author's own accelerator variant
mjmodel_mjx.xml makes the same reduction).

Contact frame: normal n=(0,0,1), tangents t1=(0,1,0), t2=(-1,0,0) — exactly
MuJoCo's mju_makeFrame output for a +z plane normal (verified against
mjData.contact.frame).  The jacobian is evaluated at MuJoCo's contact point,
the mid-penetration point (z = dist/2), not at the body vertex.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from nightmare_rl_tpu.core import quat as Q
from nightmare_rl_tpu.physics import system as S
from nightmare_rl_tpu.physics.kinematics import KinOut, _body_root


class Contacts(NamedTuple):
    pos: jnp.ndarray     # (ncp, 3) world contact point
    dist: jnp.ndarray    # (ncp,) signed distance (negative = penetrating)
    active: jnp.ndarray  # (ncp,) bool
    jac: jnp.ndarray     # (ncp, nv, 3) translational jacobian at the contact
                         # point, last axis = world (x, y, z) components
                         # (kept dof-major to avoid minor-dim transposes,
                         # which are pathological on this TPU stack)


def find_contacts(sys: S.System, kin: KinOut) -> Contacts:
    body = jnp.asarray(sys.cpoint_bodyid, dtype=jnp.int32)
    root = _body_root(sys)
    origin = kin.subtree_com[
        jnp.asarray([root[b] for b in sys.cpoint_bodyid], dtype=jnp.int32)
    ]

    center = kin.xpos[body] + Q.rotate(sys.cpoint_pos, kin.xquat[body])  # (ncp,3)
    r = jnp.asarray(sys.cpoint_radius)
    dist = center[:, 2] - r
    active = dist < 0.0

    # MuJoCo places the contact at mid-penetration along the normal
    pos = center.at[:, 2].add(-r)
    mid = pos.at[:, 2].set(jnp.minimum(dist, 0.0) * 0.5)

    # point jacobian: Jp[:, d] = cdof_lin[d] + cdof_ang[d] × (p - com_origin),
    # masked to the dofs on the path to the owning body
    r = mid[:, None, :] - origin[:, None, :]           # (ncp, 1, 3)
    ang = kin.cdof[None, :, :3]                        # (1, nv, 3)
    lin = kin.cdof[None, :, 3:]                        # (1, nv, 3)
    jac = lin + jnp.cross(ang, r)                      # (ncp, nv, 3)
    mask = jnp.asarray(sys.body_dof_mask)[body][..., None]  # (ncp, nv, 1)
    return Contacts(pos, dist, active, jac * mask)
