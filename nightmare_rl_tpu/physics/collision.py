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

import jax
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
    centers: jnp.ndarray  # (ncp, 3) world centers of the candidate spheres
    jac_rot: jnp.ndarray  # (ncp, nv, 3) rotational jacobian (world axes);
                          # consumed only by condim>3 facet rows — XLA DCEs
                          # it away for all-condim-3 models


class PairContacts(NamedTuple):
    """Top-K deepest body↔body sphere-pair contacts (self-collision)."""

    sel: jnp.ndarray     # (K,) selected pair indices
    a: jnp.ndarray       # (K,) cpoint index of side a
    b: jnp.ndarray       # (K,) cpoint index of side b
    dist: jnp.ndarray    # (K,)
    active: jnp.ndarray  # (K,) bool
    normal: jnp.ndarray  # (K, 3) from a to b (MuJoCo: geom1 -> geom2)
    t1: jnp.ndarray      # (K, 3)
    t2: jnp.ndarray      # (K, 3)
    jac: jnp.ndarray     # (K, nv, 3) relative point jacobian (b minus a)


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
    jac_rot = jnp.broadcast_to(ang, jac.shape) * mask
    return Contacts(pos, dist, active, jac * mask, center, jac_rot)


def find_pair_contacts(sys: S.System, kin: KinOut,
                       con: Contacts) -> PairContacts:
    """Sphere-sphere contacts between the top-K deepest candidate pairs
    (sys.cpair_*).  Contact frame: normal from a to b; tangents from a
    deterministic orthonormal construction (self-contacts are transient, so
    frame-choice parity with mju_makeFrame is not load-bearing)."""
    K = min(sys.max_pair_contacts, len(sys.cpair_a))
    pa = jnp.asarray(sys.cpair_a, dtype=jnp.int32)
    pb = jnp.asarray(sys.cpair_b, dtype=jnp.int32)
    r = jnp.asarray(sys.cpoint_radius)
    ca = con.centers[pa]
    cb = con.centers[pb]
    d_vec = cb - ca
    center_dist = jnp.linalg.norm(d_vec, axis=1)
    dist = center_dist - (r[pa] + r[pb])

    _, sel = jax.lax.top_k(-dist, K)
    a, b = pa[sel], pb[sel]
    n = d_vec[sel] / jnp.maximum(center_dist[sel], 1e-9)[:, None]
    dist_s = dist[sel]
    active = dist_s < 0.0

    # orthonormal tangents (branchless: cross with the axis least aligned)
    dtype = con.centers.dtype
    ref = jnp.where(
        (jnp.abs(n[:, 2:3]) < 0.9),
        jnp.array([0.0, 0.0, 1.0], dtype),
        jnp.array([1.0, 0.0, 0.0], dtype),
    )
    t1 = jnp.cross(ref, n)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)

    # contact point: midway between the sphere surfaces
    mid = 0.5 * (ca[sel] + r[a][:, None] * n + cb[sel] - r[b][:, None] * n)

    body_a = jnp.asarray(sys.cpoint_bodyid, dtype=jnp.int32)[a]
    body_b = jnp.asarray(sys.cpoint_bodyid, dtype=jnp.int32)[b]
    root = _body_root(sys)
    origin = kin.subtree_com[jnp.asarray(root, dtype=jnp.int32)[body_b]]
    rrel = mid[:, None, :] - origin[:, None, :]
    ang = kin.cdof[None, :, :3]
    lin = kin.cdof[None, :, 3:]
    jac_pt = lin + jnp.cross(ang, rrel)                # (K, nv, 3)
    dmask = jnp.asarray(sys.body_dof_mask)
    rel_mask = (dmask[body_b] - dmask[body_a])[..., None]
    return PairContacts(sel, a, b, dist_s, active, n, t1, t2,
                        jac_pt * rel_mask)
