"""MJCF → System compiler (host-side).

Uses the installed ``mujoco`` package purely as an MJCF *compiler front-end*
(mass/inertia from meshes with ``settotalmass``, joint/actuator/site tables,
``body_invweight0``), then derives the TPU-native collision representation:
body-attached candidate contact points extracted from the collision meshes'
support vertices, tested against the ground plane at runtime.

The compiled System can be saved to / loaded from an ``.npz`` archive so the
runtime has no mujoco dependency (``save_system`` / ``load_system``).

Reference behaviour being reproduced: ``mj.MjModel.from_xml_path`` +
per-env ``MjData`` in nightmare_rl ``envs/nightmare_v3_env.py:37-38``.
"""

from __future__ import annotations

import io
import json
import os
from typing import List, Sequence

import numpy as np

from nightmare_rl_tpu.physics import system as S

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")

# Support-point directions for mesh → contact-point reduction, in priority
# order (earlier directions are guaranteed to be kept): the ±z extremes first
# (resting contact), then cube corners, then the remaining axes.  Directions
# toward small touch-sensor sites (foot tips) are prepended per body so the
# sensor-relevant vertices always survive the cap.
_DIRS = np.array(
    [
        [0, 0, -1], [0, 0, 1],
        # bottom-biased corners: cover the corners of a flat underside
        [1, 1, -3], [1, -1, -3], [-1, 1, -3], [-1, -1, -3],
        # top-biased corners (robot upside down)
        [1, 1, 3], [1, -1, 3], [-1, 1, 3], [-1, -1, 3],
        # balanced corners and axes
        [1, 1, -1], [1, -1, -1], [-1, 1, -1], [-1, -1, -1],
        [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
    ],
    dtype=np.float64,
)
_DIRS /= np.linalg.norm(_DIRS, axis=1, keepdims=True)


def _quat_mat(q):
    import mujoco as mj

    m = np.zeros(9)
    mj.mju_quat2Mat(m, q)
    return m.reshape(3, 3)


def _mesh_support_points(m, geom_id: int, max_points: int) -> np.ndarray:
    """Pick support vertices of a mesh geom, in the owning body's frame.

    Priority: directions toward small (touch-sensor) sites on the same body
    first, then the ordered _DIRS set; unique picks kept up to max_points.
    """
    import mujoco as mj

    mesh_id = m.geom_dataid[geom_id]
    adr, num = m.mesh_vertadr[mesh_id], m.mesh_vertnum[mesh_id]
    verts = m.mesh_vert[adr : adr + num].astype(np.float64)
    # geom frame -> body frame
    R = _quat_mat(m.geom_quat[geom_id])
    verts = verts @ R.T + m.geom_pos[geom_id]
    centroid = verts.mean(0)

    dirs: List[np.ndarray] = []
    body = int(m.geom_bodyid[geom_id])
    for s in range(m.nsite):
        if int(m.site_bodyid[s]) != body:
            continue
        if m.site_type[s] == mj.mjtGeom.mjGEOM_SPHERE and m.site_size[s, 0] < 0.05:
            d = m.site_pos[s] - centroid
            n = np.linalg.norm(d)
            if n > 1e-9:
                dirs.append(d / n)
    dirs.extend(_DIRS)

    picks: List[np.ndarray] = []
    for d in dirs:
        v = verts[np.argmax(verts @ d)]
        if not any(np.linalg.norm(v - p) < 1e-6 for p in picks):
            picks.append(v)
        if len(picks) >= max_points:
            break
    return np.array(picks)


def _collides_with_plane(m, geom_id: int, plane_id: int) -> bool:
    c1, a1 = m.geom_contype[geom_id], m.geom_conaffinity[geom_id]
    c2, a2 = m.geom_contype[plane_id], m.geom_conaffinity[plane_id]
    return bool((c1 & a2) or (c2 & a1))


def system_from_mjcf(
    xml_path: str,
    max_points_per_geom=8,
    dtype=np.float64,
) -> S.System:
    """Compile an MJCF file into a System pytree.

    max_points_per_geom: int, or dict {geom_name: int} with optional '*' default.
    """
    import mujoco as mj

    m = mj.MjModel.from_xml_path(xml_path)
    return system_from_mjmodel(m, max_points_per_geom=max_points_per_geom, dtype=dtype)


def _max_points(spec, name: str) -> int:
    if isinstance(spec, dict):
        return int(spec.get(name, spec.get("*", 6)))
    return int(spec)


def system_from_mjmodel(m, max_points_per_geom=8, dtype=np.float64) -> S.System:
    import mujoco as mj

    # ---- find the ground plane ----
    plane_ids = [g for g in range(m.ngeom) if m.geom_type[g] == mj.mjtGeom.mjGEOM_PLANE]
    assert len(plane_ids) == 1, "expected exactly one ground plane"
    plane_id = plane_ids[0]

    # ---- candidate contact points from collision-enabled geoms ----
    cp_body: List[int] = []
    cp_pos: List[np.ndarray] = []
    cp_rad: List[float] = []
    cp_mu: List[float] = []
    cp_mu_rot: List[np.ndarray] = []
    cp_condim: List[int] = []
    cp_solref: List[np.ndarray] = []
    cp_solimp: List[np.ndarray] = []
    cp_geom: List[int] = []
    for g in range(m.ngeom):
        if g == plane_id or not _collides_with_plane(m, g, plane_id):
            continue
        body = int(m.geom_bodyid[g])
        radius = 0.0
        if m.geom_type[g] == mj.mjtGeom.mjGEOM_MESH:
            pts = _mesh_support_points(
                m, g, _max_points(max_points_per_geom, m.geom(g).name)
            )
        elif m.geom_type[g] == mj.mjtGeom.mjGEOM_SPHERE:
            pts = m.geom_pos[g][None]
            radius = float(m.geom_size[g, 0])
        elif m.geom_type[g] in (
            mj.mjtGeom.mjGEOM_CAPSULE, mj.mjtGeom.mjGEOM_CYLINDER
        ):
            # two spheres on the axis (local z), radius = cross-section.
            # Capsule: at the axis endpoints — the spheres ARE the end caps.
            # Cylinder: inscribed at ±(half−r) so the spheres stay inside
            # the solid (axial extent exactly ±half): at ±half they would
            # overhang the flat caps by r, producing phantom self-collision
            # contacts MuJoCo doesn't have (anymal_c LH_HIP↔RH_HIP).  The
            # inscribed pair is exact for cap-standing and side-lying plane
            # contact; only the cap rim of a tilted cylinder is undercovered.
            R = _quat_mat(m.geom_quat[g])
            radius = float(m.geom_size[g, 0])
            h = float(m.geom_size[g, 1])
            if m.geom_type[g] == mj.mjtGeom.mjGEOM_CYLINDER:
                h = max(h - radius, 0.0)
            half = h * R[:, 2]
            pts = np.stack([m.geom_pos[g] - half, m.geom_pos[g] + half])
        else:
            pts = m.geom_pos[g][None]
        # pair parameters with the plane: MuJoCo takes the higher-priority
        # geom's values outright, else mixes (mean for equal solmix, max
        # friction, max condim)
        if m.geom_priority[g] != m.geom_priority[plane_id]:
            src = g if m.geom_priority[g] > m.geom_priority[plane_id] else plane_id
            fric3 = m.geom_friction[src].copy()
            condim = int(m.geom_condim[src])
            solref = m.geom_solref[src].copy()
            solimp = m.geom_solimp[src].copy()
        else:
            fric3 = np.maximum(m.geom_friction[g], m.geom_friction[plane_id])
            condim = int(max(m.geom_condim[g], m.geom_condim[plane_id]))
            solref = (m.geom_solref[g] + m.geom_solref[plane_id]) / 2
            solimp = (m.geom_solimp[g] + m.geom_solimp[plane_id]) / 2
        for p in pts:
            cp_body.append(body)
            cp_pos.append(np.asarray(p, dtype=np.float64))
            cp_rad.append(radius)
            cp_mu.append(float(fric3[0]))
            cp_mu_rot.append(
                np.array([fric3[1], fric3[2], fric3[2]], dtype=np.float64)
            )
            cp_condim.append(condim)
            cp_solref.append(np.asarray(solref, dtype=np.float64))
            cp_solimp.append(np.asarray(solimp, dtype=np.float64))
            cp_geom.append(g)

    # order: by body id (matches MuJoCo's pair traversal order vs the plane)
    order = np.argsort(np.array(cp_body), kind="stable")
    cp_body = [cp_body[i] for i in order]
    cp_pos = [cp_pos[i] for i in order]
    cp_rad = [cp_rad[i] for i in order]
    cp_mu = [cp_mu[i] for i in order]
    cp_mu_rot = [cp_mu_rot[i] for i in order]
    cp_condim = [cp_condim[i] for i in order]
    cp_solref = [cp_solref[i] for i in order]
    cp_solimp = [cp_solimp[i] for i in order]
    cp_geom = [cp_geom[i] for i in order]
    ncp = len(cp_body)

    # ---- body-body candidate pairs (self-collision) ----
    excluded = {
        (int(sig) >> 16, int(sig) & 0xFFFF) for sig in m.exclude_signature
    }

    def _geoms_collide(g1, g2):
        if m.geom_bodyid[g1] == m.geom_bodyid[g2]:
            return False
        # parent-child body pairs are excluded by MuJoCo's default filter,
        # as are explicit <contact><exclude> body pairs
        b1, b2 = int(m.geom_bodyid[g1]), int(m.geom_bodyid[g2])
        if m.body_parentid[b1] == b2 or m.body_parentid[b2] == b1:
            return False
        if (b1, b2) in excluded or (b2, b1) in excluded:
            return False
        c1, a1 = m.geom_contype[g1], m.geom_conaffinity[g1]
        c2, a2 = m.geom_contype[g2], m.geom_conaffinity[g2]
        return bool((c1 & a2) or (c2 & a1))

    pair_a: List[int] = []
    pair_b: List[int] = []
    pair_mu: List[float] = []
    pair_solref: List[np.ndarray] = []
    pair_solimp: List[np.ndarray] = []
    for i in range(ncp):
        for j in range(i + 1, ncp):
            g1, g2 = cp_geom[i], cp_geom[j]
            if g1 == g2 or not _geoms_collide(g1, g2):
                continue
            pair_a.append(i)
            pair_b.append(j)
            pair_mu.append(max(cp_mu[i], cp_mu[j]))
            pair_solref.append((cp_solref[i] + cp_solref[j]) / 2)
            pair_solimp.append((cp_solimp[i] + cp_solimp[j]) / 2)
    npair = len(pair_a)

    # ---- touch sensor membership matrix ----
    touch_sensors = [
        i for i in range(m.nsensor) if m.sensor_type[i] == mj.mjtSensor.mjSENS_TOUCH
    ]
    nsensor = m.nsensor
    if not touch_sensors and ncp:
        # models without touch sensors (anymal_c): synthesize one per
        # plane-colliding sphere geom (the feet) so envs can read foot
        # contact forces uniformly through sensordata
        sphere_bodies = sorted(
            {
                int(m.geom_bodyid[g])
                for g in range(m.ngeom)
                if g != plane_id
                and m.geom_type[g] == mj.mjtGeom.mjGEOM_SPHERE
                and _collides_with_plane(m, g, plane_id)
            }
        )
        nsensor = len(sphere_bodies)
        sensor_matrix = np.zeros((nsensor, ncp))
        for si, b in enumerate(sphere_bodies):
            for k in range(ncp):
                if cp_body[k] == b and cp_rad[k] > 0:
                    sensor_matrix[si, k] = 1.0
    else:
        sensor_matrix = np.zeros((m.nsensor, ncp))
    for si in touch_sensors:
        site = int(m.sensor_objid[si])
        sbody = int(m.site_bodyid[site])
        ssize = m.site_size[site]
        spos = m.site_pos[site]
        stype = m.site_type[site]
        for k in range(ncp):
            if cp_body[k] != sbody:
                continue
            # site volume test in the shared body frame (pose-independent)
            if stype == mj.mjtGeom.mjGEOM_SPHERE:
                inside = np.linalg.norm(cp_pos[k] - spos) <= ssize[0]
            else:
                inside = np.all(np.abs(cp_pos[k] - spos) <= ssize[: 3])
            if inside:
                sensor_matrix[si, k] = 1.0

    # ---- integrator / solver options ----
    integ = {
        mj.mjtIntegrator.mjINT_EULER: S.EULER,
        mj.mjtIntegrator.mjINT_IMPLICITFAST: S.IMPLICITFAST,
        mj.mjtIntegrator.mjINT_IMPLICIT: S.IMPLICITFAST,
        mj.mjtIntegrator.mjINT_RK4: S.EULER,
    }[m.opt.integrator]

    f = lambda x: np.asarray(x, dtype=dtype)
    return S.System(
        nq=int(m.nq),
        nv=int(m.nv),
        nu=int(m.nu),
        nbody=int(m.nbody),
        njnt=int(m.njnt),
        nsite=int(m.nsite),
        nsensor=int(nsensor),
        ncp=ncp,
        body_parent=tuple(int(x) for x in m.body_parentid),
        body_jntadr=tuple(int(x) for x in m.body_jntadr),
        body_jntnum=tuple(int(x) for x in m.body_jntnum),
        jnt_type=tuple(_JNT_MAP[int(t)] for t in m.jnt_type),
        jnt_bodyid=tuple(int(x) for x in m.jnt_bodyid),
        jnt_qposadr=tuple(int(x) for x in m.jnt_qposadr),
        jnt_dofadr=tuple(int(x) for x in m.jnt_dofadr),
        dof_bodyid=tuple(int(x) for x in m.dof_bodyid),
        actuator_trnid=tuple(int(x) for x in m.actuator_trnid[:, 0]),
        site_bodyid=tuple(int(x) for x in m.site_bodyid),
        cpoint_bodyid=tuple(cp_body),
        cpoint_sensor=tuple(
            int(np.argmax(sensor_matrix[:, k])) if sensor_matrix[:, k].any() else -1
            for k in range(ncp)
        ),
        integrator=integ,
        solver_iterations=int(m.opt.iterations),
        noslip_iterations=int(m.opt.noslip_iterations),
        solver_type=int(m.opt.solver),
        cone=int(m.opt.cone),
        ls_iterations=int(m.opt.ls_iterations),
        eulerdamp=not bool(
            m.opt.disableflags & mj.mjtDisableBit.mjDSBL_EULERDAMP
        ),
        body_pos=f(m.body_pos),
        body_quat=f(m.body_quat),
        body_ipos=f(m.body_ipos),
        body_iquat=f(m.body_iquat),
        body_mass=f(m.body_mass),
        body_inertia=f(m.body_inertia),
        body_invweight=f(m.body_invweight0),
        jnt_axis=f(m.jnt_axis),
        jnt_pos=f(m.jnt_pos),
        jnt_range=f(m.jnt_range),
        jnt_limited=np.asarray(m.jnt_limited, dtype=bool),
        jnt_solref=f(m.jnt_solref),
        jnt_solimp=f(m.jnt_solimp),
        dof_solref=f(m.dof_solref),
        dof_solimp=f(m.dof_solimp),
        dof_damping=f(m.dof_damping),
        dof_armature=f(m.dof_armature),
        dof_frictionloss=f(m.dof_frictionloss),
        dof_invweight=f(m.dof_invweight0),
        qpos0=f(m.qpos0),
        actuator_gear=f(m.actuator_gear[:, 0]),
        actuator_gainprm=f(m.actuator_gainprm[:, 0]),
        actuator_biasprm=f(m.actuator_biasprm[:, :3]),
        actuator_ctrlrange=f(m.actuator_ctrlrange),
        actuator_ctrllimited=np.asarray(m.actuator_ctrllimited, dtype=bool),
        actuator_forcerange=f(m.actuator_forcerange),
        actuator_forcelimited=np.asarray(m.actuator_forcelimited, dtype=bool),
        site_pos=f(m.site_pos),
        site_quat=f(m.site_quat),
        cpoint_pos=f(np.array(cp_pos)) if ncp else f(np.zeros((0, 3))),
        cpoint_radius=f(np.array(cp_rad)),
        cpoint_friction=f(np.array(cp_mu)),
        cpoint_friction_rot=(
            f(np.array(cp_mu_rot)) if ncp else f(np.zeros((0, 3)))
        ),
        cpoint_condim=tuple(cp_condim),
        impratio=float(m.opt.impratio),
        cpoint_solref=f(np.array(cp_solref)),
        cpoint_solimp=f(np.array(cp_solimp)),
        cpair_a=np.asarray(pair_a, dtype=np.int32),
        cpair_b=np.asarray(pair_b, dtype=np.int32),
        cpair_friction=f(np.array(pair_mu) if npair else np.zeros(0)),
        cpair_solref=f(np.array(pair_solref) if npair else np.zeros((0, 2))),
        cpair_solimp=f(np.array(pair_solimp) if npair else np.zeros((0, 5))),
        sensor_cpoint_matrix=f(sensor_matrix),
        gravity=f(m.opt.gravity),
        timestep=f(m.opt.timestep),
        dof_ancestor_mask=_dof_ancestor_mask(m, dtype),
        body_dof_mask=_body_dof_mask(m, dtype),
    )


_JNT_MAP = {0: S.FREE, 1: S.BALL, 2: S.SLIDE, 3: S.HINGE}


def _body_dof_mask(m, dtype) -> np.ndarray:
    """mask[b, d] = 1 iff dof d is on the path world→body b."""
    mask = np.zeros((m.nbody, m.nv), dtype=dtype)
    for b in range(m.nbody):
        d = int(m.body_dofadr[b]) + int(m.body_dofnum[b]) - 1 if m.body_dofnum[b] else -1
        # walk up using dof_parentid chain from the body's last dof
        if m.body_dofnum[b] == 0:
            # inherit parent's mask later via tree walk
            pass
        while d >= 0:
            mask[b, d] = 1
            d = int(m.dof_parentid[d])
    # bodies without dofs inherit their parent's mask
    for b in range(1, m.nbody):
        if m.body_dofnum[b] == 0:
            mask[b] = mask[int(m.body_parentid[b])]
    return mask


def _dof_ancestor_mask(m, dtype) -> np.ndarray:
    """mask[i, j] = 1 iff dof i is an ancestor of (or equal to) dof j."""
    mask = np.zeros((m.nv, m.nv), dtype=dtype)
    for j in range(m.nv):
        i = j
        while i >= 0:
            mask[i, j] = 1
            i = int(m.dof_parentid[i])
    return mask


# ---------------------------------------------------------------------------
# serialization: System <-> npz (runtime needs no mujoco)
# ---------------------------------------------------------------------------

_STATIC_FIELDS = [
    "nq", "nv", "nu", "nbody", "njnt", "nsite", "nsensor", "ncp",
    "body_parent", "body_jntadr", "body_jntnum", "jnt_type", "jnt_bodyid",
    "jnt_qposadr", "jnt_dofadr", "dof_bodyid", "actuator_trnid",
    "site_bodyid", "cpoint_bodyid", "cpoint_sensor", "integrator",
    "solver_iterations", "noslip_iterations", "max_contacts", "eulerdamp",
    "cpoint_condim", "impratio", "solver_type", "cone", "ls_iterations",
    "ls_refine",
]


def save_system(sys: S.System, path: str) -> None:
    import dataclasses

    arrays = {}
    static = {}
    for fld in dataclasses.fields(sys):
        val = getattr(sys, fld.name)
        if fld.name in _STATIC_FIELDS:
            static[fld.name] = (
                val if isinstance(val, (int, float)) else list(val)
            )
        elif val is not None:
            arrays[fld.name] = np.asarray(val)
    arrays["__static__"] = np.frombuffer(
        json.dumps(static).encode(), dtype=np.uint8
    )
    with open(path, "wb") as fh:
        np.savez_compressed(fh, **arrays)


def load_system(path_or_name: str, dtype=None) -> S.System:
    """Load a compiled System from npz (by path or bundled asset name)."""
    path = path_or_name
    if not os.path.exists(path):
        path = os.path.join(_ASSET_DIR, path_or_name + ".npz")
    with open(path, "rb") as fh:
        data = np.load(io.BytesIO(fh.read()))
    static = json.loads(bytes(data["__static__"]).decode())
    kwargs = {}
    for k, v in static.items():
        kwargs[k] = v if isinstance(v, (int, float)) else tuple(v)
    for k in data.files:
        if k == "__static__":
            continue
        arr = data[k]
        if dtype is not None and np.issubdtype(arr.dtype, np.floating):
            arr = arr.astype(dtype)
        kwargs[k] = arr
    return S.System(**kwargs)
