"""Static model description (System) and per-env dynamic state (State).

The System pytree is the TPU-native replacement for MuJoCo's MjModel
(reference loads it via ``mj.MjModel.from_xml_path`` —
nightmare_rl ``envs/nightmare_v3_env.py:37``).  It is produced host-side by
``physics.loader`` (which uses the installed mujoco package purely as an MJCF
*compiler front-end*) and then lives on device as a pytree of arrays; all
tree-topology metadata is static Python data so jit can unroll the kinematic
sweeps.

Collision geometry is reduced to a set of body-attached contact points tested
against the ground plane — the same reduction the reference author applied for
their accelerator experiment (``models/nightmare_v3/mjmodel_mjx.xml`` keeps
only tibia↔floor contacts).  Each point carries the solver parameters MuJoCo
would derive for the corresponding mesh↔plane pair and a static mapping to the
touch sensor it feeds.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import struct

# Joint types (subset of MuJoCo's mjtJoint we support)
FREE = 0
BALL = 1
SLIDE = 2
HINGE = 3

# Integrators
EULER = 0
IMPLICITFAST = 1

# Constraint solvers (mjtSolver values)
SOLVER_PGS = 0
SOLVER_CG = 1
SOLVER_NEWTON = 2

# Friction cones (mjtCone values)
PYRAMIDAL = 0
ELLIPTIC = 1


def _static(**kw):
    return struct.field(pytree_node=False, **kw)


@struct.dataclass
class System:
    # ---- sizes (static) ----
    nq: int = _static()
    nv: int = _static()
    nu: int = _static()
    nbody: int = _static()
    njnt: int = _static()
    nsite: int = _static()
    nsensor: int = _static()
    ncp: int = _static()  # number of candidate contact points

    # ---- tree topology (static tuples, index-aligned with MuJoCo) ----
    body_parent: Tuple[int, ...] = _static()        # (nbody,)
    body_jntadr: Tuple[int, ...] = _static()        # first joint per body, -1 if none
    body_jntnum: Tuple[int, ...] = _static()
    jnt_type: Tuple[int, ...] = _static()           # (njnt,)
    jnt_bodyid: Tuple[int, ...] = _static()
    jnt_qposadr: Tuple[int, ...] = _static()
    jnt_dofadr: Tuple[int, ...] = _static()
    dof_bodyid: Tuple[int, ...] = _static()         # (nv,)
    actuator_trnid: Tuple[int, ...] = _static()     # joint id per actuator
    site_bodyid: Tuple[int, ...] = _static()
    cpoint_bodyid: Tuple[int, ...] = _static()      # (ncp,)
    cpoint_sensor: Tuple[int, ...] = _static()      # touch sensor idx fed by point, -1 none
    integrator: int = _static()
    solver_iterations: int = _static()
    noslip_iterations: int = _static()

    # ---- numeric constants (arrays, leaf nodes) ----
    body_pos: jnp.ndarray      # (nbody, 3) frame offset rel. parent
    body_quat: jnp.ndarray     # (nbody, 4)
    body_ipos: jnp.ndarray     # (nbody, 3) inertial frame rel. body
    body_iquat: jnp.ndarray    # (nbody, 4)
    body_mass: jnp.ndarray     # (nbody,)
    body_inertia: jnp.ndarray  # (nbody, 3) diagonal in inertial frame
    body_invweight: jnp.ndarray  # (nbody, 2) [trans, rot] at qpos0
    jnt_axis: jnp.ndarray      # (njnt, 3)
    jnt_pos: jnp.ndarray       # (njnt, 3)
    jnt_range: jnp.ndarray     # (njnt, 2)
    jnt_limited: jnp.ndarray   # (njnt,) bool
    jnt_solref: jnp.ndarray    # (njnt, 2) limit-constraint solref
    jnt_solimp: jnp.ndarray    # (njnt, 5)
    dof_solref: jnp.ndarray    # (nv, 2) dof-friction solref
    dof_solimp: jnp.ndarray    # (nv, 5)
    dof_damping: jnp.ndarray   # (nv,)
    dof_armature: jnp.ndarray  # (nv,)
    dof_frictionloss: jnp.ndarray  # (nv,)
    dof_invweight: jnp.ndarray  # (nv,)
    qpos0: jnp.ndarray         # (nq,)
    # actuators (MuJoCo "general" form: force = gain*ctrl + b0 + b1*len + b2*vel)
    actuator_gear: jnp.ndarray       # (nu,)
    actuator_gainprm: jnp.ndarray    # (nu,)
    actuator_biasprm: jnp.ndarray    # (nu, 3)
    actuator_ctrlrange: jnp.ndarray  # (nu, 2)
    actuator_ctrllimited: jnp.ndarray  # (nu,)
    actuator_forcerange: jnp.ndarray   # (nu, 2)
    actuator_forcelimited: jnp.ndarray  # (nu,)
    # sites
    site_pos: jnp.ndarray      # (nsite, 3)
    site_quat: jnp.ndarray     # (nsite, 4)
    # contact points (spheres of radius cpoint_radius; mesh support vertices
    # have radius 0)
    cpoint_pos: jnp.ndarray    # (ncp, 3) body frame
    cpoint_radius: jnp.ndarray  # (ncp,)
    cpoint_friction: jnp.ndarray  # (ncp,) tangential mu
    cpoint_solref: jnp.ndarray    # (ncp, 2)
    cpoint_solimp: jnp.ndarray    # (ncp, 5)
    # body-body candidate pairs (self-collision, e.g. tibia↔tibia — the
    # nightmare model's contype 2 / conaffinity 3 geoms collide with each
    # other, mjmodel.xml:47): indices into the cpoint arrays
    cpair_a: jnp.ndarray          # (npair,) int32
    cpair_b: jnp.ndarray          # (npair,) int32
    cpair_friction: jnp.ndarray   # (npair,)
    cpair_solref: jnp.ndarray     # (npair, 2)
    cpair_solimp: jnp.ndarray     # (npair, 5)
    # touch-sensor accumulation: sensordata = matrix @ contact_normal_forces.
    # Static membership is pose-independent because each contact point and the
    # sensor sites that contain it live on the same body (the reference
    # exploits the foot-site-inside-tibia-site nesting,
    # envs/nightmare_v3_env.py:230-232).
    sensor_cpoint_matrix: jnp.ndarray  # (nsensor, ncp)
    # options
    gravity: jnp.ndarray       # (3,)
    timestep: jnp.ndarray      # ()

    # ancestor masks, precomputed from topology (constants, not traced state)
    dof_ancestor_mask: jnp.ndarray  # (nv, nv) 1 where dof i on path of dof j (or equal)
    body_dof_mask: jnp.ndarray      # (nbody, nv) 1 where dof d on path root->body

    # top-K contact selection: only the K deepest candidate points enter the
    # solver each step (-1 = all).  MuJoCo instantiates only detected
    # contacts; this is the fixed-shape equivalent.  (Last: has a default.)
    max_contacts: int = _static(default=-1)
    # Euler integrator: implicit joint damping (mjDSBL_EULERDAMP clears it)
    eulerdamp: bool = _static(default=True)
    # top-K deepest body-body pair contacts entering the solver (0 = none)
    max_pair_contacts: int = _static(default=4)
    # contact dimensionality per candidate point (3 = sliding friction only,
    # 4 = +torsional, 6 = +rolling; anymal_c feet are condim 6,
    # models/anymal_c/anymal_c.xml:20).  () = all condim 3.
    cpoint_condim: Tuple[int, ...] = _static(default=())
    # <option impratio>: frictional-to-normal impedance ratio; divides the
    # pyramidal-row regularization (anymal_c scene.xml sets 100)
    impratio: float = _static(default=1.0)
    # torsional/rolling friction per point: (ncp, 3) = [tors, roll, roll];
    # None for archives predating condim support (treated as zeros)
    cpoint_friction_rot: Any = None
    # <option solver>: PGS=0 (nightmare train model), CG=1, Newton=2 (the
    # MuJoCo default — anymal_c and mjmodel_mjx.xml).  CG shares Newton's
    # convex objective and fixed point; we run Newton for both.
    solver_type: int = _static(default=SOLVER_PGS)
    # <option cone>: pyramidal=0 or elliptic=1 (anymal_c scene sets elliptic)
    cone: int = _static(default=PYRAMIDAL)
    # <option ls_iterations>: Newton exact-linesearch iteration cap.
    # Our line search is not MuJoCo's sequential one: the root is
    # ANALYTICALLY bracketed and located by a 12-candidate batched grid,
    # then polished by `ls_refine` guarded Newton/bisection steps
    # (newton.py::solve).  ls_iterations still upper-bounds the refinement
    # (effective budget = min(ls_iterations, ls_refine)); values above
    # ls_refine buy nothing because the bracketed root is already located
    # to grid resolution (convergence pinned across a sampled training
    # batch in tests/test_newton.py::test_anymal_refine_budget_converges).
    ls_iterations: int = _static(default=50)
    # Bracketed-grid refinement budget (TPU-native knob, not in MuJoCo)
    ls_refine: int = _static(default=8)

    @property
    def dtype(self):
        return self.qpos0.dtype


@struct.dataclass
class State:
    """Dynamic per-env state carried between physics steps."""

    qpos: jnp.ndarray            # (nq,)
    qvel: jnp.ndarray            # (nv,)
    qacc_warmstart: jnp.ndarray  # (nv,) solver warmstart, like mjData.qacc_warmstart
    # outputs of the last step (read by the env layer)
    sensordata: jnp.ndarray      # (nsensor,) touch sensor readings
    xpos: jnp.ndarray            # (nbody, 3)
    xquat: jnp.ndarray           # (nbody, 4)
    xipos: jnp.ndarray           # (nbody, 3)
    cvel: jnp.ndarray            # (nbody, 6) com-based body velocity [ang; lin]
    subtree_com: jnp.ndarray     # (nbody, 3)
    qfrc_actuator: jnp.ndarray   # (nv,)


def tree_cast(tree: Any, dtype) -> Any:
    """Cast all floating-point leaves of a pytree to dtype."""
    import jax

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)
