"""Constraint assembly + PGS solver (+ noslip post-pass), MuJoCo semantics.

Replicates the PGS path selected by the nightmare model
(models/nightmare_v3/mjmodel.xml:3 — solver="PGS", iterations=3,
noslip_iterations=4) as a fixed-shape JAX program, generalized to the three
constraint families the supported robots need:

- dof friction rows (|f| ≤ frictionloss — anymal_c joints);
- joint limit rows (two one-sided rows per limited joint);
- pyramidal contact rows (condim 3 → 4 facets, J = Jn ± μ·Jt_i, f ≥ 0).

Row order matches MuJoCo: friction, limits, contacts.  Common machinery:
Baumgarte-style reference acceleration from solref/solimp
(aref = -B·(J·qvel) - K·imp·pos with K = imp/(dmax·tc·dr)², B = 2/(dmax·tc)),
regularization R = (1-imp)/imp · diagApprox (contacts: 2(1+μ²)·Σinvweight;
dof rows: dof_invweight0), and a projected Gauss-Seidel on the dual with
box bounds [lo, hi] per row, then the noslip pass on contact tangent pairs.

Contact formulas are verified numerically against mjData.efc_* on the
reference model (tests/test_solver.py).  Known deviation: MuJoCo's PGS
processes rows in an internal pseudo-random per-sweep order; we use fixed
ascending order (pre-convergence transient only — see PARITY.md).  Inactive
candidate rows stay in the system with bounds pinned to [0, 0], keeping
shapes static under jit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nightmare_rl_tpu.ops import linalg
from nightmare_rl_tpu.physics import newton
from nightmare_rl_tpu.physics import system as S
from nightmare_rl_tpu.physics.collision import Contacts


class Efc(NamedTuple):
    J: jnp.ndarray       # (nefc, nv) constraint jacobian
    aref: jnp.ndarray    # (nefc,)
    R: jnp.ndarray       # (nefc,) regularization
    lo: jnp.ndarray      # (nefc,) force lower bound (0 for inactive rows)
    hi: jnp.ndarray      # (nefc,) force upper bound (0 for inactive rows)


_MINIMP, _MAXIMP = 1e-4, 0.9999  # mjMINIMP/mjMAXIMP: MuJoCo clamps impedances


def impedance(solimp: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """MuJoCo's sigmoid impedance d(pos) from solimp = (d0,dmax,width,mid,pow)."""
    d0, dmax, width, mid, power = (
        solimp[..., 0], solimp[..., 1], solimp[..., 2], solimp[..., 3], solimp[..., 4]
    )
    d0 = jnp.clip(d0, _MINIMP, _MAXIMP)
    dmax = jnp.clip(dmax, _MINIMP, _MAXIMP)
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, 1e-12), 0.0, 1.0)
    y_lo = (x / jnp.maximum(mid, 1e-12)) ** (power - 1.0) * x
    y_hi = 1.0 - ((1.0 - x) / jnp.maximum(1.0 - mid, 1e-12)) ** (power - 1.0) * (
        1.0 - x
    )
    y = jnp.where(x < mid, y_lo, y_hi)
    return d0 + y * (dmax - d0)


def _kb(solref, solimp):
    """Stiffness/damping from solref (standard positive convention;
    direct negative convention = (-K, -B))."""
    tc, dr = solref[..., 0], solref[..., 1]
    dmax = jnp.clip(solimp[..., 1], _MINIMP, _MAXIMP)
    K = jnp.where(tc > 0, 1.0 / jnp.maximum(dmax * tc * dr, 1e-12) ** 2, -tc)
    B = jnp.where(tc > 0, 2.0 / jnp.maximum(dmax * tc, 1e-12), -dr)
    return K, B


def _contact_R(imp: jnp.ndarray, mu0: jnp.ndarray, iw, impratio) -> jnp.ndarray:
    """Pyramidal-row regularization, MuJoCo's diag-approximation:
    R = (1-imp)/imp · 2μ₀²(1+μ₀²)·(iw1+iw2)/impratio — identical for every
    facet of a contact regardless of condim (verified numerically against
    mjData.efc_R for condim 3 and 6, μ≠1, impratio≠1)."""
    R = (
        (1.0 - imp) / jnp.maximum(imp, 1e-12)
        * 2.0 * mu0**2 * (1.0 + mu0**2) * iw / impratio
    )
    return jnp.maximum(R, 1e-12)


def _pyramid_rows(
    Jn, fdirs, mus, dist, active, solref, solimp, iw, impratio, qvel
) -> Efc:
    """Pyramid facet rows for a uniform-condim contact group.

    fdirs: friction-direction jacobians [(n, nv)] in MuJoCo order
    (t1, t2[, rot_n, rot_t1, rot_t2]); mus: matching coefficients (n,).
    Facet layout per point: +d0, -d0, +d1, -d1, ... (matches mjData.efc_J
    row order for pyramidal cones)."""
    rows = []
    for mu_i, Ji in zip(mus, fdirs):
        m = mu_i[:, None]
        rows.append(Jn + m * Ji)
        rows.append(Jn - m * Ji)
    J = jnp.stack(rows, axis=1)                    # (n, nf, nv)
    n, nf, nv = J.shape

    imp = impedance(solimp, dist)
    K, B = _kb(solref, solimp)
    vel = jnp.einsum("cfn,n->cf", J, qvel)
    aref = -B[:, None] * vel - (K * imp * dist)[:, None]
    R = _contact_R(imp, mus[0], iw, impratio)

    act = jnp.repeat(active, nf)
    dtype = J.dtype
    return Efc(
        J.reshape(n * nf, nv),
        aref.reshape(n * nf),
        jnp.repeat(R, nf),
        jnp.zeros(n * nf, dtype),
        jnp.where(act, jnp.inf, 0.0).astype(dtype),
    )


def _fdirs(jac, jac_rot, mu, mu_rot, condim: int):
    """Friction directions/coefficients for the plane-contact frame
    (mju_makeFrame for n=+z: t1 = (0,1,0), t2 = (-1,0,0))."""
    Jn = jac[..., 2]
    fdirs = [jac[..., 1], -jac[..., 0]]
    mus = [mu, mu]
    if condim >= 4:
        fdirs.append(jac_rot[..., 2])
        mus.append(mu_rot[:, 0])
    if condim >= 6:
        fdirs += [jac_rot[..., 1], -jac_rot[..., 0]]
        mus += [mu_rot[:, 1], mu_rot[:, 2]]
    return Jn, fdirs, mus


def make_efc(sys: S.System, con: Contacts, qvel: jnp.ndarray, iw=None,
             condim: int = 3) -> Efc:
    """Assemble pyramidal contact rows for a uniform-condim contact set."""
    mu = jnp.asarray(sys.cpoint_friction)          # (ncp,)
    mu_rot = (
        jnp.asarray(sys.cpoint_friction_rot)
        if sys.cpoint_friction_rot is not None
        else jnp.zeros((con.jac.shape[0], 3), con.jac.dtype)
    )
    if iw is None:  # world side contributes 0 invweight
        iw = jnp.asarray(sys.body_invweight)[
            jnp.asarray(sys.cpoint_bodyid, dtype=jnp.int32), 0
        ]
    Jn, fdirs, mus = _fdirs(con.jac, con.jac_rot, mu, mu_rot, condim)
    return _pyramid_rows(
        Jn, fdirs, mus, con.dist, con.active, sys.cpoint_solref,
        sys.cpoint_solimp, iw, sys.impratio, qvel,
    )


def _elliptic_rows(
    Jn, fdirs, mus, dist, active, solref, solimp, iw, impratio, qvel
):
    """Elliptic-cone rows for a uniform-condim contact group: per contact
    [normal | t1 | t2 | (torsion) | (roll1 | roll2)] — one row per friction
    direction (no ± facets).  MuJoCo semantics verified numerically against
    mjData on anymal_c (scripts/probe_newton.py): friction rows carry
    aref = −B·vel (no position term), R₀ = (1−imp)/imp·Σinvweight on the
    normal row, Rᵢ = R₀·(μ₁/μᵢ)²/impratio on friction rows, and the solver
    cone coefficient is μ̄ = μ₁·√(R₁/R₀) = μ₁/√impratio (= contact.mu)."""
    J = jnp.stack([Jn] + list(fdirs), axis=1)       # (n, d, nv)
    n, d, nv = J.shape
    mus_arr = jnp.stack(list(mus), axis=1)           # (n, d-1)
    mu1 = mus[0]

    imp = impedance(solimp, dist)
    K, B = _kb(solref, solimp)
    vel = jnp.einsum("cfn,n->cf", J, qvel)
    aref = -B[:, None] * vel
    aref = aref.at[:, 0].add(-(K * imp * dist))
    R0 = jnp.maximum((1.0 - imp) / jnp.maximum(imp, 1e-12) * iw, 1e-12)
    Rf = R0[:, None] * (mu1[:, None] / mus_arr) ** 2 / impratio
    R = jnp.concatenate([R0[:, None], Rf], axis=1)
    mu_bar = mu1 / jnp.sqrt(jnp.asarray(impratio, J.dtype))

    efc = Efc(
        J.reshape(n * d, nv),
        aref.reshape(n * d),
        R.reshape(n * d),
        jnp.zeros(n * d, J.dtype),
        jnp.where(jnp.repeat(active, d), jnp.inf, 0.0).astype(J.dtype),
    )
    return efc, mu_bar, mus_arr


def make_pair_efc(sys: S.System, pc, qvel: jnp.ndarray, elliptic=False):
    """Rows for the selected body↔body sphere-pair contacts (condim 3):
    pyramid facets, or per-direction cone rows when ``elliptic``."""
    mu = jnp.asarray(sys.cpair_friction)[pc.sel]
    Jn = jnp.einsum("knd,kd->kn", pc.jac, pc.normal)
    Jt1 = jnp.einsum("knd,kd->kn", pc.jac, pc.t1)
    Jt2 = jnp.einsum("knd,kd->kn", pc.jac, pc.t2)
    solimp = jnp.asarray(sys.cpair_solimp)[pc.sel]
    solref = jnp.asarray(sys.cpair_solref)[pc.sel]
    iw_all = jnp.asarray(sys.body_invweight)[:, 0]
    bodyid = jnp.asarray(sys.cpoint_bodyid, dtype=jnp.int32)
    iw = iw_all[bodyid[pc.a]] + iw_all[bodyid[pc.b]]
    if elliptic:
        return _elliptic_rows(
            Jn, [Jt1, Jt2], [mu, mu], pc.dist, pc.active, solref, solimp,
            iw, sys.impratio, qvel,
        )
    m = mu[:, None]
    J = jnp.stack(
        [Jn + m * Jt1, Jn - m * Jt1, Jn + m * Jt2, Jn - m * Jt2], axis=1
    )
    imp = impedance(solimp, pc.dist)
    K, B = _kb(solref, solimp)
    vel = jnp.einsum("kfn,n->kf", J, qvel)
    aref = -B[:, None] * vel - (K * imp * pc.dist)[:, None]
    R = _contact_R(imp, mu, iw, sys.impratio)
    nefc = J.shape[0] * 4
    active = jnp.repeat(pc.active, 4)
    return Efc(
        J.reshape(nefc, sys.nv),
        aref.reshape(nefc),
        jnp.repeat(R, 4),
        jnp.zeros(nefc, J.dtype),
        jnp.where(active, jnp.inf, 0.0).astype(J.dtype),
    ), None, None


def make_dof_efc(sys: S.System, qpos: jnp.ndarray,
                 qvel: jnp.ndarray) -> Optional[Efc]:
    """Dof-friction and joint-limit rows (row order: friction, then limits —
    MuJoCo's efc layout).  Returns None when the model has neither."""
    dtype = qvel.dtype
    fl = np.asarray(sys.dof_frictionloss)
    fric_dofs = np.nonzero(fl > 0)[0]
    lim_jnts = [
        j for j in range(sys.njnt)
        if bool(np.asarray(sys.jnt_limited)[j]) and sys.jnt_type[j] == S.HINGE
    ]
    if len(fric_dofs) == 0 and len(lim_jnts) == 0:
        return None

    rows = []
    eye = jnp.eye(sys.nv, dtype=dtype)
    if len(fric_dofs) > 0:
        d = jnp.asarray(fric_dofs)
        J = eye[d]
        solref = jnp.asarray(sys.dof_solref)[d]
        solimp = jnp.asarray(sys.dof_solimp)[d]
        K, B = _kb(solref, solimp)
        imp = solimp[:, 0]  # impedance at pos = 0
        aref = -B * qvel[d]
        R = jnp.maximum(
            (1.0 - imp) / jnp.maximum(imp, 1e-12)
            * jnp.asarray(sys.dof_invweight)[d],
            1e-12,
        )
        flv = jnp.asarray(fl[fric_dofs], dtype=dtype)
        rows.append(Efc(J, aref, R, -flv, flv))

    if len(lim_jnts) > 0:
        dofs = np.array([sys.jnt_dofadr[j] for j in lim_jnts])
        qadr = np.array([sys.jnt_qposadr[j] for j in lim_jnts])
        rng = jnp.asarray(sys.jnt_range)[jnp.asarray(lim_jnts)]
        solref = jnp.asarray(sys.jnt_solref)[jnp.asarray(lim_jnts)]
        solimp = jnp.asarray(sys.jnt_solimp)[jnp.asarray(lim_jnts)]
        q = qpos[qadr]
        v = qvel[dofs]
        Jbase = eye[jnp.asarray(dofs)]
        # lower: dist = q - lo, J = +e; upper: dist = hi - q, J = -e
        for sign, dist in ((1.0, q - rng[:, 0]), (-1.0, rng[:, 1] - q)):
            imp = impedance(solimp, dist)
            K, B = _kb(solref, solimp)
            J = sign * Jbase
            aref = -B * (sign * v) - K * imp * jnp.minimum(dist, 0.0)
            R = jnp.maximum(
                (1.0 - imp) / jnp.maximum(imp, 1e-12)
                * jnp.asarray(sys.dof_invweight)[jnp.asarray(dofs)],
                1e-12,
            )
            active = dist < 0.0
            rows.append(
                Efc(J, aref, R, jnp.zeros_like(aref),
                    jnp.where(active, jnp.inf, 0.0).astype(dtype))
            )

    return Efc(*[jnp.concatenate([getattr(r, f) for r in rows])
                 for f in Efc._fields])


class LegMeta(NamedTuple):
    """Per-row slot assignment for the leg-block-sparse PGS core
    (ops/pgs.py::_scan_core_legs): every constraint row of an arrow-layout
    model touches at most two leg chains plus the base.  leg ids address the
    branch arrays; ``hasN`` masks zero a slot's panel values when the row does
    not involve it (a plane-contact row reuses leg1's id in slot 2, so the
    mask is what prevents double counting)."""

    leg1: jnp.ndarray  # (nefc,) int32 branch id of slot 1
    leg2: jnp.ndarray  # (nefc,) int32 branch id of slot 2
    has1: jnp.ndarray  # (nefc,) bool
    has2: jnp.ndarray  # (nefc,) bool


def _point_leg_map(sys: S.System, lay) -> np.ndarray:
    """Static candidate-point → branch map (-1: point on the base body, whose
    rows involve only the 6 base dofs)."""
    out = np.full(sys.ncp, -1, np.int32)
    for p in range(sys.ncp):
        b = int(np.asarray(sys.cpoint_bodyid)[p])
        while b > 0 and sys.body_jntnum[b] == 0:
            b = int(sys.body_parent[b])
        if b <= 0:
            continue
        d = int(sys.jnt_dofadr[sys.body_jntadr[b]])
        if d >= lay.nbase:
            out[p] = (d - lay.nbase) // lay.branch_size
    return out


def _dof_row_dofs(sys: S.System) -> np.ndarray:
    """Dof index per dof-constraint row, in make_dof_efc's exact row order
    (friction rows, then lower-limit rows, then upper-limit rows)."""
    fl = np.asarray(sys.dof_frictionloss)
    fric_dofs = np.nonzero(fl > 0)[0]
    lim_dofs = np.array([
        sys.jnt_dofadr[j] for j in range(sys.njnt)
        if bool(np.asarray(sys.jnt_limited)[j]) and sys.jnt_type[j] == S.HINGE
    ], dtype=np.int64)
    return np.concatenate([fric_dofs, lim_dofs, lim_dofs]).astype(np.int32)


def _leg_panels(lay, fac, J: jnp.ndarray, lm: LegMeta) -> jnp.ndarray:
    """Row panels of G = J L⁻ᵀ in [leg1 | leg2 | base] slot layout, from the
    block-arrow factor (physics/arrow.py).  With dofs ordered legs-first/
    base-last, L = [[blkdiag(Ld_b), 0], [W_bᵀ…, Ls]] is an exact no-fill
    Cholesky of M, so per row:

        G_legN = j_legN · Ld⁻ᵀ                   (s×s triangular solve)
        G_base = (j_base − Σ G_legN·W_legN)·Ls⁻ᵀ (6×6 triangular solve)

    Cost is O(nefc·(s² + s·nb + nb²)) — replacing the dense U = J M⁻¹
    precompute's O(nefc·nv²)."""
    from nightmare_rl_tpu.physics.arrow import _solve_tril

    s, nb = lay.branch_size, lay.nbase
    ar = jnp.arange(s)
    dt = J.dtype
    j1 = jnp.take_along_axis(
        J, nb + s * lm.leg1[:, None] + ar[None], axis=1
    ) * lm.has1[:, None].astype(dt)
    j2 = jnp.take_along_axis(
        J, nb + s * lm.leg2[:, None] + ar[None], axis=1
    ) * lm.has2[:, None].astype(dt)
    jb = J[:, :nb]
    g1 = _solve_tril(fac.Ld[lm.leg1], j1[..., None])[..., 0]
    g2 = _solve_tril(fac.Ld[lm.leg2], j2[..., None])[..., 0]
    rb = (jb
          - jnp.einsum("rs,rsk->rk", g1, fac.W[lm.leg1])
          - jnp.einsum("rs,rsk->rk", g2, fac.W[lm.leg2]))
    gb = _solve_tril(fac.Ls, rb.T).T
    return jnp.concatenate([g1, g2, gb], axis=1)


def prewarm(sys: S.System) -> str:
    """Run the PGS dispatch probe eagerly (ops/pgs.py::choose_mode times the
    candidate implementations on the real backend — that must happen OUTSIDE
    any jit trace).  Constraint-system shapes are derived without executing
    anything via jax.eval_shape.  Called from env __init__; returns the
    selected mode (informational)."""
    from nightmare_rl_tpu.ops import pgs
    from nightmare_rl_tpu.physics import arrow, collision, kinematics, pipeline

    if sys.solver_type in (S.SOLVER_CG, S.SOLVER_NEWTON):
        return "newton"
    lay = arrow.layout(sys)
    state = pipeline.make_state(sys)

    def shapes(qpos, qvel):
        kin = kinematics.kinematics(sys, qpos)
        con = collision.find_contacts(sys, kin)
        pair = (
            collision.find_pair_contacts(sys, kin, con)
            if sys.max_pair_contacts > 0 and len(sys.cpair_a) > 0 else None
        )
        return assemble(sys, con, qpos, qvel, pair=pair, lay=lay).efc.J

    Js = jax.eval_shape(shapes, state.qpos, jnp.zeros(sys.nv, sys.dtype))
    return pgs.choose_mode(
        legs_available=lay is not None,
        nefc=Js.shape[0], nv=Js.shape[1],
        iterations=sys.solver_iterations, noslip=sys.noslip_iterations,
        ns_offset=len(_dof_row_dofs(sys)),
        lay_shape=None if lay is None else (lay.nbranch, lay.branch_size,
                                            lay.nbase),
        dtype_name=str(jnp.dtype(sys.dtype)),
    )


class SolveOut(NamedTuple):
    force: jnp.ndarray            # (nefc,) constraint forces
    qfrc_constraint: jnp.ndarray  # (nv,)
    qacc: jnp.ndarray             # (nv,) constrained acceleration


def solve(
    sys: S.System,
    efc: Efc,
    M_chol: jnp.ndarray,
    qacc_smooth: jnp.ndarray,
    ns_offset: int = 0,
    Minv: Optional[jnp.ndarray] = None,
    lay=None,
    fac=None,
    legmeta: Optional[LegMeta] = None,
) -> SolveOut:
    """Dual box-PGS (zero start) with fixed sweeps, then noslip on the
    contact tangent pairs starting at row ns_offset.

    The iteration itself lives in ops/pgs.py: a lax.scan reference for
    unbatched callers that upgrades to the fused Pallas TPU kernel under vmap
    (one kernel launch for the whole env batch, all sweeps in VMEM).  The
    core is matrix-free — it consumes J and U = J M⁻¹ and never assembles
    the Delassus matrix A = J M⁻¹ Jᵀ, whose (nefc × nefc from nefc × nv)
    construction used to dominate the physics step's FLOPs.

    M⁻¹ is supplied by the caller from the block-arrow factorization
    (physics/arrow.py) when the topology allows; otherwise it comes from
    the unrolled triangular inverse (ops/linalg.py) — XLA's multi-rhs
    triangular solve lowers to sequential loops on TPU.  All contractions
    are formulated transpose-free (einsums on trailing dims): minor-dim
    transposes are pathological on this TPU stack."""
    from nightmare_rl_tpu.ops import pgs

    b = efc.J @ qacc_smooth - efc.aref
    mode = pgs.choose_mode(
        legs_available=(legmeta is not None and fac is not None),
        nefc=efc.J.shape[0], nv=efc.J.shape[1],
        iterations=sys.solver_iterations, noslip=sys.noslip_iterations,
        ns_offset=ns_offset,
        lay_shape=None if lay is None else (lay.nbranch, lay.branch_size,
                                            lay.nbase),
        dtype_name=str(efc.J.dtype),
    )
    if mode == "legs":
        Gp = _leg_panels(lay, fac, efc.J, legmeta)
        f = pgs._scan_core_legs(
            Gp, legmeta.leg1, legmeta.leg2, b, efc.R, efc.lo, efc.hi,
            lay.nbranch, lay.branch_size, lay.nbase,
            sys.solver_iterations, sys.noslip_iterations, ns_offset,
        )
        qfrc = jnp.einsum("kn,k->n", efc.J, f)
        from nightmare_rl_tpu.physics import arrow

        qacc = qacc_smooth + arrow.solve_vec(lay, fac, qfrc)
        return SolveOut(f, qfrc, qacc)

    if Minv is None:
        if fac is not None:
            from nightmare_rl_tpu.physics import arrow

            Minv = arrow.inv(lay, fac)
        else:
            Minv = linalg.spd_inv_from_chol(M_chol)
    U = efc.J @ Minv                                         # (nefc, nv)

    # thread the probed verdict into the vmap rule (its own choose_mode
    # re-query uses a different cache key the probe never fills — without
    # the hint a probed 'kernel' silently downgraded to 'scan')
    core = pgs.pgs_core(sys.solver_iterations, sys.noslip_iterations,
                        ns_offset,
                        mode_hint=mode if mode in ("scan", "kernel") else None)
    f = core(efc.J, U, b, efc.R, efc.lo, efc.hi)

    qfrc = jnp.einsum("kn,k->n", efc.J, f)
    qacc = qacc_smooth + Minv @ qfrc
    return SolveOut(f, qfrc, qacc)


class ContactSolveOut(NamedTuple):
    nforce: jnp.ndarray           # (ncp,) normal force per candidate point
    qfrc_constraint: jnp.ndarray  # (nv,)
    qacc: jnp.ndarray             # (nv,)


def _noslip_pairs(A, b, f, hi, ns_offset: int, sweeps: int):
    """MuJoCo noslip post-pass on consecutive ± facet pairs, starting from an
    arbitrary force f (used after Newton; the PGS path runs it fused inside
    ops/pgs.py with identical semantics)."""
    nefc = b.shape[0]
    diag = jnp.diagonal(A)
    npairs = (nefc - ns_offset) // 2
    if sweeps <= 0 or npairs <= 0:
        return f

    def ns_pair(p, f):
        i, j = ns_offset + 2 * p, ns_offset + 2 * p + 1
        s = f[i] + f[j]
        g = (A[i] - A[j]) @ f + b[i] - b[j]
        h = diag[i] + diag[j] - 2.0 * A[i, j]
        y = 0.5 * (f[i] - f[j]) - g / jnp.maximum(h, 1e-12)
        y = jnp.clip(y, -0.5 * s, 0.5 * s)
        ok = hi[i] > 0
        fi = jnp.where(ok, 0.5 * s + y, f[i])
        fj = jnp.where(ok, 0.5 * s - y, f[j])
        return f.at[i].set(fi).at[j].set(fj)

    def ns_sweep(_, f):
        return jax.lax.fori_loop(0, npairs, ns_pair, f)

    return jax.lax.fori_loop(0, sweeps, ns_sweep, f)


class Assembled(NamedTuple):
    """The fully assembled constraint system (see solve_contacts docstring
    for the row layout) plus the bookkeeping needed to scatter forces back
    to candidate contact points."""

    efc: Efc
    nefc: Optional["newton.NewtonEfc"]  # set for Newton/CG models
    ns_offset: int
    cparts: list           # (efc, point_idx, rows_per_point, condim, ...)
    pair_part: object
    legmeta: Optional[LegMeta] = None


def assemble(
    sys: S.System,
    con,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    pair=None,
    lay=None,
) -> Assembled:
    """Assemble every constraint row exactly as solve_contacts consumes it
    (exposed separately so tests/probes can inspect the system row-by-row
    against mjData.efc_*)."""
    condim = np.asarray(
        sys.cpoint_condim if len(sys.cpoint_condim) else (3,) * sys.ncp
    )
    assert condim.min() >= 3, "condim 1 contacts are not supported"
    iw_full = jnp.asarray(sys.body_invweight)[
        jnp.asarray(sys.cpoint_bodyid, dtype=jnp.int32), 0
    ]
    mu_full = jnp.asarray(sys.cpoint_friction)
    mu_rot_full = (
        jnp.asarray(sys.cpoint_friction_rot)
        if sys.cpoint_friction_rot is not None
        else jnp.zeros((sys.ncp, 3), con.jac.dtype)
    )
    solref_full = jnp.asarray(sys.cpoint_solref)
    solimp_full = jnp.asarray(sys.cpoint_solimp)

    use_newton = sys.solver_type in (S.SOLVER_CG, S.SOLVER_NEWTON)
    elliptic = use_newton and sys.cone == S.ELLIPTIC

    def group_rows(idx, d: int):
        """Constraint rows for the (dynamically- or statically-) selected
        points ``idx``, all of condim ``d``: pyramid facets, or (Newton +
        elliptic models) per-direction cone rows."""
        Jn, fdirs, mus = _fdirs(
            con.jac[idx], con.jac_rot[idx], mu_full[idx], mu_rot_full[idx], d
        )
        args = (
            Jn, fdirs, mus, con.dist[idx], con.active[idx], solref_full[idx],
            solimp_full[idx], iw_full[idx], sys.impratio, qvel,
        )
        if elliptic:
            return _elliptic_rows(*args)
        return _pyramid_rows(*args), None, None

    # ---- contact groups (static split by condim) ----
    c3 = np.nonzero(condim == 3)[0]
    higher = [
        (int(d), np.nonzero(condim == d)[0])
        for d in sorted(set(condim.tolist()))
        if d > 3
    ]
    K = sys.max_contacts
    # (efc, point_indices, rows_per_point, condim, mu_bar, mus) per group
    cparts = []
    if len(c3):
        if 0 < K < len(c3):
            c3j = jnp.asarray(c3)
            _, s = jax.lax.top_k(-con.dist[c3j], K)
            sel3 = c3j[s]
        else:
            sel3 = jnp.asarray(c3)
        rows, mu_bar, mus = group_rows(sel3, 3)
        cparts.append((rows, sel3, 3 if elliptic else 4, 3, mu_bar, mus))
    for d, idx in higher:
        idxj = jnp.asarray(idx)
        rows, mu_bar, mus = group_rows(idxj, d)
        nf = d if elliptic else 2 * (d - 1)
        cparts.append((rows, idxj, nf, d, mu_bar, mus))

    parts = [p[0] for p in cparts]
    pair_part = None
    if pair is not None:
        pair_part = make_pair_efc(sys, pair, qvel, elliptic=elliptic)
        parts.append(pair_part[0])

    efc_d = make_dof_efc(sys, qpos, qvel)
    if efc_d is not None:
        ns_offset = efc_d.J.shape[0]
        parts.insert(0, efc_d)
    else:
        ns_offset = 0
    if len(parts) > 1:
        efc = Efc(*[jnp.concatenate([getattr(p, f) for p in parts])
                    for f in Efc._fields])
    else:
        efc = parts[0]

    # per-row leg-slot assignment for the sparse PGS core, in the exact
    # concatenated row order [dof | contact groups | pairs]
    legmeta = None
    if lay is not None:
        plm = jnp.asarray(_point_leg_map(sys, lay))
        l1s, l2s, h1s, h2s = [], [], [], []

        def add(l1, l2, h1, h2, n):
            l1s.append(jnp.broadcast_to(l1, (n,)).astype(jnp.int32))
            l2s.append(jnp.broadcast_to(l2, (n,)).astype(jnp.int32))
            h1s.append(jnp.broadcast_to(h1, (n,)))
            h2s.append(jnp.broadcast_to(h2, (n,)))

        if efc_d is not None:
            dd = _dof_row_dofs(sys)
            dleg = np.where(dd >= lay.nbase,
                            (dd - lay.nbase) // lay.branch_size, 0)
            add(jnp.asarray(dleg), jnp.asarray(dleg),
                jnp.asarray(dd >= lay.nbase), jnp.zeros(len(dd), bool),
                len(dd))
        for _, idx, nf, _, _, _ in cparts:
            lp = plm[idx]                       # (n,) dynamic gather
            leg = jnp.repeat(jnp.maximum(lp, 0), nf)
            has = jnp.repeat(lp >= 0, nf)
            add(leg, leg, has, jnp.zeros_like(has), idx.shape[0] * nf)
        if pair is not None:
            nf = 3 if elliptic else 4
            la, lb = plm[pair.a], plm[pair.b]
            # same-branch pair (e.g. within-leg coxa-tibia collision): J's
            # leg-column block already carries BOTH points' contributions,
            # and slot 1 gathers it whole — activating slot 2 as well would
            # double-count the leg in the reconstructed G row (ADVICE r4
            # medium #2).  Mask slot 2 to the distinct-branch case.
            add(jnp.repeat(jnp.maximum(la, 0), nf),
                jnp.repeat(jnp.maximum(lb, 0), nf),
                jnp.repeat(la >= 0, nf),
                jnp.repeat((lb >= 0) & (la != lb), nf),
                pair.a.shape[0] * nf)
        legmeta = LegMeta(
            jnp.concatenate(l1s), jnp.concatenate(l2s),
            jnp.concatenate(h1s), jnp.concatenate(h2s),
        )

    nefc = None
    if use_newton:
        cones = []
        if elliptic:
            off = ns_offset
            for _, idx, nf, d, mu_bar, mus in cparts:
                n = idx.shape[0]
                cones.append(newton.ConeGroup(
                    start=off, dim=d, mu=mu_bar, mus=mus,
                    active=con.active[idx],
                ))
                off += n * nf
            if pair_part is not None:
                cones.append(newton.ConeGroup(
                    start=off, dim=3, mu=pair_part[1], mus=pair_part[2],
                    active=pair.active,
                ))
        is_fl = efc.lo < 0.0
        nefc = newton.NewtonEfc(
            J=efc.J, aref=efc.aref, R=efc.R,
            quad_active=(~is_fl) & (efc.hi > 0.0) & _cone_row_mask(
                efc.J.shape[0], cones
            ),
            fl=jnp.where(is_fl, efc.hi, 0.0),
            cones=tuple(cones),
        )
    return Assembled(efc, nefc, ns_offset, cparts, pair_part, legmeta)


def solve_contacts(
    sys: S.System,
    con,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    M_chol: jnp.ndarray,
    qacc_smooth: jnp.ndarray,
    pair=None,
    M: Optional[jnp.ndarray] = None,
    Minv: Optional[jnp.ndarray] = None,
    lay=None,
    fac=None,
    warmstart: Optional[jnp.ndarray] = None,
) -> ContactSolveOut:
    """Full constraint solve: dof friction + joint limits + plane contacts
    (+ optional body-body pair contacts), with top-K candidate selection.

    Candidate points are statically grouped by condim (the condim of each
    point is a compile-time constant).  With ``sys.max_contacts = K > 0``
    the K deepest *condim-3* candidates enter the constraint system (MuJoCo
    instantiates only detected contacts; this is the static-shape analog);
    higher-condim points (e.g. the four anymal_c feet) are few and always
    enter.  Forces are scattered back to the full candidate set for the
    touch sensors.

    Row layout: [dof friction | joint limits | condim-3 facets | condim>3
    facets (ascending condim) | pair facets].  Every facet block keeps the
    consecutive ±pair structure the noslip pass expects.
    """
    asm = assemble(sys, con, qpos, qvel, pair=pair, lay=lay)
    efc, nefc, ns_offset = asm.efc, asm.nefc, asm.ns_offset
    cparts, pair_part = asm.cparts, asm.pair_part
    use_newton = nefc is not None
    elliptic = use_newton and sys.cone == S.ELLIPTIC

    if use_newton:
        assert M is not None, "Newton solve needs the mass matrix"
        nsol = newton.solve(
            nefc, M, qacc_smooth, sys.solver_iterations,
            min(sys.ls_iterations, sys.ls_refine),
            x0=warmstart,
        )
        force = nsol.force
        if sys.noslip_iterations > 0 and not elliptic:
            if Minv is None:
                if fac is not None:
                    from nightmare_rl_tpu.physics import arrow

                    Minv = arrow.inv(lay, fac)
                else:
                    Minv = linalg.spd_inv_from_chol(M_chol)
            JMinv = efc.J @ Minv
            A = jnp.einsum("ik,jk->ij", JMinv, efc.J)
            b = efc.J @ qacc_smooth - efc.aref
            force = _noslip_pairs(
                A, b, force, efc.hi, ns_offset, sys.noslip_iterations
            )
            qfrc = jnp.einsum("kn,k->n", efc.J, force)
            qacc = qacc_smooth + Minv @ qfrc
            sol = SolveOut(force, qfrc, qacc)
        else:
            sol = SolveOut(force, nsol.qfrc_constraint, nsol.qacc)
    else:
        sol = solve(
            sys, efc, M_chol, qacc_smooth, ns_offset=ns_offset, Minv=Minv,
            lay=lay, fac=fac, legmeta=asm.legmeta,
        )

    # normal force per candidate point, scattered back to the full candidate
    # set (touch sensors read the full set): Σ facet forces for pyramidal,
    # the normal row for elliptic
    nforce = jnp.zeros(sys.ncp, dtype=sol.force.dtype)
    off = ns_offset
    for _, idx, nf, _, _, _ in cparts:
        n = idx.shape[0]
        blk = sol.force[off : off + n * nf].reshape(n, nf)
        nforce = nforce.at[idx].set(blk[:, 0] if elliptic else blk.sum(axis=1))
        off += n * nf
    if pair is not None:
        # pair contact normal force feeds the touch sensors of BOTH bodies
        # (the huge tibia sites contain any point on their body)
        blk = sol.force[off:].reshape(-1, 3 if elliptic else 4)
        nf_pair = blk[:, 0] if elliptic else blk.sum(axis=1)
        nforce = nforce.at[pair.a].add(nf_pair).at[pair.b].add(nf_pair)
    return ContactSolveOut(nforce, sol.qfrc_constraint, sol.qacc)


def _cone_row_mask(nefc: int, cones) -> jnp.ndarray:
    """False on rows owned by elliptic cone groups (their cost is handled
    per-contact, not as one-sided quadratics)."""
    mask = np.ones(nefc, dtype=bool)
    for g in cones:
        n = g.mus.shape[0]
        mask[g.start : g.start + n * g.dim] = False
    return jnp.asarray(mask)
