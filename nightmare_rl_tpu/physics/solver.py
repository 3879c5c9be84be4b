"""Constraint assembly + PGS solver (+ noslip post-pass), MuJoCo semantics.

Replicates the PGS path selected by the nightmare model
(models/nightmare_v3/mjmodel.xml:3 — solver="PGS", iterations=3,
noslip_iterations=4) as a fixed-shape JAX program:

- pyramidal friction cone, condim 3 → 4 facet rows per contact with
  J_row = Jn ± μ·Jt_i, force ≥ 0;
- Baumgarte-style reference acceleration from solref/solimp
  (aref = -B·(J·qvel) - K·imp·pos with K = imp/(dmax·tc·dr)², B = 2/(dmax·tc));
- regularization R = (1-imp)/imp · 2(1+μ²) · (invweight[b1]+invweight[b2]);
- projected Gauss-Seidel on the dual from a zero start (MuJoCo's PGS ignores
  qacc_warmstart — verified empirically), fixed iteration count;
- noslip: extra Gauss-Seidel on tangent *pairs* with zero regularization,
  holding each pair's normal contribution (f⁺+f⁻) fixed — reproduces
  MuJoCo's noslip pass to 1e-9.

All formulas verified numerically against mjData.efc_* on the reference model
(see tests/test_solver.py).  Known deviation: MuJoCo's PGS processes rows in
an internal pseudo-random per-sweep order; we use fixed ascending order.  Both
iterate the same updates toward the same KKT point of the same QP, so the
difference is a pre-convergence transient only.  Inactive candidate contacts
stay in the system with forces pinned to zero, keeping shapes static under
jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nightmare_rl_tpu.physics import system as S
from nightmare_rl_tpu.physics.collision import Contacts


class Efc(NamedTuple):
    J: jnp.ndarray       # (nefc, nv) constraint jacobian (pyramid facets)
    aref: jnp.ndarray    # (nefc,)
    R: jnp.ndarray       # (nefc,) regularization
    active: jnp.ndarray  # (nefc,) bool
    mu: jnp.ndarray      # (ncp,)


def impedance(solimp: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """MuJoCo's sigmoid impedance d(pos) from solimp = (d0,dmax,width,mid,pow)."""
    d0, dmax, width, mid, power = (
        solimp[..., 0], solimp[..., 1], solimp[..., 2], solimp[..., 3], solimp[..., 4]
    )
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, 1e-12), 0.0, 1.0)
    y_lo = (x / jnp.maximum(mid, 1e-12)) ** (power - 1.0) * x
    y_hi = 1.0 - ((1.0 - x) / jnp.maximum(1.0 - mid, 1e-12)) ** (power - 1.0) * (
        1.0 - x
    )
    y = jnp.where(x < mid, y_lo, y_hi)
    return d0 + y * (dmax - d0)


def make_efc(sys: S.System, con: Contacts, qvel: jnp.ndarray) -> Efc:
    """Assemble pyramidal contact constraint rows."""
    mu = sys.cpoint_friction                       # (ncp,)
    Jn = con.jac[:, 2, :]                          # (ncp, nv)
    # mju_makeFrame for n=+z: t1 = (0,1,0), t2 = (-1,0,0)
    Jt1 = con.jac[:, 1, :]
    Jt2 = -con.jac[:, 0, :]
    m = mu[:, None]
    J = jnp.stack(
        [Jn + m * Jt1, Jn - m * Jt1, Jn + m * Jt2, Jn - m * Jt2], axis=1
    )                                              # (ncp, 4, nv)

    imp = impedance(sys.cpoint_solimp, con.dist)   # (ncp,)
    tc, dr = sys.cpoint_solref[:, 0], sys.cpoint_solref[:, 1]
    dmax = sys.cpoint_solimp[:, 1]
    # standard (positive) solref convention; direct (negative) = (-k, -b)
    K = jnp.where(tc > 0, 1.0 / jnp.maximum(dmax * tc * dr, 1e-12) ** 2, -tc)
    B = jnp.where(tc > 0, 2.0 / jnp.maximum(dmax * tc, 1e-12), -dr)

    vel = jnp.einsum("cfn,n->cf", J, qvel)         # (ncp, 4)
    aref = -B[:, None] * vel - (K * imp * con.dist)[:, None]

    iw = jnp.asarray(sys.body_invweight)[jnp.array(sys.cpoint_bodyid), 0]  # world side is 0
    R = (1.0 - imp) / jnp.maximum(imp, 1e-12) * 2.0 * (1.0 + mu**2) * iw
    R = jnp.maximum(R, 1e-12)

    nefc = sys.ncp * 4
    active = jnp.repeat(con.active, 4)
    return Efc(
        J.reshape(nefc, sys.nv),
        aref.reshape(nefc),
        jnp.repeat(R, 4),
        active,
        mu,
    )


class SolveOut(NamedTuple):
    force: jnp.ndarray            # (nefc,) pyramid facet forces
    qfrc_constraint: jnp.ndarray  # (nv,)
    qacc: jnp.ndarray             # (nv,) constrained acceleration


def solve(
    sys: S.System,
    efc: Efc,
    M_chol: jnp.ndarray,
    qacc_smooth: jnp.ndarray,
) -> SolveOut:
    """Dual PGS (zero start) with fixed sweeps, then noslip."""
    nefc = efc.J.shape[0]

    # A = J M⁻¹ Jᵀ ; rows/cols of inactive constraints are irrelevant (forces 0)
    MinvJT = jax.scipy.linalg.cho_solve((M_chol, True), efc.J.T)  # (nv, nefc)
    A = efc.J @ MinvJT                                            # (nefc, nefc)
    Ar = A + jnp.diag(efc.R)
    diag = jnp.diag(Ar)

    b = efc.J @ qacc_smooth - efc.aref

    f0 = jnp.zeros(nefc, dtype=efc.J.dtype)
    inv_diag = 1.0 / jnp.maximum(diag, 1e-12)

    def gs_row(r, f):
        grad = Ar[r] @ f + b[r]
        new = jnp.maximum(0.0, f[r] - grad * inv_diag[r])
        new = jnp.where(efc.active[r], new, 0.0)
        return f.at[r].set(new)

    def sweep(_, f):
        return jax.lax.fori_loop(0, nefc, gs_row, f)

    f = jax.lax.fori_loop(0, sys.solver_iterations, sweep, f0)

    # ---- noslip: drive tangential velocity to zero, no regularization ----
    # pyramid facets come in ± pairs (0,1)=t1, (2,3)=t2 per contact; update the
    # antisymmetric part y=(f⁺-f⁻)/2 with s=f⁺+f⁻ fixed ⇒ |y| ≤ s/2.
    if sys.noslip_iterations > 0:
        ncp = sys.ncp
        A_ns = A  # no regularization in the noslip pass
        bsm = b

        def ns_pair(carry, idx):
            f = carry
            c, t = idx // 2, idx % 2
            i = c * 4 + 2 * t
            jpair = i + 1
            s = f[i] + f[jpair]
            # gradient of ½fᵀAf + bᵀf along direction e_i - e_j at current f
            g = (A_ns[i] - A_ns[jpair]) @ f + (bsm[i] - bsm[jpair])
            h = A_ns[i, i] + A_ns[jpair, jpair] - 2.0 * A_ns[i, jpair]
            y = 0.5 * (f[i] - f[jpair]) - g / jnp.maximum(h, 1e-12)
            y = jnp.clip(y, -0.5 * s, 0.5 * s)
            ok = efc.active[i]
            fi = jnp.where(ok, 0.5 * s + y, f[i])
            fj = jnp.where(ok, 0.5 * s - y, f[jpair])
            return f.at[i].set(fi).at[jpair].set(fj), None

        def ns_sweep(_, f):
            f, _ = jax.lax.scan(ns_pair, f, jnp.arange(2 * ncp))
            return f

        f = jax.lax.fori_loop(0, sys.noslip_iterations, ns_sweep, f)

    qfrc = efc.J.T @ f
    qacc = qacc_smooth + MinvJT @ f
    return SolveOut(f, qfrc, qacc)
