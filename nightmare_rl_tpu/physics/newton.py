"""MuJoCo-semantics Newton constraint solver (pyramidal + elliptic cones).

The reference's models select this solver: ``models/anymal_c/anymal_c.xml:4``
(cone="elliptic", impratio=100, solver defaults to Newton) and
``models/nightmare_v3/mjmodel_mjx.xml:4`` (solver="Newton", pyramidal).  The
nightmare train model stays on PGS (physics/solver.py).

MuJoCo's Newton solver minimizes the strictly convex primal cost over
qacc = x:

    C(x) = 0.5·(x-a₀)ᵀM(x-a₀) + Σᵢ s(jarᵢ),   jar = J·x − aref

with per-constraint costs s (D = 1/R):

- one-sided rows (limits, pyramid facets):  0.5·D·jar²  for jar < 0, else 0;
- dof-friction rows (|force| ≤ fl):  quadratic for |jar| ≤ fl·R, linear
  (force saturated at ∓fl) outside;
- elliptic contacts: per-contact zones derived from the regularized local
  problem  f*(jar) = argmin_{f∈K} 0.5 fᵀRf + fᵀjar  over the friction cone
  K = {f: ‖(fᵢ·μ₁/μᵢ)ᵢ‖ ≤ μ₁·f₀}.  With the MuJoCo regularization
  Rᵢ = R₀·(μ₁/μᵢ)²/impratio and regularized coefficient μ̄ = μ₁/√impratio
  (verified numerically against mjData: contact.mu, efc_R — see
  scripts/probe_newton.py), the zones in scaled coordinates
  u₀ = jar₀, wᵢ = jarᵢ·μᵢ/μ̄, T = ‖w‖ are:

      bottom  (μ̄·(−u₀) ≥ T):  f = −D·jar         (all rows quadratic)
      top     (u₀ ≥ μ̄·T):     f = 0
      middle:                  f₀ = D₀·(μ̄T − u₀)/(1+μ̄²),
                               fᵢ = −f₀·μᵢ·wᵢ/T,
                               s  = 0.5·D₀·(μ̄T − u₀)²/(1+μ̄²)

Every Newton iteration builds the exact (zone-aware) Hessian
H = M + Jᵀdiag(D·act)J + Σ cone blocks, takes p = −H⁻¹∇C, and runs an
exact line search (scalar Newton on the piecewise-smooth convex φ(α),
``ls_iterations`` steps).  Because C is strictly convex (R > 0), the
minimizer is unique: converged results match MuJoCo's independently of
iteration-level details (tests/test_newton.py checks forces/qacc against the
oracle).  mjSOL_CG shares this objective and fixed point; CG models are
solved with Newton too.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from nightmare_rl_tpu.ops import linalg


class ConeGroup(NamedTuple):
    """A block of elliptic contacts with uniform condim.

    Rows [start, start + n·dim) of the efc system, reshaped (n, dim) as
    [normal | friction dirs...] per contact.
    """

    start: int            # static row offset
    dim: int              # static condim
    mu: jnp.ndarray       # (n,) regularized cone coefficient μ₁/√impratio
    mus: jnp.ndarray      # (n, dim-1) physical friction per direction
    active: jnp.ndarray   # (n,) candidate activity


class NewtonEfc(NamedTuple):
    J: jnp.ndarray        # (nefc, nv)
    aref: jnp.ndarray     # (nefc,)
    R: jnp.ndarray        # (nefc,)
    quad_active: jnp.ndarray   # (nefc,) activity of one-sided rows (cone and
                               # friction rows must be False here)
    fl: jnp.ndarray       # (nefc,) frictionloss (>0 marks dof-friction rows)
    cones: Tuple[ConeGroup, ...] = ()


def _cone_terms(efc: NewtonEfc, g: ConeGroup, jar: jnp.ndarray):
    """Per-contact zone quantities for one cone group."""
    n, d = g.mus.shape[0], g.dim
    sl = slice(g.start, g.start + n * d)
    jar_c = jar[sl].reshape(n, d)
    R_c = efc.R[sl].reshape(n, d)
    D_c = 1.0 / R_c
    mu = g.mu
    u0 = jar_c[:, 0]
    w = jar_c[:, 1:] * g.mus / jnp.maximum(mu, 1e-12)[:, None]
    T = jnp.sqrt(jnp.sum(w * w, axis=1))
    Ts = jnp.maximum(T, 1e-12)
    bottom = g.active & (mu * (-u0) >= T)
    top = (~g.active) | (u0 >= mu * T)
    mid = g.active & ~bottom & ~top
    # forces
    f_bot = -D_c * jar_c
    c2 = D_c[:, 0] / (1.0 + mu * mu)            # D₀/(1+μ̄²)
    gap = mu * T - u0                             # ≥ 0 in middle zone
    f0_mid = c2 * gap
    f_mid = jnp.concatenate(
        [f0_mid[:, None], -f0_mid[:, None] * g.mus * w / Ts[:, None]], axis=1
    )
    f = jnp.where(
        bottom[:, None], f_bot, jnp.where(mid[:, None], f_mid, 0.0)
    )
    return jar_c, D_c, w, T, Ts, bottom, mid, c2, gap, f


def forces(efc: NewtonEfc, jar: jnp.ndarray):
    """Constraint forces f(jar) and the diagonal curvature vector
    (rows whose s is locally 0.5·D·jar²); cone middle zones carry
    non-diagonal curvature handled separately."""
    D = 1.0 / efc.R
    is_fl = efc.fl > 0
    # one-sided rows
    act_quad = efc.quad_active & (jar < 0.0)
    # dof friction rows: quadratic middle, saturated outside
    fl_mid = is_fl & (jnp.abs(jar) * D <= efc.fl)
    f = jnp.where(act_quad | fl_mid, -D * jar, 0.0)
    f = jnp.where(
        is_fl & ~fl_mid, -jnp.sign(jar) * efc.fl, f
    )
    diag = jnp.where(act_quad | fl_mid, D, 0.0)

    for g in efc.cones:
        n, d = g.mus.shape[0], g.dim
        sl = slice(g.start, g.start + n * d)
        jar_c, D_c, w, T, Ts, bottom, mid, c2, gap, f_c = _cone_terms(
            efc, g, jar
        )
        f = f.at[sl].set(f_c.reshape(-1))
        # bottom zone: plain diagonal D curvature on all contact rows
        diag = diag.at[sl].set(
            jnp.where(bottom[:, None], D_c, 0.0).reshape(-1)
        )
    return f, diag


def constraint_cost(efc: NewtonEfc, jar: jnp.ndarray) -> jnp.ndarray:
    """Σᵢ s(jarᵢ) — the constraint part of the primal cost C(x) (module
    docstring).  Used by the warmstart selector, mirroring mj_warmstart:
    start the solve from qacc_warmstart or qacc_smooth, whichever has the
    lower total cost."""
    D = 1.0 / efc.R
    is_fl = efc.fl > 0
    act_quad = efc.quad_active & (jar < 0.0)
    fl_mid = is_fl & (jnp.abs(jar) * D <= efc.fl)
    s = jnp.where(act_quad | fl_mid, 0.5 * D * jar * jar, 0.0)
    # saturated friction rows: linear continuation, C¹ at the break
    s = jnp.where(
        is_fl & ~fl_mid,
        efc.fl * jnp.abs(jar) - 0.5 * efc.fl * efc.fl * efc.R, s,
    )
    total = jnp.sum(s)
    for g in efc.cones:
        n, d = g.mus.shape[0], g.dim
        sl = slice(g.start, g.start + n * d)
        jar_c, D_c, w, T, Ts, bottom, mid, c2, gap, _f = _cone_terms(
            efc, g, jar
        )
        s_bot = 0.5 * jnp.sum(D_c * jar_c * jar_c, axis=1)
        s_mid = 0.5 * c2 * gap * gap
        # the quad part above already counted nothing for cone rows
        # (quad_active excludes them); add the zone costs here
        total = total + jnp.sum(
            jnp.where(bottom, s_bot, jnp.where(mid, s_mid, 0.0))
        )
    return total


def _cone_hessians(efc: NewtonEfc, g: ConeGroup, jar: jnp.ndarray):
    """Middle-zone per-contact Hessian blocks B (n, d, d) for one group:
    ∇²s = c₂·∇g∇gᵀ + c₂·gap·μ̄/T · S(I − ŵŵᵀ)S  on the friction block,
    with ∇g = (−1, μᵢ·ŵᵢ) and S = diag(μᵢ/μ̄)."""
    n, d = g.mus.shape[0], g.dim
    jar_c, D_c, w, T, Ts, bottom, mid, c2, gap, _ = _cone_terms(efc, g, jar)
    what = w / Ts[:, None]
    dg = jnp.concatenate([-jnp.ones((n, 1), jar.dtype), g.mus * what], axis=1)
    B = c2[:, None, None] * dg[:, :, None] * dg[:, None, :]
    s = g.mus / jnp.maximum(g.mu, 1e-12)[:, None]     # (n, d-1)
    P = (
        jnp.eye(d - 1, dtype=jar.dtype)[None] - what[:, :, None] * what[:, None, :]
    )
    SPS = s[:, :, None] * P * s[:, None, :]
    coef = c2 * gap * g.mu / Ts
    B = B.at[:, 1:, 1:].add(coef[:, None, None] * SPS)
    return jnp.where(mid[:, None, None], B, 0.0)


def _dir_curv(efc: NewtonEfc, jar: jnp.ndarray, Jp: jnp.ndarray):
    """Directional curvature pᵀ(∂²Σs)p at the current jar (for the line
    search), including cone middle-zone terms."""
    f, diag = forces(efc, jar)
    curv = jnp.sum(diag * Jp * Jp)
    for g in efc.cones:
        n, d = g.mus.shape[0], g.dim
        sl = slice(g.start, g.start + n * d)
        h = Jp[sl].reshape(n, d)
        jar_c, D_c, w, T, Ts, bottom, mid, c2, gap, _ = _cone_terms(
            efc, g, jar
        )
        what = w / Ts[:, None]
        s = g.mus / jnp.maximum(g.mu, 1e-12)[:, None]
        dg_h = -h[:, 0] + jnp.sum(g.mus * what * h[:, 1:], axis=1)
        sh = s * h[:, 1:]
        perp = jnp.sum(sh * sh, axis=1) - jnp.sum(what * sh, axis=1) ** 2
        cc = c2 * dg_h**2 + c2 * gap * g.mu / Ts * perp
        curv += jnp.sum(jnp.where(mid, cc, 0.0))
    return f, curv


class NewtonOut(NamedTuple):
    force: jnp.ndarray            # (nefc,)
    qfrc_constraint: jnp.ndarray  # (nv,)
    qacc: jnp.ndarray             # (nv,)


def solve(
    efc: NewtonEfc,
    M: jnp.ndarray,
    qacc_smooth: jnp.ndarray,
    iterations: int,
    ls_refine: int,
    x0: jnp.ndarray = None,
) -> NewtonOut:
    """Newton solve with analytically bracketed exact line search.

    ``ls_refine`` is the guarded refinement budget AFTER the batched
    bracket grid (the caller clamps it with the XML's <option
    ls_iterations> — see System.ls_refine).

    ``x0`` (optional) is a warmstart candidate (previous step's qacc,
    mjData.qacc_warmstart).  Like mj_warmstart, the solve starts from the
    LOWER-COST of {x0, qacc_smooth}; a stale/zero warmstart (reset frames)
    therefore never hurts.  Consecutive physics substeps share their
    active set, so a warmstarted fixed iteration budget converges in far
    fewer Newton steps than a cold start."""
    J, aref = efc.J, efc.aref
    a0 = qacc_smooth
    dtype = a0.dtype
    tiny = jnp.asarray(1e-12, dtype)

    start = a0
    if x0 is not None:
        def total_cost(x):
            dx = x - a0
            return (0.5 * dx @ (M @ dx)
                    + constraint_cost(efc, J @ x - aref))

        use_ws = total_cost(x0) < total_cost(a0)
        start = jnp.where(use_ws, x0, a0)

    def body(x, _):
        jar = J @ x - aref
        f, diag = forces(efc, jar)
        grad = M @ (x - a0) - jnp.einsum("kn,k->n", J, f)
        H = M + jnp.einsum("kn,k,km->nm", J, diag, J)
        for g in efc.cones:
            n, d = g.mus.shape[0], g.dim
            sl = slice(g.start, g.start + n * d)
            Jc = J[sl].reshape(n, d, -1)
            B = _cone_hessians(efc, g, jar)
            H = H + jnp.einsum("kin,kij,kjm->nm", Jc, B, Jc)
        L = linalg.chol(H)
        p = -jax.scipy.linalg.cho_solve((L, True), grad)

        Jp = J @ p
        Mp = M @ p
        pMp = p @ Mp
        gMp = p @ (M @ (x - a0))

        def phi_derivs(alpha):
            f_a, curv = _dir_curv(efc, jar + alpha * Jp, Jp)
            d1 = gMp + alpha * pMp - Jp @ f_a
            d2 = pMp + curv
            return d1, d2

        alpha0 = jnp.asarray(0.0, dtype)
        d1_0, d2_0 = phi_derivs(alpha0)

        # Line search on the monotone piecewise-smooth φ'(α), restructured
        # for TPU: the directional curvature is ≥ pᵀMp everywhere (every
        # constraint cost is convex), so φ'(α) ≥ φ'(0) + α·pᵀMp and the
        # unique root is ANALYTICALLY bracketed by
        #     α* ∈ [0, αmax],  αmax = −φ'(0)/pᵀMp
        # — no sequential expansion loop.  A log-spaced grid over the
        # bracket (plus the unguarded Newton estimate) is evaluated in ONE
        # batched φ' call, then a few guarded Newton/bisection refinements
        # polish the bracketed root.  This cuts the sequential dependency
        # chain from ~60 φ evaluations to ~9, keeping the bracket
        # guarantee (pure scalar Newton can cycle across curvature
        # breakpoints; period-2 oscillation observed on anymal_c with
        # mixed fl/cone rows).  Measured effect (scripts/bench_anymal_ab.py,
        # tunnel TPU, 2048 envs): 3,676 -> 3,929 env-steps/s (+7%) — the
        # anymal step is bandwidth-bound on the batched small ops, not
        # line-search-chain-bound, so the win is real but modest; the
        # shorter chain mainly helps latency-critical small batches.
        alpha_max = -d1_0 / jnp.maximum(pMp, tiny)
        a1 = -d1_0 / jnp.maximum(d2_0, tiny)
        fracs = jnp.asarray(
            [1.0, 0.5, 0.25, 0.125, 1.0 / 16, 1.0 / 64, 1.0 / 256], dtype
        )
        cand = jnp.concatenate(
            [alpha_max * fracs,
             a1 * jnp.asarray([0.25, 0.5, 1.0, 2.0, 4.0], dtype)]
        )
        cand = jnp.clip(cand, 0.0, alpha_max)
        d1s, d2s = jax.vmap(phi_derivs)(cand)
        neg = d1s < 0.0
        # tightest bracket the grid provides; φ'(αmax) ≥ 0 by the slope
        # bound, so hi is always finite and valid
        lo = jnp.max(jnp.where(neg, cand, 0.0))
        hi = jnp.min(jnp.where(neg, alpha_max, cand))
        i_lo = jnp.argmax(jnp.where(neg, cand, -1.0))
        has_neg = jnp.any(neg)
        alpha_c = jnp.where(has_neg, cand[i_lo], alpha0)
        d1_c = jnp.where(has_neg, d1s[i_lo], d1_0)
        d2_c = jnp.where(has_neg, d2s[i_lo], d2_0)

        def ls_body(carry, _):
            lo, hi, alpha, d1, d2 = carry
            lo = jnp.where(d1 < 0.0, jnp.maximum(lo, alpha), lo)
            hi = jnp.where(d1 >= 0.0, jnp.minimum(hi, alpha), hi)
            a_newton = alpha - d1 / jnp.maximum(d2, tiny)
            inside = (a_newton > lo) & (a_newton < hi)
            a_next = jnp.where(inside, a_newton, 0.5 * (lo + hi))
            d1_n, d2_n = phi_derivs(a_next)
            return (lo, hi, a_next, d1_n, d2_n), None

        (lo, hi, alpha, d1_f, _), _ = jax.lax.scan(
            ls_body, (lo, hi, alpha_c, d1_c, d2_c), None,
            length=ls_refine,
        )
        # land on the descent side of the bracket when φ'(final) > 0
        alpha = jnp.where(d1_f <= 0.0, alpha, lo)
        # descent guard: converged iterates take a null step
        alpha = jnp.where(d1_0 < 0.0, alpha, 0.0)
        return x + alpha * p, None

    x, _ = jax.lax.scan(body, start, None, length=iterations)
    jar = J @ x - aref
    f, _ = forces(efc, jar)
    qfrc = jnp.einsum("kn,k->n", J, f)
    return NewtonOut(f, qfrc, x)
