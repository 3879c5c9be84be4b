"""Matrix-free PGS ≡ explicit-A oracle; Pallas kernel ≡ scan reference."""

import numpy as np
import jax
import jax.numpy as jnp

from nightmare_rl_tpu.ops import pgs


def _random_problem(rng, N, nefc, nv, ns_offset=0):
    """Random constraint systems in the solver's native (J, M⁻¹) form."""
    J = rng.normal(size=(N, nefc, nv))
    G = rng.normal(size=(N, nv, nv))
    Minv = G @ G.transpose(0, 2, 1) + np.eye(nv) * 0.1
    U = J @ Minv
    b = rng.normal(size=(N, nefc)) * 5
    R = np.abs(rng.normal(size=(N, nefc))) + 0.01
    lo = np.zeros((N, nefc))
    hi = np.full((N, nefc), np.inf)
    # friction-style box rows before ns_offset
    lo[:, :ns_offset] = -2.0
    hi[:, :ns_offset] = 2.0
    # some inactive contact rows (in pyramid pairs)
    inact = rng.random((N, (nefc - ns_offset) // 2)) < 0.3
    inact = np.repeat(inact, 2, axis=1)
    hi[:, ns_offset:] = np.where(inact, 0.0, hi[:, ns_offset:])
    return tuple(jnp.array(x) for x in (J, U, b, R, lo, hi))


def _explicit_A_oracle(J, U, b, R, lo, hi, iterations, noslip, ns_offset):
    """The classic dual PGS over an assembled A = J M⁻¹ Jᵀ = U Jᵀ — the
    formulation the matrix-free core must reproduce (numpy, one env)."""
    A = np.asarray(U) @ np.asarray(J).T
    b, R, lo, hi = (np.asarray(x) for x in (b, R, lo, hi))
    nefc = b.shape[0]
    diag = np.diagonal(A)
    inv_d = 1.0 / np.maximum(diag + R, 1e-12)
    f = np.zeros(nefc)
    for _ in range(iterations):
        for r in range(nefc):
            g = A[r] @ f + b[r] + R[r] * f[r]
            f[r] = np.clip(f[r] - g * inv_d[r], lo[r], hi[r])
    npairs = (nefc - ns_offset) // 2
    for _ in range(noslip if npairs > 0 else 0):
        for p in range(npairs):
            i, j = ns_offset + 2 * p, ns_offset + 2 * p + 1
            s = f[i] + f[j]
            g = (A[i] - A[j]) @ f + b[i] - b[j]
            h = diag[i] + diag[j] - 2.0 * A[i, j]
            y = 0.5 * (f[i] - f[j]) - g / max(h, 1e-12)
            y = np.clip(y, -0.5 * s, 0.5 * s)
            if hi[i] > 0:
                f[i], f[j] = 0.5 * s + y, 0.5 * s - y
    return f


def test_matrix_free_matches_explicit_A():
    rng = np.random.default_rng(5)
    J, U, b, R, lo, hi = _random_problem(rng, 6, 16, 12, ns_offset=2)
    for e in range(6):
        ref = _explicit_A_oracle(J[e], U[e], b[e], R[e], lo[e], hi[e],
                                 3, 4, 2)
        out = pgs._scan_core(J[e], U[e], b[e], R[e], lo[e], hi[e], 3, 4, 2)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-9)


def test_kernel_matches_scan_reference():
    rng = np.random.default_rng(0)
    J, U, b, R, lo, hi = _random_problem(rng, 8, 16, 12)
    ref = jax.vmap(
        lambda j, u, bb, rr, l, h: pgs._scan_core(j, u, bb, rr, l, h, 3, 4, 0)
    )(J, U, b, R, lo, hi)
    out = pgs.pgs_solve(J, U, b, R, lo, hi, iterations=3, noslip=4,
                        block_envs=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)


def test_kernel_with_dof_rows():
    rng = np.random.default_rng(2)
    J, U, b, R, lo, hi = _random_problem(rng, 4, 20, 12, ns_offset=4)
    ref = jax.vmap(
        lambda j, u, bb, rr, l, h: pgs._scan_core(j, u, bb, rr, l, h, 3, 4, 4)
    )(J, U, b, R, lo, hi)
    out = pgs.pgs_solve(J, U, b, R, lo, hi, iterations=3, noslip=4,
                        ns_offset=4, block_envs=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)
    # friction rows respect their box bounds
    assert float(jnp.max(jnp.abs(out[:, :4]))) <= 2.0 + 1e-9


def test_custom_vmap_dispatch():
    rng = np.random.default_rng(1)
    J, U, b, R, lo, hi = _random_problem(rng, 4, 8, 6)
    core = pgs.pgs_core(3, 4, 0)
    single = core(J[0], U[0], b[0], R[0], lo[0], hi[0])
    batched = jax.vmap(core)(J, U, b, R, lo, hi)
    np.testing.assert_allclose(
        np.asarray(batched[0]), np.asarray(single), atol=1e-12
    )


# ---------------------------------------------------------------------------
# leg-block-sparse core (ops/pgs.py::_scan_core_legs + solver._leg_panels)
# ---------------------------------------------------------------------------


def _random_arrow_problem(rng, nefc, B, s, nb, ns_offset=0, npair_rows=0):
    """Random constraint system over a synthetic block-arrow mass matrix,
    with rows whose support matches the leg-slot structure: dof rows (one
    leg), plane-contact rows (base + one leg, some base-only), pair rows
    (two legs, no base) — the row families of the real models."""
    from nightmare_rl_tpu.physics.arrow import ArrowFac, ArrowLayout
    from nightmare_rl_tpu.physics.solver import LegMeta, _leg_panels

    nv = nb + B * s
    # arrow-structured M built directly from its no-fill factor blocks
    Ld = np.tril(rng.normal(size=(B, s, s)))
    Ld[:, np.arange(s), np.arange(s)] = (
        np.abs(Ld[:, np.arange(s), np.arange(s)]) + 1.0
    )
    W = rng.normal(size=(B, s, nb)) * 0.3
    Ls = np.tril(rng.normal(size=(nb, nb)))
    Ls[np.arange(nb), np.arange(nb)] = np.abs(Ls[np.arange(nb), np.arange(nb)]) + 1.0
    D = Ld @ Ld.transpose(0, 2, 1)
    C = Ld @ W
    B6 = np.einsum("bsi,bsj->ij", W, W) + Ls @ Ls.T
    M = np.zeros((nv, nv))
    M[:nb, :nb] = B6
    for b_ in range(B):
        sl = slice(nb + b_ * s, nb + (b_ + 1) * s)
        M[sl, sl] = D[b_]
        M[sl, :nb] = C[b_]
        M[:nb, sl] = C[b_].T
    Minv = np.linalg.inv(M)

    leg1 = rng.integers(0, B, size=nefc).astype(np.int32)
    leg2 = np.where(leg1 + 1 < B, leg1 + 1, 0).astype(np.int32)
    # ± facet pairs of one contact share their slot assignment (the noslip
    # pass relies on it) — align consecutive rows in the contact block
    for r in range(ns_offset, nefc - 1, 2):
        leg1[r + 1] = leg1[r]
        leg2[r + 1] = leg2[r]
    has1 = np.ones(nefc, bool)
    has2 = np.zeros(nefc, bool)
    has1[:ns_offset] = True                      # dof rows: leg only
    if npair_rows:
        has2[nefc - npair_rows:] = True          # pair rows: two legs
    base_only = (rng.random(nefc) < 0.15) & has1 & ~has2
    J = np.zeros((nefc, nv))
    for r in range(nefc):
        if r >= ns_offset and not has2[r]:
            J[r, :nb] = rng.normal(size=nb)      # base part
        if has1[r] and not base_only[r]:
            sl = slice(nb + leg1[r] * s, nb + (leg1[r] + 1) * s)
            J[r, sl] = rng.normal(size=s)
        if has2[r]:
            sl = slice(nb + leg2[r] * s, nb + (leg2[r] + 1) * s)
            J[r, sl] = rng.normal(size=s)
    has1 = has1 & ~base_only

    U = J @ Minv
    b = rng.normal(size=nefc) * 5
    R = np.abs(rng.normal(size=nefc)) + 0.01
    lo = np.zeros(nefc)
    hi = np.full(nefc, np.inf)
    lo[:ns_offset] = -2.0
    hi[:ns_offset] = 2.0
    inact = np.repeat(rng.random((nefc - ns_offset) // 2) < 0.3, 2)
    hi[ns_offset:] = np.where(inact, 0.0, hi[ns_offset:])

    lay = ArrowLayout(nv, nb, B, s)
    fac = ArrowFac(jnp.asarray(Ld), jnp.asarray(W), jnp.asarray(Ls),
                   jnp.asarray(C))
    lm = LegMeta(jnp.asarray(leg1), jnp.asarray(leg2),
                 jnp.asarray(has1), jnp.asarray(has2))
    Gp = _leg_panels(lay, fac, jnp.asarray(J), lm)
    dense = tuple(jnp.asarray(x) for x in (J, U, b, R, lo, hi))
    return dense, Gp, lm, lay, jnp.asarray(Minv)


def test_leg_panels_reconstruct_delassus():
    """G Gᵀ from the sparse panels equals A = J M⁻¹ Jᵀ row-exactly — the
    identity the sparse sweeps rely on."""
    rng = np.random.default_rng(7)
    (J, U, *_), Gp, lm, lay, Minv = _random_arrow_problem(
        rng, nefc=20, B=4, s=3, nb=6, ns_offset=2, npair_rows=4)
    A_ref = np.asarray(U @ J.T)
    s, nb, B = lay.branch_size, lay.nbase, lay.nbranch
    G = np.zeros((20, lay.nv))
    g1 = np.asarray(Gp[:, :s])
    g2 = np.asarray(Gp[:, s:2 * s])
    gb = np.asarray(Gp[:, 2 * s:])
    for r in range(20):
        G[r, nb + int(lm.leg1[r]) * s: nb + (int(lm.leg1[r]) + 1) * s] += g1[r]
        G[r, nb + int(lm.leg2[r]) * s: nb + (int(lm.leg2[r]) + 1) * s] += g2[r]
        G[r, :nb] += gb[r]
    # permuted coords: G's base block multiplies the base slots; A = G Gᵀ
    np.testing.assert_allclose(G @ G.T, A_ref, atol=1e-9)


def test_leg_sparse_core_matches_explicit_A():
    rng = np.random.default_rng(8)
    for ns_offset, npair in ((0, 0), (3, 4)):
        dense, Gp, lm, lay, _ = _random_arrow_problem(
            rng, nefc=16 + ns_offset, B=5, s=3, nb=6,
            ns_offset=ns_offset, npair_rows=npair)
        J, U, b, R, lo, hi = dense
        ref = _explicit_A_oracle(J, U, b, R, lo, hi, 3, 4, ns_offset)
        out = pgs._scan_core_legs(
            Gp, lm.leg1, lm.leg2, b, R, lo, hi,
            lay.nbranch, lay.branch_size, lay.nbase, 3, 4, ns_offset)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-9)


def test_leg_sparse_core_matches_dense_core_under_vmap():
    rng = np.random.default_rng(9)
    outs = []
    for _ in range(3):
        dense, Gp, lm, lay, _ = _random_arrow_problem(
            rng, nefc=16, B=4, s=3, nb=6, ns_offset=0, npair_rows=4)
        J, U, b, R, lo, hi = dense
        d_out = pgs._scan_core(J, U, b, R, lo, hi, 3, 4, 0)
        l_out = pgs._scan_core_legs(
            Gp, lm.leg1, lm.leg2, b, R, lo, hi, 4, 3, 6, 3, 4, 0)
        np.testing.assert_allclose(np.asarray(l_out), np.asarray(d_out),
                                   atol=1e-9)
        outs.append((Gp, lm, b, R, lo, hi))
    # vmapped over envs (the shape the env layer uses)
    Gps = jnp.stack([o[0] for o in outs])
    bs = jnp.stack([o[2] for o in outs])
    Rs = jnp.stack([o[3] for o in outs])
    los = jnp.stack([o[4] for o in outs])
    his = jnp.stack([o[5] for o in outs])
    lm0 = outs[0][1]
    batched = jax.vmap(
        lambda gp, bb, rr, l, h: pgs._scan_core_legs(
            gp, lm0.leg1, lm0.leg2, bb, rr, l, h, 4, 3, 6, 3, 4, 0)
    )(Gps, bs, Rs, los, his)
    single = pgs._scan_core_legs(
        Gps[0], lm0.leg1, lm0.leg2, bs[0], Rs[0], los[0], his[0],
        4, 3, 6, 3, 4, 0)
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(single),
                               atol=1e-12)


def test_choose_mode_and_probe():
    import os

    # forced modes respected; 'legs' falls back when unavailable
    for forced, avail, want in (("scan", True, "scan"), ("legs", True, "legs"),
                                ("legs", False, "scan"),
                                ("kernel", True, "kernel")):
        os.environ["NIGHTMARE_PGS"] = forced
        try:
            got = pgs.choose_mode(avail, 16, 12, 3, 4, 0, (4, 3, 6))
        finally:
            del os.environ["NIGHTMARE_PGS"]
        assert got == want, (forced, avail, got, want)
    # no override on a CPU backend: sparse when available
    assert pgs.choose_mode(True, 16, 12, 3, 4, 0, (4, 3, 6)) == "legs"
    assert pgs.choose_mode(False, 16, 12, 3, 4, 0, None) == "scan"
    # the probe itself runs (timing path) and returns an available candidate
    mode = pgs._probed_mode(16, 18, 3, 4, 0, (4, 3, 6), True, "float32")
    assert mode in ("scan", "legs")


# ---------------------------------------------------------------------------
# unrolled small-matrix linalg (ops/linalg.py)
# ---------------------------------------------------------------------------

from nightmare_rl_tpu.ops import linalg  # noqa: E402


def _random_spd(rng, shape, n):
    X = rng.standard_normal(shape + (n, n))
    return jnp.asarray(X @ np.swapaxes(X, -1, -2) + 5.0 * np.eye(n))


def test_unrolled_cholesky_matches_xla():
    rng = np.random.default_rng(0)
    M = _random_spd(rng, (16,), 24)
    L = linalg.chol(M)
    L_ref = jnp.linalg.cholesky(M)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref), atol=1e-11)
    # strictly upper triangle is exactly zero
    assert float(jnp.abs(jnp.triu(L[0], 1)).max()) == 0.0


def test_tri_inv_and_spd_inv():
    rng = np.random.default_rng(1)
    M = _random_spd(rng, (8,), 24)
    L = linalg.chol(M)
    Li = linalg.tri_inv(L)
    eye = jnp.eye(24, dtype=L.dtype)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bik,bkj->bij", Li, L)),
        np.broadcast_to(np.eye(24), (8, 24, 24)),
        atol=1e-11,
    )
    Minv = linalg.spd_inv_from_chol(L)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bik,bkj->bij", Minv, M)),
        np.broadcast_to(np.eye(24), (8, 24, 24)),
        atol=1e-9,
    )
    assert float(jnp.abs(Minv - jnp.swapaxes(Minv, -1, -2)).max()) < 1e-12


def test_unrolled_chol_unbatched_and_f32():
    rng = np.random.default_rng(2)
    M = _random_spd(rng, (), 7)
    np.testing.assert_allclose(
        np.asarray(linalg.chol(M)), np.asarray(jnp.linalg.cholesky(M)),
        atol=1e-12,
    )
    M32 = M.astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(linalg.chol(M32)),
        np.asarray(jnp.linalg.cholesky(M32)), atol=1e-5,
    )


# ---- block-arrow mass-matrix factorization (physics/arrow.py) ----

def _real_M(name):
    from nightmare_rl_tpu.physics import dynamics, kinematics, loader, pipeline

    sys = loader.load_system(name)
    state = pipeline.make_state(sys)
    # perturb away from qpos0 so M is generic
    q = np.asarray(state.qpos).copy()
    q[7:] += np.linspace(-0.3, 0.3, q.size - 7)
    kin = kinematics.kinematics(sys, jnp.asarray(q))
    return sys, dynamics.crb(sys, kin)


def test_arrow_layout_detects_both_models():
    from nightmare_rl_tpu.physics import arrow, loader

    lay = arrow.layout(loader.load_system("nightmare_v3"))
    assert lay is not None and (lay.nbranch, lay.branch_size) == (6, 3)
    lay = arrow.layout(loader.load_system("anymal_c"))
    assert lay is not None and (lay.nbranch, lay.branch_size) == (4, 3)


def test_arrow_factor_solve_inv_match_dense():
    from nightmare_rl_tpu.ops import linalg
    from nightmare_rl_tpu.physics import arrow

    for name in ("nightmare_v3", "anymal_c"):
        sys, M = _real_M(name)
        lay = arrow.layout(sys)
        fac = arrow.factor(lay, M)
        Minv = arrow.inv(lay, fac)
        L = linalg.chol(M)
        np.testing.assert_allclose(
            np.asarray(Minv), np.asarray(linalg.spd_inv_from_chol(L)),
            atol=1e-10,
        )
        rng = np.random.default_rng(3)
        b = jnp.asarray(rng.normal(size=sys.nv))
        x = arrow.solve_vec(lay, fac, b)
        np.testing.assert_allclose(
            np.asarray(M @ x), np.asarray(b), atol=1e-10
        )


def test_arrow_solve_under_vmap():
    from nightmare_rl_tpu.physics import arrow

    sys, M = _real_M("nightmare_v3")
    lay = arrow.layout(sys)
    rng = np.random.default_rng(4)
    # batch of diagonal-shifted matrices (the implicitfast Mhat pattern)
    shifts = jnp.asarray(np.abs(rng.normal(size=(5, sys.nv))) * 0.1)
    Ms = M[None] + jax.vmap(jnp.diag)(shifts)
    bs = jnp.asarray(rng.normal(size=(5, sys.nv)))
    xs = jax.vmap(lambda A, b: arrow.solve_vec(lay, arrow.factor(lay, A), b))(
        Ms, bs
    )
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bij,bj->bi", Ms, xs)), np.asarray(bs),
        atol=1e-10,
    )


def test_same_branch_pair_rows_match_dense():
    """A collision pair whose two points map to the SAME branch (e.g.
    within-leg coxa-tibia contact): J's leg-column block carries both
    points' contributions at once, so the assemble fix masks slot 2
    (has2=False, solver.py assemble) and slot 1 gathers the whole block.
    The sparse core must equal the dense core row-exactly — with the
    pre-fix metadata (has2=True, same leg in both slots) the reconstructed
    G row double-counts the leg (ADVICE r4 medium #2)."""
    from nightmare_rl_tpu.physics.arrow import ArrowFac, ArrowLayout
    from nightmare_rl_tpu.physics.solver import LegMeta, _leg_panels

    rng = np.random.default_rng(11)
    dense, Gp, lm, lay, Minv = _random_arrow_problem(
        rng, nefc=16, B=4, s=3, nb=6, ns_offset=0, npair_rows=4)
    J, U, b, R, lo, hi = (np.array(x) for x in dense)
    s, nb = lay.branch_size, lay.nbase
    # rewrite the 4 pair rows as same-branch pairs: support entirely in
    # leg1's columns (the union of both points' contributions), slot 2
    # masked off — exactly what assemble now emits for la == lb
    leg1 = np.asarray(lm.leg1).copy()
    leg2 = np.asarray(lm.leg2).copy()
    has1 = np.asarray(lm.has1).copy()
    has2 = np.asarray(lm.has2).copy()
    for r in range(12, 16):
        leg2[r] = leg1[r]
        has2[r] = False
        J[r] = 0.0
        sl = slice(nb + leg1[r] * s, nb + (leg1[r] + 1) * s)
        J[r, sl] = rng.normal(size=s)  # both points' columns, combined
    U = J @ np.asarray(Minv)
    lm2 = LegMeta(jnp.asarray(leg1), jnp.asarray(leg2),
                  jnp.asarray(has1), jnp.asarray(has2))
    fac = None
    # rebuild panels from the SAME factor used by _random_arrow_problem:
    # recover it by re-deriving from Minv is overkill — recompute directly
    # from a fresh factorization of M = Minv^-1
    M = np.linalg.inv(np.asarray(Minv))
    Lfull = np.linalg.cholesky(M)  # dense reference factor
    # sparse-path panels via _leg_panels need the arrow factor; rebuild it
    Ld = np.stack([
        np.linalg.cholesky(M[nb + i * s: nb + (i + 1) * s,
                             nb + i * s: nb + (i + 1) * s])
        for i in range(lay.nbranch)
    ])
    W = np.stack([
        np.linalg.solve(Ld[i], M[nb + i * s: nb + (i + 1) * s, :nb])
        for i in range(lay.nbranch)
    ])
    S6 = M[:nb, :nb] - np.einsum("bsi,bsj->ij", W, W)
    Ls = np.linalg.cholesky(S6)
    fac = ArrowFac(jnp.asarray(Ld), jnp.asarray(W), jnp.asarray(Ls), None)
    Gp2 = _leg_panels(lay, fac, jnp.asarray(J), lm2)

    # identity: G Gᵀ = J M⁻¹ Jᵀ including the same-branch pair rows
    g1 = np.asarray(Gp2[:, :s])
    g2 = np.asarray(Gp2[:, s:2 * s])
    gb = np.asarray(Gp2[:, 2 * s:])
    G = np.zeros((16, lay.nv))
    for r in range(16):
        G[r, nb + int(leg1[r]) * s: nb + (int(leg1[r]) + 1) * s] += g1[r]
        G[r, nb + int(leg2[r]) * s: nb + (int(leg2[r]) + 1) * s] += g2[r]
        G[r, :nb] += gb[r]
    np.testing.assert_allclose(G @ G.T, U @ J.T, atol=1e-8)

    # and the sweeps agree with the dense core
    d_out = pgs._scan_core(*(jnp.asarray(x) for x in (J, U, b, R, lo, hi)),
                           3, 4, 0)
    l_out = pgs._scan_core_legs(
        Gp2, lm2.leg1, lm2.leg2, jnp.asarray(b), jnp.asarray(R),
        jnp.asarray(lo), jnp.asarray(hi),
        lay.nbranch, lay.branch_size, lay.nbase, 3, 4, 0)
    np.testing.assert_allclose(np.asarray(l_out), np.asarray(d_out),
                               atol=1e-8)

    # the PRE-FIX metadata (slot 2 active on the same leg) provably
    # double-counts: the delassus identity breaks
    lm_bad = LegMeta(lm2.leg1, lm2.leg2, lm2.has1,
                     jnp.asarray(has2 | (np.arange(16) >= 12)))
    Gp_bad = _leg_panels(lay, fac, jnp.asarray(J), lm_bad)
    g1b, g2b, gbb = (np.asarray(Gp_bad[:, :s]),
                     np.asarray(Gp_bad[:, s:2 * s]),
                     np.asarray(Gp_bad[:, 2 * s:]))
    Gbad = np.zeros((16, lay.nv))
    for r in range(16):
        Gbad[r, nb + int(leg1[r]) * s: nb + (int(leg1[r]) + 1) * s] += g1b[r]
        Gbad[r, nb + int(leg2[r]) * s: nb + (int(leg2[r]) + 1) * s] += g2b[r]
        Gbad[r, :nb] += gbb[r]
    assert np.abs((Gbad @ Gbad.T) - U @ J.T).max() > 1e-3


def test_probe_cache_roundtrip(tmp_path, monkeypatch):
    """Persisted probe verdicts (VERDICT r4 weak #6): store/load round-trips
    through the JSON file atomically and choose_mode consumes a recorded
    verdict without probing (exercised via the cache helpers directly —
    the probe itself only runs on TPU backends)."""
    path = str(tmp_path / "probe.json")
    monkeypatch.setattr(pgs, "_PROBE_CACHE_PATH", path)
    key_s = f"{pgs._backend_fingerprint()}|(16, 12, 3, 4, 0, None, False, 'float32')"
    assert pgs._probe_cache_load() == {}
    pgs._probe_cache_store(key_s, "kernel")
    assert pgs._probe_cache_load() == {key_s: "kernel"}
    pgs._probe_cache_store("other", "scan")
    data = pgs._probe_cache_load()
    assert data[key_s] == "kernel" and data["other"] == "scan"
    # corrupt file degrades to empty, not an exception
    with open(path, "w") as fh:
        fh.write("{not json")
    assert pgs._probe_cache_load() == {}
