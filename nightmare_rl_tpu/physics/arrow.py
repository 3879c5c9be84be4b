"""Block-arrow mass-matrix factorization for legged kinematic trees.

The joint-space inertia matrix of every model this framework targets
(free-floating base + B independent serial legs: the hexapod's 6x3 hinge
chains, reference models/nightmare_v3/mjmodel.xml:33-133, and anymal_c's
4x3, models/anymal_c/anymal_c.xml:103-281) is block-arrow sparse: legs do
not couple with each other, only with the 6 base dofs.

    M = [[ B6   C^T ]      B6: 6x6 base block
         [ C    D   ]]     D:  block-diag of per-leg s x s chains
                           C:  (B, s, 6) leg<->base coupling

Factor once per step:  Ld = chol(D_b) batched over legs,
W_b = Ld_b^{-1} C_b, and the 6x6 Schur complement S = B6 - sum_b W_b^T W_b
with Ls = chol(S).  Solves and the explicit inverse then cost O(B s^2 + 6^2)
instead of the dense O(nv^3) -- on the FLOP-bound TPU path this removes the
dominant cost of the physics substep (dense 24x24 Cholesky + triangular
inverse; see scripts/profile_flops.py).  All ops are batched over legs with
static shapes, so they vectorize cleanly under vmap over envs and tile onto
the VPU/MXU.

Exact algebra: results match the dense Cholesky path to roundoff
(tests/test_ops.py::test_arrow_*).  Models whose topology does not match
(no free root, unequal/non-contiguous branches) fall back to the dense path
automatically (layout() returns None).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from nightmare_rl_tpu.ops import linalg
from nightmare_rl_tpu.physics import system as S


class ArrowLayout(NamedTuple):
    nv: int
    nbase: int        # base dof count (6: free joint)
    nbranch: int      # B
    branch_size: int  # s; branch b owns dofs [nbase + b*s, nbase + (b+1)*s)


def layout(sys: S.System) -> Optional[ArrowLayout]:
    """Detect the free-root + equal independent branches structure from the
    System's static topology; None -> caller uses the dense path."""
    roots = [b for b in range(1, sys.nbody) if sys.body_parent[b] == 0]
    if len(roots) != 1:
        return None
    rb = roots[0]
    if sys.body_jntnum[rb] != 1:
        return None
    j0 = sys.body_jntadr[rb]
    if sys.jnt_type[j0] != S.FREE or sys.jnt_dofadr[j0] != 0:
        return None

    children = [[] for _ in range(sys.nbody)]
    for b in range(1, sys.nbody):
        children[sys.body_parent[b]].append(b)

    branches = []
    for c in children[rb]:
        dofs = []
        stack = [c]
        while stack:
            b = stack.pop()
            for k in range(sys.body_jntnum[b]):
                j = sys.body_jntadr[b] + k
                if sys.jnt_type[j] not in (S.HINGE, S.SLIDE):
                    return None
                dofs.append(sys.jnt_dofadr[j])
            stack.extend(children[b])
        if dofs:
            dofs.sort()
            if dofs != list(range(dofs[0], dofs[0] + len(dofs))):
                return None
            branches.append(dofs)
    if not branches:
        return None
    branches.sort(key=lambda d: d[0])
    s = len(branches[0])
    if any(len(d) != s for d in branches):
        return None
    flat = [d for br in branches for d in br]
    if flat != list(range(6, sys.nv)):
        return None
    return ArrowLayout(sys.nv, 6, len(branches), s)


class ArrowFac(NamedTuple):
    Ld: jnp.ndarray  # (B, s, s) chol of per-branch diagonal blocks
    W: jnp.ndarray   # (B, s, 6) = Ld^{-1} C
    Ls: jnp.ndarray  # (6, 6) chol of the base Schur complement
    C: jnp.ndarray   # (B, s, 6) leg-base coupling rows of M


def _solve_tril(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """X = L^{-1} B by unrolled forward substitution (static small n).
    L (..., n, n) lower-triangular, B (..., n, k)."""
    n = L.shape[-1]
    rows = []
    for i in range(n):
        acc = B[..., i, :]
        for k in range(i):
            acc = acc - L[..., i, k, None] * rows[k]
        rows.append(acc / L[..., i, i, None])
    return jnp.stack(rows, axis=-2)


def _solve_triu(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """X = L^{-T} B by unrolled back substitution."""
    n = L.shape[-1]
    rows: list = [None] * n
    for i in reversed(range(n)):
        acc = B[..., i, :]
        for k in range(i + 1, n):
            acc = acc - L[..., k, i, None] * rows[k]
        rows[i] = acc / L[..., i, i, None]
    return jnp.stack(rows, axis=-2)


def factor(lay: ArrowLayout, M: jnp.ndarray) -> ArrowFac:
    nb, B, s = lay.nbase, lay.nbranch, lay.branch_size
    legs = M[nb:, nb:]
    # per-branch diagonal blocks: strided view (B, s, B, s) -> take diagonal
    D = legs.reshape(B, s, B, s)[np.arange(B), :, np.arange(B), :]
    C = M[nb:, :nb].reshape(B, s, nb)
    Ld = linalg.chol(D)
    W = _solve_tril(Ld, C)
    Ssc = M[:nb, :nb] - jnp.einsum("bsi,bsj->ij", W, W)
    Ls = linalg.chol(Ssc)
    return ArrowFac(Ld, W, Ls, C)


def solve_vec(lay: ArrowLayout, fac: ArrowFac, b: jnp.ndarray) -> jnp.ndarray:
    """x = M^{-1} b for a single rhs (..., nv)."""
    nb, B, s = lay.nbase, lay.nbranch, lay.branch_size
    b0 = b[..., :nb]
    bl = b[..., nb:].reshape(b.shape[:-1] + (B, s))
    y = _solve_triu(fac.Ld, _solve_tril(fac.Ld, bl[..., None]))[..., 0]
    r0 = b0 - jnp.einsum("...bsk,...bs->...k", fac.C, y)
    x0 = _solve_triu(fac.Ls, _solve_tril(fac.Ls, r0[..., None]))[..., 0]
    xl = y - _solve_triu(fac.Ld, (fac.W @ x0[..., None, :, None]))[..., 0]
    return jnp.concatenate(
        [x0, xl.reshape(b.shape[:-1] + (B * s,))], axis=-1
    )


def inv(lay: ArrowLayout, fac: ArrowFac) -> jnp.ndarray:
    """Explicit M^{-1} (nv, nv) assembled from the factor blocks:

        Minv = [[ Sinv        -(E Sinv)^T ]
                [ -E Sinv   Dinv + E Sinv E^T ]],   E = D^{-1} C.
    """
    nb, B, s = lay.nbase, lay.nbranch, lay.branch_size
    Sinv = linalg.spd_inv_from_chol(fac.Ls)                    # (6,6)
    E = _solve_triu(fac.Ld, fac.W)                             # (B,s,6)
    G = E @ Sinv                                               # (B,s,6)
    Dinv = linalg.spd_inv_from_chol(fac.Ld)                    # (B,s,s)
    cross = jnp.einsum("bsk,ctk->bsct", G, E)                  # (B,s,B,s)
    ii = np.arange(B)
    cross = cross.at[ii, :, ii, :].add(Dinv)
    bl = -G.reshape(B * s, nb)                                 # legs-base
    top = jnp.concatenate([Sinv, bl.T], axis=-1)
    bot = jnp.concatenate([bl, cross.reshape(B * s, B * s)], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
