"""Unrolled small-matrix linear algebra for the dynamics hot path.

XLA's ``jnp.linalg.cholesky`` / triangular solves lower to sequential
``while``-loop programs on TPU; for the tiny SPD systems rigid-body dynamics
needs (nv = 24 for the hexapod — free base + 18 hinges, reference model
models/nightmare_v3/mjmodel.xml:33-133) they run ~3x slower than a statically
unrolled factorization, measured at 4096 batched envs on TPU (the dimension
is a compile-time constant, so full unrolling is free of trace-size risk).

These routines operate on the trailing two axes and broadcast over any
leading batch axes, so they work unchanged under ``vmap`` and inside the
jitted env step.  Numerics: the outer-product Cholesky below is the textbook
algorithm LAPACK uses; agreement with ``jnp.linalg.cholesky`` is at roundoff
(tests/test_ops.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def chol(M: jnp.ndarray) -> jnp.ndarray:
    """Cholesky factor L (lower) of SPD ``M``, unrolled over the static size.

    Equivalent to ``jnp.linalg.cholesky(M)`` for well-conditioned input but
    compiles to pure vectorized elementwise ops (no while loops).
    """
    n = M.shape[-1]
    idx = jnp.arange(n)
    A = M
    cols = []
    for j in range(n):
        d = jnp.sqrt(A[..., j, j])
        c = A[..., :, j] / d[..., None]
        c = c * (idx >= j)              # zero the strictly-upper part
        cols.append(c)
        # rank-1 downdate; rows/cols < j are stale but never read again
        A = A - c[..., :, None] * c[..., None, :]
    return jnp.stack(cols, axis=-1)


def tri_inv(L: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a lower-triangular matrix by unrolled forward substitution."""
    n = L.shape[-1]
    eye = jnp.eye(n, dtype=L.dtype)
    rows = []
    for i in range(n):
        acc = jnp.broadcast_to(eye[i], L.shape[:-2] + (n,))
        for k in range(i):
            acc = acc - L[..., i, k, None] * rows[k]
        rows.append(acc / L[..., i, i, None])
    return jnp.stack(rows, axis=-2)


def spd_inv_from_chol(L: jnp.ndarray) -> jnp.ndarray:
    """M⁻¹ = L⁻ᵀ L⁻¹ from the Cholesky factor (one matmul, MXU-friendly)."""
    Li = tri_inv(L)
    return jnp.einsum("...ki,...kj->...ij", Li, Li)
