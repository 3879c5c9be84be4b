"""Constraint-solver core: box-bounded projected Gauss-Seidel + noslip.

Three interchangeable implementations with identical semantics (fixed
ascending row order, per-row force bounds [lo, hi], noslip pair updates with
frozen pair sums over the contact block — the solver contract documented in
physics/solver.py):

- ``_scan_core``     single-env lax.scan reference implementation;
- ``pgs_solve``      Pallas TPU kernel — holds A/b/R/f for a block of envs in
                     VMEM and runs every sweep on-chip (the BASELINE's
                     "contact-solver inner loop" kernel);
- ``pgs_core(...)``  a jax.custom_batching.custom_vmap wrapper: unbatched
                     callers get the scan version, vmapped callers get the
                     Pallas kernel on TPU (vmapped scan elsewhere;
                     NIGHTMARE_PGS=scan forces the fallback).

The env layer vmaps single-env physics; custom_vmap is what lets the whole
batch funnel into one kernel launch without restructuring the pipeline.

Row bounds encode constraint type and activity: contacts [0, ∞), joint
limits [0, ∞), dof friction [-fl, +fl]; inactive rows are pinned to [0, 0].

TPU layout notes (hard-won on this platform):
- Minor-dim-moving transposes of large arrays are catastrophically slow
  (~1000× a leading-dim transpose), so A enters the kernel as
  (row, env, col) — a (1,0,2) transpose — and all vectors stay in their
  natural (env, row) layout.
- Mosaic only allows *dynamic* indexing on non-tiled (leading) dims; the GS
  row select therefore slices A's leading row axis, while per-row scalar
  reads/writes on (env, row) vectors go through one-hot selects (nothing
  dynamic ever touches a lane/sublane axis).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# reference implementation (single env)
# ---------------------------------------------------------------------------


def _scan_core(A, b, R, lo, hi, iterations: int, noslip: int, ns_offset: int):
    nefc = b.shape[0]
    diag = jnp.diagonal(A)
    inv_d = 1.0 / jnp.maximum(diag + R, 1e-12)

    def gs_row(r, f):
        g = A[r] @ f + b[r] + R[r] * f[r]
        return f.at[r].set(jnp.clip(f[r] - g * inv_d[r], lo[r], hi[r]))

    def sweep(_, f):
        return jax.lax.fori_loop(0, nefc, gs_row, f)

    f = jax.lax.fori_loop(0, iterations, sweep, jnp.zeros_like(b))

    npairs = (nefc - ns_offset) // 2
    if noslip > 0 and npairs > 0:
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

        f = jax.lax.fori_loop(0, noslip, ns_sweep, f)
    return f


# ---------------------------------------------------------------------------
# Pallas TPU kernel (batched)
# ---------------------------------------------------------------------------


def _kernel(A_ref, b_ref, R_ref, lo_ref, hi_ref, diag_ref, f_ref, *,
            iterations: int, noslip: int, ns_offset: int, nefc: int):
    """A: (nefc, E, nefc) [row, env, col]; vectors: (E, nefc)."""
    b = b_ref[:]
    R = R_ref[:]
    lo = lo_ref[:]
    hi = hi_ref[:]
    diag = diag_ref[:]
    E = b.shape[0]
    dtype = b.dtype

    inv_d = 1.0 / jnp.maximum(diag + R, 1e-12)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (E, nefc), 1)

    def put(f, r, new):
        # column write via one-hot select (scatter / lane-dim dynamic slicing
        # are unavailable in Mosaic)
        return jnp.where(lane_ids == r, new[:, None], f)

    def rowval(M, r):
        return jnp.sum(jnp.where(lane_ids == r, M, 0.0), axis=1)

    def gs_row(r, f):
        Ar = A_ref[pl.ds(r, 1)][0]                  # (E, nefc)
        fr = rowval(f, r)
        g = jnp.sum(Ar * f, axis=1) + rowval(b, r) + rowval(R, r) * fr
        new = jnp.clip(fr - g * rowval(inv_d, r), rowval(lo, r), rowval(hi, r))
        return put(f, r, new)

    def sweep(_, f):
        return jax.lax.fori_loop(0, nefc, gs_row, f)

    f = jax.lax.fori_loop(0, iterations, sweep, jnp.zeros((E, nefc), dtype))

    npairs = (nefc - ns_offset) // 2
    if noslip > 0 and npairs > 0:
        def ns_pair(p, f):
            i = ns_offset + 2 * p
            j = i + 1
            Ai = A_ref[pl.ds(i, 1)][0]              # (E, nefc)
            Aj = A_ref[pl.ds(j, 1)][0]
            Aij = rowval(Ai, j)
            fi0 = rowval(f, i)
            fj0 = rowval(f, j)
            s = fi0 + fj0
            g = jnp.sum((Ai - Aj) * f, axis=1) + rowval(b, i) - rowval(b, j)
            h = rowval(diag, i) + rowval(diag, j) - 2.0 * Aij
            y = 0.5 * (fi0 - fj0) - g / jnp.maximum(h, 1e-12)
            y = jnp.clip(y, -0.5 * s, 0.5 * s)
            ok = rowval(hi, i) > 0
            fi = jnp.where(ok, 0.5 * s + y, fi0)
            fj = jnp.where(ok, 0.5 * s - y, fj0)
            return put(put(f, i, fi), j, fj)

        def ns_sweep(_, f):
            return jax.lax.fori_loop(0, npairs, ns_pair, f)

        f = jax.lax.fori_loop(0, noslip, ns_sweep, f)

    f_ref[:] = f


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "noslip", "ns_offset", "block_envs",
                     "interpret"),
)
def pgs_solve(
    A: jnp.ndarray,        # (N, nefc, nefc)  J M⁻¹ Jᵀ (no regularization)
    b: jnp.ndarray,        # (N, nefc)        J qacc_smooth − aref
    R: jnp.ndarray,        # (N, nefc)        regularization diagonal
    lo: jnp.ndarray,       # (N, nefc)        per-row force lower bound
    hi: jnp.ndarray,       # (N, nefc)        per-row force upper bound
    iterations: int = 3,
    noslip: int = 4,
    ns_offset: int = 0,
    block_envs: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    N, nefc = b.shape
    E = min(block_envs, N)
    while N % E:
        E //= 2
    kern = functools.partial(
        _kernel, iterations=iterations, noslip=noslip, ns_offset=ns_offset,
        nefc=nefc,
    )
    # leading-dims-only transpose (cheap on TPU, unlike minor-dim moves)
    A_r = jnp.transpose(A, (1, 0, 2))               # (nefc, N, nefc)
    eye = jnp.eye(nefc, dtype=A.dtype)
    diag = jnp.sum(A * eye[None], axis=2)           # (N, nefc)
    # keep bounds finite inside the kernel
    big = jnp.asarray(3e38, A.dtype)
    lo_f = jnp.clip(lo, -big, big)
    hi_f = jnp.clip(hi, -big, big)
    vec = lambda: pl.BlockSpec((E, nefc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(N // E,),
        in_specs=[
            pl.BlockSpec((nefc, E, nefc), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            vec(), vec(), vec(), vec(), vec(),
        ],
        out_specs=vec(),
        out_shape=jax.ShapeDtypeStruct((N, nefc), A.dtype),
        interpret=interpret,
    )(A_r, b, R, lo_f, hi_f, diag)


# ---------------------------------------------------------------------------
# custom_vmap dispatcher
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def pgs_core(iterations: int, noslip: int, ns_offset: int = 0):
    """PGS core that upgrades itself to the Pallas kernel under vmap."""

    @jax.custom_batching.custom_vmap
    def core(A, b, R, lo, hi):
        return _scan_core(A, b, R, lo, hi, iterations, noslip, ns_offset)

    @core.def_vmap
    def _rule(axis_size, in_batched, A, b, R, lo, hi):  # noqa: ANN001
        # env-constant operands (e.g. friction bounds) arrive unbatched
        A, b, R, lo, hi = (
            x if bt else jnp.broadcast_to(x, (axis_size,) + x.shape)
            for x, bt in zip((A, b, R, lo, hi), in_batched)
        )
        # NIGHTMARE_PGS=kernel|scan overrides; default: the Pallas kernel on
        # real TPU.  (On this dev box's tunneled/emulated TPU, Pallas ops run
        # ~100x slower than XLA ops — see PARITY.md.)
        mode = os.environ.get("NIGHTMARE_PGS", "kernel")
        if jax.default_backend() == "tpu" and mode == "kernel":
            out = pgs_solve(A, b, R, lo, hi, iterations=iterations,
                            noslip=noslip, ns_offset=ns_offset)
        else:
            out = jax.vmap(
                lambda a, bb, rr, l, h: _scan_core(
                    a, bb, rr, l, h, iterations, noslip, ns_offset
                )
            )(A, b, R, lo, hi)
        return out, True

    return core
