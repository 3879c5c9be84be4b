"""Constraint-solver core: box-bounded projected Gauss-Seidel + noslip.

Matrix-free formulation.  The classic dual PGS sweeps rows of the Delassus
matrix A = J M⁻¹ Jᵀ; assembling A used to be ~70% of every physics substep's
FLOPs (80×80 from 80×24 operands).  Instead the core carries the smooth-space
velocity response w = M⁻¹ Jᵀ f and never forms A:

    A[r]·f  = J[r]·w                      (row evaluation, nv MACs)
    f[r] += Δ  ⇒  w += U[r]·Δ             (rank-1 update, U = J M⁻¹)

which is algebraically identical to the explicit-A sweep (M⁻¹ is SPD, so
M⁻¹ J[r]ᵀ = (J M⁻¹)[r]ᵀ) and differs only in rounding.  Cost per sweep drops
from nefc² to 2·nefc·nv MACs, and the only precomputation left is
U = J M⁻¹ (nefc×nv) — a ~3× FLOP cut for the nightmare_v3 contact system
(nefc=80, nv=24); tests/test_ops.py asserts equivalence against an explicit-A
oracle.

Three interchangeable implementations with identical semantics (fixed
ascending row order, per-row force bounds [lo, hi], noslip pair updates with
frozen pair sums over the contact block — the solver contract documented in
physics/solver.py):

- ``_scan_core``     single-env lax.scan reference implementation;
- ``pgs_solve``      Pallas TPU kernel — holds J/U/b/R/f for a block of envs
                     in VMEM and runs every sweep on-chip (the BASELINE's
                     "contact-solver inner loop" kernel).  The matrix-free
                     panels (2·nefc×nv) need less VMEM than A (nefc×nefc)
                     whenever 2·nv < nefc, so bigger env blocks fit;
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
  (~1000× a leading-dim transpose), so J and U enter the kernel as
  (row, env, col) — a (1,0,2) transpose — and all vectors stay in their
  natural (env, row) layout.
- Mosaic only allows *dynamic* indexing on non-tiled (leading) dims; the GS
  row select therefore slices the leading row axis of J/U, while per-row
  scalar reads/writes on (env, row) vectors go through one-hot selects
  (nothing dynamic ever touches a lane/sublane axis).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pair_offdiag(J, U, ns_offset: int):
    """A[i,j] for the consecutive ± facet pairs (i, j=i+1) the noslip pass
    updates, computed without forming A.  Returns (npairs,) or (N, npairs)."""
    nefc = J.shape[-2]
    npairs = (nefc - ns_offset) // 2
    if npairs <= 0:
        return jnp.zeros(J.shape[:-2] + (0,), J.dtype)
    idx = ns_offset + 2 * jnp.arange(npairs)
    return jnp.sum(
        jnp.take(J, idx, axis=-2) * jnp.take(U, idx + 1, axis=-2), axis=-1
    )


# ---------------------------------------------------------------------------
# reference implementation (single env)
# ---------------------------------------------------------------------------


def _scan_core(J, U, b, R, lo, hi, iterations: int, noslip: int,
               ns_offset: int):
    nefc, nv = J.shape
    diag = jnp.sum(J * U, axis=1)
    inv_d = 1.0 / jnp.maximum(diag + R, 1e-12)

    def gs_row(r, carry):
        f, w = carry
        g = J[r] @ w + b[r] + R[r] * f[r]
        new = jnp.clip(f[r] - g * inv_d[r], lo[r], hi[r])
        w = w + U[r] * (new - f[r])
        return f.at[r].set(new), w

    def sweep(_, carry):
        return jax.lax.fori_loop(0, nefc, gs_row, carry)

    # f starts at 0 ⇒ w starts exactly at 0; every subsequent w is the
    # rank-1-maintained M⁻¹Jᵀf (drift is plain FP accumulation, bounded by
    # the 7·nefc updates of one solver call — the force restarts each step)
    f0 = jnp.zeros_like(b)
    w0 = jnp.zeros(nv, b.dtype)
    f, w = jax.lax.fori_loop(0, iterations, sweep, (f0, w0))

    npairs = (nefc - ns_offset) // 2
    if noslip > 0 and npairs > 0:
        Aij = _pair_offdiag(J, U, ns_offset)

        def ns_pair(p, carry):
            f, w = carry
            i, j = ns_offset + 2 * p, ns_offset + 2 * p + 1
            s = f[i] + f[j]
            g = (J[i] - J[j]) @ w + b[i] - b[j]
            h = diag[i] + diag[j] - 2.0 * Aij[p]
            y = 0.5 * (f[i] - f[j]) - g / jnp.maximum(h, 1e-12)
            y = jnp.clip(y, -0.5 * s, 0.5 * s)
            ok = hi[i] > 0
            fi = jnp.where(ok, 0.5 * s + y, f[i])
            fj = jnp.where(ok, 0.5 * s - y, f[j])
            w = w + U[i] * (fi - f[i]) + U[j] * (fj - f[j])
            return f.at[i].set(fi).at[j].set(fj), w

        def ns_sweep(_, carry):
            return jax.lax.fori_loop(0, npairs, ns_pair, carry)

        f, w = jax.lax.fori_loop(0, noslip, ns_sweep, (f, w))
    return f


# ---------------------------------------------------------------------------
# Pallas TPU kernel (batched)
# ---------------------------------------------------------------------------


def _kernel(J_ref, U_ref, b_ref, R_ref, lo_ref, hi_ref, diag_ref, Aij_ref,
            f_ref, *, iterations: int, noslip: int, ns_offset: int,
            nefc: int, nv: int):
    """J, U: (nefc, E, nv) [row, env, col]; vectors: (E, nefc)."""
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

    def gs_row(r, carry):
        f, w = carry
        Jr = J_ref[pl.ds(r, 1)][0]                  # (E, nv)
        fr = rowval(f, r)
        g = jnp.sum(Jr * w, axis=1) + rowval(b, r) + rowval(R, r) * fr
        new = jnp.clip(fr - g * rowval(inv_d, r), rowval(lo, r), rowval(hi, r))
        w = w + U_ref[pl.ds(r, 1)][0] * (new - fr)[:, None]
        return put(f, r, new), w

    def sweep(_, carry):
        return jax.lax.fori_loop(0, nefc, gs_row, carry)

    f0 = jnp.zeros((E, nefc), dtype)
    w0 = jnp.zeros((E, nv), dtype)
    f, w = jax.lax.fori_loop(0, iterations, sweep, (f0, w0))

    npairs = (nefc - ns_offset) // 2
    if noslip > 0 and npairs > 0:
        Aij = Aij_ref[:]                            # (E, npairs)
        pair_ids = jax.lax.broadcasted_iota(jnp.int32, (E, npairs), 1)

        def ns_pair(p, carry):
            f, w = carry
            i = ns_offset + 2 * p
            j = i + 1
            Ji = J_ref[pl.ds(i, 1)][0]              # (E, nv)
            Jj = J_ref[pl.ds(j, 1)][0]
            Aij_p = jnp.sum(jnp.where(pair_ids == p, Aij, 0.0), axis=1)
            fi0 = rowval(f, i)
            fj0 = rowval(f, j)
            s = fi0 + fj0
            g = jnp.sum((Ji - Jj) * w, axis=1) + rowval(b, i) - rowval(b, j)
            h = rowval(diag, i) + rowval(diag, j) - 2.0 * Aij_p
            y = 0.5 * (fi0 - fj0) - g / jnp.maximum(h, 1e-12)
            y = jnp.clip(y, -0.5 * s, 0.5 * s)
            ok = rowval(hi, i) > 0
            fi = jnp.where(ok, 0.5 * s + y, fi0)
            fj = jnp.where(ok, 0.5 * s - y, fj0)
            w = (w + U_ref[pl.ds(i, 1)][0] * (fi - fi0)[:, None]
                 + U_ref[pl.ds(j, 1)][0] * (fj - fj0)[:, None])
            return put(put(f, i, fi), j, fj), w

        def ns_sweep(_, carry):
            return jax.lax.fori_loop(0, npairs, ns_pair, carry)

        f, w = jax.lax.fori_loop(0, noslip, ns_sweep, (f, w))

    f_ref[:] = f


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "noslip", "ns_offset", "block_envs",
                     "interpret"),
)
def pgs_solve(
    J: jnp.ndarray,        # (N, nefc, nv)    constraint Jacobian
    U: jnp.ndarray,        # (N, nefc, nv)    J M⁻¹
    b: jnp.ndarray,        # (N, nefc)        J qacc_smooth − aref
    R: jnp.ndarray,        # (N, nefc)        regularization diagonal
    lo: jnp.ndarray,       # (N, nefc)        per-row force lower bound
    hi: jnp.ndarray,       # (N, nefc)        per-row force upper bound
    iterations: int = 3,
    noslip: int = 4,
    ns_offset: int = 0,
    block_envs: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    N, nefc = b.shape
    nv = J.shape[-1]
    # E=64 measured as the largest block that fits the 16 MB scoped-VMEM
    # stack at (nefc=80, nv=24) with the f/w loop carries; E=128 OOMs
    E = min(block_envs, N)
    while N % E:
        E //= 2
    kern = functools.partial(
        _kernel, iterations=iterations, noslip=noslip, ns_offset=ns_offset,
        nefc=nefc, nv=nv,
    )
    # leading-dims-only transpose (cheap on TPU, unlike minor-dim moves)
    J_r = jnp.transpose(J, (1, 0, 2))               # (nefc, N, nv)
    U_r = jnp.transpose(U, (1, 0, 2))
    diag = jnp.sum(J * U, axis=2)                   # (N, nefc)
    npairs = (nefc - ns_offset) // 2
    Aij = (_pair_offdiag(J, U, ns_offset) if noslip > 0 and npairs > 0
           else jnp.zeros((N, 1), J.dtype))
    # keep bounds finite inside the kernel
    big = jnp.asarray(3e38, J.dtype)
    lo_f = jnp.clip(lo, -big, big)
    hi_f = jnp.clip(hi, -big, big)
    vec = lambda n=nefc: pl.BlockSpec((E, n), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    panel = pl.BlockSpec((nefc, E, nv), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(N // E,),
        in_specs=[
            panel, panel,
            vec(), vec(), vec(), vec(), vec(), vec(Aij.shape[1]),
        ],
        out_specs=vec(),
        out_shape=jax.ShapeDtypeStruct((N, nefc), J.dtype),
        interpret=interpret,
    )(J_r, U_r, b, R, lo_f, hi_f, diag, Aij)


# ---------------------------------------------------------------------------
# custom_vmap dispatcher
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _is_axon_backend() -> bool:
    """True when the TPU is reached through the axon tunnel (emulated perf
    profile; identified by its PJRT platform_version string)."""
    try:
        return "axon" in jax.devices()[0].client.platform_version
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def pgs_core(iterations: int, noslip: int, ns_offset: int = 0):
    """PGS core that upgrades itself to the Pallas kernel under vmap."""

    @jax.custom_batching.custom_vmap
    def core(J, U, b, R, lo, hi):
        return _scan_core(J, U, b, R, lo, hi, iterations, noslip, ns_offset)

    @core.def_vmap
    def _rule(axis_size, in_batched, J, U, b, R, lo, hi):  # noqa: ANN001
        # env-constant operands (e.g. friction bounds) arrive unbatched
        J, U, b, R, lo, hi = (
            x if bt else jnp.broadcast_to(x, (axis_size,) + x.shape)
            for x, bt in zip((J, U, b, R, lo, hi), in_batched)
        )
        # NIGHTMARE_PGS=kernel|scan overrides; default: the Pallas kernel on
        # real TPU, the vmapped scan on the axon-tunneled dev backend (where
        # Mosaic kernels execute far below XLA ops: 113k vs 145k env-steps/s
        # measured on the full env step — BENCH_NOTES round 3).
        mode = os.environ.get("NIGHTMARE_PGS")
        if mode is None:
            mode = "scan" if _is_axon_backend() else "kernel"
        if jax.default_backend() == "tpu" and mode == "kernel":
            out = pgs_solve(J, U, b, R, lo, hi, iterations=iterations,
                            noslip=noslip, ns_offset=ns_offset)
        else:
            out = jax.vmap(
                lambda j, u, bb, rr, l, h: _scan_core(
                    j, u, bb, rr, l, h, iterations, noslip, ns_offset
                )
            )(J, U, b, R, lo, hi)
        return out, True

    return core
