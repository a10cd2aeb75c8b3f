"""Pallas TPU kernel: fused batched Riccati backward sweep.

The Riccati recursion is the iLQR hot spot. Under XLA (vmap of a lax.scan)
each of the N~100 sequential steps pays loop overhead, carry HBM traffic,
and — dominant in practice — batched LAPACK-style small-matrix factorization
kernels (measured ~370 µs/step at B=128 before the unrolled-solve rewrite,
~90 µs/step after). This kernel runs the ENTIRE sweep in one Pallas program:

- layout: batch on the LANE axis — every (n×n) matrix is an (n, n, 128)
  array, so each scalar op of the recursion is one 128-wide vector op,
- matmuls are unrolled broadcast-FMA loops over the small contraction dim
  (n, m ≤ 13) — no MXU needed, the VPU eats them,
- the Quu solve is the same unrolled positive-definite elimination as
  solvers.ilqr.posdef_solve, lane-vectorized, with per-lane pivot-failure
  masks,
- the cost-to-go carry (Sx, Sxx) never leaves VMEM.

Reference semantics preserved (backward_pass.jl:9-85): regularized gains,
UNregularized value update, ΔV accumulation, per-problem fail flags for the
ρ-retry loop (which wraps the kernel from outside with per-lane ρ).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# Equilibrated-space pivot policy (f32): see _posdef_solve_lanes docstring.
# Same constants as the sqrt stage factorization (solvers/ilqr.py).
PIVOT_NEG_TOL_F32 = 1e-3
PIVOT_FLOOR_F32 = 1e-7


# ---------------------------------------------------- lane-batched helpers

def _mTm(A, S):
    """C = Aᵀ S with lane batch: A (p, q, B), S (p, r, B) → (q, r, B)."""
    p = A.shape[0]
    acc = A[0][:, None, :] * S[0][None, :, :]
    for k in range(1, p):
        acc = acc + A[k][:, None, :] * S[k][None, :, :]
    return acc


def _mTv(A, v):
    """Aᵀ v: A (p, q, B), v (p, B) → (q, B)."""
    p = A.shape[0]
    acc = A[0] * v[0][None, :]
    for k in range(1, p):
        acc = acc + A[k] * v[k][None, :]
    return acc


def _mm(A, S):
    """C = A S: A (q, p, B), S (p, r, B) → (q, r, B)."""
    p = S.shape[0]
    acc = A[:, 0, :][:, None, :] * S[0][None, :, :]
    for k in range(1, p):
        acc = acc + A[:, k, :][:, None, :] * S[k][None, :, :]
    return acc


def _mv(A, v):
    """A v: A (q, p, B), v (p, B) → (q, B)."""
    p = v.shape[0]
    acc = A[:, 0, :] * v[0][None, :]
    for k in range(1, p):
        acc = acc + A[:, k, :] * v[k][None, :]
    return acc


def _t(A):
    """Transpose of the leading two dims of (p, q, B) via slice-stacking
    (Mosaic-safe — no moveaxis on lane-last 3D values)."""
    q = A.shape[1]
    return jnp.stack([A[:, j, :] for j in range(q)])


def _posdef_solve_lanes(S, rhs):
    """Blocked PD elimination, lane-batched: S (m, m, B), rhs (m, k, B).

    Returns (X (m, k, B), fail (1, B)). Same SEMANTICS as
    solvers.ilqr.posdef_solve (f32 rounding may differ: back-substitution
    is column-oriented, so the per-row subtraction order is reversed vs
    the scalar reference). Each pivot applies ONE masked full-matrix
    rank-1 update instead of m−i row updates: the kernel is
    instruction-issue-bound at maze shapes (m=17; unrolls and tree
    reductions measured no gain), so ~8 large vector ops per pivot beat
    ~3(m−i) tiny (1, B)-row ops. Static 0/1 row masks keep shapes fixed.

    JACOBI EQUILIBRATION (round 4): the elimination runs on D·S·D with
    D = diag(1/√S_ii) and unscales the solution (x = D·z). AL-decorated
    Quu mixes penalty rows ~μ (up to 1e8) with R_inf slack rows (1e-8);
    the raw f32 elimination pivot-failed near κ ~ 1/ε_f32 and the
    solver's ρ-retry loop re-swept the WHOLE kernel ~10× per iLQR
    iteration — 65% of maze device time (profiled, benchmark/
    maze_profile.py). On the scaled matrix pivots are O(1): only genuine
    indefiniteness fails, and the retry loop fires only when ρ can
    actually fix something. Matches ops.linalg.posdef_solve.

    Pivot policy in the scaled space (f32): a pivot below −PIVOT_NEG_TOL
    is genuinely indefinite → fail/ρ-retry; pivots in (−tol, floor) are
    rounding-exhausted (κ(Quu) ≳ 1/ε_f32 — the f32 information is gone)
    and are CLAMPED to PIVOT_FLOOR instead of failing. Same policy as the
    sqrt stage factorization (solvers/ilqr.py SQRT_PIVOT_*): before it,
    rounding-level failures still triggered ~4 full re-sweeps per maze
    iteration (ρ climbing from 1e-8 by ×1.6 can take ~7 masked retries),
    ~60% of the remaining BP device time (benchmark/maze_profile.py).

    CAUTION — failed lanes can be FULLY NaN: when a pivot is 0/non-finite,
    inf·0 in the masked rank-1 update yields NaN even in rows the mask
    excludes, contaminating the entire lane. Callers MUST gate the
    returned solution on the ``fail`` mask (the Riccati kernel zeroes
    failed lanes via ``jnp.where(fail_k, 0, sol)``).
    """
    m, B = S.shape[0], S.shape[-1]
    dtype = S.dtype
    fail = jnp.zeros((1, B), dtype=jnp.bool_)
    # (m,1,1) row-index masks from iota (Pallas kernels cannot capture
    # array constants; Mosaic also rejects the mid-dim squeeze's shape
    # cast, so slices stay 3D throughout)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1, 1), 0)

    # D as (m,1,B) and (1,m,B) built from one-hot accumulation (no
    # sublane concatenate — Mosaic rejects it in this kernel context)
    tiny = jnp.asarray(1e-30 if dtype == jnp.float32 else 1e-300, dtype)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
    d_r = jnp.zeros((m, 1, B), dtype)
    d_c = jnp.zeros((1, m, B), dtype)
    for i in range(m):
        di = jax.lax.rsqrt(jnp.maximum(S[i, i:i + 1], tiny))   # (1, B)
        d_r = d_r + (rows == i).astype(dtype) * di[None]
        d_c = d_c + (cols == i).astype(dtype) * di[None]
    S = S * d_r * d_c
    rhs = rhs * d_r

    if dtype == jnp.float32:
        neg_tol, floor = PIVOT_NEG_TOL_F32, PIVOT_FLOOR_F32
    else:
        neg_tol, floor = 0.0, 0.0
    pivs = []
    for i in range(m):
        piv = S[i, i:i + 1]                                # (1, B)
        if neg_tol > 0.0:
            fail = fail | (piv < -neg_tol) | ~jnp.isfinite(piv)
            piv = jnp.maximum(piv, floor)
        else:
            fail = fail | (piv <= 0.0) | ~jnp.isfinite(piv)
        pivs.append(piv)
        inv = 1.0 / piv
        below = (rows > i).astype(dtype)
        f = S[:, i:i + 1, :] * inv * below                 # (m, 1, B)
        S = S - f * S[i][None, :, :]
        rhs = rhs - f * rhs[i][None, :, :]
    for i in range(m - 1, -1, -1):
        r_i = (rhs[i] / pivs[i])[None, :, :]               # (1, k, B)
        above = (rows < i).astype(dtype)
        onehot = (rows == i).astype(dtype)
        rhs = rhs - above * S[:, i:i + 1, :] * r_i
        rhs = rhs * (1.0 - onehot) + onehot * r_i
    return rhs * d_r, fail


# ----------------------------------------------------------------- kernel

def _riccati_kernel(N, n, m, reg_state,
                    A_ref, B_ref, lx_ref, lu_ref, lxx_ref, luu_ref, lux_ref,
                    rho_ref,
                    K_ref, d_ref, dV_ref, fail_ref,
                    Sx_ref, Sxx_ref, acc_ref):
    """One batch tile. Shapes (leading grid dim indexed [0]):
    A (1,N-1,n,n,B), B (1,N-1,n,m,B), lx (1,N,n,B), lu (1,N-1,m,B),
    lxx (1,N,n,n,B), luu (1,N-1,m,m,B), lux (1,N-1,m,n,B), rho (1,1,B)
    → K (1,N-1,m,n,B), d (1,N-1,m,B), dV (1,2,B), fail (1,1,B) [f32].
    """
    rho = rho_ref[0]                            # (1, B) — stay 2D
    # carries live in VMEM scratch (Mosaic cannot legalize multi-dim
    # scf.for iter_args): Sx (n,B), Sxx (n,n,B), acc (3,B)=dV1,dV2,fail
    Sx_ref[:] = lx_ref[0, N - 1]
    Sxx_ref[:] = lxx_ref[0, N - 1]
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(i, _):
        Sx = Sx_ref[:]
        Sxx = Sxx_ref[:]
        k = N - 2 - i
        A_k = A_ref[0, k]                       # (n, n, B)
        B_k = B_ref[0, k]                       # (n, m, B)

        SxxA = _mTm(Sxx, A_k)                   # Sxxᵀ A = Sxx A (sym)
        SxxB = _mTm(Sxx, B_k)
        Qx = lx_ref[0, k] + _mTv(A_k, Sx)
        Qu = lu_ref[0, k] + _mTv(B_k, Sx)
        Qxx = lxx_ref[0, k] + _mTm(A_k, SxxA)
        Quu = luu_ref[0, k] + _mTm(B_k, SxxB)
        Qux = lux_ref[0, k] + _mTm(B_k, SxxA)

        if reg_state:
            Quu_reg = Quu + rho[None] * _mTm(B_k, B_k)
            Qux_reg = Qux + rho[None] * _mTm(B_k, A_k)
        else:
            eye = jnp.eye(m, dtype=Quu.dtype)[:, :, None]
            Quu_reg = Quu + rho[None] * eye
            Qux_reg = Qux

        rhs = jnp.concatenate([Qux_reg, Qu[:, None, :]], axis=1)  # (m, n+1, B)
        sol, fail_k = _posdef_solve_lanes(Quu_reg, rhs)   # fail_k (1, B)
        sol = jnp.where(fail_k[None], 0.0, sol)
        K_k = -sol[:, :n]                       # (m, n, B)
        d_k = -sol[:, n]                        # (m, B)

        Quu_d = _mv(Quu, d_k)                       # Quu d (m, B)
        Sx_new = Qx + _mTv(K_k, Quu_d) + _mTv(K_k, Qu) + _mTv(Qux, d_k)
        QuuK = _mm(Quu, K_k)                        # Quu K (m, n, B)
        Sxx_new = Qxx + _mTm(K_k, QuuK) \
            + _mTm(Qux, K_k) + _mTm(K_k, Qux)
        Sxx_new = 0.5 * (Sxx_new + _t(Sxx_new))

        K_ref[0, k] = K_k
        d_ref[0, k] = d_k
        Sx_ref[:] = Sx_new
        Sxx_ref[:] = Sxx_new
        # unrolled sublane reductions (Mosaic rejects vector.multi_reduction
        # with offset layouts over the reduced dim)
        def _rowsum(v):
            acc1 = v[0:1]
            for i in range(1, v.shape[0]):
                acc1 = acc1 + v[i:i + 1]
            return acc1

        acc = acc_ref[:]
        acc_ref[0:1] = acc[0:1] + _rowsum(d_k * Qu)
        acc_ref[1:2] = acc[1:2] + 0.5 * _rowsum(d_k * Quu_d)
        acc_ref[2:3] = jnp.maximum(acc[2:3], jnp.where(fail_k, 1.0, 0.0))
        return 0

    jax.lax.fori_loop(0, N - 1, body, 0)
    dV_ref[0] = acc_ref[0:2]
    fail_ref[0] = acc_ref[2:3]


def _riccati_sweep_pallas_impl(A, B, lx, lu, lxx, luu, lux, rho,
                         reg_state: bool = False, interpret: bool = False):
    """Fused batched Riccati sweep.

    Batch-first inputs: A (Bz,N-1,n,n), B (Bz,N-1,n,m), lx (Bz,N,n),
    lu (Bz,N-1,m), lxx (Bz,N,n,n), luu (Bz,N-1,m,m), lux (Bz,N-1,m,n),
    rho (Bz,). Returns (K (Bz,N-1,m,n), d (Bz,N-1,m), dV1 (Bz,), dV2 (Bz,),
    fail (Bz,) bool). Bz must be a multiple of 128.
    """
    Bt = LANES
    Bz, Nm1, n, m = B.shape
    N = Nm1 + 1
    assert Bz % Bt == 0, "batch must be a multiple of 128"
    nb = Bz // Bt
    dtype = A.dtype

    def to_lanes(a):
        a = a.reshape((nb, Bt) + a.shape[1:])
        return jnp.moveaxis(a, 1, -1)

    ins = [to_lanes(x) for x in
           (A, B, lx, lu, lxx, luu, lux, rho[:, None])]

    kern = functools.partial(_riccati_kernel, N, n, m, reg_state)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape,
                            lambda i, _nd=nd: (i,) + (0,) * _nd,
                            memory_space=pltpu.VMEM)

    K, d, dV, fail = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            bspec((Nm1, n, n, Bt)),
            bspec((Nm1, n, m, Bt)),
            bspec((N, n, Bt)),
            bspec((Nm1, m, Bt)),
            bspec((N, n, n, Bt)),
            bspec((Nm1, m, m, Bt)),
            bspec((Nm1, m, n, Bt)),
            bspec((1, Bt)),
        ],
        out_specs=(
            bspec((Nm1, m, n, Bt)),
            bspec((Nm1, m, Bt)),
            bspec((2, Bt)),
            bspec((1, Bt)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, Nm1, m, n, Bt), dtype),
            jax.ShapeDtypeStruct((nb, Nm1, m, Bt), dtype),
            jax.ShapeDtypeStruct((nb, 2, Bt), dtype),
            jax.ShapeDtypeStruct((nb, 1, Bt), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, Bt), dtype),
            pltpu.VMEM((n, n, Bt), dtype),
            pltpu.VMEM((3, Bt), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ins)

    def from_lanes(a):
        a = jnp.moveaxis(a, -1, 1)
        return a.reshape((Bz,) + a.shape[2:])

    K = from_lanes(K)
    d = from_lanes(d)
    dV = from_lanes(dV)
    fail = from_lanes(fail)[:, 0] > 0
    return K, d, dV[:, 0], dV[:, 1], fail


def riccati_sweep_pallas(A, B, lx, lu, lxx, luu, lux, rho,
                         reg_state: bool = False, interpret: bool = False):
    """Chunked front-end: Mosaic double-buffers input blocks once the grid
    exceeds 2 programs, overflowing VMEM for large batches — so batches are
    processed in ≤256-problem chunks via ``lax.map`` (sequential chunks cost
    nothing on a single-core chip)."""
    Bz = A.shape[0]
    # 256-wide chunks only for small control dims — larger m blows the VMEM
    # budget once Mosaic double-buffers (m=17 maze-augmented model OOMs)
    chunk = 256 if (Bz % 256 == 0 and B.shape[-1] <= 8) else LANES
    if Bz <= chunk:
        return _riccati_sweep_pallas_impl(A, B, lx, lu, lxx, luu, lux, rho,
                                          reg_state, interpret)
    nchunk = Bz // chunk

    def resh(x):
        return x.reshape((nchunk, chunk) + x.shape[1:])

    out = jax.lax.map(
        lambda args: _riccati_sweep_pallas_impl(*args, reg_state, interpret),
        tuple(resh(x) for x in (A, B, lx, lu, lxx, luu, lux, rho)))
    return tuple(o.reshape((Bz,) + o.shape[2:]) for o in out)
