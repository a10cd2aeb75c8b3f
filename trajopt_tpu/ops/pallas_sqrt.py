"""Pallas TPU kernel: fused batched SQUARE-ROOT Riccati backward sweep.

The QR sqrt sweep (solvers/ilqr.py ``sqrt_sweep``, mirroring reference
_backwardpass_sqrt!, backward_pass.jl:87-169) is the best-quality f32
configuration (error-state + sqrt: conv 0.992, med err 2e-4 — BENCH_LOCAL),
but under XLA its per-knot ``jnp.linalg.qr`` lowers to batched LAPACK-style
loops that cap it at ~24 solves/s vs ~670 for the fused scan kernel. This
kernel runs the whole sqrt sweep lane-batched in one Pallas program
(VERDICT r1 item 3 / builder roadmap #1).

Algorithm per knot (semantics of sqrt_sweep, ρ folded into the stage
factorization — adding ρ to the Quu block of the joint Hessian before the
Cholesky is algebraically identical to appending √ρ·[I 0] rows to the
pre-array):

1. lane-batched Cholesky of the joint stage Hessian
   [[luu + ρI, lux], [luxᵀ, lxx]] → upper factor R1 (p×p, p = m+n),
   kept as a list of p rows, each an (p, B) lane vector.
2. Householder triangularization of [R1 ; Ssqrt·[B A]] — the classic
   QR-update structure: column j needs one reflection against the n dense
   rows (R1's subdiagonal is already zero), applied VECTORIZED to the whole
   row tail. Dense rows are carried transposed (Dt: (p, n, B)) so both the
   reflection inner products and the rank-1 update are single broadcast
   ops.
3. gains from the R blocks: K = −Ruu⁻¹Rux (unrolled back-substitution),
   d = −Ruu⁻¹Ruu⁻ᵀQu, cost-to-go gradient update, ΔV terms; Rxx is the
   next Ssqrt (never squared through time).

Layout rules follow ops/pallas_riccati.py: batch on the lane axis,
scalars as (1, B), carries in VMEM scratch, unrolled sublane reductions,
one-hot masked writes instead of per-element updates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _rowsum(v):
    """Sum over the sublane axis of (r, B) → (1, B), unrolled."""
    acc = v[0:1]
    for i in range(1, v.shape[0]):
        acc = acc + v[i:i + 1]
    return acc


def _mTv(A, v):
    """Aᵀ v: A (p, q, B), v (p, B) → (q, B)."""
    p = A.shape[0]
    acc = A[0] * v[0][None, :]
    for k in range(1, p):
        acc = acc + A[k] * v[k][None, :]
    return acc


def _mv(A, v):
    """A v: A (q, p, B), v (p, B) → (q, B)."""
    p = v.shape[0]
    acc = A[:, 0, :] * v[0:1]
    for k in range(1, p):
        acc = acc + A[:, k, :] * v[k:k + 1]
    return acc


def _sqrt_kernel(N, n, m, A_ref, B_ref, lx_ref, lu_ref, lxx_ref, luu_ref,
                 lux_ref, rho_ref,
                 K_ref, d_ref, dV_ref, fail_ref,
                 Sx_ref, Ss_ref, acc_ref):
    """One batch tile. p = m + n columns, ordered [u | x].

    Ss_ref carries the upper-triangular Ssqrt (n, n, B); Sx_ref the value
    gradient (n, B); acc_ref rows = (dV1, dV2, fail).
    """
    p = m + n
    dtype = Sx_ref.dtype
    rho = rho_ref[0]                                   # (1, B)
    tiny = jnp.asarray(1e-30, dtype)

    iota_p = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)

    # ---- terminal: Ssqrt_N = chol(lxxN)ᵀ (upper), lane-batched ----------
    def chol_upper(rows, dim, fail):
        """rows: list of dim (dim, B) arrays holding a symmetric matrix's
        rows. Plain Cholesky FIRST (exact rounding of the original kernel
        — the f32 hot-gain iteration path is chaotically sensitive at
        κ(Quu)~1e9, and switching every knot to equilibrated arithmetic
        measured 28→43 mean iterations on the TPU flagship); lanes whose
        plain factorization breaks down get the Jacobi-EQUILIBRATED
        factor instead (factor D·M·D with unit diagonal, unscale the
        COLUMNS of the upper factor — (U·D⁻¹)ᵀ(U·D⁻¹) = M): AL stage
        Hessians mixing penalty rows ~μ (1e8) with slack rows ~R_inf
        (1e-8) NaN the raw f32 Cholesky, and a failed STAGE factor is
        un-fixable by ρ-retries (pre-fix those lanes froze with zeroed
        gains). Rounding-exhausted pivots of the scaled matrix clamp to a
        floor; substantially negative = genuinely indefinite = fail.
        Returns (list of dim rows of the upper factor, fail)."""
        # --- plain path (bit-exact vs the original kernel) ---------------
        plain = []
        f_plain = jnp.zeros_like(fail)
        for i in range(dim):
            s = rows[i]
            for k in range(i):
                s = s - plain[k][i:i + 1] * plain[k]
            piv2 = s[i:i + 1] + 1e-14
            f_plain = f_plain | (piv2 <= 0.0) | ~jnp.isfinite(piv2)
            piv = jnp.sqrt(jnp.maximum(piv2, tiny))
            row = s / piv
            row = jnp.where(iota_p[:row.shape[0]] == i, piv, row)
            row = jnp.where(iota_p[:row.shape[0]] < i, 0.0, row)
            plain.append(row)
        # --- equilibrated fallback ---------------------------------------
        dinv = [jax.lax.rsqrt(jnp.maximum(rows[i][i:i + 1], 1e-30))
                for i in range(dim)]                      # (1, B) each
        dinv_col = jnp.concatenate(dinv, axis=0)          # (dim, B)
        if dtype == jnp.float32:
            neg_tol, floor = 1e-3, 1e-7
        else:
            neg_tol, floor = 0.0, 1e-300
        f_eq = jnp.zeros_like(fail)
        eq = []
        for i in range(dim):
            s = rows[i] * dinv[i] * dinv_col
            for k in range(i):
                s = s - eq[k][i:i + 1] * eq[k]
            piv2 = s[i:i + 1]
            if neg_tol > 0.0:
                f_eq = f_eq | (piv2 < -neg_tol) | ~jnp.isfinite(piv2)
            else:
                f_eq = f_eq | (piv2 <= 0.0) | ~jnp.isfinite(piv2)
            piv = jnp.sqrt(jnp.maximum(piv2, floor))
            row = s / piv
            row = jnp.where(iota_p[:row.shape[0]] == i, piv, row)
            row = jnp.where(iota_p[:row.shape[0]] < i, 0.0, row)
            eq.append(row)
        # unscale columns: U[i][j] = U_s[i][j]·√d_j
        dsqrt_col = 1.0 / dinv_col
        out = [jnp.where(f_plain, eq[i] * dsqrt_col, plain[i])
               for i in range(dim)]
        return out, fail | (f_plain & f_eq)

    fail = jnp.zeros((1, Sx_ref.shape[-1]), dtype=jnp.bool_)
    lxxN_rows = [lxx_ref[0, N - 1][i] for i in range(n)]
    SsN_rows, fail = chol_upper(lxxN_rows, n, fail)
    Ss_ref[:] = jnp.stack(SsN_rows)
    Sx_ref[:] = lx_ref[0, N - 1]
    acc_ref[0:2] = jnp.zeros_like(acc_ref[0:2])
    acc_ref[2:3] = jnp.where(fail, 1.0, 0.0)

    def body(i, _):
        k = N - 2 - i
        Sx = Sx_ref[:]                                  # (n, B)
        Ss = Ss_ref[:]                                  # (n, n, B) upper
        A_k = A_ref[0, k]                               # (n, n, B)
        B_k = B_ref[0, k]                               # (n, m, B)
        lx = lx_ref[0, k]
        lu = lu_ref[0, k]
        fail_k = jnp.zeros((1, Sx.shape[-1]), dtype=jnp.bool_)

        # ---- 1) stage factor R1 = chol(joint + ρ·diag_u)ᵀ --------------
        # joint rows built (p, B) each: [luu + ρI | lux] then [luxᵀ | lxx]
        luu_k = luu_ref[0, k]                           # (m, m, B)
        lux_k = lux_ref[0, k]                           # (m, n, B)
        lxx_k = lxx_ref[0, k]                           # (n, n, B)
        jrows = []
        for r in range(m):
            row = jnp.concatenate([luu_k[r], lux_k[r]], axis=0)   # (p, B)
            row = jnp.where(iota_p == r, row + rho, row)
            jrows.append(row)
        luxT = jnp.stack([lux_k[:, j, :] for j in range(n)])      # (n, m, B)
        for r in range(n):
            jrows.append(jnp.concatenate([luxT[r], lxx_k[r]], axis=0))
        R1, fail_k = chol_upper(jrows, p, fail_k)       # list of p (p, B)

        # ---- 2) dense rows Dt[j] = Ssqrt · (col j of [B A]) -------------
        # BAt_list[j] = column j of [B A], each (n, B)
        BAt_list = [B_k[:, j, :] for j in range(m)] + \
                   [A_k[:, j, :] for j in range(n)]
        Dt = jnp.stack([_mv(Ss, col) for col in BAt_list])  # (p, n, B)

        # ---- 3) Householder triangularization of [R1 ; Dt] --------------
        for j in range(p):
            rowj = R1[j]
            a0 = rowj[j:j + 1]                           # (1, B)
            w = Dt[j]                                    # (n, B)
            sigma = _rowsum(w * w)
            nrm = jnp.sqrt(a0 * a0 + sigma)
            alpha = jnp.where(a0 >= 0.0, -nrm, nrm)
            v0 = a0 - alpha
            denom = nrm * (nrm + jnp.abs(a0))            # = vᵀv / 2
            beta = jnp.where(denom > tiny, 1.0 / jnp.maximum(denom, tiny),
                             0.0)
            # taus for ALL later columns at once: (p, B) — contraction of
            # the dense rows with the reflector over the n axis
            t = beta * (v0 * rowj + _mv(Dt, w))
            t = jnp.where(iota_p > j, t, 0.0)
            rowj = rowj - t * v0
            rowj = jnp.where(iota_p == j, alpha, rowj)
            R1[j] = rowj
            Dt = Dt - t[:, None, :] * w[None, :, :]

        # R blocks (diag sign arbitrary — all uses below are sign-safe
        # row-wise because each row of K/d solves scales by its own diag)
        Ruu_rows = R1[:m]                                # rows j: (p, B)
        diag = [jnp.abs(R1[j][j:j + 1]) for j in range(m)]
        dmin, dmax = diag[0], diag[0]
        for dd in diag[1:]:
            dmin = jnp.minimum(dmin, dd)
            dmax = jnp.maximum(dmax, dd)
        fail_k = fail_k | (dmin / jnp.maximum(dmax, tiny) < 1e-8)
        for j in range(m):
            fail_k = fail_k | ~jnp.isfinite(_rowsum(jnp.abs(R1[j])))

        # ---- 4) gains: K = −Ruu⁻¹ Rux (back-substitution, rows (n, B)) --
        Krows = [None] * m
        for j in range(m - 1, -1, -1):
            r = Ruu_rows[j][m:]                          # Rux row j (n, B)
            for kk in range(j + 1, m):
                r = r - Ruu_rows[j][kk:kk + 1] * Krows[kk]
            Krows[j] = r / Ruu_rows[j][j:j + 1]
        K_k = -jnp.stack(Krows)                          # (m, n, B)

        # ---- 5) d = −Ruu⁻¹ Ruu⁻ᵀ Qu ------------------------------------
        Qu = lu + _mTv(B_k, Sx)                          # (m, B)
        # forward: Ruuᵀ y = Qu
        y = [None] * m
        for j in range(m):
            s = Qu[j:j + 1]
            for kk in range(j):
                s = s - Ruu_rows[kk][j:j + 1] * y[kk]
            y[j] = s / Ruu_rows[j][j:j + 1]
        # back: Ruu d = y
        drows = [None] * m
        for j in range(m - 1, -1, -1):
            s = y[j]
            for kk in range(j + 1, m):
                s = s - Ruu_rows[j][kk:kk + 1] * drows[kk]
            drows[j] = s / Ruu_rows[j][j:j + 1]
        d_k = -jnp.concatenate(drows, axis=0)            # (m, B)

        K_k = jnp.where(fail_k[None], 0.0, K_k)
        d_k = jnp.where(fail_k, 0.0, d_k)

        # ---- 6) value update (sqrt_sweep lines: Qx, Qux = RuuᵀRux) ------
        Qx = lx + _mTv(A_k, Sx)                          # (n, B)
        Qux_rows = []
        for i in range(m):
            acc = Ruu_rows[0][i:i + 1] * Ruu_rows[0][m:]
            for j2 in range(1, i + 1):
                acc = acc + Ruu_rows[j2][i:i + 1] * Ruu_rows[j2][m:]
            Qux_rows.append(acc)                         # (n, B)
        Qux = jnp.stack(Qux_rows)                        # (m, n, B)
        # Ruu d (m, B)
        Rd = []
        for j in range(m):
            s = Ruu_rows[j][j:j + 1] * d_k[j:j + 1]
            for kk in range(j + 1, m):
                s = s + Ruu_rows[j][kk:kk + 1] * d_k[kk:kk + 1]
            Rd.append(s)
        Rd = jnp.concatenate(Rd, axis=0)                 # (m, B)
        RtRd = [None] * m                                # Ruuᵀ(Ruu d)
        for j in range(m):
            s = Ruu_rows[0][j:j + 1] * Rd[0:1]
            for kk in range(1, j + 1):
                s = s + Ruu_rows[kk][j:j + 1] * Rd[kk:kk + 1]
            RtRd[j] = s
        Quu_d = jnp.concatenate(RtRd, axis=0)            # (m, B)

        Sx_new = Qx + _mTv(K_k, Quu_d) + _mTv(K_k, Qu) + _mTv(Qux, d_k)
        # next Ssqrt = Rxx rows (upper (n, n, B)); zero left-of-diagonal
        # already enforced by the reflections (masked writes keep exact 0s)
        Ss_new = jnp.stack([R1[m + r][m:] for r in range(n)])

        K_ref[0, k] = K_k
        d_ref[0, k] = d_k
        Sx_ref[:] = Sx_new
        Ss_ref[:] = Ss_new
        acc = acc_ref[:]
        acc_ref[0:1] = acc[0:1] + _rowsum(d_k * Qu)
        acc_ref[1:2] = acc[1:2] + 0.5 * _rowsum(Rd * Rd)
        acc_ref[2:3] = jnp.maximum(acc[2:3], jnp.where(fail_k, 1.0, 0.0))
        return 0

    jax.lax.fori_loop(0, N - 1, body, 0)
    dV_ref[0] = acc_ref[0:2]
    fail_ref[0] = acc_ref[2:3]


def _sqrt_sweep_pallas_impl(A, B, lx, lu, lxx, luu, lux, rho,
                            interpret: bool = False):
    """Fused batched sqrt Riccati sweep. Batch-first inputs as in
    ops/pallas_riccati.py; batch must be a multiple of 128. Returns
    (K, d, dV1, dV2, fail)."""
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

    kern = functools.partial(_sqrt_kernel, N, n, m)

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


def sqrt_sweep_pallas(A, B, lx, lu, lxx, luu, lux, rho,
                      interpret: bool = False):
    """Chunked front-end (same rationale as riccati_sweep_pallas: Mosaic
    double-buffers input blocks once grid > 2, so large batches go through
    ≤256-problem chunks via ``lax.map``)."""
    Bz = A.shape[0]
    chunk = 256 if (Bz % 256 == 0 and B.shape[-1] <= 8) else LANES
    if Bz <= chunk:
        return _sqrt_sweep_pallas_impl(A, B, lx, lu, lxx, luu, lux, rho,
                                       interpret)
    nchunk = Bz // chunk

    def resh(x):
        return x.reshape((nchunk, chunk) + x.shape[1:])

    out = jax.lax.map(
        lambda args: _sqrt_sweep_pallas_impl(*args, interpret),
        tuple(resh(x) for x in (A, B, lx, lu, lxx, luu, lux, rho)))
    return tuple(o.reshape((Bz,) + o.shape[2:]) for o in out)
