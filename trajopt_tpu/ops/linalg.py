"""Small dense linear algebra, unrolled for TPU.

Batched LAPACK-style ``cholesky`` / ``lu`` / ``cho_solve`` custom calls on
tiny matrices (n ≤ 8) lower to sequential masked loops on TPU and dominate
whatever surrounds them — measured ~3× the cost of all the backward pass's
matmuls combined inside iLQR, and 26 ms (vs ~1 ms for everything else) for
the cartpole trajectory Jacobians at B=128, where ``jacfwd`` pushes 5
tangents through a 2×2 ``jnp.linalg.solve`` at every RK3 stage. The fix is
the same in both places: fully unrolled elimination over static shapes —
pure vectorized arithmetic that vmap turns into lane-parallel VPU code.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def posdef_solve(S, rhs):
    """Solve S X = rhs for small symmetric positive-definite S with fully
    unrolled Gaussian elimination (no pivoting — PD ⇒ stable).

    Returns (X, fail) where fail = True iff a pivot is ≤ 0 or non-finite
    (the `isposdef` check of reference backward_pass.jl:52).

    The elimination runs Jacobi-equilibrated (D·S·D with D = diag(1/√S_ii),
    solution unscaled): AL-decorated Quu mixes penalty rows ~μ with R_inf
    slack rows across ~16 decades, and the raw f32 pivots failed at
    κ ~ 1/ε_f32 — triggering ρ-retry re-sweeps that dominated maze device
    time (profiled; see ops/pallas_riccati._posdef_solve_lanes, whose
    failure semantics this matches). Scaled pivots are O(1); only genuine
    indefiniteness fails. In f32, rounding-exhausted pivots in
    (−NEG_TOL, FLOOR) are clamped to the floor instead of failing — the
    same policy as the sqrt stage factorization (a perturbation only
    where the f32 information is already gone).
    """
    m = S.shape[-1]
    f32 = S.dtype == jnp.float32
    tiny = 1e-30 if f32 else 1e-300
    d = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(S), tiny))
    S = S * d[:, None] * d[None, :]
    rhs = rhs * d[:, None]
    Aug = jnp.concatenate([S, rhs], axis=-1)          # (m, m+k)
    fail = jnp.asarray(False)
    rows = [Aug[i] for i in range(m)]
    if f32:
        from trajopt_tpu.ops.pallas_riccati import (
            PIVOT_FLOOR_F32, PIVOT_NEG_TOL_F32,
        )

        neg_tol, floor = PIVOT_NEG_TOL_F32, PIVOT_FLOOR_F32
    else:
        neg_tol, floor = 0.0, 0.0
    pivs = []
    # forward elimination
    for i in range(m):
        piv = rows[i][i]
        if neg_tol > 0.0:
            fail = fail | (piv < -neg_tol) | ~jnp.isfinite(piv)
            piv = jnp.maximum(piv, floor)
        else:
            fail = fail | (piv <= 0.0) | ~jnp.isfinite(piv)
        pivs.append(piv)
        inv = 1.0 / piv
        for j in range(i + 1, m):
            rows[j] = rows[j] - rows[j][i] * inv * rows[i]
    # back substitution
    for i in range(m - 1, -1, -1):
        r = rows[i]
        for j in range(i + 1, m):
            r = r - r[j] * rows[j]
        rows[i] = r / pivs[i]
    X = jnp.stack([rows[i][m:] for i in range(m)])
    return X * d[:, None], fail


def spd_solve_vec(H, b):
    """H⁻¹ b for a small SPD matrix H and vector b (mass-matrix solves in
    the model dynamics — reference dynamics/*.jl use ``H\\…``). Same
    unrolled elimination as :func:`posdef_solve`, solution only."""
    x, _ = posdef_solve(H, b[:, None])
    return x[:, 0]
