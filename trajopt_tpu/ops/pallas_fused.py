"""Pallas TPU kernels: fused iLQR iteration phases.

The reference's ``step!`` is four phases — jacobians, cost expansion,
backward pass, forward pass (reference ilqr_methods.jl:47-53). The round-2
kernels fused the backward sweep and the rollout individually, but the
jacobian/expansion phases still ran as XLA programs materializing
A (N,n,n,B), B (N,n,m,B) and the five expansion stacks in HBM — ~50 MB of
HBM round-trip per maze iteration that dwarfs the 0.7 MB of X, U actually
needed (VERDICT r2 item 1, BENCH_LOCAL.md phase tables).

These kernels fuse whole phases:

- :func:`fused_backward_pallas` — per knot, INSIDE the backward sweep:
  discrete-step Jacobians via ``jax.linearize`` of the model's lane-batched
  step (one linearization + n+m tangent applications, all 128-lane VPU
  ops), the quadratic cost expansion from the objective arrays (lane-
  broadcast from singleton-lane inputs), then the standard Riccati step.
  A, B, lx..lux exist only as per-knot VMEM registers.
- :func:`fused_forward_pallas` — the ENTIRE backtracking line search in one
  program: bounded α-halving loop with per-lane accept masks (identical
  semantics to solvers.ilqr.forward_pass's batched while_loop), the
  closed-loop rollout AND the trajectory cost computed in-lane per
  candidate, so rejected candidates never touch HBM.

Numerics: the Riccati step matches ops.pallas_riccati bit-for-bit given the
same A, B, expansion; the in-kernel Jacobians are the same RK3 chain rule
as ``model.jacobian_traj`` (jacfwd) with a different summation order, so
f32 results agree to rounding (validated compiled-vs-interpret and against
the scan path in tests/test_fused.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trajopt_tpu.ops.pallas_riccati import (
    LANES, _mm, _mTm, _mTv, _mv, _posdef_solve_lanes, _t,
)


# ------------------------------------------------------- in-kernel helpers

def _onehot_rows(j, rows, width, dtype):
    """(rows, width) one-hot tangent with row j = 1 (Pallas-safe: built from
    broadcasted_iota, no captured constants)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    return jnp.broadcast_to((idx == j).astype(dtype), (rows, width))


def _step_jacobians(step_lanes, x, u, dtv, n, m):
    """A (n,n,B), B (n,m,B): columns of the discrete-step Jacobian via one
    linearization + (n+m) tangent applications (forward mode — the same
    math as jacfwd of the step, lane-batched)."""
    dtype = x.dtype
    Bt = x.shape[-1]
    _, f_lin = jax.linearize(lambda xx, uu: step_lanes(xx, uu, dtv), x, u)
    zx = jnp.zeros_like(x)
    zu = jnp.zeros_like(u)
    Acols = [f_lin(_onehot_rows(j, n, Bt, dtype), zu) for j in range(n)]
    Bcols = [f_lin(zx, _onehot_rows(j, m, Bt, dtype)) for j in range(m)]
    A = jnp.stack(Acols, axis=1)            # (n, n, B) — column j = ∂f/∂x_j
    Bm = jnp.stack(Bcols, axis=1)           # (n, m, B)
    return A, Bm


def _lqr_stage_terms(x, u, dtv, Qk, Rk, Hk, qk, rk):
    """Quadratic stage expansion, lane-batched (ops.cost.cost_expansion):
    lx = dt(Qx + q + Hᵀu), lu = dt(Ru + r + Hx), lxx = dtQ, luu = dtR,
    lux = dtH. Objective arrays come in with a singleton lane dim
    ((n,n,1) etc.) and broadcast against the (·,B) lanes."""
    lx = (jnp.sum(Qk * x[None, :, :], axis=1) + qk
          + jnp.sum(Hk * u[:, None, :], axis=0)) * dtv
    lu = (jnp.sum(Rk * u[None, :, :], axis=1) + rk
          + jnp.sum(Hk * x[None, :, :], axis=1)) * dtv
    lxx = Qk * dtv[None]
    luu = Rk * dtv[None]
    lux = Hk * dtv[None]
    return lx, lu, lxx, luu, lux


# ------------------------------------------------------- backward kernel

def _fused_backward_kernel(step_lanes, N, n, m, reg_state,
                           X_ref, U_ref, dt_ref,
                           Q_ref, R_ref, H_ref, q_ref, r_ref, qN_ref,
                           rho_ref,
                           K_ref, d_ref, dV_ref, fail_ref,
                           Sx_ref, Sxx_ref, acc_ref):
    """One batch tile. Blocks: X (1,N,n,B), U (1,N-1,m,B), dt (N-1,1,1)
    [per-knot, shared across the batch], Q (N,n,n,1), R (N-1,m,m,1),
    H (N-1,m,n,1), q (N-1,n,1), r (N-1,m,1), qN (n,1), rho (1,1,B)
    → K (1,N-1,m,n,B), d (1,N-1,m,B), dV (1,2,B), fail (1,1,B) [f32]."""
    dtype = X_ref.dtype
    Bt = X_ref.shape[-1]
    rho = rho_ref[0]                       # (1, B)

    # terminal expansion: Sx = Q_N x_N + q_N, Sxx = Q_N
    xN = X_ref[0, N - 1]                   # (n, B)
    QN = Q_ref[N - 1]                      # (n, n, 1)
    Sx_ref[:] = jnp.sum(QN * xN[None, :, :], axis=1) + qN_ref[:]
    Sxx_ref[:] = jnp.broadcast_to(QN, (n, n, Bt))
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(i, _):
        Sx = Sx_ref[:]
        Sxx = Sxx_ref[:]
        k = N - 2 - i
        x = X_ref[0, k]
        u = U_ref[0, k]
        dtv = dt_ref[k]                    # (1, 1) — broadcasts over lanes

        A_k, B_k = _step_jacobians(step_lanes, x, u, dtv, n, m)
        lx, lu, lxx, luu, lux = _lqr_stage_terms(
            x, u, dtv, Q_ref[k], R_ref[k], H_ref[k], q_ref[k], r_ref[k])

        SxxA = _mTm(Sxx, A_k)
        SxxB = _mTm(Sxx, B_k)
        Qx = lx + _mTv(A_k, Sx)
        Qu = lu + _mTv(B_k, Sx)
        Qxx = lxx + _mTm(A_k, SxxA)
        Quu = luu + _mTm(B_k, SxxB)
        Qux = lux + _mTm(B_k, SxxA)

        if reg_state:
            Quu_reg = Quu + rho[None] * _mTm(B_k, B_k)
            Qux_reg = Qux + rho[None] * _mTm(B_k, A_k)
        else:
            eye = _onehot_eye(m, dtype)
            Quu_reg = Quu + rho[None] * eye
            Qux_reg = Qux

        rhs = jnp.concatenate([Qux_reg, Qu[:, None, :]], axis=1)
        sol, fail_k = _posdef_solve_lanes(Quu_reg, rhs)
        sol = jnp.where(fail_k[None], 0.0, sol)
        K_k = -sol[:, :n]
        d_k = -sol[:, n]

        Quu_d = _mv(Quu, d_k)
        Sx_new = Qx + _mTv(K_k, Quu_d) + _mTv(K_k, Qu) + _mTv(Qux, d_k)
        QuuK = _mm(Quu, K_k)
        Sxx_new = Qxx + _mTm(K_k, QuuK) + _mTm(Qux, K_k) + _mTm(K_k, Qux)
        Sxx_new = 0.5 * (Sxx_new + _t(Sxx_new))

        K_ref[0, k] = K_k
        d_ref[0, k] = d_k
        Sx_ref[:] = Sx_new
        Sxx_ref[:] = Sxx_new

        def _rowsum(v):
            acc1 = v[0:1]
            for j in range(1, v.shape[0]):
                acc1 = acc1 + v[j:j + 1]
            return acc1

        acc = acc_ref[:]
        acc_ref[0:1] = acc[0:1] + _rowsum(d_k * Qu)
        acc_ref[1:2] = acc[1:2] + 0.5 * _rowsum(d_k * Quu_d)
        acc_ref[2:3] = jnp.maximum(acc[2:3], jnp.where(fail_k, 1.0, 0.0))
        return 0

    jax.lax.fori_loop(0, N - 1, body, 0)
    dV_ref[0] = acc_ref[0:2]
    fail_ref[0] = acc_ref[2:3]


def _onehot_eye(m, dtype):
    """(m, m, 1) identity from iota (no captured constants)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (m, m, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (m, m, 1), 1)
    return (ri == ci).astype(dtype)


def _obj_arrays(obj, dtype):
    """Objective stacks with a trailing singleton lane dim (shared across
    the batch — tiny VMEM, broadcast in-kernel)."""
    Q = jnp.asarray(obj.Q, dtype)[:, :, :, None]           # (N, n, n, 1)
    R = jnp.asarray(obj.R[:-1], dtype)[:, :, :, None]      # (N-1, m, m, 1)
    H = jnp.asarray(obj.H[:-1], dtype)[:, :, :, None]      # (N-1, m, n, 1)
    q = jnp.asarray(obj.q[:-1], dtype)[:, :, None]         # (N-1, n, 1)
    r = jnp.asarray(obj.r[:-1], dtype)[:, :, None]         # (N-1, m, 1)
    qN = jnp.asarray(obj.q[-1], dtype)[:, None]            # (n, 1)
    return Q, R, H, q, r, qN


def _fused_backward_impl(step_lanes, X, U, dt, obj, rho,
                         reg_state=False, interpret=False):
    """Batch-first: X (Bz,N,n), U (Bz,N-1,m), dt scalar, obj an
    ops.cost.Objective (shared across the batch), rho (Bz,).
    Returns (K (Bz,N-1,m,n), d (Bz,N-1,m), dV1, dV2, fail (Bz,))."""
    Bt = LANES
    Bz, N, n = X.shape
    m = U.shape[-1]
    assert Bz % Bt == 0, "batch must be a multiple of 128"
    nb = Bz // Bt
    dtype = X.dtype

    def to_lanes(a):
        a = a.reshape((nb, Bt) + a.shape[1:])
        return jnp.moveaxis(a, 1, -1)

    X_l = to_lanes(X)
    U_l = to_lanes(U)
    rho_l = to_lanes(rho[:, None])
    dth = jnp.broadcast_to(jnp.asarray(dt, dtype),
                           (N - 1,))[:, None, None]     # (N-1, 1, 1)
    Q, R, H, q, r, qN = _obj_arrays(obj, dtype)

    kern = functools.partial(_fused_backward_kernel, step_lanes, N, n, m,
                             reg_state)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape,
                            lambda i, _nd=nd: (i,) + (0,) * _nd,
                            memory_space=pltpu.VMEM)

    def shared(shape):
        # objective arrays: same block for every grid step (no batch dim)
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    K, d, dV, fail = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            bspec((N, n, Bt)),
            bspec((N - 1, m, Bt)),
            shared((N - 1, 1, 1)),
            shared((N, n, n, 1)),
            shared((N - 1, m, m, 1)),
            shared((N - 1, m, n, 1)),
            shared((N - 1, n, 1)),
            shared((N - 1, m, 1)),
            shared((n, 1)),
            bspec((1, Bt)),
        ],
        out_specs=(
            bspec((N - 1, m, n, Bt)),
            bspec((N - 1, m, Bt)),
            bspec((2, Bt)),
            bspec((1, Bt)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, N - 1, m, n, Bt), dtype),
            jax.ShapeDtypeStruct((nb, N - 1, m, Bt), dtype),
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
    )(X_l, U_l, dth, Q, R, H, q, r, qN, rho_l)

    def from_lanes(a):
        a = jnp.moveaxis(a, -1, 1)
        return a.reshape((Bz,) + a.shape[2:])

    K = from_lanes(K)
    d = from_lanes(d)
    dV = from_lanes(dV)
    fail = from_lanes(fail)[:, 0] > 0
    return K, d, dV[:, 0], dV[:, 1], fail


def fused_backward_pallas(step_lanes, X, U, dt, obj, rho,
                          reg_state=False, interpret=False):
    """Chunked front-end (see pallas_riccati.riccati_sweep_pallas)."""
    Bz = X.shape[0]
    chunk = 256 if (Bz % 256 == 0 and U.shape[-1] <= 8) else LANES
    if Bz <= chunk:
        return _fused_backward_impl(step_lanes, X, U, dt, obj, rho,
                                    reg_state, interpret)
    nchunk = Bz // chunk

    def resh(x):
        return x.reshape((nchunk, chunk) + x.shape[1:])

    out = jax.lax.map(
        lambda args: _fused_backward_impl(step_lanes, args[0], args[1], dt,
                                          obj, args[2], reg_state, interpret),
        (resh(X), resh(U), resh(rho)))
    return tuple(o.reshape((Bz,) + o.shape[2:]) for o in out)


# -------------------------------------------------------- forward kernel

def _stage_cost_lanes(x, u, dtv, Qk, Rk, Hk, qk, rk, ck):
    """dt·(½xᵀQx + ½uᵀRu + qᵀx + rᵀu + uᵀHx + c), lane-batched → (1, B)."""
    Qx = jnp.sum(Qk * x[None, :, :], axis=1)          # (n, B)
    Ru = jnp.sum(Rk * u[None, :, :], axis=1)          # (m, B)
    Hx = jnp.sum(Hk * x[None, :, :], axis=1)          # (m, B)

    def _rowsum(v):
        acc = v[0:1]
        for j in range(1, v.shape[0]):
            acc = acc + v[j:j + 1]
        return acc

    val = (0.5 * _rowsum(x * Qx) + 0.5 * _rowsum(u * Ru)
           + _rowsum(x * qk) + _rowsum(u * rk) + _rowsum(u * Hx) + ck)
    return val * dtv


def _fused_forward_kernel(step_lanes, diff_lanes, N, n, m, opts_t,
                          x0_ref, X_ref, U_ref, K_ref, d_ref, dV_ref,
                          Jprev_ref, rho_ref, drho_ref, alpha0_ref, dt_ref,
                          Q_ref, R_ref, H_ref, q_ref, r_ref, c_ref,
                          qN_ref, cN_ref,
                          Xout_ref, Uout_ref, J_ref, rho_out_ref,
                          drho_out_ref, alpha_ref,
                          Xc_ref, Uc_ref, st_ref):
    """Entire backtracking line search (solvers.ilqr.forward_pass semantics,
    reference forwardpass!, forward_pass.jl:5-85) in one program.

    st scratch rows: 0 alpha, 1 J, 2 z, 3 done(0/1), 4 rho, 5 drho — each
    (1, B) lanes. The outer while_loop carries only scalars (trip count +
    any-active flag); all lane state lives in VMEM scratch, per CLAUDE.md's
    no-multi-dim-loop-carry rule.
    """
    dtype = X_ref.dtype
    (ls_lb, ls_ub, ls_iters, reg_min, reg_factor, bp_reg_fp) = opts_t
    Jprev = Jprev_ref[0]                   # (1, B)
    dV1 = dV_ref[0, 0:1]
    dV2 = dV_ref[0, 1:2]

    # initial state (forward_pass init): alpha0, J=+inf, z=-1, done=0
    st_ref[0:1] = alpha0_ref[0]
    st_ref[1:2] = jnp.full_like(Jprev, jnp.inf)
    st_ref[2:3] = -jnp.ones_like(Jprev)
    st_ref[3:4] = jnp.zeros_like(Jprev)
    st_ref[4:5] = rho_ref[0]
    st_ref[5:6] = drho_ref[0]
    # default outputs = restore (X, U, J_prev) — overwritten on accept
    Xout_ref[0] = X_ref[0]
    Uout_ref[0] = U_ref[0]
    J_ref[0] = Jprev

    def _active():
        J = st_ref[1:2]
        z = st_ref[2:3]
        done = st_ref[3:4]
        searching = ((z <= ls_lb) | (z > ls_ub)) & (J >= Jprev)
        return jnp.where(searching & (done < 0.5), 1.0, 0.0)

    def trip(carry):
        it, _any = carry
        alpha = st_ref[0:1]
        act = _active()                     # (1, B)

        over = jnp.asarray(it > ls_iters)   # scalar trip guard (same for
        # every lane — ``it`` counts trips, matching the batched
        # while_loop where all lanes share the trip count)

        # --- rollout at current alpha, accumulating the cost in-lane
        x = x0_ref[0]                       # (n, B)
        okm = jnp.ones_like(alpha)          # (1, B)
        Jacc = jnp.zeros_like(alpha)
        Xc_ref[0] = x
        for_k = jax.lax.fori_loop
        def roll_body(k, carry2):
            x, okm, Jacc = carry2
            dx = diff_lanes(x, X_ref[0, k])
            dtv = dt_ref[k]                 # (1, 1)
            Kk = K_ref[0, k]
            u = U_ref[0, k] + jnp.sum(Kk * dx[None, :, :], axis=1) \
                + alpha * d_ref[0, k]
            x_next = step_lanes(x, u, dtv)
            good = (jnp.max(jnp.abs(x_next), axis=0, keepdims=True) < 1e8) \
                & (jnp.max(jnp.abs(u), axis=0, keepdims=True) < 1e8)
            finite = jnp.min(jnp.where(jnp.isfinite(x_next), 1.0, 0.0),
                             axis=0, keepdims=True) > 0.5
            okm = okm * jnp.where(good & finite, 1.0, 0.0)
            x_next = jnp.where(okm > 0.5, x_next, x)
            Jacc = Jacc + _stage_cost_lanes(
                x, u, dtv, Q_ref[k], R_ref[k], H_ref[k], q_ref[k],
                r_ref[k], c_ref[k])
            Xc_ref[k + 1] = x_next
            Uc_ref[k] = u
            return x_next, okm, Jacc

        x, okm, Jacc = for_k(0, N - 1, roll_body, (x, okm, Jacc))
        # terminal cost
        QN = Q_ref[N - 1]
        Qx = jnp.sum(QN * x[None, :, :], axis=1)

        def _rowsum(v):
            acc = v[0:1]
            for j in range(1, v.shape[0]):
                acc = acc + v[j:j + 1]
            return acc

        Jc = Jacc + 0.5 * _rowsum(x * Qx) + _rowsum(x * qN_ref[:]) \
            + cN_ref[:]
        ok = okm > 0.5                      # (1, B)

        expected = -alpha * (dV1 + alpha * dV2)
        z_c = jnp.where(expected > 0.0, (Jprev - Jc) / expected, -1.0)

        J_old = st_ref[1:2]
        z_old = st_ref[2:3]
        rho_old = st_ref[4:5]
        drho_old = st_ref[5:6]

        # rollout diverged → keep old J/z, just halve alpha
        J_n = jnp.where(ok, Jc, J_old)
        z_n = jnp.where(ok, z_c, z_old)

        # exhausted → restore trajectory, bump rho (reg_increase + bp_reg_fp)
        drho_o = jnp.maximum(drho_old * reg_factor, reg_factor)
        rho_o = jnp.maximum(rho_old * drho_o, reg_min) + bp_reg_fp

        upd = act > 0.5                     # lanes taking this trip
        if_over = jnp.logical_and(upd, over)
        st_ref[0:1] = jnp.where(upd, jnp.where(over, 0.0, alpha * 0.5), alpha)
        st_ref[1:2] = jnp.where(upd, jnp.where(over, Jprev, J_n), J_old)
        st_ref[2:3] = jnp.where(upd, jnp.where(over, 0.0, z_n), z_old)
        st_ref[3:4] = jnp.where(if_over, 1.0, st_ref[3:4])
        st_ref[4:5] = jnp.where(if_over, rho_o, rho_old)
        st_ref[5:6] = jnp.where(if_over, drho_o, drho_old)

        # lanes that just produced a VALID candidate store it; the accept
        # test happens via _active() next trip (a lane whose z lands in
        # the accept window stops updating, so its stored candidate is the
        # accepted one — identical to the batched while_loop semantics)
        take = jnp.logical_and(upd, jnp.logical_and(ok, ~over))  # (1, B)

        def copy_body(k, _):
            # exhausted lanes RESTORE the original trajectory (reference
            # forward_pass.jl:22-37), even if they stored a candidate earlier
            Xout_ref[0, k + 1] = jnp.where(
                if_over, X_ref[0, k + 1],
                jnp.where(take, Xc_ref[k + 1], Xout_ref[0, k + 1]))
            Uout_ref[0, k] = jnp.where(
                if_over, U_ref[0, k],
                jnp.where(take, Uc_ref[k], Uout_ref[0, k]))
            return 0
        for_k(0, N - 1, copy_body, 0)
        J_ref[0] = jnp.where(jnp.logical_and(upd, over), Jprev,
                             jnp.where(take, Jc, J_ref[0]))

        n_act = jnp.sum(_active()).astype(dtype)
        return it + 1, n_act

    def cond(carry):
        it, n_act = carry
        return n_act > 0.5

    jax.lax.while_loop(cond, trip, (jnp.zeros((), jnp.int32),
                                    jnp.ones((), dtype)))
    alpha_ref[0] = st_ref[0:1]
    rho_out_ref[0] = st_ref[4:5]
    drho_out_ref[0] = st_ref[5:6]


def _fused_forward_impl(step_lanes, diff_lanes, x0, X, U, K, d, dV1, dV2,
                        J_prev, rho, drho, alpha0, dt, obj, opts_t,
                        interpret=False):
    """Batch-first fused line search. Returns (Xb, Ub, J, rho, drho, alpha)
    matching solvers.ilqr.forward_pass (alpha already un-halved ×2)."""
    Bt = LANES
    Bz, N, n = X.shape
    m = U.shape[-1]
    assert Bz % Bt == 0
    nb = Bz // Bt
    dtype = X.dtype

    def to_lanes(a):
        a = a.reshape((nb, Bt) + a.shape[1:])
        return jnp.moveaxis(a, 1, -1)

    ins_b = [to_lanes(a) for a in
             (x0, X, U, K, d,
              jnp.stack([dV1, dV2], axis=-1),
              J_prev[:, None], rho[:, None], drho[:, None],
              alpha0[:, None])]
    dth = jnp.broadcast_to(jnp.asarray(dt, dtype),
                           (N - 1,))[:, None, None]     # (N-1, 1, 1)
    Q, R, H, q, r, qN = _obj_arrays(obj, dtype)
    c = jnp.asarray(obj.c[:-1], dtype)[:, None, None]      # (N-1, 1, 1)
    cN = jnp.asarray(obj.c[-1], dtype)[None, None]         # (1, 1)

    if diff_lanes is None:
        diff_lanes = lambda x, xr: x - xr
    kern = functools.partial(_fused_forward_kernel, step_lanes, diff_lanes,
                             N, n, m, opts_t)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape,
                            lambda i, _nd=nd: (i,) + (0,) * _nd,
                            memory_space=pltpu.VMEM)

    def shared(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    ns = K.shape[-1]
    Xout, Uout, J, rho_o, drho_o, alpha = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            bspec((n, Bt)),
            bspec((N, n, Bt)),
            bspec((N - 1, m, Bt)),
            bspec((N - 1, m, ns, Bt)),
            bspec((N - 1, m, Bt)),
            bspec((2, Bt)),
            bspec((1, Bt)),
            bspec((1, Bt)),
            bspec((1, Bt)),
            bspec((1, Bt)),
            shared((N - 1, 1, 1)),
            shared((N, n, n, 1)),
            shared((N - 1, m, m, 1)),
            shared((N - 1, m, n, 1)),
            shared((N - 1, n, 1)),
            shared((N - 1, m, 1)),
            shared((N - 1, 1, 1)),
            shared((n, 1)),
            shared((1, 1)),
        ],
        out_specs=tuple(bspec(s) for s in
                        ((N, n, Bt), (N - 1, m, Bt), (1, Bt), (1, Bt),
                         (1, Bt), (1, Bt))),
        out_shape=(
            jax.ShapeDtypeStruct((nb, N, n, Bt), dtype),
            jax.ShapeDtypeStruct((nb, N - 1, m, Bt), dtype),
            jax.ShapeDtypeStruct((nb, 1, Bt), dtype),
            jax.ShapeDtypeStruct((nb, 1, Bt), dtype),
            jax.ShapeDtypeStruct((nb, 1, Bt), dtype),
            jax.ShapeDtypeStruct((nb, 1, Bt), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, n, Bt), dtype),
            pltpu.VMEM((N - 1, m, Bt), dtype),
            pltpu.VMEM((6, Bt), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ins_b, dth, Q, R, H, q, r, c, qN, cN)

    def from_lanes(a):
        a = jnp.moveaxis(a, -1, 1)
        return a.reshape((Bz,) + a.shape[2:])

    return (from_lanes(Xout), from_lanes(Uout), from_lanes(J)[:, 0],
            from_lanes(rho_o)[:, 0], from_lanes(drho_o)[:, 0],
            from_lanes(alpha)[:, 0] * 2.0)


def fused_forward_pallas(step_lanes, diff_lanes, x0, X, U, K, d, dV1, dV2,
                         J_prev, rho, drho, alpha0, dt, obj, opts_t,
                         interpret=False):
    """Chunked front-end (≤256 problems per pallas_call)."""
    Bz = X.shape[0]
    chunk = 256 if (Bz % 256 == 0 and U.shape[-1] <= 8) else LANES
    if Bz <= chunk:
        return _fused_forward_impl(step_lanes, diff_lanes, x0, X, U, K, d,
                                   dV1, dV2, J_prev, rho, drho, alpha0, dt,
                                   obj, opts_t, interpret)
    nchunk = Bz // chunk

    def resh(x):
        return x.reshape((nchunk, chunk) + x.shape[1:])

    out = jax.lax.map(
        lambda a: _fused_forward_impl(step_lanes, diff_lanes, a[0], a[1],
                                      a[2], a[3], a[4], a[5], a[6], a[7],
                                      a[8], a[9], a[10], dt, obj, opts_t,
                                      interpret),
        tuple(resh(x) for x in (x0, X, U, K, d, dV1, dV2, J_prev, rho,
                                drho, alpha0)))
    return tuple(o.reshape((Bz,) + o.shape[2:]) for o in out)
