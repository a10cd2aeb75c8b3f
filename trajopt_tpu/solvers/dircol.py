"""Direct collocation (DIRCOL) — Hermite–Simpson transcription.

TPU-native counterpart of reference src/solvers/direct/dircol.jl + moi.jl.
The reference transcribes the problem to an NLP and ships it through
MathOptInterface to Ipopt (C++) / SNOPT (Fortran) (moi.jl:120). Here the
same Hermite–Simpson NLP — cubic-spline stage cost (dircol.jl:83-98) and
collocation defects (dircol.jl:307-327) — is solved *natively* with an
augmented-Lagrangian outer loop and a structure-exploiting Newton inner
loop:

- decision variables z_k = (x_k, u_k) at every knot (controls at N knots,
  first-order hold, matching the reference's DIRCOL layout),
- the AL Hessian is block-tridiagonal (HS cost + defects couple only
  adjacent knots), factorized with the same scan-based block Cholesky as
  projected Newton — batched q×q MXU matmuls instead of CHOLMOD,
- Levenberg-style damping with retry replaces Ipopt's inertia correction.

This delivers the reference's DIRCOL capability (machine-precision dynamic
feasibility through an NLP, warm-startable, arbitrary constraints) with no
external native solver.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from trajopt_tpu.problem import Problem
from trajopt_tpu.solvers.projected_newton import (
    block_tridiag_cholesky, block_tridiag_solve,
)
from trajopt_tpu.utils.tree import precise, static_dataclass


@static_dataclass
class DIRCOLOptions:
    """(reference DIRCOLSolverOptions, direct_solvers.jl:131-143, plus the
    Ipopt-equivalent knobs the native solver needs)."""

    feasibility_tolerance: float = 1e-8
    gradient_tolerance: float = 1e-6
    iterations_outer: int = 25
    iterations_inner: int = 40
    penalty_initial: float = 10.0
    penalty_scaling: float = 10.0
    penalty_max: float = 1e12
    reg_initial: float = 1e-8
    reg_increase: float = 10.0
    reg_max: float = 1e10
    linesearch_iters: int = 20


@static_dataclass
class DIRCOLMinTimeOptions:
    """Options-type selector for the min-time DIRCOL variant so the generic
    ``solve()`` dispatch covers it (reference solve! covers every solver,
    src/solvers.jl:91-123; min-time knobs from dircol_mintime.jl)."""

    R_min_time: float = 1.0
    h_max: float = 1.0
    h_min: float = 1e-3
    equal_steps: bool = False
    dircol: DIRCOLOptions = DIRCOLOptions()


class DIRCOLResult(NamedTuple):
    X: jnp.ndarray          # (N, n)
    U: jnp.ndarray          # (N-1, m) — knot controls mapped back
    U_knots: jnp.ndarray    # (N, m) — full first-order-hold controls
    J: jnp.ndarray
    c_max: jnp.ndarray      # problem-constraint violation
    defect_max: jnp.ndarray # collocation defect ∞-norm
    iterations: jnp.ndarray
    history: dict           # per-outer-iteration trace; see nlp_history


def nlp_history(iterations: int, dtype):
    """Per-outer-iteration convergence trace for the native AL-Newton NLP
    solvers (the reference caches c_max + per-NLP-iteration timestamps in
    its MOI callback, moi.jl:63-66,118-128; here the outer AL iteration is
    the NLP-iteration analog). Arrays are fixed-length (= iterations_outer);
    rows past ``result.iterations`` stay zero. Plot ``viol``/``cost`` vs
    index for the convergence curve."""
    z = jnp.zeros((iterations,), dtype)
    return {
        "cost": z, "viol": z, "gradient": z,
        "iterations_inner": jnp.zeros((iterations,), jnp.int32),
    }


def record_nlp_history(hist, it, J, viol, gnorm, inner):
    return {
        "cost": hist["cost"].at[it].set(J),
        "viol": hist["viol"].at[it].set(viol),
        "gradient": hist["gradient"].at[it].set(gnorm),
        "iterations_inner": hist["iterations_inner"].at[it].set(inner),
    }


def hs_defects(f, X, UN, dt):
    """Hermite–Simpson collocation defects (reference
    collocation_constraints!, dircol.jl:307-327):

        Xm = (x_k + x_{k+1})/2 + h/8 (f_k − f_{k+1}),  Um = (u_k + u_{k+1})/2
        g_k = x_k − x_{k+1} + h/6 (f_k + 4 f(Xm, Um) + f_{k+1})
    """
    F = jax.vmap(f)(X, UN)                       # (N, n)
    Xm = 0.5 * (X[:-1] + X[1:]) + dt / 8.0 * (F[:-1] - F[1:])
    Um = 0.5 * (UN[:-1] + UN[1:])
    Fm = jax.vmap(f)(Xm, Um)
    return X[:-1] - X[1:] + dt / 6.0 * (F[:-1] + 4.0 * Fm + F[1:])


def hs_cost(obj, f, X, UN, dt):
    """HS cubic-spline integrated cost (reference gen_stage_cost,
    dircol.jl:83-98): Σ h/6 (ℓ_k + 4 ℓ(Xm, Um) + ℓ_{k+1}) + ℓ_N."""
    def ell(k, x, u):
        Q, R, H = obj.Q[k], obj.R[k], obj.H[k]
        q, r, c = obj.q[k], obj.r[k], obj.c[k]
        return (0.5 * x @ Q @ x + 0.5 * u @ R @ u + q @ x + r @ u + c
                + u @ (H @ x))

    F = jax.vmap(f)(X, UN)
    Xm = 0.5 * (X[:-1] + X[1:]) + dt / 8.0 * (F[:-1] - F[1:])
    Um = 0.5 * (UN[:-1] + UN[1:])
    ks = jnp.arange(X.shape[0] - 1)
    l1 = jax.vmap(ell)(ks, X[:-1], UN[:-1])
    lm = jax.vmap(ell)(ks, Xm, Um)
    l2 = jax.vmap(ell)(ks, X[1:], UN[1:])
    J = jnp.sum(dt / 6.0 * (l1 + 4.0 * lm + l2))
    xN = X[-1]
    return J + 0.5 * xN @ obj.Q[-1] @ xN + obj.q[-1] @ xN + obj.c[-1]


@precise
def dircol_solve(prob: Problem, opts: DIRCOLOptions = DIRCOLOptions()) -> DIRCOLResult:
    """Solve the HS-transcribed NLP (reference solve_moi, moi.jl:82-139 —
    natively, no Ipopt). The problem's discrete model must wrap a continuous
    model (reference converts Discrete problems the same way, moi.jl:162-170).
    """
    if prob.model.model is None:
        raise ValueError("DIRCOL needs the underlying continuous model "
                         "(build the problem from discretize(model))")
    cmodel = prob.model.model
    if cmodel.r > 0:
        # uncertain model: collocate the nominal (w = 0) dynamics
        f = lambda x, u: cmodel.dynamics(x, u, jnp.zeros((cmodel.r,), x.dtype))
    else:
        f = cmodel.dynamics
    cs = prob.constraints
    n, m, N = prob.n, prob.m, prob.N
    dtype = prob.U.dtype
    dt = jnp.asarray(prob.dt, dtype)
    nm = n + m
    P = cs.P

    # initial U at N knots: pad with the last control (reference dircol.jl
    # get_initial uses U[N-1] for the terminal knot)
    U0 = jnp.concatenate([prob.U, prob.U[-1:]], axis=0)
    X0 = prob.X
    X0 = jnp.where(jnp.all(jnp.isfinite(X0)), X0,
                   jnp.linspace(0, 1, N)[:, None] * (prob.xf - prob.x0)[None]
                   + prob.x0[None])

    # ---------------- AL machinery over (defects, x0 pin, problem cons)
    def split(Z):
        return Z[:, :n], Z[:, n:]

    def eq_residuals(Z):
        X, UN = split(Z)
        g = hs_defects(f, X, UN, dt)             # (N-1, n)
        pin = (X[0] - prob.x0)[None]             # (1, n)
        return jnp.concatenate([pin, g], axis=0)  # (N, n)

    def con_values(Z):
        X, UN = split(Z)
        return cs.evaluate(X, UN[:-1])           # (N, P)

    def al_value(Z, lam_d, mu_d, lam_c, mu_c):
        X, UN = split(Z)
        J = hs_cost(prob.obj, f, X, UN, dt)
        gd = eq_residuals(Z)
        Jd = jnp.sum(lam_d * gd + 0.5 * mu_d * gd * gd)
        if P:
            C = con_values(Z)
            a = cs.active_set(C, lam_c)
            Imu = jnp.where(a, mu_c, 0.0)
            Jc = jnp.sum(lam_c * C + 0.5 * C * Imu * C)
        else:
            Jc = 0.0
        return J + Jd + Jc

    grad_fn = jax.grad(al_value, argnums=0)

    # ---------------- block-tridiagonal AL Hessian by per-interval AD.
    # L(Z) = Σ_k φ_k(z_k, z_{k+1}) + ψ(z_0, z_N); Hessian blocks follow.
    def phi_k(k, z1, z2, lam_d_k, mu_d_k, lam_c_k, mu_c_k):
        x1, u1 = z1[:n], z1[n:]
        x2, u2 = z2[:n], z2[n:]
        f1 = f(x1, u1)
        f2 = f(x2, u2)
        Xm = 0.5 * (x1 + x2) + dt / 8.0 * (f1 - f2)
        Um = 0.5 * (u1 + u2)
        fm = f(Xm, Um)

        def ell(kk, x, u):
            Q, R, H = prob.obj.Q[kk], prob.obj.R[kk], prob.obj.H[kk]
            q, r, c = prob.obj.q[kk], prob.obj.r[kk], prob.obj.c[kk]
            return (0.5 * x @ Q @ x + 0.5 * u @ R @ u + q @ x + r @ u + c
                    + u @ (H @ x))

        J = dt / 6.0 * (ell(k, x1, u1) + 4.0 * ell(k, Xm, Um)
                        + ell(k, x2, u2))
        g = x1 - x2 + dt / 6.0 * (f1 + 4.0 * fm + f2)
        Jd = jnp.sum(lam_d_k * g + 0.5 * mu_d_k * g * g)
        if P:
            C1 = jnp.concatenate([c.fn(x1, u1) for c in cs.cons])
            C1 = jnp.where(cs.mask[k], C1, 0.0)
            a1 = (cs.is_eq | (C1 >= 0.0) | (lam_c_k > 0)) & cs.mask[k]
            Imu1 = jnp.where(a1, mu_c_k, 0.0)
            Jc = jnp.sum(lam_c_k * C1 + 0.5 * C1 * Imu1 * C1)
        else:
            Jc = 0.0
        return J + Jd + Jc

    hess_joint = jax.hessian(
        lambda k, z12, *al: phi_k(k, z12[:nm], z12[nm:], *al), argnums=1)

    def psi(zN, lam_c_N, mu_c_N, lam_pin, mu_pin):
        xN, uN = zN[:n], zN[n:]
        J = 0.5 * xN @ prob.obj.Q[-1] @ xN + prob.obj.q[-1] @ xN
        if P:
            CN = jnp.concatenate([c.fn(xN, uN) for c in cs.cons])
            CN = jnp.where(cs.mask[N - 1], CN, 0.0)
            aN = (cs.is_eq | (CN >= 0.0) | (lam_c_N > 0)) & cs.mask[N - 1]
            ImuN = jnp.where(aN, mu_c_N, 0.0)
            J = J + jnp.sum(lam_c_N * CN + 0.5 * CN * ImuN * CN)
        return J

    hess_psi = jax.hessian(psi, argnums=0)

    def build_hessian(Z, lam_d, mu_d, lam_c, mu_c):
        ks = jnp.arange(N - 1)
        z12 = jnp.concatenate([Z[:-1], Z[1:]], axis=1)   # (N-1, 2 nm)
        if P:
            lcs, mcs = lam_c[:-1], mu_c[:-1]
        else:
            lcs = jnp.zeros((N - 1, 0), dtype)
            mcs = jnp.zeros((N - 1, 0), dtype)
        Hj = jax.vmap(hess_joint)(ks, z12, lam_d[1:], mu_d[1:], lcs, mcs)
        D = jnp.zeros((N, nm, nm), dtype)
        D = D.at[:-1].add(Hj[:, :nm, :nm])
        D = D.at[1:].add(Hj[:, nm:, nm:])
        L = Hj[:, nm:, :nm]                              # (N-1, nm, nm)
        # terminal cost + terminal cons
        lcN = lam_c[-1] if P else jnp.zeros((0,), dtype)
        mcN = mu_c[-1] if P else jnp.zeros((0,), dtype)
        D = D.at[-1].add(hess_psi(Z[-1], lcN, mcN, 0.0, 0.0))
        # x0 pin penalty: μ_d[0]·I on the x-part of block 0
        D = D.at[0, :n, :n].add(jnp.diag(mu_d[0]))
        return D, L

    # ---------------- solve loops
    def inner_newton(Z, lam_d, mu_d, lam_c, mu_c):
        def body(carry):
            Z, reg, it, gnorm = carry
            g = grad_fn(Z, lam_d, mu_d, lam_c, mu_c)        # (N, nm)
            D, L = build_hessian(Z, lam_d, mu_d, lam_c, mu_c)

            def try_solve(reg_val):
                Dr = D + reg_val * jnp.eye(nm, dtype=dtype)
                G, M = block_tridiag_cholesky(Dr, L)
                fail = jnp.any(jnp.isnan(G))
                dZ = block_tridiag_solve(
                    G, M, jnp.where(fail, jnp.zeros_like(g), -g))
                return jnp.where(fail, jnp.zeros_like(dZ), dZ), fail

            def retry_cond(st):
                _, fail, reg_val, cnt = st
                return fail & (cnt < 12)

            def retry_body(st):
                _, _, reg_val, cnt = st
                reg_val = reg_val * opts.reg_increase + opts.reg_initial
                dZ, fail = try_solve(reg_val)
                return dZ, fail, reg_val, cnt + 1

            dZ0, fail0 = try_solve(reg)
            dZ, fail, reg, _ = jax.lax.while_loop(
                retry_cond, retry_body, (dZ0, fail0, reg, jnp.zeros((), jnp.int32)))

            # backtracking line search on the AL merit
            L0 = al_value(Z, lam_d, mu_d, lam_c, mu_c)

            def ls_body(st):
                alpha, best, cnt = st
                Lt = al_value(Z + alpha * dZ, lam_d, mu_d, lam_c, mu_c)
                ok = Lt < L0
                best = jnp.where(ok & (alpha > best[1]),
                                 jnp.stack([Lt, alpha]), best)
                return alpha * 0.5, best, cnt + 1

            def ls_cond(st):
                alpha, best, cnt = st
                return (best[1] == 0.0) & (cnt < opts.linesearch_iters)

            _, best, _ = jax.lax.while_loop(
                ls_cond, ls_body,
                (jnp.ones((), dtype), jnp.stack(
                    [L0, jnp.zeros((), dtype)]), jnp.zeros((), jnp.int32)))
            alpha = best[1]
            Z_new = Z + alpha * dZ
            gnorm = jnp.max(jnp.abs(g))
            # shrink damping on success
            reg = jnp.where(alpha > 0, jnp.maximum(reg / opts.reg_increase,
                                                   opts.reg_initial), reg)
            return Z_new, reg, it + 1, gnorm

        def cond(carry):
            _, _, it, gnorm = carry
            return (it < opts.iterations_inner) & (gnorm > opts.gradient_tolerance)

        Z, reg, it, gnorm = jax.lax.while_loop(
            cond, body,
            (Z, jnp.asarray(opts.reg_initial, dtype), jnp.zeros((), jnp.int32),
             jnp.asarray(jnp.inf, dtype)))
        return Z, it, gnorm

    Z = jnp.concatenate([X0, U0], axis=1)
    lam_d = jnp.zeros((N, n), dtype)
    mu_d = jnp.full((N, n), opts.penalty_initial, dtype)
    lam_c = jnp.zeros((N, P), dtype)
    mu_c = jnp.full((N, P), opts.penalty_initial, dtype) * cs.mask

    def outer_body(carry):
        Z, lam_d, mu_d, lam_c, mu_c, it, viol, hist = carry
        Z, inner_it, gnorm = inner_newton(Z, lam_d, mu_d, lam_c, mu_c)
        gd = eq_residuals(Z)
        lam_d = lam_d + mu_d * gd
        mu_d = jnp.minimum(mu_d * opts.penalty_scaling, opts.penalty_max)
        if P:
            C = con_values(Z)
            lam_c = jnp.where(cs.mask, lam_c + mu_c * C, 0.0)
            lam_c = jnp.where(cs.is_eq[None, :], lam_c,
                              jnp.maximum(lam_c, 0.0))
            mu_c = jnp.minimum(mu_c * opts.penalty_scaling,
                               opts.penalty_max) * cs.mask
            cviol = cs.max_violation(C)
        else:
            cviol = jnp.zeros((), dtype)
        viol = jnp.maximum(jnp.max(jnp.abs(gd)), cviol)
        Xc, UNc = split(Z)
        hist = record_nlp_history(hist, it, hs_cost(prob.obj, f, Xc, UNc, dt),
                                  viol, gnorm, inner_it)
        return Z, lam_d, mu_d, lam_c, mu_c, it + 1, viol, hist

    def outer_cond(carry):
        *_, it, viol, _h = carry
        return (it < opts.iterations_outer) & (viol > opts.feasibility_tolerance)

    Z, lam_d, mu_d, lam_c, mu_c, it, viol, hist = jax.lax.while_loop(
        outer_cond, outer_body,
        (Z, lam_d, mu_d, lam_c, mu_c, jnp.zeros((), jnp.int32),
         jnp.asarray(jnp.inf, dtype),
         nlp_history(opts.iterations_outer, dtype)))

    X, UN = split(Z)
    gd = eq_residuals(Z)
    C = con_values(Z)
    return DIRCOLResult(
        X=X, U=UN[:-1], U_knots=UN,
        J=hs_cost(prob.obj, f, X, UN, dt),
        c_max=cs.max_violation(C) if P else jnp.zeros((), dtype),
        defect_max=jnp.max(jnp.abs(gd)),
        iterations=it, history=hist)


class DIRCOLMTResult(NamedTuple):
    X: jnp.ndarray
    U: jnp.ndarray
    U_knots: jnp.ndarray
    H: jnp.ndarray           # (N-1,) optimized interval durations
    tf: jnp.ndarray
    J: jnp.ndarray
    c_max: jnp.ndarray
    defect_max: jnp.ndarray
    iterations: jnp.ndarray
    history: dict            # per-outer-iteration trace; see nlp_history


@precise
def dircol_mintime_solve(prob: Problem, R_min_time: float = 1.0,
                         h_max: float = 1.0, h_min: float = 1e-3,
                         opts: DIRCOLOptions = DIRCOLOptions(),
                         equal_steps: bool = False) -> DIRCOLMTResult:
    """Minimum-time Hermite–Simpson collocation: per-interval durations h_k
    join the decision vector (reference dircol_mintime.jl + primals_mintime.jl:
    Z = [x; u; h] per knot, R_min_time·Σh cost, h bounds, optional
    h-equality rows h_k = h_{k+1}, dircol_mintime.jl:241-271).

    Decision blocks z_k = (x_k, u_k, h_k) keep the KKT block-tridiagonal, so
    the same scan Cholesky solves the Newton systems.
    """
    cmodel = prob.model.model
    if cmodel is None:
        raise ValueError("needs the underlying continuous model")
    if cmodel.r > 0:
        f = lambda x, u: cmodel.dynamics(x, u, jnp.zeros((cmodel.r,), x.dtype))
    else:
        f = cmodel.dynamics
    cs = prob.constraints
    n, m, N = prob.n, prob.m, prob.N
    dtype = prob.U.dtype
    nmh = n + m + 1
    P = cs.P

    U0 = jnp.concatenate([prob.U, prob.U[-1:]], axis=0)
    X0 = jnp.where(jnp.all(jnp.isfinite(prob.X)), prob.X,
                   jnp.linspace(0, 1, N)[:, None] * (prob.xf - prob.x0)[None]
                   + prob.x0[None])
    h0 = jnp.full((N, 1), jnp.asarray(prob.dt, dtype))

    def split(Z):
        return Z[:, :n], Z[:, n:n + m], Z[:, n + m]

    def eq_residuals(Z):
        X, UN, h = split(Z)
        F = jax.vmap(f)(X, UN)
        hh = h[:-1, None]
        Xm = 0.5 * (X[:-1] + X[1:]) + hh / 8.0 * (F[:-1] - F[1:])
        Um = 0.5 * (UN[:-1] + UN[1:])
        Fm = jax.vmap(f)(Xm, Um)
        g = X[:-1] - X[1:] + hh / 6.0 * (F[:-1] + 4.0 * Fm + F[1:])
        pin = (X[0] - prob.x0)[None]
        rows = jnp.concatenate([pin, g], axis=0)        # (N, n)
        if equal_steps:
            heq = (h[:-1] - h[1:])[:, None]              # (N-1, 1)
            heq = jnp.concatenate([heq, jnp.zeros((1, 1), dtype)], axis=0)
            rows = jnp.concatenate([rows, heq], axis=1)  # (N, n+1)
        return rows

    def objective(Z):
        X, UN, h = split(Z)

        def ell(k, x, u):
            Q, R, Hm = prob.obj.Q[k], prob.obj.R[k], prob.obj.H[k]
            q, r, c = prob.obj.q[k], prob.obj.r[k], prob.obj.c[k]
            return (0.5 * x @ Q @ x + 0.5 * u @ R @ u + q @ x + r @ u + c
                    + u @ (Hm @ x))

        F = jax.vmap(f)(X, UN)
        hh = h[:-1, None]
        Xm = 0.5 * (X[:-1] + X[1:]) + hh / 8.0 * (F[:-1] - F[1:])
        Um = 0.5 * (UN[:-1] + UN[1:])
        ks = jnp.arange(N - 1)
        l1 = jax.vmap(ell)(ks, X[:-1], UN[:-1])
        lm = jax.vmap(ell)(ks, Xm, Um)
        l2 = jax.vmap(ell)(ks, X[1:], UN[1:])
        J = jnp.sum(h[:-1] / 6.0 * (l1 + 4.0 * lm + l2))
        J = J + R_min_time * jnp.sum(h[:-1])
        xN = X[-1]
        return J + 0.5 * xN @ prob.obj.Q[-1] @ xN + prob.obj.q[-1] @ xN \
            + prob.obj.c[-1]

    def h_bound_viol(Z):
        _, _, h = split(Z)
        lo = jnp.maximum(h_min - h[:-1], 0.0)
        hi = jnp.maximum(h[:-1] - h_max, 0.0)
        return jnp.maximum(jnp.max(lo), jnp.max(hi))

    def al_value(Z, lam_d, mu_d, lam_c, mu_c, lam_h, mu_h):
        X, UN, h = split(Z)
        J = objective(Z)
        gd = eq_residuals(Z)
        Jd = jnp.sum(lam_d * gd + 0.5 * mu_d * gd * gd)
        # h bounds as AL inequality rows (active if violated or λ>0)
        ch = jnp.stack([h - h_max, h_min - h], axis=1)     # (N, 2)
        ah = (ch >= 0.0) | (lam_h > 0)
        Imu_h = jnp.where(ah, mu_h, 0.0)
        Jh = jnp.sum(lam_h * ch + 0.5 * ch * Imu_h * ch)
        if P:
            C = cs.evaluate(X, UN[:-1])
            a = cs.active_set(C, lam_c)
            Imu = jnp.where(a, mu_c, 0.0)
            Jc = jnp.sum(lam_c * C + 0.5 * C * Imu * C)
        else:
            Jc = 0.0
        return J + Jd + Jh + Jc

    grad_fn = jax.grad(al_value, argnums=0)

    # block-tridiagonal Hessian via per-interval AD over (z_k, z_{k+1})
    def phi_k(k, z1, z2, lam_d_k, mu_d_k):
        x1, u1, h1 = z1[:n], z1[n:n + m], z1[n + m]
        x2, u2 = z2[:n], z2[n:n + m]
        f1 = f(x1, u1)
        f2 = f(x2, u2)
        Xm = 0.5 * (x1 + x2) + h1 / 8.0 * (f1 - f2)
        Um = 0.5 * (u1 + u2)
        fm = f(Xm, Um)

        def ell(kk, x, u):
            Q, R, Hm = prob.obj.Q[kk], prob.obj.R[kk], prob.obj.H[kk]
            q, r, c = prob.obj.q[kk], prob.obj.r[kk], prob.obj.c[kk]
            return (0.5 * x @ Q @ x + 0.5 * u @ R @ u + q @ x + r @ u + c
                    + u @ (Hm @ x))

        J = h1 / 6.0 * (ell(k, x1, u1) + 4.0 * ell(k, Xm, Um)
                        + ell(k, x2, u2)) + R_min_time * h1
        g = x1 - x2 + h1 / 6.0 * (f1 + 4.0 * fm + f2)
        gd = lam_d_k[:n] * g + 0.5 * mu_d_k[:n] * g * g
        out = J + jnp.sum(gd)
        if equal_steps:
            heq = h1 - z2[n + m]
            out = out + lam_d_k[n] * heq + 0.5 * mu_d_k[n] * heq * heq
        return out

    hess_joint = jax.hessian(
        lambda k, z12, l, mu: phi_k(k, z12[:nmh], z12[nmh:], l, mu), argnums=1)

    rows_d = n + (1 if equal_steps else 0)

    def build_hessian(Z, lam_d, mu_d, lam_c, mu_c, lam_h, mu_h):
        ks = jnp.arange(N - 1)
        z12 = jnp.concatenate([Z[:-1], Z[1:]], axis=1)
        Hj = jax.vmap(hess_joint)(ks, z12, lam_d[1:], mu_d[1:])
        D = jnp.zeros((N, nmh, nmh), dtype)
        D = D.at[:-1].add(Hj[:, :nmh, :nmh])
        D = D.at[1:].add(Hj[:, nmh:, nmh:])
        L = Hj[:, nmh:, :nmh]
        D = D.at[-1, :n, :n].add(prob.obj.Q[-1])
        D = D.at[0, :n, :n].add(jnp.diag(mu_d[0, :n]))
        # h-bound penalty curvature on diagonal
        _, _, h = split(Z)
        ch = jnp.stack([h - h_max, h_min - h], axis=1)
        ah = (ch >= 0.0) | (lam_h > 0)
        Imu_h = jnp.where(ah, mu_h, 0.0)
        D = D.at[:, n + m, n + m].add(jnp.sum(Imu_h, axis=1))
        if P:
            X, UN, _ = split(Z)
            C = cs.evaluate(X, UN[:-1])
            a = cs.active_set(C, lam_c)
            Imu = jnp.where(a, mu_c, 0.0)
            cx, cu = cs.jacobian(X, UN[:-1])
            JZ = jnp.concatenate(
                [cx, cu, jnp.zeros(cx.shape[:2] + (1,), dtype)], axis=-1)
            D = D + jnp.einsum("kpi,kp,kpj->kij", JZ, Imu, JZ)
        return D, L

    def inner_newton(Z, lam_d, mu_d, lam_c, mu_c, lam_h, mu_h):
        def body(carry):
            Z, reg, it, gnorm = carry
            g = grad_fn(Z, lam_d, mu_d, lam_c, mu_c, lam_h, mu_h)
            D, L = build_hessian(Z, lam_d, mu_d, lam_c, mu_c, lam_h, mu_h)

            def try_solve(reg_val):
                Dr = D + reg_val * jnp.eye(nmh, dtype=dtype)
                G, M = block_tridiag_cholesky(Dr, L)
                fail = jnp.any(jnp.isnan(G))
                dZ = block_tridiag_solve(
                    G, M, jnp.where(fail, jnp.zeros_like(g), -g))
                return jnp.where(fail, jnp.zeros_like(dZ), dZ), fail

            def retry_cond(st):
                _, fail, _, cnt = st
                return fail & (cnt < 12)

            def retry_body(st):
                _, _, reg_val, cnt = st
                reg_val = reg_val * opts.reg_increase + opts.reg_initial
                dZ, fail = try_solve(reg_val)
                return dZ, fail, reg_val, cnt + 1

            dZ0, fail0 = try_solve(reg)
            dZ, fail, reg, _ = jax.lax.while_loop(
                retry_cond, retry_body,
                (dZ0, fail0, reg, jnp.zeros((), jnp.int32)))

            L0 = al_value(Z, lam_d, mu_d, lam_c, mu_c, lam_h, mu_h)

            def ls_body(st):
                alpha, best, cnt = st
                Lt = al_value(Z + alpha * dZ, lam_d, mu_d, lam_c, mu_c,
                              lam_h, mu_h)
                ok = Lt < L0
                best = jnp.where(ok & (alpha > best[1]),
                                 jnp.stack([Lt, alpha]), best)
                return alpha * 0.5, best, cnt + 1

            def ls_cond(st):
                alpha, best, cnt = st
                return (best[1] == 0.0) & (cnt < opts.linesearch_iters)

            _, best, _ = jax.lax.while_loop(
                ls_cond, ls_body,
                (jnp.ones((), dtype), jnp.stack(
                    [L0, jnp.zeros((), dtype)]), jnp.zeros((), jnp.int32)))
            Z_new = Z + best[1] * dZ
            reg = jnp.where(best[1] > 0,
                            jnp.maximum(reg / opts.reg_increase,
                                        opts.reg_initial), reg)
            return Z_new, reg, it + 1, jnp.max(jnp.abs(g))

        def cond(carry):
            _, _, it, gnorm = carry
            return (it < opts.iterations_inner) & \
                (gnorm > opts.gradient_tolerance)

        Z, _, it, gnorm = jax.lax.while_loop(
            cond, body,
            (Z, jnp.asarray(opts.reg_initial, dtype),
             jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, dtype)))
        return Z, it, gnorm

    Z = jnp.concatenate([X0, U0, h0], axis=1)
    lam_d = jnp.zeros((N, rows_d), dtype)
    mu_d = jnp.full((N, rows_d), opts.penalty_initial, dtype)
    lam_c = jnp.zeros((N, P), dtype)
    mu_c = jnp.full((N, P), opts.penalty_initial, dtype) * cs.mask
    lam_h = jnp.zeros((N, 2), dtype)
    mu_h = jnp.full((N, 2), opts.penalty_initial, dtype)

    def outer_body(carry):
        Z, lam_d, mu_d, lam_c, mu_c, lam_h, mu_h, it, viol, hist = carry
        Z, inner_it, gnorm = inner_newton(Z, lam_d, mu_d, lam_c, mu_c,
                                          lam_h, mu_h)
        gd = eq_residuals(Z)
        lam_d = lam_d + mu_d * gd
        mu_d = jnp.minimum(mu_d * opts.penalty_scaling, opts.penalty_max)
        _, _, h = split(Z)
        ch = jnp.stack([h - h_max, h_min - h], axis=1)
        lam_h = jnp.maximum(lam_h + mu_h * ch, 0.0)
        mu_h = jnp.minimum(mu_h * opts.penalty_scaling, opts.penalty_max)
        if P:
            X, UN, _ = split(Z)
            C = cs.evaluate(X, UN[:-1])
            lam_c = jnp.where(cs.mask, lam_c + mu_c * C, 0.0)
            lam_c = jnp.where(cs.is_eq[None, :], lam_c,
                              jnp.maximum(lam_c, 0.0))
            mu_c = jnp.minimum(mu_c * opts.penalty_scaling,
                               opts.penalty_max) * cs.mask
            cviol = cs.max_violation(C)
        else:
            cviol = jnp.zeros((), dtype)
        viol = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(gd)), cviol),
                           h_bound_viol(Z))
        hist = record_nlp_history(hist, it, objective(Z), viol, gnorm,
                                  inner_it)
        return Z, lam_d, mu_d, lam_c, mu_c, lam_h, mu_h, it + 1, viol, hist

    def outer_cond(carry):
        *_, it, viol, _h = carry
        return (it < opts.iterations_outer) & \
            (viol > opts.feasibility_tolerance)

    (Z, lam_d, mu_d, lam_c, mu_c, lam_h, mu_h, it, viol,
     hist) = jax.lax.while_loop(
        outer_cond, outer_body,
        (Z, lam_d, mu_d, lam_c, mu_c, lam_h, mu_h,
         jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, dtype),
         nlp_history(opts.iterations_outer, dtype)))

    X, UN, h = split(Z)
    gd = eq_residuals(Z)
    C = cs.evaluate(X, UN[:-1]) if P else jnp.zeros((N, 0), dtype)
    return DIRCOLMTResult(
        X=X, U=UN[:-1], U_knots=UN, H=h[:-1], tf=jnp.sum(h[:-1]),
        J=objective(Z),
        c_max=cs.max_violation(C) if P else jnp.zeros((), dtype),
        defect_max=jnp.max(jnp.abs(gd[:, :n])),
        iterations=it, history=hist)
