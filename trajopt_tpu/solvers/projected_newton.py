"""Projected Newton solver (machine-precision feasibility polish).

TPU-native counterpart of reference src/solvers/direct/projected_newton.jl.
The reference assembles a banded sparse KKT Jacobian Y (dynamics defects +
active constraint rows) and projects primals via

    δZ = −H⁻¹ Yᵀ (Y H⁻¹ Yᵀ + ρI)⁻¹ y        (H = diagonal cost Hessian)

with CHOLMOD sparse Cholesky (projected_newton.jl:200-324). Here the Schur
complement S = Y H⁻¹ Yᵀ is never formed as a big sparse matrix: its exact
block-tridiagonal structure (row block k couples only knots k−1, k — see
buildShurCompliment, projected_newton.jl:728-777) is materialized as three
stacked block arrays and factorized with a block-tridiagonal Cholesky
``lax.scan`` — batched q×q matmuls that map onto the MXU.

Active-set changes (which change sparsity in the reference) become row
masking: inactive rows keep a zero Y row and zero rhs, and the +ρI
regularization keeps S well-posed, so shapes stay static under jit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from trajopt_tpu.problem import Problem
from trajopt_tpu.utils.tree import precise, static_dataclass


@static_dataclass
class PNOptions:
    """(reference ProjectedNewtonSolverOptions, direct_solvers.jl:14-30)."""

    n_steps: int = 2
    solve_type: str = "feasible"  # 'feasible' | 'optimal'
    active_set_tolerance: float = 1e-3
    feasibility_tolerance: float = 1e-6
    ridge: float = 1e-2            # ρ in S + ρI (projected_newton.jl:243)
    refine_iters: int = 25         # iterative refinement (reg_solve, :306-324)
    refine_tol: float = 1e-8
    max_projection_iters: int = 10
    max_refinements: int = 10
    linesearch_iters: int = 10
    # Jacobi-equilibrate the Schur blocks before the block Cholesky (no
    # reference counterpart — CHOLMOD in f64 never needed it): the maze
    # active-set S mixes defect rows at dynamics scale with obstacle
    # rows at penalty scale and inactive rows at ridge scale, and the
    # RAW f32 factorization at q = 89 produced garbage Newton steps
    # (polish DEGRADED med c_max 5.6e-6 → 7.1e-5 — BENCH_LOCAL round 5).
    # Factor diag(s)·S·diag(s) with unit diagonal and unscale the solve;
    # refinement still runs against the unscaled unregularized S.
    equilibrate: bool = True


class PNResult(NamedTuple):
    X: jnp.ndarray
    U: jnp.ndarray
    J: jnp.ndarray
    c_max: jnp.ndarray
    viol: jnp.ndarray
    iterations: jnp.ndarray


# --------------------------------------------- block-tridiagonal Cholesky ops

def block_tridiag_cholesky(D, L):
    """Cholesky factor of a symmetric positive-definite block-tridiagonal
    matrix given diagonal blocks D: (N, q, q) and sub-diagonal blocks
    L: (N-1, q, q) (block (k+1, k)). Returns (G, M): diagonal Cholesky
    factors G (lower) and off-diagonal factors M with
    S = 𝓛 𝓛ᵀ, 𝓛 block rows [M_{k-1}, G_k].
    """

    def step(G_prev, inp):
        D_k, L_k = inp
        # M_k = L_k G_prev^{-T}
        M_k = jax.scipy.linalg.solve_triangular(
            G_prev, L_k.T, lower=True).T
        G_k = jnp.linalg.cholesky(D_k - M_k @ M_k.T)
        return G_k, (G_k, M_k)

    G0 = jnp.linalg.cholesky(D[0])
    _, (G_tail, M) = jax.lax.scan(step, G0, (D[1:], L))
    G = jnp.concatenate([G0[None], G_tail], axis=0)
    return G, M


def block_tridiag_solve(G, M, b):
    """Solve S x = b given the block Cholesky factors. b: (N, q)."""

    def fwd(w_prev, inp):
        G_k, M_k, b_k = inp
        w_k = jax.scipy.linalg.solve_triangular(
            G_k, b_k - M_k @ w_prev, lower=True)
        return w_k, w_k

    w0 = jax.scipy.linalg.solve_triangular(G[0], b[0], lower=True)
    _, w_tail = jax.lax.scan(fwd, w0, (G[1:], M, b[1:]))
    w = jnp.concatenate([w0[None], w_tail], axis=0)

    def bwd(x_next, inp):
        G_k, M_k1, w_k = inp
        x_k = jax.scipy.linalg.solve_triangular(
            G_k.T, w_k - M_k1.T @ x_next, lower=False)
        return x_k, x_k

    xN = jax.scipy.linalg.solve_triangular(G[-1].T, w[-1], lower=False)
    _, x_head = jax.lax.scan(bwd, xN, (G[:-1], M, w[:-1]), reverse=True)
    return jnp.concatenate([x_head, xN[None]], axis=0)


def block_tridiag_matvec(D, L, x):
    """y = S x for block-tridiagonal S. x: (N, q)."""
    y = jnp.einsum("kij,kj->ki", D, x)
    y = y.at[1:].add(jnp.einsum("kij,kj->ki", L, x[:-1]))
    y = y.at[:-1].add(jnp.einsum("kji,kj->ki", L, x[1:]))
    return y


# ----------------------------------------------------------------- assembly

def _dynamics_defects(prob: Problem, X, U):
    """fVal: (N, n) — [x_0 − x0; f(x_k, u_k) − x_{k+1}]
    (reference dynamics_constraints!, projected_newton.jl:37-45)."""
    dt_traj = prob.dt_traj()
    f_next = jax.vmap(prob.model.step)(X[:-1], U, dt_traj)
    d0 = X[0] - prob.x0
    return jnp.concatenate([d0[None], f_next - X[1:]], axis=0)


def _assemble(prob: Problem, X, U, active):
    """Build the per-knot row-block pieces of Y and the diagonal H⁻¹.

    Row block k (q = n + P rows): [defect rows; constraint rows at knot k].
    Ya_k: coupling to variable block k−1 = (x_{k-1}, u_{k-1});
    Yb_k: coupling to variable block k = (x_k, u_k)  (u_{N-1} phantom).
    """
    n, m, N = prob.n, prob.m, prob.N
    cs = prob.constraints
    P = cs.P
    q = n + P
    nm = n + m
    dtype = X.dtype
    dt_traj = prob.dt_traj()

    A, B = prob.model.jacobian_traj(X[:-1], U, dt_traj)     # (N-1,n,n),(N-1,n,m)
    cx, cu = cs.jacobian(X, U)                               # (N,P,n),(N,P,m)
    act = active.astype(dtype)[:, :, None]
    cx = cx * act
    cu = cu * act

    # Ya: (N, q, nm); Ya[0] = 0; Ya[k] top rows = [A_{k-1} B_{k-1}]
    Ya = jnp.zeros((N, q, nm), dtype)
    AB = jnp.concatenate([A, B], axis=2)                      # (N-1, n, nm)
    Ya = Ya.at[1:, :n, :].set(AB)

    # Yb: (N, q, nm): defect rows = -I on x (+I at k=0); con rows = [cx cu]
    Yb = jnp.zeros((N, q, nm), dtype)
    eye = jnp.eye(n, dtype=dtype)
    negI = jnp.broadcast_to(-eye, (N, n, n))
    Yb = Yb.at[:, :n, :n].set(negI)
    Yb = Yb.at[0, :n, :n].set(eye)
    Yb = Yb.at[:, n:, :n].set(cx)
    Yb = Yb.at[:, n:, n:].set(cu)
    # phantom u at terminal knot: zero its columns
    Yb = Yb.at[N - 1, :, n:].set(0.0)

    # diagonal cost Hessian H (reference cost_expansion! → Diagonal(H),
    # projected_newton.jl:122-149, 231): hz (N, nm)
    e = prob.obj.expansion(X, U, dt_traj)
    hx = jax.vmap(jnp.diag)(e.xx)                             # (N, n)
    hu = jax.vmap(jnp.diag)(e.uu)                             # (N-1, m)
    hu = jnp.concatenate([hu, jnp.zeros((1, m), dtype)], axis=0)
    hz = jnp.concatenate([hx, hu], axis=1)                    # (N, nm)
    hinv = jnp.where(hz > 1e-12, 1.0 / jnp.maximum(hz, 1e-12), 0.0)
    hinv = hinv.at[N - 1, n:].set(0.0)                        # phantom u

    g = jnp.concatenate([e.x, jnp.concatenate(
        [e.u, jnp.zeros((1, m), dtype)], axis=0)], axis=1)    # (N, nm)

    return Ya, Yb, hinv, g


def _rhs(prob: Problem, X, U, active):
    """y: (N, q) = [defects; active constraint values]."""
    C = prob.constraints.evaluate(X, U)
    d = _dynamics_defects(prob, X, U)
    Crows = jnp.where(active, C, 0.0)
    return jnp.concatenate([d, Crows], axis=1)


def _schur_blocks(Ya, Yb, hinv, ridge):
    """S = Y H⁻¹ Yᵀ + ρI as block-tridiagonal (D, L)."""
    N, q, nm = Ya.shape
    Hb = hinv[:, None, :]                                     # (N,1,nm)
    D = jnp.einsum("kin,kjn->kij", Yb * Hb, Yb)
    D = D.at[1:].add(jnp.einsum("kin,kjn->kij", Ya[1:] * Hb[:-1], Ya[1:]))
    D = D + ridge * jnp.eye(q, dtype=Ya.dtype)
    # L_k = S_{k+1,k} = Ya_{k+1} H_k⁻¹ Yb_kᵀ
    L = jnp.einsum("kin,kjn->kij", Ya[1:] * Hb[:-1], Yb[:-1])
    return D, L


def _apply_YtHinv(Ya, Yb, hinv, lam):
    """δz = H⁻¹ Yᵀ λ: (N, nm)."""
    dz = jnp.einsum("kqn,kq->kn", Yb, lam)
    dz = dz.at[:-1].add(jnp.einsum("kqn,kq->kn", Ya[1:], lam[1:]))
    return hinv * dz


def _apply_Y(Ya, Yb, dz):
    """Y δz: (N, q)."""
    y = jnp.einsum("kqn,kn->kq", Yb, dz)
    y = y.at[1:].add(jnp.einsum("kqn,kn->kq", Ya[1:], dz[:-1]))
    return y


def _split_z(dz, n, m, N):
    dX = dz[:, :n]
    dU = dz[:-1, n:]
    return dX, dU


def _max_viol(prob: Problem, y, active):
    """∞-norm of [defects; active constraint rows]."""
    return jnp.max(jnp.abs(y))


@precise
def pn_solve(prob: Problem, opts: PNOptions = PNOptions()) -> PNResult:
    """Feasibility projection solve (reference solve! + projection_solve!,
    projected_newton.jl:6-20, 200-264). ``solve_type='feasible'`` is the mode
    ALTRO uses for its 1e-8 polish."""
    n, m, N = prob.n, prob.m, prob.N
    cs = prob.constraints
    X0, U0 = prob.X, prob.U
    dtype = X0.dtype

    def active_set(X, U):
        C = cs.evaluate(X, U)
        # a = eq | (c >= -tol) (projected_newton.jl:87-93; note the -tol)
        a = cs.is_eq[None, :] | (C >= -opts.active_set_tolerance)
        return a & cs.mask

    def full_viol(Xc, Uc):
        """True feasibility measure: dynamics defects + violation of EVERY
        constraint row (not just the frozen active set). The reference
        scores its projection line search on the active-set residual
        (projected_newton.jl:297-303) — safe in f64 where steps are small;
        in f32 a garbage Newton direction can shrink the frozen-active
        rows while pushing INACTIVE inequalities violently positive, so
        the frozen metric accepted steps that degraded c_max (round-5 TPU
        maze polish). Acceptance is on the quantity the projection exists
        to reduce."""
        d_ = _dynamics_defects(prob, Xc, Uc)
        C_ = cs.evaluate(Xc, Uc)
        return jnp.maximum(jnp.max(jnp.abs(d_)), cs.max_violation(C_))

    def projection_iteration(carry):
        X, U, it, viol = carry
        act = active_set(X, U)
        Ya, Yb, hinv, _ = _assemble(prob, X, U, act)
        D, L = _schur_blocks(Ya, Yb, hinv, opts.ridge)
        if opts.equilibrate:
            dg = jnp.diagonal(D, axis1=1, axis2=2)          # (N, q)
            s = jax.lax.rsqrt(jnp.maximum(dg, jnp.asarray(1e-30, dtype)))
            G, M = block_tridiag_cholesky(
                D * s[:, :, None] * s[:, None, :],
                L * s[1:, :, None] * s[:-1, None, :])
        else:
            s = None
            G, M = block_tridiag_cholesky(D, L)

        def scaled_solve(b):
            if s is None:
                return block_tridiag_solve(G, M, b)
            return s * block_tridiag_solve(G, M, s * b)

        def refine_solve(y):
            """δλ = reg_solve(S, y): Cholesky of S+ρI + iterative refinement
            against the UNregularized S (projected_newton.jl:306-324)."""
            lam = scaled_solve(y)
            D0 = D - opts.ridge * jnp.eye(D.shape[-1], dtype=dtype)

            def body(i, lam):
                r = y - block_tridiag_matvec(D0, L, lam)
                return lam + scaled_solve(r)

            return jax.lax.fori_loop(0, opts.refine_iters, body, lam)

        def linesearch(carry2):
            X_c, U_c, viol_c, _, _ = carry2
            y = _rhs(prob, X_c, U_c, act)
            viol0 = full_viol(X_c, U_c)

            def ls_cond(st):
                Xn, Un, violn, alpha, cnt = st
                return (violn >= viol0) & (cnt <= opts.linesearch_iters)

            def ls_body(st):
                Xn, Un, violn, alpha, cnt = st
                lam = refine_solve(y)
                dz = -_apply_YtHinv(Ya, Yb, hinv, lam)
                dX, dU = _split_z(dz, n, m, N)
                X_t = X_c + alpha * dX
                U_t = U_c + alpha * dU
                viol_t = full_viol(X_t, U_t)
                return (X_t, U_t, viol_t, alpha * 0.5, cnt + 1)

            init = (X_c, U_c, jnp.asarray(jnp.inf, dtype),
                    jnp.ones((), dtype), jnp.ones((), jnp.int32))
            Xn, Un, violn, _, _ = jax.lax.while_loop(ls_cond, ls_body, init)
            # exhausted line search: keep the ENTRY state, not the last
            # (worst) trial — in f64 the search never exhausts so this was
            # invisible, but f32 Newton steps at ill-conditioned active
            # sets exhaust it and the raw loop state DEGRADED the iterate
            # monotonically (round-5 TPU maze polish: med c_max
            # 5.6e-6 → 7.1e-5). The projection must be a no-worse map.
            ok = violn < viol0
            Xn = jnp.where(ok, Xn, X_c)
            Un = jnp.where(ok, Un, U_c)
            violn = jnp.where(ok, violn, viol0)
            return Xn, Un, violn, viol0, viol_c

        # refinement loop (projected_newton.jl:244-259): repeat linesearch
        # while converging fast and still violating
        def refine_cond(st):
            X_c, U_c, viol_c, viol_prev, cnt = st
            rate = jnp.log10(jnp.maximum(viol_c, 1e-300)) / \
                jnp.log10(jnp.maximum(viol_prev, 1e-300))
            keep = (rate >= 1.1) & (viol_c > opts.feasibility_tolerance)
            return keep & (cnt < opts.max_refinements)

        def refine_body(st):
            X_c, U_c, viol_c, viol_prev, cnt = st
            Xn, Un, violn, v0, _ = linesearch((X_c, U_c, viol_c, 0.0, 0.0))
            return (Xn, Un, violn, viol_c, cnt + 1)

        # do at least one linesearch, then loop
        Xn, Un, violn, v0, _ = linesearch((X, U, viol, 0.0, 0.0))
        Xn, Un, violn, _, _ = jax.lax.while_loop(
            refine_cond, refine_body,
            (Xn, Un, violn, jnp.maximum(v0, 1e-300), jnp.ones((), jnp.int32)))
        return Xn, Un, it + 1, violn

    def outer_cond(carry):
        X, U, it, viol = carry
        return (viol > opts.feasibility_tolerance) & \
            (it < opts.max_projection_iters)

    def project(X, U):
        viol0 = full_viol(X, U)
        return jax.lax.while_loop(
            outer_cond, lambda c: projection_iteration(c),
            (X, U, jnp.zeros((), jnp.int32), viol0))

    X, U, it, viol = project(X0, U0)

    if opts.solve_type == "optimal":
        # full KKT Newton steps on top of the feasibility projection
        # (reference newton_step!, projected_newton.jl:501-547)
        for _ in range(opts.n_steps):
            X, U, viol = _kkt_newton_step(prob, X, U, active_set, project, opts)
            it = it + 1

    C = cs.evaluate(X, U)
    c_max = cs.max_violation(C)
    J = prob.obj.total(X, U, prob.dt_traj())
    return PNResult(X=X, U=U, J=J, c_max=c_max, viol=viol, iterations=it)


def _kkt_newton_step(prob: Problem, X, U, active_set, project, opts: PNOptions):
    """One primal-dual KKT step (reference multiplier_projection! +
    solveKKT_Shur + line_search, projected_newton.jl:407-547):

        λ*  = argmin ‖g + Yᵀλ‖        (dual least squares via Y Yᵀ)
        δλ  = S⁻¹ (y − Y H⁻¹ r),  r = g + Yᵀλ*
        δz  = −H⁻¹ (r + Yᵀ δλ)
        line search on α with re-projection to feasibility.
    """
    n, m, N = prob.n, prob.m, prob.N
    dtype = X.dtype

    act = active_set(X, U)
    Ya, Yb, hinv, g = _assemble(prob, X, U, act)
    y = _rhs(prob, X, U, act)

    # ---- multiplier projection: solve (Y Yᵀ + ρI) δλ = −Y g
    ones_h = jnp.ones_like(hinv).at[N - 1, n:].set(0.0)
    D_I, L_I = _schur_blocks(Ya, Yb, ones_h, opts.ridge)
    G_I, M_I = block_tridiag_cholesky(D_I, L_I)
    Yg = _apply_Y(Ya, Yb, g)                       # Y g  (uses H = I)
    lam = -block_tridiag_solve(G_I, M_I, Yg)       # λ* = −(YYᵀ)⁻¹ Y g

    # ---- KKT Schur step with the diagonal cost metric
    D, L = _schur_blocks(Ya, Yb, hinv, opts.ridge)
    G, M = block_tridiag_cholesky(D, L)
    r = g + _apply_Yt(Ya, Yb, lam)                 # (N, nm)
    YHr = _apply_Y(Ya, Yb, hinv * r)
    dlam = block_tridiag_solve(G, M, y - YHr)
    dz = -hinv * (r + _apply_Yt(Ya, Yb, dlam))
    dX, dU = _split_z(dz, n, m, N)

    def residual_norm(Xc, Uc, lamc):
        actc = active_set(Xc, Uc)
        Ya2, Yb2, _, g2 = _assemble(prob, Xc, Uc, actc)
        y2 = _rhs(prob, Xc, Uc, actc)
        res = g2 + _apply_Yt(Ya2, Yb2, lamc)
        return jnp.sqrt(jnp.sum(res**2) + jnp.sum(y2**2))

    res0 = residual_norm(X, U, lam)

    def ls_body(st):
        alpha, bestX, bestU, best_res, done, cnt = st
        Xt = X + alpha * dX
        Ut = U + alpha * dU
        # re-project to feasibility (reference line_search calls projection!)
        Xt, Ut, _, violt = project(Xt, Ut)
        rest = residual_norm(Xt, Ut, lam + alpha * dlam)
        ok = rest < res0
        bestX = jnp.where(ok, Xt, bestX)
        bestU = jnp.where(ok, Ut, bestU)
        best_res = jnp.where(ok, rest, best_res)
        return alpha * 0.5, bestX, bestU, best_res, done | ok, cnt + 1

    def ls_cond(st):
        alpha, bX, bU, br, done, cnt = st
        return (~done) & (cnt < 10)

    _, Xn, Un, res1, accepted, _ = jax.lax.while_loop(
        ls_cond, ls_body,
        (jnp.ones((), dtype), X, U, res0, jnp.asarray(False),
         jnp.zeros((), jnp.int32)))

    actn = active_set(Xn, Un)
    violn = jnp.max(jnp.abs(_rhs(prob, Xn, Un, actn)))
    return Xn, Un, violn


def _apply_Yt(Ya, Yb, lam):
    """Yᵀ λ without the H⁻¹ factor: (N, nm)."""
    dz = jnp.einsum("kqn,kq->kn", Yb, lam)
    dz = dz.at[:-1].add(jnp.einsum("kqn,kq->kn", Ya[1:], lam[1:]))
    return dz


# ------------------------------------------------------------ flat primals
# (reference Primals pack/unpack, src/solvers/direct/primals.jl:23-142)

def pack_primals(X, U):
    """Interleave into the flat decision vector Z = [x0;u0;x1;u1;…;xN]."""
    N, n = X.shape
    m = U.shape[-1]
    Zs = jnp.concatenate(
        [X[:-1], U], axis=1).reshape(-1)
    return jnp.concatenate([Zs, X[-1]])


def unpack_primals(Z, n, m, N):
    """Inverse of :func:`pack_primals`."""
    body = Z[: (N - 1) * (n + m)].reshape(N - 1, n + m)
    X = jnp.concatenate([body[:, :n], Z[-n:][None]], axis=0)
    U = body[:, n:]
    return X, U
