"""DIRTREL — robust trajectory optimization with disturbance ellipsoids.

TPU-native counterpart of reference src/solvers/direct/dirtrel.jl (959 LoC,
its own MOI NLP evaluator solved by Ipopt). Same algorithm (Manchester &
Kuindersma's DIRTREL): around the nominal trajectory, a TVLQR tracking
controller is synthesized, the disturbance ellipsoid E_k is propagated
through the closed loop (dirtrel.jl:196-230), a robust cost
Σ tr((Q_r + KᵀR_r K) E_k) penalizes closed-loop dispersion, and state/
control constraints are tightened by the ellipsoid extent (dirtrel.jl
gen_δx/gen_δu, :310-420).

TPU-first differences from the reference:
- E/H propagation and the TVLQR sweep are ``lax.scan``s; the robust-cost
  gradient is exact reverse-mode AD through them (the reference uses
  ForwardDiff over hand-assembled functions).
- The NLP is solved by the same native AL + block-tridiagonal Newton core
  as DIRCOL (no Ipopt); the robust cost enters the gradient exactly and the
  Hessian via its nominal block structure (Gauss-Newton treatment of the
  trajectory-coupled robust terms).
- Constraint tightening matches the reference's per-vertex row scheme
  (robust_constraints!, dirtrel.jl:496-546): every ± column vertex of
  sqrtm(E) / sqrtm(K E Kᵀ) contributes its OWN inequality row with its
  own AL multiplier, and the vertices are a FUNCTION of the iterate —
  the AL gradient differentiates through the δ tightening (the
  reference's gen_δx/gen_δu with analytic gradients, dirtrel.jl:310-420).
  The PSD square root uses a trace-scaled Denman–Beavers iteration with
  the reference's ε padding: smooth (safe JVPs at repeated eigenvalues,
  where eigh's gradient divides by eigen-gaps) and quadratically
  convergent for the padded SPD inputs. State vertices are included here
  (the reference has them written but disabled, dirtrel.jl:508-517);
  vertex rows exist only for constraints structurally depending on the
  perturbed variable, so untouched rows are not multiply-penalized.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.problem import Problem
from trajopt_tpu.solvers.dircol import (
    DIRCOLOptions, hs_cost, hs_defects, nlp_history, record_nlp_history,
)
from trajopt_tpu.solvers.projected_newton import (
    block_tridiag_cholesky, block_tridiag_solve,
)
from trajopt_tpu.utils.tree import precise, pytree_dataclass, static_dataclass


@static_dataclass
class DIRTRELOptions:
    """(reference DIRTRELSolver fields, dirtrel.jl:7-34)."""

    feasibility_tolerance: float = 1e-6
    gradient_tolerance: float = 1e-5
    iterations_outer: int = 20
    iterations_inner: int = 30
    penalty_initial: float = 10.0
    penalty_scaling: float = 10.0
    penalty_max: float = 1e10
    reg_initial: float = 1e-6
    reg_increase: float = 10.0
    linesearch_iters: int = 20
    eig_pad: float = 1e-8          # ε padding (reference matrix-sqrt padding)


@pytree_dataclass
class RobustSpec:
    """Disturbance model + robust weights (reference DIRTRELProblem,
    dirtrel.jl:38-87): E1 (n,n) initial ellipsoid, D (r,r) disturbance
    covariance, TVLQR weights Q_lqr/R_lqr/Qf_lqr, robust cost weights
    Q_r/R_r/Qf_r."""

    E1: jnp.ndarray
    D: jnp.ndarray
    Q_lqr: jnp.ndarray
    R_lqr: jnp.ndarray
    Qf_lqr: jnp.ndarray
    Q_r: jnp.ndarray
    R_r: jnp.ndarray
    Qf_r: jnp.ndarray


class DIRTRELResult(NamedTuple):
    X: jnp.ndarray
    U: jnp.ndarray
    U_knots: jnp.ndarray
    J: jnp.ndarray
    J_robust: jnp.ndarray
    E: jnp.ndarray          # (N, n, n) closed-loop ellipsoids
    K: jnp.ndarray          # (N-1, m, n) TVLQR gains
    defect_max: jnp.ndarray
    c_max: jnp.ndarray
    iterations: jnp.ndarray
    history: dict           # per-outer-iteration trace; see dircol.nlp_history


def _discretize_uncertain(f, integrator="rk3"):
    """Discrete uncertain step x⁺ = F(x, u, w, dt) (reference rk3_uncertain,
    integration.jl:160-168: ZOH on both u and w)."""
    def step(x, u, w, dt):
        def fw(x_, u_):
            return f(x_, u_, w)
        k1 = dt * fw(x, u)
        k2 = dt * fw(x + 0.5 * k1, u)
        k3 = dt * fw(x - k1 + 2.0 * k2, u)
        return x + (k1 + 4.0 * k2 + k3) / 6.0
    return step


def psd_sqrt(M, eig_pad, iters: int = 16):
    """ε-padded PSD matrix square root (reference gen_δx/gen_δu,
    dirtrel.jl:310-420) via a trace-scaled Denman–Beavers iteration:

        Y ← ½(Y + Z⁻¹),  Z ← ½(Z + Y⁻¹),  Y → sqrt(A), Z → sqrt(A)⁻¹

    on A = (M_sym + ε·I)/s with s = tr/n (unit-scale spectrum ⇒ fast
    quadratic convergence), unscaled by √s. Chosen over eigh because the
    robust-constraint vertices are DIFFERENTIATED through this sqrt (the
    AL gradient flows through the δ tightening) and eigh's JVP divides by
    eigenvalue gaps — NaN at the isotropic E₁ the recursion starts from;
    Denman–Beavers is smooth everywhere on the padded SPD cone."""
    n = M.shape[-1]
    eye = jnp.eye(n, dtype=M.dtype)
    A = 0.5 * (M + jnp.swapaxes(M, -1, -2)) + eig_pad * eye
    s = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None] / n
    A = A / s
    Y, Z = A, jnp.broadcast_to(eye, A.shape)

    def body(_, YZ):
        Y, Z = YZ
        Y_new = 0.5 * (Y + jnp.linalg.inv(Z))
        Z_new = 0.5 * (Z + jnp.linalg.inv(Y))
        return Y_new, Z_new

    Y, Z = jax.lax.fori_loop(0, iters, body, (Y, Z))
    return Y * jnp.sqrt(s)


def tvlqr_gains(A, B, Q, R, Qf):
    """Discrete TVLQR sweep (reference tvlqr inside robust_cost,
    dirtrel.jl:196-230). Returns K: (N-1, m, n)."""
    def bp(P, inp):
        A_k, B_k = inp
        BtP = B_k.T @ P
        K_k = jnp.linalg.solve(R + BtP @ B_k, BtP @ A_k)
        Acl = A_k - B_k @ K_k
        P_new = Q + K_k.T @ R @ K_k + Acl.T @ P @ Acl
        P_new = 0.5 * (P_new + P_new.T)
        return P_new, K_k

    _, K = jax.lax.scan(bp, Qf, (A, B), reverse=True)
    return K


def propagate_ellipsoids(A, B, G, K, E1, D):
    """Closed-loop disturbance ellipsoid recursion (DIRTREL eq. 10-11,
    reference dirtrel.jl:196-230):

        Acl = A − B K
        E⁺ = Acl E Aclᵀ + Acl H Gᵀ + G Hᵀ Aclᵀ + G D Gᵀ
        H⁺ = Acl H + G D
    """
    n = A.shape[-1]
    r = G.shape[-1]

    def step(carry, inp):
        E, H = carry
        A_k, B_k, G_k, K_k = inp
        Acl = A_k - B_k @ K_k
        AclH = Acl @ H
        E_new = Acl @ E @ Acl.T + AclH @ G_k.T + G_k @ AclH.T + G_k @ D @ G_k.T
        E_new = 0.5 * (E_new + E_new.T)
        H_new = Acl @ H + G_k @ D
        return (E_new, H_new), E

    H1 = jnp.zeros((n, r), A.dtype)
    (E_N, _), E_head = jax.lax.scan(step, (E1, H1), (A, B, G, K))
    return jnp.concatenate([E_head, E_N[None]], axis=0)  # (N, n, n)


def robust_cost(step_w, X, UN, dt, spec: RobustSpec):
    """ℓ_E = Σ tr((Q_r + KᵀR_rK) E_k) + tr(Qf_r E_N)
    (reference robust_cost, dirtrel.jl:196-230). Fully differentiable."""
    r = spec.D.shape[0]
    w0 = jnp.zeros((r,), X.dtype)

    def jac(x, u):
        A = jax.jacfwd(step_w, argnums=0)(x, u, w0, dt)
        B = jax.jacfwd(step_w, argnums=1)(x, u, w0, dt)
        G = jax.jacfwd(step_w, argnums=2)(x, u, w0, dt)
        return A, B, G

    A, B, G = jax.vmap(jac)(X[:-1], UN[:-1])
    K = tvlqr_gains(A, B, spec.Q_lqr, spec.R_lqr, spec.Qf_lqr)
    E = propagate_ellipsoids(A, B, G, K, spec.E1, spec.D)

    W_stage = spec.Q_r[None] + jnp.einsum("kji,jl,klm->kim", K, spec.R_r, K)
    lE = jnp.sum(jnp.einsum("kij,kji->k", W_stage, E[:-1]))
    lE = lE + jnp.trace(spec.Qf_r @ E[-1])
    return lE, (E, K)


@precise
def dirtrel_solve(prob: Problem, spec: RobustSpec,
                  opts: DIRTRELOptions = DIRTRELOptions()) -> DIRTRELResult:
    """Robust HS-collocation solve (reference solve!, dirtrel.jl:892-959).

    ``prob.model.model`` must be an uncertain continuous model f(x, u, w)
    with ``r > 0`` (reference UncertainModel, model.jl:36-74).
    """
    cmodel = prob.model.model
    if cmodel is None or cmodel.r == 0:
        raise ValueError("DIRTREL needs an uncertain continuous model f(x,u,w)")
    f = cmodel.dynamics
    f_nom = lambda x, u: f(x, u, jnp.zeros((cmodel.r,), x.dtype))
    step_w = _discretize_uncertain(f)
    cs = prob.constraints
    n, m, N = prob.n, prob.m, prob.N
    dtype = prob.U.dtype
    dt = jnp.asarray(prob.dt, dtype)
    nm = n + m
    P = cs.P

    U0 = jnp.concatenate([prob.U, prob.U[-1:]], axis=0)
    X0 = jnp.where(jnp.all(jnp.isfinite(prob.X)), prob.X,
                   jnp.linspace(0, 1, N)[:, None] * (prob.xf - prob.x0)[None]
                   + prob.x0[None])

    def split(Z):
        return Z[:, :n], Z[:, n:]

    def eq_residuals(Z):
        X, UN = split(Z)
        g = hs_defects(f_nom, X, UN, dt)
        pin = (X[0] - prob.x0)[None]
        return jnp.concatenate([pin, g], axis=0)

    def robust_terms(Z):
        X, UN = split(Z)
        return robust_cost(step_w, X, UN, dt, spec)

    # ---------------- per-vertex robust constraint rows -------------------
    # V = 1 (nominal) + 2n state vertices + 2m control vertices. Each
    # vertex owns a full (N, P) row bank with its OWN multipliers
    # (reference robust_constraints! enumerates rows per vertex,
    # dirtrel.jl:496-546); equality rows live only at the nominal vertex,
    # and vertex banks keep only rows structurally depending on the
    # perturbed variable (via the canonical descriptors when available).
    V = 1 + 2 * n + 2 * m

    def _row_deps():
        from trajopt_tpu.ops.canonical import constraint_canon

        depx = np.ones((P,), bool)
        depu = np.ones((P,), bool)
        for con, (r0, r1) in zip(cs.cons, cs.slices):
            c = constraint_canon(con, n, m)
            if c is None:
                continue
            if c[0] == "sphere":
                depx[r0:r1] = True
                depu[r0:r1] = False
            else:
                for i, (col, _sign) in enumerate(c[1]):
                    depx[r0 + i] = col < n
                    depu[r0 + i] = col >= n
        return depx, depu

    if P:
        _depx, _depu = _row_deps()
        _vmask_np = np.zeros((V, 1, P), bool)
        _vmask_np[0] = True
        ineq = ~np.asarray(jax.device_get(cs.is_eq))
        for v in range(1, 1 + 2 * n):
            _vmask_np[v, 0] = ineq & _depx
        for v in range(1 + 2 * n, V):
            _vmask_np[v, 0] = ineq & _depu
        vmask = jnp.asarray(_vmask_np) & cs.mask[None]      # (V, N, P)
    else:
        vmask = jnp.zeros((V, N, 0), bool)

    def vertex_con_values(Z, dXcols, dUcols):
        """C (V, N, P): nominal rows then every ± ellipsoid-column vertex.
        The vertex offsets (columns of the ε-padded square roots,
        reference gen_δx/gen_δu, dirtrel.jl:310-420) are FROZEN per outer
        AL iteration: the ellipsoids couple every knot to the whole prefix
        trajectory, so carrying their Z-dependence into the inner Newton
        would break the block-tridiagonal Hessian structure the solver
        factorizes (measured: the fully-coupled gradient stalls the inner
        loop at 30/30 iterations with exploding penalties). The reference
        differentiates through δ(Z) but hands the NLP to Ipopt's
        limited-memory quasi-Newton, which has no such structure to lose."""
        X, UN = split(Z)
        if P == 0:
            return jnp.zeros((V, N, 0), dtype)
        U_s = UN[:-1]
        C_nom = cs.evaluate(X, U_s)
        dXv = jnp.concatenate(
            [jnp.moveaxis(dXcols, 2, 0), -jnp.moveaxis(dXcols, 2, 0)], axis=0)
        dUv = jnp.concatenate(
            [jnp.moveaxis(dUcols, 2, 0), -jnp.moveaxis(dUcols, 2, 0)], axis=0)
        Cx = jax.vmap(lambda dx: cs.evaluate(X + dx, U_s))(dXv)  # (2n, N, P)
        Cu = jax.vmap(lambda du: cs.evaluate(X, U_s + du))(dUv)  # (2m, N, P)
        return jnp.concatenate([C_nom[None], Cx, Cu], axis=0)

    def vertex_active(C, lam_c, tol=0.0):
        """Active set per vertex row: nominal equality rows always on;
        everything else by the standard rule, masked by vertex validity."""
        a = (C >= tol) | (lam_c > 0)
        a = a.at[0].set(a[0] | cs.is_eq[None, :]) if P else a
        return a & vmask

    def al_value(Z, lam_d, mu_d, lam_c, mu_c, dX, dU):
        X, UN = split(Z)
        J = hs_cost(prob.obj, f_nom, X, UN, dt)
        lE, _ = robust_terms(Z)
        gd = eq_residuals(Z)
        Jd = jnp.sum(lam_d * gd + 0.5 * mu_d * gd * gd)
        if P:
            C = vertex_con_values(Z, dX, dU)
            a = vertex_active(C, lam_c)
            Imu = jnp.where(a, mu_c, 0.0)
            Jc = jnp.sum(lam_c * C + 0.5 * C * Imu * C)
        else:
            Jc = 0.0
        return J + lE + Jd + Jc

    grad_fn = jax.grad(al_value, argnums=0)

    # nominal-part block-tridiagonal Hessian (same structure as DIRCOL; the
    # robust cost couples all knots and is treated first-order)
    def phi_k(k, z1, z2, lam_d_k, mu_d_k):
        x1, u1 = z1[:n], z1[n:]
        x2, u2 = z2[:n], z2[n:]
        f1 = f_nom(x1, u1)
        f2 = f_nom(x2, u2)
        Xm = 0.5 * (x1 + x2) + dt / 8.0 * (f1 - f2)
        Um = 0.5 * (u1 + u2)
        fm = f_nom(Xm, Um)

        def ell(kk, x, u):
            Q, R, H = prob.obj.Q[kk], prob.obj.R[kk], prob.obj.H[kk]
            q, rr, c = prob.obj.q[kk], prob.obj.r[kk], prob.obj.c[kk]
            return (0.5 * x @ Q @ x + 0.5 * u @ R @ u + q @ x + rr @ u + c
                    + u @ (H @ x))

        J = dt / 6.0 * (ell(k, x1, u1) + 4.0 * ell(k, Xm, Um) + ell(k, x2, u2))
        g = x1 - x2 + dt / 6.0 * (f1 + 4.0 * fm + f2)
        return J + jnp.sum(lam_d_k * g + 0.5 * mu_d_k * g * g)

    hess_joint = jax.hessian(
        lambda k, z12, l, mu: phi_k(k, z12[:nm], z12[nm:], l, mu), argnums=1)

    def build_hessian(Z, lam_d, mu_d, lam_c, mu_c, dX, dU):
        ks = jnp.arange(N - 1)
        z12 = jnp.concatenate([Z[:-1], Z[1:]], axis=1)
        Hj = jax.vmap(hess_joint)(ks, z12, lam_d[1:], mu_d[1:])
        D = jnp.zeros((N, nm, nm), dtype)
        D = D.at[:-1].add(Hj[:, :nm, :nm])
        D = D.at[1:].add(Hj[:, nm:, nm:])
        L = Hj[:, nm:, :nm]
        D = D.at[-1, :n, :n].add(prob.obj.Q[-1])
        D = D.at[0, :n, :n].add(jnp.diag(mu_d[0]))
        if P:
            # Gauss-Newton penalty curvature: nominal constraint Jacobians
            # with the vertex multipliers SUMMED over banks (each vertex
            # row's Jacobian equals the nominal row's up to the δ(Z)
            # coupling, which GN drops)
            X, UN = split(Z)
            C = vertex_con_values(Z, dX, dU)
            a = vertex_active(C, lam_c)
            Imu = jnp.sum(jnp.where(a, mu_c, 0.0), axis=0)   # (N, P)
            cx, cu = cs.jacobian(X, UN[:-1])        # (N,P,n), (N,P,m)
            JZ = jnp.concatenate([cx, cu], axis=-1)  # (N,P,nm)
            D = D + jnp.einsum("kpi,kp,kpj->kij", JZ, Imu, JZ)
        return D, L

    def inner_newton(Z, lam_d, mu_d, lam_c, mu_c, dX, dU):
        def body(carry):
            Z, reg, it, gnorm = carry
            g = grad_fn(Z, lam_d, mu_d, lam_c, mu_c, dX, dU)
            D, L = build_hessian(Z, lam_d, mu_d, lam_c, mu_c, dX, dU)

            def try_solve(reg_val):
                Dr = D + reg_val * jnp.eye(nm, dtype=dtype)
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

            L0 = al_value(Z, lam_d, mu_d, lam_c, mu_c, dX, dU)

            def ls_body(st):
                alpha, best, cnt = st
                Lt = al_value(Z + alpha * dZ, lam_d, mu_d, lam_c, mu_c,
                              dX, dU)
                ok = Lt < L0
                best = jnp.where(ok & (alpha > best[1]),
                                 jnp.stack([Lt, alpha]), best)
                return alpha * 0.5, best, cnt + 1

            def ls_cond(st):
                alpha, best, cnt = st
                return (best[1] == 0.0) & (cnt < opts.linesearch_iters)

            _, best, _ = jax.lax.while_loop(
                ls_cond, ls_body,
                (jnp.ones((), dtype),
                 jnp.stack([L0, jnp.zeros((), dtype)]),
                 jnp.zeros((), jnp.int32)))
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

    Z = jnp.concatenate([X0, U0], axis=1)
    lam_d = jnp.zeros((N, n), dtype)
    mu_d = jnp.full((N, n), opts.penalty_initial, dtype)
    lam_c = jnp.zeros((V, N, P), dtype)
    mu_c = jnp.full((V, N, P), opts.penalty_initial, dtype) * vmask

    def outer_body(carry):
        Z, lam_d, mu_d, lam_c, mu_c, it, viol, hist = carry
        # freeze the robust vertices from the current iterate (reference
        # gen_δx/gen_δu eig-padded square roots, dirtrel.jl:310-420)
        _, (E, K) = robust_terms(Z)
        dXcols = psd_sqrt(E, opts.eig_pad)                       # (N, n, n)
        KEK = jnp.einsum("kin,knl,kjl->kij", K, E[:-1], K)
        dUcols = psd_sqrt(KEK, opts.eig_pad)                     # (N-1, m, m)
        Z, inner_it, gnorm = inner_newton(Z, lam_d, mu_d, lam_c, mu_c,
                                          dXcols, dUcols)
        gd = eq_residuals(Z)
        lam_d = lam_d + mu_d * gd
        mu_d = jnp.minimum(mu_d * opts.penalty_scaling, opts.penalty_max)
        if P:
            # first-order dual step PER VERTEX ROW (each carries its own
            # multiplier, reference dirtrel.jl:496-546 row enumeration)
            C = vertex_con_values(Z, dXcols, dUcols)
            lam_c = jnp.where(vmask, lam_c + mu_c * C, 0.0)
            eq0 = jnp.zeros((V, 1, P), bool).at[0, 0].set(cs.is_eq)
            lam_c = jnp.where(eq0, lam_c, jnp.maximum(lam_c, 0.0))
            mu_c = jnp.minimum(mu_c * opts.penalty_scaling,
                               opts.penalty_max) * vmask
            vv = jnp.where(eq0, jnp.abs(C), jnp.maximum(C, 0.0))
            cviol = jnp.max(jnp.where(vmask, vv, 0.0))
        else:
            cviol = jnp.zeros((), dtype)
        viol = jnp.maximum(jnp.max(jnp.abs(gd)), cviol)
        # trace the merit the NLP minimizes: nominal HS cost + robust cost
        Xc, UNc = split(Z)
        lE_c, _ = robust_terms(Z)
        hist = record_nlp_history(
            hist, it, hs_cost(prob.obj, f_nom, Xc, UNc, dt) + lE_c,
            viol, gnorm, inner_it)
        return Z, lam_d, mu_d, lam_c, mu_c, it + 1, viol, hist

    def outer_cond(carry):
        *_, it, viol, _h = carry
        return (it < opts.iterations_outer) & \
            (viol > opts.feasibility_tolerance)

    Z, lam_d, mu_d, lam_c, mu_c, it, viol, hist = jax.lax.while_loop(
        outer_cond, outer_body,
        (Z, lam_d, mu_d, lam_c, mu_c, jnp.zeros((), jnp.int32),
         jnp.asarray(jnp.inf, dtype),
         nlp_history(opts.iterations_outer, dtype)))

    X, UN = split(Z)
    lE, (E, K) = robust_terms(Z)
    gd = eq_residuals(Z)
    C = cs.evaluate(X, UN[:-1]) if P else jnp.zeros((N, 0), dtype)
    return DIRTRELResult(
        X=X, U=UN[:-1], U_knots=UN,
        J=hs_cost(prob.obj, f_nom, X, UN, dt), J_robust=lE, E=E, K=K,
        defect_max=jnp.max(jnp.abs(gd)),
        c_max=cs.max_violation(C) if P else jnp.zeros((), dtype),
        iterations=it, history=hist)
