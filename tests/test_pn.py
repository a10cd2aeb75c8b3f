"""Projected Newton tests: block-tridiagonal linear algebra + feasibility
projection (reference test/projection_solve.jl intent, plus the
"zero-defect-on-rollout" invariant of dircol_test.jl:100-101)."""
import numpy as np
import jax.numpy as jnp

import trajopt_tpu as tt
from trajopt_tpu.models import zoo
from trajopt_tpu.solvers.projected_newton import (
    PNOptions, pn_solve, block_tridiag_cholesky, block_tridiag_solve,
    block_tridiag_matvec, _dynamics_defects,
)


def _random_block_tridiag(Nb, q, seed=0):
    rng = np.random.default_rng(seed)
    D = []
    L = []
    for k in range(Nb):
        Ak = rng.normal(size=(q, q))
        D.append(Ak @ Ak.T + q * np.eye(q))
        if k < Nb - 1:
            L.append(rng.normal(size=(q, q)) * 0.1)
    return jnp.asarray(np.stack(D)), jnp.asarray(np.stack(L))


def _dense(D, L):
    Nb, q, _ = D.shape
    S = np.zeros((Nb * q, Nb * q))
    for k in range(Nb):
        S[k * q:(k + 1) * q, k * q:(k + 1) * q] = D[k]
        if k < Nb - 1:
            S[(k + 1) * q:(k + 2) * q, k * q:(k + 1) * q] = L[k]
            S[k * q:(k + 1) * q, (k + 1) * q:(k + 2) * q] = L[k].T
    return S


def test_block_tridiag_cholesky_solve():
    """Scan-based block Cholesky == dense solve (the rebuild's equivalent of
    the reference's sqrt-BP-vs-BP oracle, sqrt_bp_tests.jl)."""
    Nb, q = 7, 5
    D, L = _random_block_tridiag(Nb, q)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.normal(size=(Nb, q)))

    G, M = block_tridiag_cholesky(D, L)
    x = block_tridiag_solve(G, M, b)

    S = _dense(np.asarray(D), np.asarray(L))
    x_dense = np.linalg.solve(S, np.asarray(b).ravel())
    assert np.allclose(np.asarray(x).ravel(), x_dense, atol=1e-10)

    y = block_tridiag_matvec(D, L, x)
    assert np.allclose(np.asarray(y), np.asarray(b), atol=1e-9)


def test_pn_projects_to_feasibility():
    """Perturb a solved trajectory; PN restores dynamic feasibility and
    constraint satisfaction to ~1e-8."""
    model_d = tt.discretize(zoo.pendulum, "rk3")
    n, m, N = 2, 1, 31
    xf = np.array([np.pi, 0.0])
    obj = tt.LQRObjective(np.eye(n) * 1e-3, np.eye(m) * 1e-3, np.eye(n) * 1e-3,
                          xf, N)
    cons = tt.ConstraintSetBuilder(N)
    cons.add(tt.bound_constraint(n, m, u_min=-3.0, u_max=3.0))
    cons.add(tt.goal_constraint(xf))
    prob = tt.problem(model_d, obj, constraints=cons, x0=np.zeros(n), xf=xf,
                      N=N, dt=0.15, U0=np.ones((N - 1, m)))
    res = tt.al_solve(prob, tt.ALOptions())
    assert float(res.c_max) < 1e-3

    # perturb states slightly (dynamics now violated at ~1e-3)
    rng = np.random.default_rng(3)
    X_pert = res.X + jnp.asarray(rng.normal(size=res.X.shape)) * 1e-3
    prob_pert = tt.update_problem(prob, X=X_pert, U=res.U)
    d0 = _dynamics_defects(prob_pert, prob_pert.X, prob_pert.U)
    assert float(np.abs(np.asarray(d0)).max()) > 1e-4

    res_pn = pn_solve(prob_pert, PNOptions(feasibility_tolerance=1e-8))
    prob_out = tt.update_problem(prob, X=res_pn.X, U=res_pn.U)
    d1 = _dynamics_defects(prob_out, res_pn.X, res_pn.U)
    assert float(np.abs(np.asarray(d1)).max()) < 1e-8
    assert float(res_pn.c_max) < 1e-8


def _pendulum_bounded(N=31, ulim=3.0):
    model_d = tt.discretize(zoo.pendulum, "rk3")
    n, m = 2, 1
    xf = np.array([np.pi, 0.0])
    obj = tt.LQRObjective(np.eye(n) * 1e-3, np.eye(m) * 1e-3,
                          np.eye(n) * 1e-3, xf, N)
    cons = tt.ConstraintSetBuilder(N)
    cons.add(tt.bound_constraint(n, m, u_min=-ulim, u_max=ulim))
    cons.add(tt.goal_constraint(xf))
    return tt.problem(model_d, obj, constraints=cons, x0=np.zeros(n), xf=xf,
                      N=N, dt=0.15, U0=np.ones((N - 1, m)))


def test_pn_active_set_flip():
    """Control-bound rows flip between active and inactive across PN
    iterations (reference active_set! re-evaluated per projection
    iteration, projected_newton.jl:76-93): seed with controls PUSHED PAST
    the bound (rows active/violated); the polished solution pulls interior
    knots back inside (rows inactive) while staying feasible."""
    import jax

    prob = _pendulum_bounded()
    res = tt.al_solve(prob, tt.ALOptions())
    U_solved = np.asarray(res.U)
    inside = np.where(np.abs(U_solved[:, 0]) < 2.0)[0]
    assert inside.size > 3
    U_pert = U_solved.copy()
    U_pert[inside[:3]] = 3.4          # past u_max = 3 -> rows violated
    prob_p = tt.update_problem(prob, X=res.X, U=jnp.asarray(U_pert))
    C0 = prob.constraints.evaluate(prob_p.X, prob_p.U)
    v0 = float(prob.constraints.max_violation(C0))
    assert v0 > 0.3                   # bound rows active at the seed

    res_pn = pn_solve(prob_p, PNOptions(feasibility_tolerance=1e-8))
    assert float(res_pn.viol) < 1e-8
    assert float(res_pn.c_max) < 1e-8
    U_pol = np.asarray(res_pn.U)
    # the previously-violating rows flipped to satisfied (c <= 0)
    assert np.all(U_pol[inside[:3], 0] <= 3.0 + 1e-8)


def test_pn_polish_batch_pool():
    """Batched AL -> PN handoff (parallel.batch.pn_polish_batch): a pool
    of dispersed pendulum solves polishes to machine-precision
    feasibility in one vmapped program (the batch-scale ALTRO story,
    reference altro_methods.jl:30-40)."""
    import jax
    from trajopt_tpu.parallel.batch import pn_polish_batch, solve_batch

    prob = _pendulum_bounded()
    B = 6
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(size=(B, 2)) * 0.05)
    res = solve_batch(prob, tt.ALOptions(), x0s)
    assert float(jnp.max(res.c_max)) < 1e-3

    polished = jax.jit(lambda Xs, Us: pn_polish_batch(prob, Xs, Us))(
        res.X, res.U)
    assert float(jnp.max(polished.viol)) < 1e-8
    assert float(jnp.max(polished.c_max)) < 1e-8
    # polish is a PROJECTION: trajectories move only slightly
    assert float(jnp.max(jnp.abs(polished.X - res.X))) < 0.1


def test_pn_refinement_tightens_f32():
    """In f32, the ridge-regularized Schur solve alone stalls well above
    the feasibility floor; the iterative-refinement loop (reference
    reg_solve, projected_newton.jl:306-324) is what reaches ~1e-6."""
    import jax

    prob64 = _pendulum_bounded()
    res = tt.al_solve(prob64, tt.ALOptions())
    to32 = lambda a: jnp.asarray(a, jnp.float32)
    prob32 = tt.update_problem(
        jax.tree_util.tree_map(
            lambda a: to32(a) if hasattr(a, "dtype")
            and jnp.issubdtype(a.dtype, jnp.floating) else a, prob64),
        X=to32(res.X + 1e-3), U=to32(res.U))
    res_ref = pn_solve(prob32, PNOptions(feasibility_tolerance=1e-6,
                                         refine_iters=25))
    res_noref = pn_solve(prob32, PNOptions(feasibility_tolerance=1e-6,
                                           refine_iters=0))
    assert float(res_ref.viol) < 5e-6
    assert float(res_ref.viol) <= float(res_noref.viol) + 1e-7
