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
