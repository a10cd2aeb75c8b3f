"""iLQR + AL solver system tests.

Mirrors reference test/pendulum_tests.jl, test/car_tests.jl,
test/quadrotor_tests.jl: physics end-state assertions with explicit
tolerances (SURVEY.md §4 idiom 3).
"""
import jax.numpy as jnp
import numpy as np
import pytest

import trajopt_tpu as tt
from trajopt_tpu.models import zoo


def _pendulum_problem(N=31, dt=0.15):
    model_d = tt.discretize(zoo.pendulum, "rk3")
    n, m = 2, 1
    Q = np.eye(n) * 1e-3
    R = np.eye(m) * 1e-3
    xf = np.array([np.pi, 0.0])
    obj = tt.LQRObjective(Q, R, Q, xf, N)
    cons = tt.ConstraintSetBuilder(N)
    cons.add(tt.bound_constraint(n, m, u_min=-3.0, u_max=3.0))
    cons.add(tt.goal_constraint(xf))
    return tt.problem(model_d, obj, constraints=cons, x0=np.zeros(n), xf=xf,
                      N=N, dt=dt, U0=np.ones((N - 1, m)))


def test_pendulum_al_swingup():
    prob = _pendulum_problem()
    res = tt.al_solve(prob, tt.ALOptions())
    assert float(res.c_max) < 1e-3
    assert np.linalg.norm(res.X[-1] - prob.xf) < 2e-3


@pytest.mark.parametrize("integrator", ["midpoint", "rk3", "rk4"])
def test_pendulum_all_integrators(integrator):
    """reference test/pendulum_tests.jl:23-27 — every integrator solves."""
    model_d = tt.discretize(zoo.pendulum, integrator)
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


def test_unconstrained_ilqr_doubleintegrator():
    model_d = tt.discretize(zoo.doubleintegrator, "rk3")
    n, m, N = 2, 1, 21
    xf = np.array([1.0, 0.0])
    obj = tt.LQRObjective(np.eye(n), np.eye(m) * 0.1, np.eye(n) * 100.0, xf, N)
    prob = tt.problem(model_d, obj, x0=np.zeros(n), xf=xf, N=N, dt=0.1)
    res = tt.al_solve(prob, tt.ALOptions())
    assert np.linalg.norm(res.X[-1] - xf) < 1e-2


def test_car_parallel_park():
    """reference test/car_tests.jl:29-38 — goal within 1e-3 via AL."""
    model_d = tt.discretize(zoo.car, "rk3")
    n, m, N = 3, 2, 51
    x0 = np.zeros(3)
    xf = np.array([0.0, 1.0, 0.0])
    obj = tt.LQRObjective(np.eye(n) * 1e-2, np.eye(m) * 1e-2, np.eye(n) * 100.0,
                          xf, N)
    u_bnd = 2.0
    x_min = [-0.25, -0.001, -np.inf]
    x_max = [0.25, 1.001, np.inf]
    bnd1 = tt.bound_constraint(n, m, u_min=-u_bnd, u_max=u_bnd, label="bnd1")
    bnd2 = tt.bound_constraint(n, m, x_min=x_min, x_max=x_max, u_min=-u_bnd,
                               u_max=u_bnd, label="bnd2")
    cons = tt.ConstraintSetBuilder(N)
    cons.add(bnd1, knots=[0])
    cons.add(bnd2, knots=range(1, N - 1))
    cons.add(tt.goal_constraint(xf))
    prob = tt.problem(model_d, obj, constraints=cons, x0=x0, xf=xf, N=N,
                      dt=0.06, U0=np.ones((N - 1, m)))
    res = tt.al_solve(prob, tt.ALOptions())
    assert float(res.c_max) < 1e-3
    assert np.linalg.norm(res.X[-1] - xf) < 2e-3
    # state bounds respected (within AL tolerance)
    assert np.max(res.X[1:-1, 0]) < 0.25 + 1e-3
    assert np.min(res.X[1:-1, 0]) > -0.25 - 1e-3


def test_quadrotor_ilqr():
    """reference test/quadrotor_tests.jl:38-45 — unconstrained iLQR reaches
    the 60 m translation target."""
    model_q = tt.discretize(zoo.quadrotor, "rk3")
    n, m, N = 13, 4, 101
    x0 = np.zeros(n)
    x0[0:3] = [0, 0, 10]
    x0[3] = 1.0
    xf = np.zeros(n)
    xf[0:3] = [0, 60, 10]
    xf[3] = 1.0
    Q = np.eye(n) * 1e-3
    Q[3:7, 3:7] = np.eye(4) * 1e-2
    obj = tt.LQRObjective(Q, np.eye(m) * 1e-4, np.eye(n) * 1000.0, xf, N)
    prob = tt.problem(model_q, obj, x0=x0, xf=xf, N=N, dt=0.05,
                      U0=np.full((N - 1, m), 0.5 * 9.81 / 4))
    res = tt.al_solve(prob, tt.ALOptions())
    assert np.linalg.norm(res.X[-1, :3] - xf[:3]) < 5e-3


def test_batched_vmap_solve():
    """TPU batch axis: vmap the whole AL solve over initial conditions."""
    import jax

    model_d = tt.discretize(zoo.pendulum, "rk3")
    n, m, N = 2, 1, 31
    xf = np.array([np.pi, 0.0])
    obj = tt.LQRObjective(np.eye(n) * 1e-3, np.eye(m) * 1e-3, np.eye(n) * 1e-3,
                          xf, N)
    cons = tt.ConstraintSetBuilder(N)
    cons.add(tt.bound_constraint(n, m, u_min=-3.0, u_max=3.0))
    cons.add(tt.goal_constraint(xf))
    base = tt.problem(model_d, obj, constraints=cons, x0=np.zeros(n), xf=xf,
                      N=N, dt=0.15, U0=np.ones((N - 1, m)))

    def solve_from(x0):
        prob = tt.update_problem(base, x0=x0, X=base.X.at[0].set(x0))
        res = tt.al_solve(prob, tt.ALOptions())
        return res.c_max, res.X[-1]

    x0s = jnp.asarray(np.array([[0.0, 0.0], [0.3, 0.0], [-0.2, 0.1], [0.1, -0.3]]))
    c_maxes, xNs = jax.jit(jax.vmap(solve_from))(x0s)
    assert np.all(np.asarray(c_maxes) < 1e-3)
    assert np.allclose(xNs, xf, atol=2e-3)


def test_solve_api_dispatch():
    """Options type selects the solver (reference AbstractSolver dispatch,
    solvers.jl:60) through the public tt.solve."""
    from trajopt_tpu.solvers.altro import ALTROOptions
    from trajopt_tpu.solvers.projected_newton import PNOptions

    prob = _pendulum_problem()

    p1, s1 = tt.solve(prob, tt.iLQROptions(iterations=50))
    assert np.isfinite(float(s1.J))  # iLQR ignores constraints

    p2, s2 = tt.solve(prob, tt.ALOptions())
    assert float(s2.c_max) < 1e-3

    p3, s3 = tt.solve(prob, ALTROOptions())
    assert float(s3.c_max) < 1e-3

    p4, s4 = tt.solve(tt.update_problem(prob, X=p2.X, U=p2.U),
                      PNOptions(feasibility_tolerance=1e-9))
    assert float(s4.c_max) < 1e-8


def test_warm_start_line_search_converges():
    """line_search_warm_start (TPU throughput knob, not in the reference)
    reaches the same solution quality as the reference α=1 backtracking."""
    prob = _pendulum_problem()
    r_ref = tt.al_solve(prob, tt.ALOptions())
    r_ws = tt.al_solve(prob, tt.ALOptions(
        opts_uncon=tt.iLQROptions(line_search_warm_start=True)))
    assert float(r_ws.c_max) < 1e-3
    # both reach the swing-up goal
    xf = np.array([np.pi, 0.0])
    assert np.linalg.norm(np.asarray(r_ws.X[-1]) - xf) < 2e-3
    assert np.linalg.norm(np.asarray(r_ref.X[-1]) - xf) < 2e-3


def test_error_state_quadrotor():
    """Quaternion error-state iLQR (iLQROptions(error_state=True), beyond
    the reference's rollout.jl:50-57 TODO): same solution quality in far
    fewer iterations on the quaternion quadrotor."""
    from trajopt_tpu.problems import zoo as probs

    prob = probs.quadrotor()
    r_raw = tt.al_solve(prob, tt.ALOptions(
        opts_uncon=tt.iLQROptions(iterations=80)))
    r_err = tt.al_solve(prob, tt.ALOptions(
        opts_uncon=tt.iLQROptions(iterations=80, error_state=True)))
    xf = np.asarray(prob.xf[:3])
    for r in (r_raw, r_err):
        assert np.linalg.norm(np.asarray(r.X[-1, :3]) - xf) < 1e-3
    # the error-state formulation needs far fewer iterations
    assert int(r_err.iterations_total) < int(r_raw.iterations_total) // 2
    # gains live in the 12-dim tangent space
    assert r_err.X.shape == r_raw.X.shape


def test_error_state_batch_consistency():
    """Batched (vmap) error-state solve matches single solves."""
    from trajopt_tpu.problems import zoo as probs
    from trajopt_tpu.parallel.batch import solve_batch

    prob = probs.quadrotor()
    opts = tt.ALOptions(opts_uncon=tt.iLQROptions(iterations=30,
                                                  error_state=True))
    import jax

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.tile(np.asarray(prob.x0)[None], (3, 1)))
    x0s = x0s.at[:, :3].add(jnp.asarray(rng.normal(size=(3, 3)) * 0.1))
    rb = jax.jit(lambda xs: solve_batch(prob, opts, xs))(x0s)
    r0 = tt.al_solve(tt.update_problem(prob, x0=x0s[0]), opts)
    assert np.allclose(np.asarray(rb.X[0]), np.asarray(r0.X), atol=1e-6)


def test_error_state_f32_with_sqrt_bp():
    """f32 regression for the cancellation-free quaternion error: the
    error-state + QR-sqrt combination must solve the hot-gain quadrotor in
    single precision (the naive quat-error product form loses all f32
    accuracy at small attitude errors; see BENCH_LOCAL.md)."""
    from trajopt_tpu.problems.zoo import quadrotor_line

    prob = quadrotor_line(N=101, dtype=jnp.float32)
    res = tt.al_solve(prob, tt.ALOptions(opts_uncon=tt.iLQROptions(
        iterations=100, error_state=True, bp_type="sqrt")))
    err = float(jnp.linalg.norm(
        res.X[-1, :3] - jnp.asarray([0.0, 60.0, 10.0], jnp.float32)))
    assert err < 0.01
    assert int(res.iterations_total) < 60


def test_initial_rollout_overflow_falls_back_to_hold():
    """An open-loop seed rollout that overflows (finite-time blowup) must
    not poison the solve with a NaN J0: the solver falls back to holding x0
    and recovers through the closed-loop forward pass (the TPU-f32 failure
    mode of kuka_obstacles' gravity-comp hold seed; solvers/ilqr.py initial
    rollout guard)."""
    def blowup_dynamics(x, u):
        # x' = x^2 + u: from x0=2 with u=0 the open-loop rollout overflows
        # within a dozen knots in any float width
        return x * x + u

    model_d = tt.discretize(tt.Model(blowup_dynamics, 1, 1, name="blowup"), "rk3")
    N = 31
    obj = tt.LQRObjective(np.eye(1), np.eye(1) * 1e-2, np.eye(1) * 10.0,
                          np.zeros(1), N)
    prob = tt.problem(model_d, obj, x0=np.full(1, 2.0), xf=np.zeros(1),
                      N=N, dt=1.0, U0=np.zeros((N - 1, 1)))
    res = tt.al_solve(prob, tt.ALOptions())
    assert np.isfinite(float(res.J))
    assert np.all(np.isfinite(np.asarray(res.X)))


@pytest.mark.parametrize("gtype", ["todorov", "feedforward", "l2", "linf"])
def test_gradient_types(gtype):
    """reference calculate_gradient (ilqr_methods.jl:91-102): every
    gradient_type converges the double integrator to the goal."""
    model_d = tt.discretize(zoo.doubleintegrator, "rk3")
    n, m, N = 2, 1, 21
    xf = np.array([1.0, 0.0])
    obj = tt.LQRObjective(np.eye(n), np.eye(m) * 0.1, np.eye(n) * 100.0, xf, N)
    prob = tt.problem(model_d, obj, x0=np.zeros(n), xf=xf, N=N, dt=0.1)
    from trajopt_tpu.solvers.ilqr import iLQROptions
    res = tt.al_solve(prob, tt.ALOptions(
        opts_uncon=iLQROptions(gradient_type=gtype)))
    assert np.linalg.norm(res.X[-1] - xf) < 1e-2
    assert np.isfinite(float(res.gradient))


def test_live_plotting_callback(tmp_path, monkeypatch):
    """reference live_plotting (ilqr_methods.jl:65-75): the host callback
    fires each iteration with the current trajectory."""
    from trajopt_tpu.solvers.ilqr import iLQROptions
    from trajopt_tpu.utils import plotting

    calls = []
    plotting.set_live_plot_writer(
        lambda kind, traj, it: calls.append((kind, traj.shape, it)))
    try:
        model_d = tt.discretize(zoo.doubleintegrator, "rk3")
        n, m, N = 2, 1, 21
        xf = np.array([1.0, 0.0])
        obj = tt.LQRObjective(np.eye(n), np.eye(m) * 0.1,
                              np.eye(n) * 100.0, xf, N)
        prob = tt.problem(model_d, obj, x0=np.zeros(n), xf=xf, N=N, dt=0.1)
        res = tt.al_solve(prob, tt.ALOptions(
            opts_uncon=iLQROptions(live_plotting="state")))
        import jax
        jax.effects_barrier()
    finally:
        plotting.set_live_plot_writer(None)
    assert len(calls) >= 1
    assert all(k == "state" and shp == (N, n) for k, shp, _ in calls)


def test_sqrt_sweep_survives_al_penalty_conditioning():
    """f32 regression for the equilibrated stage factorization
    (BENCH_LOCAL.md maze + sqrt notes): an AL-decorated stage Hessian
    mixing penalty rows ~mu=1e8 with slack-control rows ~R_inf=1e-8 has
    kappa >> 1/eps_f32 — the raw Cholesky NaNs, the sweep zeroes every
    gain (d == 0) and the solve freezes. The Jacobi-equilibrated factor
    must succeed (fail=False) and match an f64 oracle on the gains."""
    from trajopt_tpu.ops.cost import Expansion
    from trajopt_tpu.solvers.ilqr import sqrt_sweep

    rng = np.random.default_rng(3)
    N, n, m, P = 9, 4, 3, 6

    def build(dtype):
        A = jnp.asarray(np.tile(np.eye(n) + 0.02 * rng.standard_normal((n, n)),
                                (N - 1, 1, 1)), dtype)
        B = jnp.asarray(0.05 * rng.standard_normal((N - 1, n, m)), dtype)
        # AL-style expansion: tiny quadratic cost + huge Gauss-Newton
        # penalty terms mu * c' c with state-only constraint rows
        mu = 1e8
        cx = rng.standard_normal((P, n))
        lxx_pen = mu * cx.T @ cx
        lxx = np.tile(1e-3 * np.eye(n) + lxx_pen, (N, 1, 1))
        luu = np.tile(np.diag([1e-4, 1e-8, 1e-8]), (N - 1, 1, 1))
        lux = np.zeros((N - 1, m, n))
        lx = 0.1 * rng.standard_normal((N, n))
        lu = 0.1 * rng.standard_normal((N - 1, m))
        return A, B, Expansion(
            x=jnp.asarray(lx, dtype), u=jnp.asarray(lu, dtype),
            xx=jnp.asarray(lxx, dtype), uu=jnp.asarray(luu, dtype),
            ux=jnp.asarray(lux, dtype))

    A64, B64, e64 = build(jnp.float64)
    K64, d64, v1_64, v2_64, fail64 = sqrt_sweep(A64, B64, e64, 0.0)
    assert not bool(fail64)

    A32, B32, e32 = build(jnp.float32)
    K32, d32, v1_32, v2_32, fail32 = sqrt_sweep(A32, B32, e32, 0.0)
    # The freeze regression: pre-fix the f32 stage Cholesky NaN'd, fail
    # latched True for every rho-retry and the sweep returned d == 0.
    # At kappa ~ 1e16 the GAINS are not f32-determined (kappa*eps >> 1,
    # same argument as the d non-equivalence notes in CLAUDE.md), so the
    # assertions are structural + sign-of-life, not value equivalence.
    assert not bool(fail32), "equilibrated stage factorization failed in f32"
    assert bool(jnp.all(jnp.isfinite(K32))) and bool(jnp.all(jnp.isfinite(d32)))
    assert float(jnp.max(jnp.abs(d32))) > 0.0, "gains were zeroed (frozen solve)"
    # expected-decrease terms keep their defining signs
    assert float(v1_32) <= 0.0 and float(v2_32) >= 0.0


@pytest.mark.slow
def test_maze_sqrt_bp_converges_f32():
    """End-to-end regression: the ALTRO maze schedule must converge with
    bp_type='sqrt' in f32 (pre-equilibration it froze at mu >= 1e4 with
    zeroed gains and AL ramped penalties against a dead iterate — conv
    0.016-0.46, BENCH_LOCAL.md round-2/3 notes)."""
    from trajopt_tpu.problem import update_problem
    from trajopt_tpu.problems import zoo as probs
    from trajopt_tpu.solvers.altro import (
        ALTROOptions, _penalty_rows, infeasible_problem,
    )

    dtype = jnp.float32
    prob = probs.quadrotor_maze(dtype=dtype)
    prob_inf = infeasible_problem(prob, 1e-8)
    al_base = tt.ALOptions(penalty_initial=1.0, penalty_scaling=25.0)
    mu0, sca = _penalty_rows(prob_inf.constraints,
                             ALTROOptions(R_inf=1e-8, opts_al=al_base), dtype)
    opts = tt.ALOptions(
        iterations=40,
        opts_uncon=tt.iLQROptions(iterations=10, bp_type="sqrt"),
        cost_tolerance=1e-5, cost_tolerance_intermediate=1e-3,
        constraint_tolerance=1e-3, penalty_initial=1.0, penalty_scaling=25.0)
    from trajopt_tpu.solvers.al import al_solve
    r = al_solve(prob_inf, opts, mu_init=mu0[None, :], penalty_scaling=sca)
    C = prob.constraints.evaluate(r.X[:, :13], r.U[:, :4])
    assert float(prob.constraints.max_violation(C)) < 1e-3
