"""Core layer tests: models, integrators, rollout, costs.

Mirrors reference test strategy §4: AD-vs-analytic Jacobian cross-checks
(test/model_tests.jl), trajectory<->array conversions (test/test_utils.jl).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.models import zoo
from trajopt_tpu.models.base import discretize
from trajopt_tpu.ops.rollout import rollout
from trajopt_tpu.ops.cost import (
    LQRObjective, total_cost, cost_expansion, QuadraticCost,
)


def test_pendulum_dynamics():
    x = jnp.array([0.3, -0.2])
    u = jnp.array([0.5])
    xd = zoo.pendulum.dynamics(x, u)
    # hand-computed: xd1 = x2; xd2 = (u - m g lc sin(x1) - b x2)/I
    expected = (0.5 - 1.0 * 9.81 * 0.5 * np.sin(0.3) - 0.1 * (-0.2)) / 0.25
    assert np.allclose(xd[0], -0.2)
    assert np.allclose(xd[1], expected)


def test_model_jacobian_matches_fd():
    x = jnp.array([0.3, -0.2])
    u = jnp.array([0.5])
    A, B = zoo.pendulum.jacobian(x, u)
    eps = 1e-6
    for i in range(2):
        dx = np.zeros(2)
        dx[i] = eps
        fd = (zoo.pendulum.dynamics(x + dx, u) - zoo.pendulum.dynamics(x - dx, u)) / (2 * eps)
        assert np.allclose(A[:, i], fd, atol=1e-5)


@pytest.mark.parametrize("integrator", ["midpoint", "rk3", "rk4"])
def test_integrator_accuracy(integrator):
    """Discrete steps converge to the analytic linear-system solution."""
    model = zoo.doubleintegrator
    dmodel = discretize(model, integrator)
    x = jnp.array([1.0, 2.0])
    u = jnp.array([0.5])
    dt = 0.1
    # double integrator: exact x+ = [x1 + x2 dt + u dt²/2, x2 + u dt]
    exact = jnp.array([1.0 + 2.0 * dt + 0.5 * dt**2 / 2, 2.0 + 0.5 * dt])
    xn = dmodel.step(x, u, dt)
    assert np.allclose(xn, exact, atol=1e-10)


@pytest.mark.parametrize("integrator,atol",
                         [("midpoint_implicit", 5e-4), ("rk3_implicit", 1e-5)])
def test_implicit_integrators(integrator, atol):
    dmodel = discretize(zoo.pendulum, integrator)
    x = jnp.array([0.1, 0.0])
    u = jnp.array([0.0])
    dt = 0.05
    # reference: rk4 substepping (order-matched comparison: implicit midpoint
    # is 2nd order, so compare within its local truncation error)
    rk4_step = discretize(zoo.pendulum, "rk4").step
    xr = x
    for _ in range(10):
        xr = rk4_step(xr, u, dt / 10)
    xn = dmodel.step(x, u, dt)
    assert np.allclose(xn, xr, atol=atol)


def test_rollout_shapes_and_consistency():
    dmodel = discretize(zoo.car, "rk3")
    x0 = jnp.array([0.0, 0.0, 0.0])
    U = jnp.ones((50, 2)) * 0.1
    X = rollout(dmodel, x0, U, 0.06)
    assert X.shape == (51, 3)
    # manual step check
    x1 = dmodel.step(x0, U[0], 0.06)
    assert np.allclose(X[1], x1)


def test_discrete_jacobian_traj():
    dmodel = discretize(zoo.cartpole, "rk3")
    X = jnp.zeros((11, 4)).at[:, 1].set(jnp.linspace(0, 1, 11))
    U = jnp.ones((10, 1)) * 0.3
    A, B = dmodel.jacobian_traj(X[:-1], U, 0.05)
    assert A.shape == (10, 4, 4) and B.shape == (10, 4, 1)
    A0, B0 = dmodel.jacobian(X[0], U[0], jnp.asarray(0.05))
    assert np.allclose(A[0], A0) and np.allclose(B[0], B0)


def test_lqr_objective_cost():
    n, m, N = 2, 1, 11
    Q = np.eye(n) * 1e-3
    R = np.eye(m) * 1e-3
    Qf = np.eye(n)
    xf = np.array([np.pi, 0.0])
    obj = LQRObjective(Q, R, Qf, xf, N)
    X = jnp.zeros((N, n))
    U = jnp.zeros((N - 1, m))
    dt = 0.1
    J = total_cost(obj, X, U, dt)
    # stage: 0.5 xf'Qxf * dt * (N-1), terminal 0.5 xf'Qf xf
    expected = 0.5 * xf @ (Q @ xf) * dt * (N - 1) + 0.5 * xf @ (Qf @ xf)
    assert np.allclose(J, expected)


def test_cost_expansion_matches_ad():
    """Expansion == AD of the total cost (reference cost_tests.jl pattern)."""
    n, m, N = 3, 2, 5
    rng = np.random.default_rng(0)
    Q = np.eye(n) * 0.7
    R = np.eye(m) * 0.3
    Qf = np.eye(n) * 2.0
    xf = rng.normal(size=n)
    obj = LQRObjective(Q, R, Qf, xf, N)
    X = jnp.asarray(rng.normal(size=(N, n)))
    U = jnp.asarray(rng.normal(size=(N - 1, m)))
    dt = 0.17

    e = cost_expansion(obj, X, U, dt)
    gX = jax.grad(lambda X_: total_cost(obj, X_, U, dt))(X)
    gU = jax.grad(lambda U_: total_cost(obj, X, U_, dt))(U)
    assert np.allclose(e.x, gX, atol=1e-12)
    assert np.allclose(e.u, gU, atol=1e-12)

    HXX = jax.hessian(lambda X_: total_cost(obj, X_, U, dt))(X)
    for k in range(N):
        assert np.allclose(e.xx[k], HXX[k, :, k, :], atol=1e-12)


def test_quadratic_cost_psd_validation():
    """(reference src/cost.jl:121-127): non-PSD Q raises, non-PD R warns."""
    import warnings

    with pytest.raises(ValueError):
        QuadraticCost.create(np.array([[1.0, 0.0], [0.0, -1.0]]), np.eye(1))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        QuadraticCost.create(np.eye(2), np.zeros((1, 1)))
        assert any("positive definite" in str(x.message) for x in w)


def test_generic_objective_matches_quadratic():
    """GenericObjective via AD reproduces the quadratic objective exactly
    (reference GenericCost w/ ForwardDiff, cost.jl:239-322)."""
    from trajopt_tpu.ops.cost import GenericObjective

    n, m, N = 3, 2, 7
    rng = np.random.default_rng(2)
    Q = np.eye(n) * 0.5
    R = np.eye(m) * 0.2
    Qf = np.eye(n) * 3.0
    xf = rng.normal(size=n)
    obj_q = LQRObjective(Q, R, Qf, xf, N)

    Qj, Rj, Qfj, xfj = map(jnp.asarray, (Q, R, Qf, xf))

    def ell(x, u):
        dx = x - xfj
        return 0.5 * dx @ Qj @ dx + 0.5 * u @ Rj @ u

    def ellf(x):
        dx = x - xfj
        return 0.5 * dx @ Qfj @ dx

    obj_g = GenericObjective(ell=ell, ellf=ellf, N=N)
    X = jnp.asarray(rng.normal(size=(N, n)))
    U = jnp.asarray(rng.normal(size=(N - 1, m)))
    dt = 0.1
    assert np.allclose(float(obj_q.total(X, U, dt)),
                       float(obj_g.total(X, U, dt)), atol=1e-12)
    eq = obj_q.expansion(X, U, dt)
    eg = obj_g.expansion(X, U, dt)
    for fld in ("x", "u", "xx", "uu", "ux"):
        assert np.allclose(getattr(eq, fld), getattr(eg, fld), atol=1e-12)


def test_generic_objective_solves():
    """Full iLQR through a GenericObjective (nonquadratic stage cost)."""
    from trajopt_tpu.ops.cost import GenericObjective
    from trajopt_tpu.models.base import discretize
    from trajopt_tpu.models import zoo as mzoo
    import trajopt_tpu as tt

    model_d = discretize(mzoo.pendulum, "rk3")
    N = 31
    xf = jnp.array([np.pi, 0.0])

    def ell(x, u):
        dx = x - xf
        # nonquadratic: quartic velocity penalty
        return 1e-3 * (dx @ dx) + 1e-3 * (u @ u) + 1e-4 * dx[1] ** 4

    def ellf(x):
        dx = x - xf
        return 0.5 * dx @ dx

    obj = GenericObjective(ell=ell, ellf=ellf, N=N)
    prob = tt.problem(model_d, obj, x0=np.zeros(2), xf=xf, N=N, dt=0.15,
                      U0=np.ones((N - 1, 1)))
    res = tt.al_solve(prob, tt.ALOptions())
    assert np.linalg.norm(np.asarray(res.X[-1]) - np.asarray(xf)) < 0.2


def test_uncertain_integrators():
    """(reference rk3_uncertain etc., integration.jl): w=0 reduces to the
    nominal integrator exactly."""
    from trajopt_tpu.models.base import discretize, discretize_uncertain

    x = jnp.array([0.2, -0.1])
    u = jnp.array([0.4])
    w0 = jnp.zeros(1)
    for name in ["midpoint", "rk3", "rk4"]:
        step_u = discretize_uncertain(zoo.pendulum_uncertain, name)
        # nominal model with w folded at 0 equals uncertain at w=0
        nominal = discretize(zoo.pendulum, name).step(x, u, 0.1)
        # pendulum_uncertain at w=0 is algebraically the same dynamics
        got = step_u(x, u, w0, 0.1)
        assert np.allclose(np.asarray(got), np.asarray(nominal), atol=1e-12)
    with pytest.raises(ValueError):
        discretize_uncertain(zoo.pendulum, "rk3")


def test_primal_pack_roundtrip():
    """(reference Primals pack/unpack, primals.jl:107-142)."""
    from trajopt_tpu.solvers.projected_newton import (
        pack_primals, unpack_primals,
    )

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(6, 3)))
    U = jnp.asarray(rng.normal(size=(5, 2)))
    Z = pack_primals(X, U)
    assert Z.shape == (6 * 3 + 5 * 2,)
    X2, U2 = unpack_primals(Z, 3, 2, 6)
    assert np.allclose(X, X2) and np.allclose(U, U2)


def test_checkpoint_roundtrip(tmp_path):
    """Checkpoint/resume (SURVEY §5.4 — new capability): save an AL result,
    reload it, warm-start a new solve from it."""
    import trajopt_tpu as tt
    from trajopt_tpu.models.base import discretize
    from trajopt_tpu.models import zoo as mzoo
    from trajopt_tpu.solvers.al import ALResult
    from trajopt_tpu.utils.checkpoint import (
        save_result, load_result, warm_start,
    )

    model_d = discretize(mzoo.pendulum, "rk3")
    xf = np.array([np.pi, 0.0])
    obj = LQRObjective(np.eye(2) * 1e-3, np.eye(1) * 1e-3, np.eye(2) * 1e-3,
                       xf, 31)
    cons = tt.ConstraintSetBuilder(31)
    cons.add(tt.bound_constraint(2, 1, u_min=-3.0, u_max=3.0))
    cons.add(tt.goal_constraint(xf))
    prob = tt.problem(model_d, obj, constraints=cons, x0=np.zeros(2), xf=xf,
                      N=31, dt=0.15, U0=np.ones((30, 1)))
    res = tt.al_solve(prob, tt.ALOptions())

    path = str(tmp_path / "ckpt.npz")
    save_result(path, res, meta={"problem": "pendulum"})
    res2 = load_result(path, ALResult)
    assert np.allclose(np.asarray(res.X), res2.X)
    assert np.allclose(np.asarray(res.lam), res2.lam)

    # warm start converges instantly
    prob_w = warm_start(prob, res2)
    res3 = tt.al_solve(prob_w, tt.ALOptions())
    assert int(res3.iterations_total) <= int(res.iterations_total)
    assert float(res3.c_max) < 1e-3


def test_verbose_live_logging(capsys):
    """verbose=True streams live iteration rows under jit (reference live
    InnerLoop/OuterLoop tables, logger.jl)."""
    import trajopt_tpu as tt
    from trajopt_tpu.problems import zoo as probs

    res = tt.al_solve(probs.pendulum(), tt.ALOptions(
        verbose=True, opts_uncon=tt.iLQROptions(verbose=True, iterations=50)))
    assert float(res.c_max) < 1e-3
    out = capsys.readouterr().out
    assert "iLQR it" in out and "AL outer" in out


def test_quaternion_error_state():
    """Quaternion-aware state differencing (reference rollout.jl:50-57 TODO):
    inverse consistency, zero at identity, Jacobian consistency."""
    import jax
    from trajopt_tpu.models import quaternions as quat

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=4)); q = q / jnp.linalg.norm(q)
    p = jnp.asarray(rng.normal(size=4)); p = p / jnp.linalg.norm(p)

    assert np.allclose(np.asarray(quat.quat_error(q, q)), 0.0, atol=1e-12)
    # first-order consistency: error of q⊗[1, θ/2] ≈ θ for small θ
    th = jnp.asarray([1e-4, -2e-4, 3e-4])
    dq = jnp.concatenate([jnp.ones(1), th / 2.0])
    q2 = quat.quat_mul(q, dq / jnp.linalg.norm(dq))
    assert np.allclose(np.asarray(quat.quat_error(q2, q)), np.asarray(th),
                       atol=1e-8)
    # attitude Jacobian matches AD of the error map
    G = quat.quat_error_jacobian(q)
    J = jax.jacfwd(lambda t: quat.quat_mul(
        q, jnp.concatenate([jnp.ones(1), t / 2.0])))(jnp.zeros(3))
    assert np.allclose(np.asarray(G), np.asarray(J), atol=1e-12)

    # full state diff on a quadrotor-like state (quat at 3:7)
    x = jnp.concatenate([jnp.asarray([1.0, 2, 3]), q, jnp.asarray(rng.normal(size=6))])
    xr = jnp.concatenate([jnp.zeros(3), p, jnp.zeros(6)])
    d = quat.state_diff(x, xr, (3, 7))
    assert d.shape == (12,)
    assert np.allclose(np.asarray(d[:3]), [1, 2, 3], atol=1e-12)
    E = quat.state_diff_jacobian(x, (3, 7))
    assert E.shape == (13, 12)
    # identity fallback == reference behavior
    assert np.allclose(np.asarray(quat.state_diff(x, xr)), np.asarray(x - xr))


def test_quadrotor_euler_matches_quaternion_model():
    """The Euler-angle quadrotor (full rpy_ddot incl. the dPhi/Rdot
    correction terms, reference quadrotor_euler.jl:63-83 — here derived by
    AD of the kinematic map G = Phi·R) must trace the SAME physical motion
    as the quaternion quadrotor from a matched aggressive non-hover state.
    The round-1 hover-only approximation fails this by construction."""
    import jax
    from trajopt_tpu.models import zoo

    # matched non-hover initial state: tilted, rotating, translating
    rpy0 = jnp.array([0.3, -0.25, 0.6])
    rpyd0 = jnp.array([0.8, -0.5, 0.4])
    vel0 = jnp.array([1.0, -2.0, 0.5])
    pos0 = jnp.array([0.0, 0.0, 10.0])

    R0 = zoo._rpy2rotmat(rpy0)
    omega0 = R0.T @ (zoo._rpydot2angularvel_matrix(rpy0) @ rpyd0)

    # rpy -> quaternion (ZYX convention matching _rpy2rotmat)
    def rpy_to_quat(rpy):
        hr, hp, hy = rpy / 2.0
        qx = jnp.array([jnp.cos(hr), jnp.sin(hr), 0.0, 0.0])
        qy = jnp.array([jnp.cos(hp), 0.0, jnp.sin(hp), 0.0])
        qz = jnp.array([jnp.cos(hy), 0.0, 0.0, jnp.sin(hy)])
        return zoo.quat_mul(qz, zoo.quat_mul(qy, qx))

    q0 = rpy_to_quat(rpy0)
    x_e = jnp.concatenate([pos0, rpy0, vel0, rpyd0])
    x_q = jnp.concatenate([pos0, q0, vel0, omega0])

    # identical asymmetric control (far from hover thrust)
    u = jnp.array([1.6, 1.1, 1.3, 0.9])
    dt, steps = 1e-3, 300

    def rk4(f, x, u, dt):
        k1 = f(x, u)
        k2 = f(x + 0.5 * dt * k1, u)
        k3 = f(x + 0.5 * dt * k2, u)
        k4 = f(x + dt * k3, u)
        return x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

    def sim(f, x):
        def body(x, _):
            xn = rk4(f, x, u, dt)
            return xn, None
        return jax.lax.scan(body, x, None, length=steps)[0]

    xe_T = sim(lambda x, u: zoo.quadrotor_euler_dynamics(x, u), x_e)
    xq_T = sim(lambda x, u: zoo.quadrotor_dynamics(x, u), x_q)

    # compare positions, velocities, attitude (as rotation matrices) and
    # body angular velocity after 0.3 s of aggressive motion
    assert np.allclose(xe_T[0:3], xq_T[0:3], atol=1e-6)      # position
    assert np.allclose(xe_T[6:9], xq_T[7:10], atol=1e-5)     # velocity
    R_e = zoo._rpy2rotmat(xe_T[3:6])
    q_T = xq_T[3:7] / jnp.linalg.norm(xq_T[3:7])
    R_q = jnp.stack([zoo.quat_rotate(q_T, e)
                     for e in jnp.eye(3)], axis=1)
    assert np.allclose(np.asarray(R_e), np.asarray(R_q), atol=1e-5)
    omega_e = R_e.T @ (zoo._rpydot2angularvel_matrix(xe_T[3:6])
                       @ xe_T[9:12])
    assert np.allclose(np.asarray(omega_e), np.asarray(xq_T[10:13]),
                       atol=1e-4)


def test_generic_objective_analytic_hooks():
    """User-supplied grad/hess override the AD expansion (reference
    GenericCost's analytic grad/hess path, cost.jl:246-262). A deliberately
    WRONG analytic gradient must show up in the expansion — proving the
    hooks are used — and the correct analytic one must equal AD exactly."""
    from trajopt_tpu.ops.cost import GenericObjective

    n, m, N = 3, 2, 7
    rng = np.random.default_rng(5)
    Qj = jnp.asarray(np.eye(n) * 0.5)
    Rj = jnp.asarray(np.eye(m) * 0.2)
    Qfj = jnp.asarray(np.eye(n) * 3.0)

    def ell(x, u):
        return 0.5 * x @ Qj @ x + 0.5 * u @ Rj @ u

    def ellf(x):
        return 0.5 * x @ Qfj @ x

    def grad(x, u):
        return Qj @ x, Rj @ u

    def hess(x, u):
        return Qj, Rj, jnp.zeros((m, n))

    obj_ad = GenericObjective(ell=ell, ellf=ellf, N=N)
    obj_an = GenericObjective(ell=ell, ellf=ellf, N=N, grad=grad, hess=hess,
                              gradf=lambda x: Qfj @ x, hessf=lambda x: Qfj)
    X = jnp.asarray(rng.normal(size=(N, n)))
    U = jnp.asarray(rng.normal(size=(N - 1, m)))
    e0 = obj_ad.expansion(X, U, 0.1)
    e1 = obj_an.expansion(X, U, 0.1)
    for fld in ("x", "u", "xx", "uu", "ux"):
        assert np.allclose(getattr(e0, fld), getattr(e1, fld), atol=1e-12)

    obj_wrong = GenericObjective(ell=ell, ellf=ellf, N=N,
                                 grad=lambda x, u: (2.0 * (Qj @ x), Rj @ u),
                                 hess=hess)
    e2 = obj_wrong.expansion(X, U, 0.1)
    assert not np.allclose(e2.x[:-1], e1.x[:-1])


def test_implicit_integrator_adaptive_tolerance():
    """The implicit Newton loop is tolerance-driven (reference
    integration.jl:44-104: iterate to 1e-12, abort at 1000), so a stiff
    step that needs more than the old fixed 20 trips still converges to
    the dtype tolerance instead of poisoning."""
    from trajopt_tpu.ops.integration import midpoint_implicit

    # heavily damped linear system: y = x + dt·(−50(x+y)/2) has the exact
    # solution y = x(1−25dt)/(1+25dt); slow linear-ish convergence comes
    # from a large dt·λ product
    f = lambda x, u: -50.0 * x
    x0 = jnp.array([1.0])
    y = midpoint_implicit(f)(x0, jnp.zeros(1), 0.039)
    assert bool(jnp.all(jnp.isfinite(y)))
    exact = (1 - 25 * 0.039) / (1 + 25 * 0.039)
    assert abs(float(y[0]) - exact) < 1e-10


def test_implicit_integrator_nonconvergence_poisons():
    """A non-converged implicit Newton step must NOT return silent garbage:
    the reference errors after 1000 iterations (src/integration.jl:55-59);
    the XLA-native equivalent is NaN-poisoning, which the solvers' existing
    divergence guards catch. Classic Newton-divergent case: stiff arctan
    dynamics from a far initial guess."""
    from trajopt_tpu.ops.integration import midpoint_implicit, rk3_implicit

    f = lambda x, u: -100.0 * jnp.arctan(x)
    x0 = jnp.array([10.0])
    u0 = jnp.zeros(1)
    for integ in (midpoint_implicit, rk3_implicit):
        y = integ(f)(x0, u0, 2.0)
        assert bool(jnp.all(jnp.isnan(y))), f"{integ.__name__} silent garbage"
        # benign stiff-but-convergent step is NOT poisoned and is accurate
        g = lambda x, u: -x
        y_ok = integ(g)(jnp.array([1.0]), u0, 0.1)
        assert bool(jnp.all(jnp.isfinite(y_ok)))
        assert abs(float(y_ok[0]) - np.exp(-0.1)) < 1e-3


def test_structured_error_state_projection():
    """Block-structured project_error_state == dense E/E⁺ einsum projection
    (the structured form exists because batched tiny matmuls pad to MXU
    tiles on TPU — 2.5× measured; must stay algebraically identical)."""
    from trajopt_tpu.models import zoo
    from trajopt_tpu.models.quaternions import (
        project_error_state, state_diff_jacobian, state_diff_jacobian_inv,
    )
    from trajopt_tpu.ops.cost import Expansion, cost_expansion
    from trajopt_tpu.ops.rollout import rollout

    qs = (3, 7)
    model_d = discretize(zoo.quadrotor, "rk3")
    N, n, m = 9, 13, 4
    rng = np.random.default_rng(7)
    x0 = np.zeros(n)
    x0[3:7] = rng.normal(size=4)
    x0[3:7] /= np.linalg.norm(x0[3:7])
    x0[7:] = rng.normal(size=6) * 0.3
    U = jnp.asarray(rng.normal(size=(N - 1, m)) + 2.0)
    X = rollout(model_d, jnp.asarray(x0), U, jnp.full((N - 1,), 0.05))
    A, B = model_d.jacobian_traj(X[:-1], U, jnp.full((N - 1,), 0.05))
    xf = np.zeros(n); xf[3] = 1.0
    obj = LQRObjective(np.eye(n) * 1e-2, np.eye(m) * 1e-2,
                       np.eye(n) * 10.0, xf, N)
    exp = cost_expansion(obj, X, U, jnp.full((N - 1,), 0.05))

    E = jax.vmap(lambda x: state_diff_jacobian(x, qs))(X)
    Ei = jax.vmap(lambda x: state_diff_jacobian_inv(x, qs))(X)
    A_ref = jnp.einsum("kji,kil,klp->kjp", Ei[1:], A, E[:-1])
    B_ref = jnp.einsum("kji,kil->kjl", Ei[1:], B)
    exp_ref = Expansion(
        x=jnp.einsum("kij,ki->kj", E, exp.x),
        xx=jnp.einsum("kij,kil,klp->kjp", E, exp.xx, E),
        u=exp.u, uu=exp.uu,
        ux=jnp.einsum("kpi,kij->kpj", exp.ux, E[:-1]))

    A_e, B_e, exp_e = project_error_state(X, A, B, exp, qs)
    assert np.allclose(np.asarray(A_e), np.asarray(A_ref), atol=1e-12)
    assert np.allclose(np.asarray(B_e), np.asarray(B_ref), atol=1e-12)
    assert np.allclose(np.asarray(exp_e.x), np.asarray(exp_ref.x), atol=1e-12)
    assert np.allclose(np.asarray(exp_e.xx), np.asarray(exp_ref.xx),
                       atol=1e-12)
    assert np.allclose(np.asarray(exp_e.ux), np.asarray(exp_ref.ux),
                       atol=1e-12)
