"""Problem zoo.

TPU-native counterpart of the reference ``Problems`` module (reference
problems/*.jl, loaded via src/problems.jl:26-37). Each factory returns a
ready-to-solve ``Problem`` with the same horizon, costs, bounds, obstacle
fields, and seeds as the reference problem of the same name.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from trajopt_tpu.models import zoo as dynamics
from trajopt_tpu.models.base import discretize
from trajopt_tpu.ops.cost import LQRObjective
from trajopt_tpu.ops.constraints import (
    ConstraintSetBuilder, bound_constraint, goal_constraint,
    obstacle_field_constraint, Constraint, sphere_constraint_fn,
)
from trajopt_tpu.problem import problem, initial_states
from trajopt_tpu.utils.interp import interp_rows


def doubleintegrator(dtype=jnp.float64):
    """(reference problems/doubleintegrator.jl): N=21, dt=0.1, u∈[−1.5,1.5]."""
    model_d = discretize(dynamics.doubleintegrator, "rk3")
    n, m, N = 2, 1, 21
    xf = np.array([1.0, 0.0])
    obj = LQRObjective(np.eye(n), np.eye(m) * 1e-1, np.eye(n), xf, N)
    cons = ConstraintSetBuilder(N)
    cons.add(bound_constraint(n, m, u_min=-1.5, u_max=1.5))
    cons.add(goal_constraint(xf))
    rng = np.random.default_rng(0)
    U0 = 0.001 * rng.random((N - 1, m))
    return problem(model_d, obj, constraints=cons, x0=np.zeros(n), xf=xf,
                   N=N, dt=0.1, U0=U0, dtype=dtype)


def pendulum(dtype=jnp.float64):
    """(reference problems/pendulum.jl): N=31, dt=0.15, swing-up, u∈[−3,3]."""
    model_d = discretize(dynamics.pendulum, "rk3")
    n, m, N = 2, 1, 31
    xf = np.array([np.pi, 0.0])
    obj = LQRObjective(np.eye(n) * 1e-3, np.eye(m) * 1e-3, np.eye(n) * 1e-3,
                       xf, N)
    cons = ConstraintSetBuilder(N)
    cons.add(bound_constraint(n, m, u_min=-3.0, u_max=3.0))
    cons.add(goal_constraint(xf))
    return problem(model_d, obj, constraints=cons, x0=np.zeros(n), xf=xf,
                   N=N, dt=0.15, U0=np.ones((N - 1, m)), dtype=dtype)


def cartpole(dtype=jnp.float64):
    """(reference problems/cartpole.jl): N=101, tf=5, swing-up, u∈[−3,3]."""
    model_d = discretize(dynamics.cartpole, "rk3")
    n, m, N = 4, 1, 101
    xf = np.array([0.0, np.pi, 0.0, 0.0])
    obj = LQRObjective(np.eye(n) * 1e-2, np.eye(m) * 1e-1, np.eye(n) * 100.0,
                       xf, N)
    cons = ConstraintSetBuilder(N)
    cons.add(bound_constraint(n, m, u_min=-3.0, u_max=3.0))
    cons.add(goal_constraint(xf))
    return problem(model_d, obj, constraints=cons, x0=np.zeros(n), xf=xf,
                   N=N, tf=5.0, U0=np.full((N - 1, m), 0.01), dtype=dtype)


def doublependulum_problem(dtype=jnp.float64):
    """(reference problems/doublependulum.jl): N=101, dt=0.01, swing-up."""
    model_d = discretize(dynamics.doublependulum, "rk3")
    n, m, N = 4, 2, 101
    xf = np.array([np.pi, 0.0, 0.0, 0.0])
    obj = LQRObjective(np.eye(n) * 1e-2, np.eye(m) * 1e-2, np.eye(n) * 100.0,
                       xf, N)
    return problem(model_d, obj, x0=np.zeros(n), xf=xf, N=N, dt=0.01,
                   U0=np.ones((N - 1, m)), dtype=dtype)


def acrobot_problem(dtype=jnp.float64):
    """(reference problems/acrobot.jl): N=151, dt=0.01, goal constraint."""
    model_d = discretize(dynamics.acrobot, "rk3")
    n, m, N = 4, 1, 151
    xf = np.array([np.pi, 0.0, 0.0, 0.0])
    obj = LQRObjective(np.eye(n) * 1e-2, np.eye(m) * 1e-2, np.eye(n) * 100.0,
                       xf, N)
    cons = ConstraintSetBuilder(N)
    cons.add(goal_constraint(xf))
    return problem(model_d, obj, constraints=cons, x0=np.zeros(n), xf=xf,
                   N=N, dt=0.01, U0=np.ones((N - 1, m)), dtype=dtype)


def parallel_park(dtype=jnp.float64):
    """(reference problems/parallel_park.jl): car, N=51, state box + goal."""
    model_d = discretize(dynamics.car, "rk3")
    n, m, N = 3, 2, 51
    xf = np.array([0.0, 1.0, 0.0])
    obj = LQRObjective(np.eye(n) * 1e-2, np.eye(m) * 1e-2, np.eye(n) * 100.0,
                       xf, N)
    u_bnd = 2.0
    bnd1 = bound_constraint(n, m, u_min=-u_bnd, u_max=u_bnd, label="bnd1")
    bnd2 = bound_constraint(n, m, x_min=[-0.25, -0.001, -np.inf],
                            x_max=[0.25, 1.001, np.inf],
                            u_min=-u_bnd, u_max=u_bnd, label="bnd2")
    cons = ConstraintSetBuilder(N)
    cons.add(bnd1, knots=[0])
    cons.add(bnd2, knots=range(1, N - 1))
    cons.add(goal_constraint(xf))
    return problem(model_d, obj, constraints=cons, x0=np.zeros(n), xf=xf,
                   N=N, dt=0.06, U0=np.ones((N - 1, m)), dtype=dtype)


# shared with examples/visualize.py (reference problems/car_3obs.jl:12-20)
CAR_3OBS_CIRCLES = [(0.25, 0.25, 0.1), (0.5, 0.5, 0.1), (0.75, 0.75, 0.1)]


def car_3obs(dtype=jnp.float64):
    """(reference problems/car_3obs.jl): 3 circular obstacles on the diagonal."""
    model_d = discretize(dynamics.car, "rk3")
    n, m, N = 3, 2, 101
    xf = np.array([1.0, 1.0, 0.0])
    obj = LQRObjective(np.eye(n), np.eye(m) * 1e-1, np.eye(n) * 100.0, xf, N)
    cons = ConstraintSetBuilder(N)
    cons.add(obstacle_field_constraint(CAR_3OBS_CIRCLES, label="obs"),
             knots=range(1, N - 1))
    cons.add(goal_constraint(xf))
    return problem(model_d, obj, constraints=cons, x0=np.zeros(n), xf=xf,
                   N=N, dt=0.05, U0=np.full((N - 1, m), 0.01), dtype=dtype)


def _escape_circles():
    """(reference problems/car_escape.jl:20-46): 170 obstacle circles
    (3·30 + 50 + 2·15)."""
    r = 0.5
    s1, s2, s3 = 30, 50, 15
    circles = []
    for i in np.linspace(0, 5, s1):
        circles.append((0.0, i, r))
    for i in np.linspace(0, 5, s1):
        circles.append((5.0, i, r))
    for i in np.linspace(0, 5, s1):
        circles.append((10.0, i, r))
    for i in np.linspace(0, 10, s2):
        circles.append((i, 0.0, r))
    for i in np.linspace(0, 3, s3):
        circles.append((i, 5.0, r))
    for i in np.linspace(5, 8, s3):
        circles.append((i, 5.0, r))
    return circles


def car_escape(dtype=jnp.float64):
    """(reference problems/car_escape.jl): 170 circles, infeasible-start seed."""
    model_d = discretize(dynamics.car, "rk3")
    n, m, N = 3, 2, 101
    tf = 3.0
    x0 = np.array([2.5, 2.5, 0.0])
    xf = np.array([7.5, 2.5, 0.0])
    obj = LQRObjective(np.eye(n) * 1e-3, np.eye(m) * 1e-2, np.eye(n) * 100.0,
                       xf, N)
    cons = ConstraintSetBuilder(N)
    cons.add(bound_constraint(n, m, u_min=-5.0, u_max=5.0))
    cons.add(obstacle_field_constraint(_escape_circles(), label="trap"),
             knots=range(1, N - 1))
    cons.add(goal_constraint(xf))
    prob = problem(model_d, obj, constraints=cons, x0=x0, xf=xf, N=N, tf=tf,
                   U0=np.ones((N - 1, m)), dtype=dtype)
    # infeasible-start seed (car_escape.jl:68-71)
    X_guess = np.array([
        [2.5, 2.5, 0.0], [4.0, 5.0, 0.785], [5.0, 6.25, 0.0],
        [7.5, 6.25, -0.261], [9.0, 5.0, -1.57], [7.5, 2.5, 0.0],
    ]).T
    X0 = interp_rows(N, tf, X_guess)
    return initial_states(prob, X0)


def quadrotor_line(N=101, dtype=jnp.float64, constrained=False,
                   distance=60.0):
    """Flagship benchmark/dryrun problem: quadrotor ``distance``-meter
    translation at an arbitrary horizon (reference problems/quadrotor.jl
    spec, tf=5, minus bounds). ``constrained=True`` adds the u ≥ 0 bound
    and the goal equality so AL convergence (c_max) is a meaningful
    assertion even at tiny dryrun horizons (the full 60 m dash at N≲17 is
    marginal even in f64 — ~9e-4 worst-case c_max — so sharding gates use
    a shorter leg)."""
    model_d = discretize(dynamics.quadrotor, "rk3")
    n, m = 13, 4
    x0 = np.zeros(n)
    x0[0:3] = [0.0, 0.0, 10.0]
    x0[3] = 1.0
    xf = np.zeros(n)
    xf[0:3] = [0.0, distance, 10.0]
    xf[3] = 1.0
    Q = np.eye(n) * 1e-3
    Q[3:7, 3:7] = np.eye(4) * 1e-2
    obj = LQRObjective(Q, np.eye(m) * 1e-4, np.eye(n) * 1000.0, xf, N)
    cons = None
    if constrained:
        from trajopt_tpu.ops.constraints import custom_constraint

        # position + velocity goal equality (the quaternion block is left to
        # the terminal cost: an exact attitude equality from perturbed
        # starts is f32-unreachable at tiny dryrun horizons)
        xf_pv = jnp.asarray(np.concatenate([xf[0:3], xf[7:10]]))

        def goal_pv(x, u):
            return jnp.concatenate([x[0:3], x[7:10]]) - xf_pv.astype(x.dtype)

        cons = ConstraintSetBuilder(N)
        cons.add(bound_constraint(n, m, u_min=0.0, label="bnd_u"),
                 knots=range(0, N - 1))
        cons.add(custom_constraint(goal_pv, 6, label="goal_pv",
                                   equality=True, applies="terminal"))
    return problem(model_d, obj, constraints=cons, x0=x0, xf=xf, N=N,
                   dt=5.0 / (N - 1),
                   U0=np.full((N - 1, m), 0.5 * 9.81 / 4.0), dtype=dtype)


def quadrotor(dtype=jnp.float64):
    """(reference problems/quadrotor.jl): 60 m translation, u ≥ 0 bound."""
    model_d = discretize(dynamics.quadrotor, "rk3")
    n, m, N = 13, 4, 101
    x0 = np.zeros(n)
    x0[0:3] = [0.0, 0.0, 10.0]
    x0[3] = 1.0
    xf = np.zeros(n)
    xf[0:3] = [0.0, 60.0, 10.0]
    xf[3] = 1.0
    Q = np.eye(n) * 1e-3
    Q[3:7, 3:7] = np.eye(4) * 1e-2
    obj = LQRObjective(Q, np.eye(m) * 1e-4, np.eye(n) * 1000.0, xf, N)

    bnd3 = bound_constraint(n, m, u_min=0.0, label="bnd_u")
    xf_U = xf.copy()
    xf_L = xf.copy()
    xf_U[3:7] = np.inf
    xf_L[3:7] = -np.inf
    xf_U[7:10] = 0.0
    xf_L[7:10] = 0.0
    xf_U[10:] = np.inf
    xf_L[10:] = -np.inf
    bnd_xf = bound_constraint(n, m, x_min=xf_L, x_max=xf_U, label="bnd_xf")
    cons = ConstraintSetBuilder(N)
    cons.add(bnd3, knots=range(0, N - 1))
    cons.add(bnd_xf, knots=[N - 1])
    return problem(model_d, obj, constraints=cons, x0=x0, xf=xf, N=N, tf=5.0,
                   U0=np.full((N - 1, m), 0.5 * 9.81 / 4.0), dtype=dtype)


def _maze_cylinders():
    """(reference problems/quadrotor_maze.jl:27-62): 44 cylinders."""
    r = 2.0
    cylinders = []
    l1, l3, l4 = 5, 4, 10
    for i in np.linspace(-25, -10, l1):
        cylinders.append((i, 10.0, r))
    for i in np.linspace(10, 25, l1):
        cylinders.append((i, 10.0, r))
    for i in np.linspace(-5, 5, l3):
        cylinders.append((i, 30.0, r))
    for i in np.linspace(-25, -10, l1):
        cylinders.append((i, 50.0, r))
    for i in np.linspace(10, 25, l1):
        cylinders.append((i, 50.0, r))
    for i in np.linspace(10 + 2 * r, 50 - 2 * r, l4):
        cylinders.append((-25.0, i, r))
    for i in np.linspace(10 + 2 * r, 50 - 2 * r, l4):
        cylinders.append((25.0, i, r))
    return cylinders


def quadrotor_maze(dtype=jnp.float64):
    """(reference problems/quadrotor_maze.jl): ALTRO flagship — 44 cylinder
    obstacles, state box, terminal velocity box, infeasible-start waypoints."""
    model_d = discretize(dynamics.quadrotor, "rk3")
    n, m, N = 13, 4, 101
    tf = 5.0
    q0 = [1.0, 0.0, 0.0, 0.0]
    x0 = np.zeros(n)
    x0[0:3] = [0.0, 0.0, 10.0]
    x0[3:7] = q0
    xf = np.zeros(n)
    xf[0:3] = [0.0, 60.0, 10.0]
    xf[3:7] = q0
    Q = np.eye(n) * 1e-3
    Q[3:7, 3:7] = np.eye(4) * 1e-2
    obj = LQRObjective(Q, np.eye(m) * 1e-4, np.eye(n) * 1000.0, xf, N)

    u_min, u_max = 0.0, 50.0
    x_max = np.full(n, np.inf)
    x_min = np.full(n, -np.inf)
    x_max[0:3] = [25.0, np.inf, 20.0]
    x_min[0:3] = [-25.0, -np.inf, 0.0]
    bnd1 = bound_constraint(n, m, u_min=u_min, u_max=u_max, label="bnd1")
    bnd2 = bound_constraint(n, m, u_min=u_min, u_max=u_max, x_min=x_min,
                            x_max=x_max, label="bnd2")
    xf_U = xf.copy()
    xf_L = xf.copy()
    xf_U[3:7] = np.inf
    xf_L[3:7] = -np.inf
    xf_U[7:10] = 0.0
    xf_L[7:10] = 0.0
    xf_U[10:] = np.inf
    xf_L[10:] = -np.inf
    bnd_xf = bound_constraint(n, m, x_min=xf_L, x_max=xf_U, label="bnd_xf")
    maze = obstacle_field_constraint(_maze_cylinders(), label="maze",
                                     inflate=2.0)  # + r_quad

    cons = ConstraintSetBuilder(N)
    cons.add(bnd1, knots=[0])
    cons.add(bnd2, knots=range(1, N - 1))
    cons.add(maze, knots=range(1, N - 1))
    cons.add(bnd_xf, knots=[N - 1])
    prob = problem(model_d, obj, constraints=cons, x0=x0, xf=xf, N=N, tf=tf,
                   U0=np.full((N - 1, m), 0.5 * 9.81 / 4.0), dtype=dtype)

    # infeasible waypoint seed (quadrotor_maze.jl:107-114)
    X_guess = np.zeros((n, 7))
    X_guess[:, 0] = x0
    X_guess[:, 6] = xf
    X_guess[0:3, 1:6] = np.array([
        [0, -12.5, -20, -12.5, 0],
        [15, 20, 30, 40, 45],
        [10, 10, 10, 10, 10],
    ])
    X_guess[3:7, :] = np.array(q0)[:, None]
    X0 = interp_rows(N, tf, X_guess)
    return initial_states(prob, X0)


def quad_obs(dtype=jnp.float64):
    """(reference problems/quad_obs.jl): quadrotor + cylinders + spheres."""
    model_d = discretize(dynamics.quadrotor, "rk3")
    n, m, N = 13, 4, 101
    x0 = np.zeros(n)
    x0[0:3] = [0.0, 0.0, 10.0]
    x0[3] = 1.0
    xf = np.zeros(n)
    xf[0:3] = [0.0, 60.0, 10.0]
    xf[3] = 1.0
    Q = np.eye(n) * 1e-3
    obj = LQRObjective(Q, np.eye(m) * 1e-2, np.eye(n), xf, N)

    r_quad = 2.0
    cylinders = [(0.0, 10.0, 3.0), (10.0, 30.0, 3.0), (-13.0, 25.0, 2.0),
                 (5.0, 50.0, 4.0)]
    spheres = [(0.0, 40.0, 5.0, 2.0), (-5.0, 15.0, 3.0, 1.0),
               (10.0, 20.0, 7.0, 2.0)]
    cyl_con = obstacle_field_constraint(cylinders, label="cylinders",
                                        inflate=r_quad)
    sph = np.asarray(spheres)

    def sphere_fn(x, u):
        xc = jnp.asarray(sph[:, 0], x.dtype)
        yc = jnp.asarray(sph[:, 1], x.dtype)
        zc = jnp.asarray(sph[:, 2], x.dtype)
        rs = jnp.asarray(sph[:, 3] + r_quad, x.dtype)
        return rs**2 - (x[0] - xc)**2 - (x[1] - yc)**2 - (x[2] - zc)**2

    sph_con = Constraint(sphere_fn, len(spheres), "spheres", equality=False,
                         applies="stage")
    from trajopt_tpu.ops.canonical import sphere_canon

    sph_con.canon = sphere_canon((0, 1, 2), sph[:, :3],
                                 (sph[:, 3] + r_quad) ** 2)

    u_min, u_max = 0.0, 50.0
    x_max = np.full(n, np.inf)
    x_min = np.full(n, -np.inf)
    x_max[0:3] = [25.0, np.inf, 20.0]
    x_min[0:3] = [-25.0, -np.inf, 0.0]
    bnd_u = bound_constraint(n, m, u_min=u_min, u_max=u_max, label="bnd_u")
    bnd = bound_constraint(n, m, u_min=u_min, u_max=u_max, x_min=x_min,
                           x_max=x_max, label="bnd")
    xf_U = xf.copy()
    xf_L = xf.copy()
    xf_U[3:7] = np.inf
    xf_L[3:7] = -np.inf
    xf_U[7:10] = 0.0
    xf_L[7:10] = 0.0
    xf_U[10:] = np.inf
    xf_L[10:] = -np.inf
    bnd_xf = bound_constraint(n, m, x_min=xf_L, x_max=xf_U, label="bnd_xf")

    cons = ConstraintSetBuilder(N)
    cons.add(bnd_u, knots=[0])
    cons.add(bnd, knots=range(1, N - 1))
    cons.add(cyl_con, knots=range(1, N - 1))
    cons.add(sph_con, knots=range(1, N - 1))
    cons.add(bnd_xf, knots=[N - 1])
    return problem(model_d, obj, constraints=cons, x0=x0, xf=xf, N=N, tf=5.0,
                   U0=np.full((N - 1, m), 0.5 * 9.81 / 4.0), dtype=dtype)


def kuka_obstacles(dtype=jnp.float64):
    """(reference problems/kuka_obstacles.jl): 7-DOF arm, collision bubbles
    at links 3-6 + end effector vs 3 spheres + 3 cylinders, torque bounds,
    goal constraint, gravity-compensation seed."""
    from trajopt_tpu.models import robots

    model = robots.kuka_model()
    chain = model.chain
    model_d = discretize(model, "rk3")
    n, m, N = 14, 7, 41
    tf = 5.0

    x0 = np.zeros(n)
    x0[1] = np.pi / 2
    x0[2] = np.pi / 2
    x0[3] = np.pi / 2
    xf = np.zeros(n)
    xf[0] = np.pi / 2
    xf[3] = np.pi / 2

    Q = np.diag(np.concatenate([np.ones(7), np.ones(7) * 100.0]))
    Qf = 10.0 * np.eye(n)
    R = 1e-2 * np.eye(m)
    obj = LQRObjective(Q, R, Qf, xf, N)

    # collision bubbles (kuka_obstacles.jl:14-36): link frames 3-6 + EE
    body_idx = [2, 3, 4, 5]          # moving-joint indices of iiwa_link_3..6
    radii = np.array([0.1, 0.12, 0.09, 0.09, 0.05])
    d = 0.25
    spheres = np.array([[d, 0.0, 1.2, 0.2],
                        [0.0, -d, 0.4, 0.15],
                        [0.0, -d, 1.2, 0.15]])
    cylinders = np.array([[d, -d, 0.08], [d, d, 0.08], [-d, -d, 0.08]])

    def arm_points(q):
        pts, ee = chain.forward_kinematics(q, point=jnp.array([0.0, 0.0, 0.045],
                                                             dtype=q.dtype))
        sel = pts[jnp.asarray(body_idx)]
        return jnp.concatenate([sel, ee[None]], axis=0)  # (5, 3)

    def fn(x, u):
        pts = arm_points(x[:7])                            # (5, 3)
        rs = jnp.asarray(radii, x.dtype)
        sp = jnp.asarray(spheres, x.dtype)
        cy = jnp.asarray(cylinders, x.dtype)
        # spheres: (r_p + r_s)² − |p − c|² ≤ 0
        dist2_s = jnp.sum((pts[:, None, :] - sp[None, :, :3]) ** 2, axis=-1)
        cs = (rs[:, None] + sp[None, :, 3]) ** 2 - dist2_s  # (5, 3)
        # cylinders (x, y only)
        dist2_c = jnp.sum((pts[:, None, :2] - cy[None, :, :2]) ** 2, axis=-1)
        cc = (rs[:, None] + cy[None, :, 2]) ** 2 - dist2_c  # (5, 3)
        return jnp.concatenate([cs.T.reshape(-1), cc.T.reshape(-1)])

    obs = Constraint(fn, 30, "obs", equality=False, applies="stage")

    def obs_al_terms(X, U_pad, g, imu):
        # Structured AL contributions (ConstraintSet.al_expansion_terms):
        # every row is r² − |p_i(q) − o_j|², so derivatives flow only
        # through q = x[:7] via the 5 FK point Jacobians — ONE 7-tangent
        # jacfwd of arm_points per knot instead of the generic fallback's
        # 14-tangent jacfwd of the whole constraint + dense (N, P, n)
        # Gauss-Newton einsums (measured 15.5 → ~5 ms per AL expansion at
        # B=128 kuka shapes).
        N_, n_ = X.shape
        dtype = X.dtype
        Q = X[:, :7]

        def pts_and_jac(q):
            # geometric Jacobian from ONE FK primal (all-revolute serial
            # chain): ∂p_i/∂q_k = 1[k ≤ joint(i)] · z_k × (p_i − o_k) —
            # jacfwd through the FK chain costs 5× as much (13.7 vs 2.7 ms
            # at these shapes)
            origins, ee, axes = chain.forward_kinematics(
                q, point=jnp.array([0.0, 0.0, 0.045], dtype=q.dtype),
                return_axes=True)
            pts_ = jnp.concatenate(
                [origins[jnp.asarray(body_idx)], ee[None]], axis=0)  # (5,3)
            arm = pts_[:, None, :] - origins[None, :, :]             # (5,7,3)
            J = jnp.cross(jnp.broadcast_to(axes[None], arm.shape), arm)
            kmax = jnp.asarray(body_idx + [chain.ndof - 1])          # (5,)
            mask = (jnp.arange(chain.ndof)[None, :]
                    <= kmax[:, None]).astype(q.dtype)                # (5,7)
            J = J * mask[:, :, None]
            return pts_, jnp.swapaxes(J, 1, 2)                       # (5,3,7)

        pts, Jp = jax.vmap(pts_and_jac)(Q)       # (N, 5, 3), (N, 5, 3, 7)
        sp = jnp.asarray(spheres, dtype)
        cy = jnp.asarray(cylinders, dtype)
        # sphere rows: dc/dq = −2 (p_i − c_j)ᵀ J_i   → (N, 5, 3s, 7)
        ds = pts[:, :, None, :] - sp[None, None, :, :3]
        Gs = -2.0 * jnp.einsum("nija,niaq->nijq", ds, Jp)
        # cylinder rows: xy components only                → (N, 5, 3c, 7)
        dc = pts[:, :, None, :2] - cy[None, None, :, :2]
        Gc = -2.0 * jnp.einsum("nija,niaq->nijq", dc, Jp[:, :, :2, :])
        # row order matches fn: cs.T.reshape(-1) = obstacle-major
        G = jnp.concatenate([
            jnp.swapaxes(Gs, 1, 2).reshape(N_, 15, 7),
            jnp.swapaxes(Gc, 1, 2).reshape(N_, 15, 7),
        ], axis=1)                                         # (N, 30, 7)
        lx = jnp.zeros((N_, n_), dtype).at[:, :7].set(
            jnp.einsum("np,npq->nq", g, G))
        lxx = jnp.zeros((N_, n_, n_), dtype).at[:, :7, :7].set(
            jnp.einsum("np,npq,npr->nqr", imu, G, G))
        return {"x": lx, "xx": lxx}

    obs.al_terms = obs_al_terms

    # canonical descriptor → fused-AL kernel eligibility (ops/canonical.py
    # "fk_sphere": in-kernel lane FK + bubble rows + GN expansion; same row
    # order as fn above: obstacle-major spheres then cylinders)
    from trajopt_tpu.ops.canonical import fk_sphere_canon

    canon_pts = [(int(b), None) for b in body_idx] + \
        [(chain.ndof - 1, (0.0, 0.0, 0.045))]
    canon_rows = []
    for j in range(spheres.shape[0]):
        for i in range(5):
            canon_rows.append((i, spheres[j, :3],
                               float((radii[i] + spheres[j, 3]) ** 2),
                               (0, 1, 2)))
    for j in range(cylinders.shape[0]):
        for i in range(5):
            canon_rows.append((i, (cylinders[j, 0], cylinders[j, 1], 0.0),
                               float((radii[i] + cylinders[j, 2]) ** 2),
                               (0, 1)))
    obs.canon = fk_sphere_canon(chain, canon_pts, canon_rows)
    bnd = bound_constraint(n, m, u_min=-80.0, u_max=80.0)
    cons = ConstraintSetBuilder(N)
    cons.add(bnd, knots=range(0, N - 1))
    cons.add(obs, knots=range(1, N - 1))
    cons.add(goal_constraint(xf))

    U0 = robots.kuka_hold_trajectory(chain, x0[:7], N)
    return problem(model_d, obj, constraints=cons, x0=x0, xf=xf, N=N, tf=tf,
                   U0=U0, dtype=dtype)


PROBLEMS = {
    "doubleintegrator": doubleintegrator,
    "pendulum": pendulum,
    "cartpole": cartpole,
    "doublependulum": doublependulum_problem,
    "acrobot": acrobot_problem,
    "parallel_park": parallel_park,
    "car_3obs": car_3obs,
    "car_escape": car_escape,
    "quadrotor": quadrotor,
    "quadrotor_maze": quadrotor_maze,
    "quad_obs": quad_obs,
    "kuka_obstacles": kuka_obstacles,
}
