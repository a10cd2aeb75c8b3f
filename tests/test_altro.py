"""ALTRO meta-solver tests: infeasible start, minimum time, PN polish.

Mirrors reference test/infeasible_tests.jl + test/minimum_time_tests.jl.
"""
import numpy as np
import pytest

import trajopt_tpu as tt
from trajopt_tpu.models import zoo
from trajopt_tpu.problems import zoo as probs
from trajopt_tpu.solvers import altro as alt
from trajopt_tpu.utils.interp import line_trajectory


def _pendulum(N=31, dt=0.15, u_bnd=3.0):
    model_d = tt.discretize(zoo.pendulum, "rk3")
    n, m = 2, 1
    xf = np.array([np.pi, 0.0])
    obj = tt.LQRObjective(np.eye(n) * 1e-3, np.eye(m) * 1e-3, np.eye(n) * 1e-3,
                          xf, N)
    cons = tt.ConstraintSetBuilder(N)
    cons.add(tt.bound_constraint(n, m, u_min=-u_bnd, u_max=u_bnd))
    cons.add(tt.goal_constraint(xf))
    return tt.problem(model_d, obj, constraints=cons, x0=np.zeros(n), xf=xf,
                      N=N, dt=dt, U0=np.ones((N - 1, m)))


def test_infeasible_start_pendulum():
    """reference test/infeasible_tests.jl: seed a line trajectory, solve with
    slack controls, project, resolve; final state at goal."""
    prob = _pendulum()
    X0 = line_trajectory(np.zeros(2), [np.pi, 0.0], prob.N)
    prob = tt.initial_states(prob, X0)
    opts_al = tt.ALOptions(constraint_tolerance=1e-5, cost_tolerance=1e-5,
                           cost_tolerance_intermediate=1e-5,
                           iterations=30, penalty_scaling=10.0)
    opts = alt.ALTROOptions(opts_al=opts_al, R_inf=1.0,
                            resolve_feasible_problem=True)
    res = alt.altro_solve(prob, opts)
    assert np.linalg.norm(np.asarray(res.X[-1]) - [np.pi, 0.0]) < 1e-3
    assert float(res.c_max) < 1e-3
    # dynamics feasibility of the returned trajectory
    from trajopt_tpu.solvers.projected_newton import _dynamics_defects
    prob_out = tt.update_problem(prob, X=res.X, U=res.U)
    d = _dynamics_defects(prob_out, res.X, res.U)
    assert float(np.abs(np.asarray(d)).max()) < 1e-6


def test_infeasible_no_resolve_matches_resolve():
    """reference infeasible_tests.jl: resolve and no-resolve agree at goal."""
    prob = _pendulum()
    X0 = line_trajectory(np.zeros(2), [np.pi, 0.0], prob.N)
    prob = tt.initial_states(prob, X0)
    opts_al = tt.ALOptions(constraint_tolerance=1e-5, cost_tolerance=1e-5,
                           cost_tolerance_intermediate=1e-5)
    r1 = alt.altro_solve(prob, alt.ALTROOptions(
        opts_al=opts_al, resolve_feasible_problem=False))
    r2 = alt.altro_solve(prob, alt.ALTROOptions(
        opts_al=opts_al, resolve_feasible_problem=True))
    assert np.linalg.norm(np.asarray(r1.X[-1]) - [np.pi, 0]) < 1e-3
    assert np.linalg.norm(np.asarray(r2.X[-1]) - [np.pi, 0]) < 1e-3


def test_minimum_time_pendulum():
    """reference test/minimum_time_tests.jl:59-63: tt_mt < 0.5·tt_fixed."""
    opts_al = tt.ALOptions(iterations=50, penalty_scaling=10.0)
    opts = alt.ALTROOptions(opts_al=opts_al, R_minimum_time=15.0,
                            dt_max=0.15, dt_min=1e-3)
    prob_fixed = _pendulum(u_bnd=5.0)
    res_fixed = alt.altro_solve(prob_fixed, opts)
    tt_fixed = float(res_fixed.tt)
    assert tt_fixed == pytest.approx(0.15 * 30)

    prob_mt = _pendulum(dt=0.075, u_bnd=5.0)
    res_mt = alt.altro_solve(prob_mt, opts, minimum_time=True)
    tt_mt = float(res_mt.tt)
    assert tt_mt < 0.5 * tt_fixed
    assert tt_mt < 1.0
    assert np.linalg.norm(np.asarray(res_mt.X[-1]) - [np.pi, 0.0],
                          np.inf) < 1e-3
    assert float(res_mt.c_max) < 1e-3  # original constraints (bound + goal)


def test_car_escape_altro_pn():
    """Flagship infeasible-start + PN path on car_escape
    (reference examples/IROS_2019/car_escape.jl options)."""
    prob = probs.car_escape()
    opts_al = tt.ALOptions(cost_tolerance=1e-6, cost_tolerance_intermediate=1e-2,
                           constraint_tolerance=1e-8, penalty_scaling=50.0,
                           penalty_initial=10.0)
    opts = alt.ALTROOptions(opts_al=opts_al, R_inf=1e-1,
                            resolve_feasible_problem=False,
                            projected_newton=True,
                            projected_newton_tolerance=1e-3)
    res = alt.altro_solve(prob, opts)
    assert float(res.c_max) < 1e-6
    assert np.linalg.norm(np.asarray(res.X[-1]) - np.asarray(prob.xf)) < 1e-4


@pytest.mark.slow
def test_kuka_obstacles_altro():
    """7-DOF arm among obstacles (reference problems/kuka_obstacles.jl +
    examples/IROS_2019/kuka_obstacles.jl options)."""
    prob = probs.PROBLEMS["kuka_obstacles"]()
    opts_al = tt.ALOptions(iterations=20, cost_tolerance=1e-6,
                           cost_tolerance_intermediate=1e-5,
                           constraint_tolerance=1e-3,
                           penalty_scaling=50.0, penalty_initial=0.01)
    res = alt.altro_solve(prob, alt.ALTROOptions(opts_al=opts_al))
    assert float(res.c_max) < 1e-3
    assert np.linalg.norm(np.asarray(res.X[-1]) - np.asarray(prob.xf)) < 1e-3


@pytest.mark.slow
def test_quadrotor_maze_altro():
    """Flagship benchmark problem solves end-to-end with PN polish
    (reference examples/IROS_2019/quadrotor_maze.jl options)."""
    prob = probs.quadrotor_maze()
    opts_al = tt.ALOptions(iterations=40, cost_tolerance=1e-5,
                           cost_tolerance_intermediate=1e-4,
                           constraint_tolerance=1e-8, penalty_scaling=10.0)
    opts = alt.ALTROOptions(opts_al=opts_al, R_inf=1e-8,
                            resolve_feasible_problem=False,
                            projected_newton=True,
                            projected_newton_tolerance=1e-4)
    res = alt.altro_solve(prob, opts)
    assert float(res.c_max) < 1e-5
    assert np.linalg.norm(np.asarray(res.X[-1, :3]) - [0.0, 60.0, 10.0]) < 1e-3


def test_small_inner_cap_converges():
    """Frequent dual updates: capping the inner iLQR loop low (with a faster
    penalty schedule) still satisfies constraints — the TPU batching lever
    behind the maze throughput numbers (docs/performance.md)."""
    prob = probs.PROBLEMS["pendulum"]()
    opts = tt.ALOptions(iterations=40,
                        opts_uncon=tt.iLQROptions(iterations=12),
                        cost_tolerance_intermediate=1e-3,
                        penalty_scaling=25.0)
    res = tt.al_solve(prob, opts)
    assert float(res.c_max) < 1e-3
    xf = np.array([np.pi, 0.0])
    assert np.linalg.norm(np.asarray(res.X[-1]) - xf) < 2e-3
