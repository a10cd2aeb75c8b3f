"""Constraint-layer unit tests (reference test/constraint_tests.jl).

Covers: custom constraints with analytic-vs-AD Jacobian agreement, bound
trimming of infinite rows, the active-set rule, eq/ineq violation semantics,
and label-keyed row partitioning — the reference's unit idioms (SURVEY §4).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import trajopt_tpu as tt
from trajopt_tpu.ops.constraints import (
    Constraint, ConstraintSet, ConstraintSetBuilder, bound_constraint,
    custom_constraint, goal_constraint, obstacle_field_constraint,
    infeasible_constraint,
)


def _set_for(con, N=5, knots=None):
    b = ConstraintSetBuilder(N)
    b.add(con, knots=knots)
    return b.build() if hasattr(b, "build") else ConstraintSet.build(b.entries, N)


def test_custom_constraint_ad_jacobian_matches_analytic():
    """(reference constraint_tests.jl: custom eq constraint, hand Jacobian
    vs ForwardDiff)."""
    n, m = 3, 2

    def fn(x, u):
        return jnp.stack([x[0] ** 2 + u[0] - 1.0, x[1] * u[1]])

    def jac(x, u):
        cx = jnp.array([[2 * x[0], 0.0, 0.0], [0.0, u[1], 0.0]])
        cu = jnp.array([[1.0, 0.0], [0.0, x[1]]])
        return cx, cu

    con_ad = custom_constraint(fn, 2, equality=True)
    con_an = custom_constraint(fn, 2, equality=True, jac_fn=jac)

    N = 4
    b1, b2 = ConstraintSetBuilder(N), ConstraintSetBuilder(N)
    b1.add(con_ad)
    b2.add(con_an)
    cs_ad, cs_an = ConstraintSet.build(b1.entries, N), ConstraintSet.build(b2.entries, N)

    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.normal(size=(N, n)))
    U = jnp.asarray(rng.normal(size=(N - 1, m)))
    Cx1, Cu1 = cs_ad.jacobian(X, U)
    Cx2, Cu2 = cs_an.jacobian(X, U)
    assert np.allclose(np.asarray(Cx1), np.asarray(Cx2), atol=1e-12)
    assert np.allclose(np.asarray(Cu1), np.asarray(Cu2), atol=1e-12)


def test_bound_constraint_trims_infinite_rows():
    """(reference BoundConstraint trim, constraints.jl:140-188): only finite
    rows become constraint rows, ordered [x_max, u_max, x_min, u_min]."""
    n, m = 3, 2
    con = bound_constraint(n, m, x_max=[1.0, np.inf, 2.0], u_min=-3.0)
    # finite rows: x_max -> 2, u_min -> 2
    assert con.p == 4
    x = jnp.asarray([5.0, 0.0, 0.0])
    u = jnp.asarray([-10.0, 0.0])
    c = con.fn(x, u)
    # x_max rows first (x0-1, x2-2), then u_min rows (-3-u0, -3-u1)
    assert np.allclose(np.asarray(c), [4.0, -2.0, 7.0, -3.0], atol=1e-12)


def test_bound_validation_rejects_crossed_bounds():
    """(reference constraints.jl:264-282 bound validation)."""
    with pytest.raises(ValueError):
        bound_constraint(2, 1, x_min=[1.0, 0.0], x_max=[0.0, 1.0])


def test_active_set_rule():
    """a = (c >= tol) | (λ > 0) (reference active_set!,
    constraint_sets.jl:247-267); equality rows always active."""
    N, n, m = 3, 2, 1
    b = ConstraintSetBuilder(N)
    b.add(bound_constraint(n, m, u_max=1.0))        # 1 ineq row
    b.add(goal_constraint(np.zeros(n)))             # 2 eq rows @ terminal
    cs = ConstraintSet.build(b.entries, N)

    C = jnp.zeros((N, cs.P))
    lam = jnp.zeros((N, cs.P))
    # inactive inequality: c < 0, λ = 0
    C = C.at[0, 0].set(-0.5)
    a = cs.active_set(C, lam, 0.0)
    assert not bool(a[0, 0])
    # violated inequality: active
    C = C.at[0, 0].set(0.2)
    a = cs.active_set(C, lam, 0.0)
    assert bool(a[0, 0])
    # λ > 0 keeps a satisfied inequality active
    C = C.at[0, 0].set(-0.5)
    lam = lam.at[0, 0].set(1.0)
    a = cs.active_set(C, lam, 0.0)
    assert bool(a[0, 0])
    # equality rows active regardless (valid knots)
    eq_rows = np.where(np.asarray(cs.is_eq))[0]
    assert bool(jnp.all(a[-1, eq_rows]))


def test_max_violation_semantics():
    """eq rows: |c|; ineq rows: max(c, 0) (reference max_violation,
    problem.jl:242-267)."""
    N, n, m = 3, 2, 1
    b = ConstraintSetBuilder(N)
    b.add(bound_constraint(n, m, u_max=1.0))
    b.add(goal_constraint(np.array([1.0, 1.0])))
    cs = ConstraintSet.build(b.entries, N)

    X = jnp.zeros((N, n))            # goal missed by 1 in each coord
    U = jnp.zeros((N - 1, m))        # u_max satisfied by margin 1
    C = cs.evaluate(X, U)
    v = float(cs.max_violation(C))
    assert v == pytest.approx(1.0)
    # satisfied inequality contributes 0, not its negative slack
    X = jnp.ones((N, n))
    C = cs.evaluate(X, U)
    assert float(cs.max_violation(C)) == pytest.approx(0.0)


def test_label_partition_row_slices():
    """Label-keyed row slices replace the reference's PartedArray labels
    (constraint_sets.jl:64-99)."""
    N, n, m = 4, 3, 2
    b = ConstraintSetBuilder(N)
    b.add(bound_constraint(n, m, u_max=[1.0, 1.0], label="bnd"))
    b.add(obstacle_field_constraint([(0.0, 0.0, 0.5)], label="obs"))
    b.add(infeasible_constraint(n, m))
    cs = ConstraintSet.build(b.entries, N)

    r_bnd = cs.row_slice("bnd")
    r_obs = cs.row_slice("obs")
    r_inf = cs.row_slice("infeasible")
    assert r_bnd == (0, 2)
    assert r_obs == (2, 3)
    assert r_inf == (3, 3 + n)
    assert bool(jnp.all(cs.is_eq[r_inf[0]:r_inf[1]]))
    assert not bool(jnp.any(cs.is_eq[r_bnd[0]:r_bnd[1]]))
    with pytest.raises(KeyError):
        cs.row_slice("nope")


def test_terminal_masking():
    """Stage constraints never apply at knot N-1; goal only there
    (reference applicability, constraints.jl:115-118)."""
    N, n, m = 4, 2, 1
    b = ConstraintSetBuilder(N)
    b.add(bound_constraint(n, m, u_max=1.0, label="bnd"))
    b.add(goal_constraint(np.zeros(n)))
    cs = ConstraintSet.build(b.entries, N)
    mask = np.asarray(cs.mask)
    r_bnd = cs.row_slice("bound" if "bound" in cs.labels() else "bnd")
    r_goal = cs.row_slice("goal")
    assert not mask[N - 1, r_bnd[0]:r_bnd[1]].any()
    assert mask[:N - 1, r_bnd[0]:r_bnd[1]].all()
    assert mask[N - 1, r_goal[0]:r_goal[1]].all()
    assert not mask[:N - 1, r_goal[0]:r_goal[1]].any()
