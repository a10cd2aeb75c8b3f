"""AL-aware fused iteration kernels (ops/pallas_al_fused.py + canonical.py).

Equivalence strategy (SURVEY.md §4 idiom 2): the canonical constraint
stack must reproduce ConstraintSet.evaluate row-for-row; the AL fused
backward kernel must match the existing Riccati kernel fed the
al_cost_fns-decorated expansion; the AL fused forward kernel must make the
same line-search decisions as solvers.ilqr.forward_pass under the AL cost.
Kernel runs use interpret=True on CPU; compiled-vs-interpret equality is
validated on TPU (benchmark/fused_al_ab.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trajopt_tpu as tt
from trajopt_tpu.ops.canonical import canon_evaluate, canonical_stack
from trajopt_tpu.ops.pallas_al_fused import (
    fused_al_backward_pallas, fused_al_forward_pallas,
)
from trajopt_tpu.ops.pallas_riccati import riccati_sweep_pallas
from trajopt_tpu.ops.rollout import rollout
from trajopt_tpu.solvers.al import ALOptions, al_cost_fns
from trajopt_tpu.solvers.altro import infeasible_problem
from trajopt_tpu.solvers.ilqr import iLQROptions, forward_pass

DTYPE = jnp.float32


def _car_problem(N=21, dtype=DTYPE):
    """Dubins car + obstacles + bounds + goal, infeasible-start transform:
    every canonical row kind (sphere, bound selections, goal identities,
    slack equalities) in one stack — a miniature of the maze's layout."""
    from trajopt_tpu.models import zoo as models
    from trajopt_tpu.ops.constraints import (
        ConstraintSetBuilder, bound_constraint, goal_constraint,
        obstacle_field_constraint,
    )

    model_d = tt.discretize(models.car, "rk3")
    n, m = 3, 2
    xf = np.array([0.0, 1.0, 0.0])
    obj = tt.LQRObjective(np.eye(n) * 1e-2, np.eye(m) * 1e-2,
                          np.eye(n) * 100.0, xf, N)
    circles = [(0.05, 0.25, 0.1), (-0.1, 0.5, 0.12), (0.1, 0.75, 0.1)]
    cons = ConstraintSetBuilder(N)
    cons.add(bound_constraint(n, m, u_min=-2.0, u_max=2.0,
                              x_min=[-0.5, -0.1, -4.0],
                              x_max=[0.5, 1.1, 4.0], label="bnd"))
    cons.add(obstacle_field_constraint(circles, label="obs"),
             knots=range(1, N - 1))
    cons.add(goal_constraint(xf))
    prob = tt.problem(model_d, obj, constraints=cons,
                      x0=np.zeros(n), xf=xf, N=N, tf=(N - 1) * 0.06,
                      U0=np.zeros((N - 1, m)), dtype=dtype)
    # straight-line infeasible seed through the obstacles
    X0 = np.zeros((N, n))
    X0[:, 1] = np.linspace(0.0, 1.0, N)
    prob = tt.initial_states(prob, X0)
    return infeasible_problem(prob, R_inf=1e-4)


def _setup(B=128, N=21):
    prob = _car_problem(N=N)
    model = prob.model
    n, m = model.n, model.m
    cs = prob.constraints
    obj = jax.tree_util.tree_map(lambda a: jnp.asarray(a, DTYPE), prob.obj)
    dt_traj = jnp.asarray(prob.dt_traj(), DTYPE)

    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rng.normal(size=(B, n)) * 0.02, DTYPE)
    U = jnp.asarray(rng.normal(size=(B, N - 1, m)) * 0.3, DTYPE)
    X = jax.vmap(lambda x0, Ui: rollout(model, x0, Ui, dt_traj))(x0s, U)
    X = jnp.asarray(X, DTYPE)

    # masked, exercised duals/penalties: λ > 0 on some rows, μ growing
    mask = np.asarray(jax.device_get(cs.mask), bool)
    lam_np = rng.uniform(0.0, 0.5, size=(B, cs.N, cs.P)) * mask
    mu_np = rng.uniform(0.5, 20.0, size=(B, cs.N, cs.P)) * mask
    lam = jnp.asarray(lam_np, DTYPE)
    mu = jnp.asarray(mu_np, DTYPE)
    return prob, model, cs, obj, x0s, X, U, dt_traj, lam, mu


def test_canonical_stack_matches_evaluate():
    for make in ("maze", "car"):
        if make == "maze":
            from trajopt_tpu.problems import zoo as probs

            prob = infeasible_problem(
                probs.quadrotor_maze(dtype=jnp.float64), 1e-8)
        else:
            prob = _car_problem()
        cs = prob.constraints
        n, m = prob.model.n, prob.model.m
        st = canonical_stack(cs, n, m, dtype=jnp.float64)
        assert st is not None and st.P == cs.P
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.normal(size=(cs.N, n)) * 4)
        U = jnp.asarray(rng.normal(size=(cs.N - 1, m)) * 2)
        U_pad = jnp.concatenate([U, jnp.zeros_like(U[:1])], axis=0)
        C_ref = cs.evaluate(X, U)
        C_can = jnp.where(cs.mask, canon_evaluate(st, n, m, X, U_pad), 0.0)
        assert float(jnp.max(jnp.abs(C_ref - C_can))) < 1e-10


def test_canonical_stack_rejects_non_canonical():
    """A constraint without a canonical descriptor keeps the stack None."""
    from trajopt_tpu.models import zoo as models
    from trajopt_tpu.ops.constraints import Constraint, ConstraintSetBuilder

    N, n, m = 11, 3, 2
    cons = ConstraintSetBuilder(N)
    cons.add(Constraint(lambda x, u: jnp.array([jnp.sin(x[0]) - 0.5]),
                        1, "weird", equality=False, applies="stage"))
    model_d = tt.discretize(models.car, "rk3")
    obj = tt.LQRObjective(np.eye(n), np.eye(m), np.eye(n), np.zeros(n), N)
    prob = tt.problem(model_d, obj, constraints=cons, x0=np.zeros(n),
                      N=N, dt=0.1, U0=np.zeros((N - 1, m)))
    st = canonical_stack(prob.constraints, n, m)
    assert st is None


def test_fk_stacks_default_to_phase_split_dispatch():
    """fk_sphere stacks are fused-AL-INELIGIBLE by default (measured loss:
    full-fused 22.4 / hybrid 41.4 / phase-split 44.7 kuka solves/s,
    benchmark/kuka_ab.py round 5); fused_al_fk=True opts into the hybrid,
    and non-fk stacks stay eligible."""
    from trajopt_tpu.problems import zoo as probs
    from trajopt_tpu.solvers.ilqr import (ALFusedMeta, _canon_has_fk,
                                          _fused_al_eligible)

    prob = infeasible_problem(probs.kuka_obstacles(dtype=DTYPE), 1e-8)
    canon = canonical_stack(prob.constraints, prob.model.n, prob.model.m)
    assert canon is not None and _canon_has_fk(canon)
    meta = ALFusedMeta(objective=prob.obj, cs=prob.constraints, canon=canon,
                       lam=None, mu=None, atol=0.0)
    assert not _fused_al_eligible(prob.model, iLQROptions(), meta)
    assert _fused_al_eligible(prob.model, iLQROptions(fused_al_fk=True),
                              meta)

    p2 = infeasible_problem(probs.car_escape(dtype=DTYPE), 1e-8)
    c2 = canonical_stack(p2.constraints, p2.model.n, p2.model.m)
    assert not _canon_has_fk(c2)
    m2 = ALFusedMeta(objective=p2.obj, cs=p2.constraints, canon=c2,
                     lam=None, mu=None, atol=0.0)
    assert _fused_al_eligible(p2.model, iLQROptions(), m2)


def test_kuka_fk_canonical_stack_matches_evaluate():
    """The fk_sphere rows (VERDICT r4 item 2) reproduce the kuka FK-bubble
    constraint stack (reference problems/kuka_obstacles.jl:14-60) both on
    the original and the slack-augmented problem."""
    from trajopt_tpu.problems import zoo as probs

    prob = probs.kuka_obstacles(dtype=jnp.float64)
    for p in (prob, infeasible_problem(prob, 1e-8)):
        cs = p.constraints
        n, m = p.model.n, p.model.m
        st = canonical_stack(cs, n, m, dtype=jnp.float64)
        assert st is not None and st.P == cs.P
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.uniform(-1.5, 1.5, size=(cs.N, n)))
        U = jnp.asarray(rng.normal(size=(cs.N - 1, m)) * 2)
        U_pad = jnp.concatenate([U, jnp.zeros_like(U[:1])], axis=0)
        C_ref = cs.evaluate(X, U)
        C_can = jnp.where(cs.mask, canon_evaluate(st, n, m, X, U_pad), 0.0)
        assert float(jnp.max(jnp.abs(C_ref - C_can))) < 1e-10


@pytest.mark.slow
def test_kuka_fused_al_backward_matches_riccati_kernel():
    """fk_sphere in-kernel FK + GN expansion (interpret mode) vs the
    Riccati kernel fed the al_cost_fns-decorated expansion — the kuka
    analog of test_fused_al_backward_matches_riccati_kernel."""
    from trajopt_tpu.problems import zoo as probs

    prob0 = probs.kuka_obstacles(dtype=DTYPE)
    prob = infeasible_problem(prob0, 1e-8)
    model = prob.model
    cs = prob.constraints
    n, m = model.n, model.m
    N = cs.N
    obj = jax.tree_util.tree_map(lambda a: jnp.asarray(a, DTYPE), prob.obj)
    dt_traj = jnp.asarray(prob.dt_traj(), DTYPE)
    B = 128
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(np.asarray(prob.x0)[None]
                      + rng.normal(size=(B, n)) * 0.05, DTYPE)
    # controls from the BASE problem's hold torques (prob.U's slack columns
    # are seeded from the problem's state seed, which kuka_obstacles leaves
    # unset) + small slack perturbations
    U = jnp.asarray(np.concatenate([
        np.tile(np.asarray(prob0.U)[None], (B, 1, 1))
        + rng.normal(size=(B, N - 1, prob0.model.m)) * 0.05,
        rng.normal(size=(B, N - 1, n)) * 0.02,
    ], axis=-1), DTYPE)
    # synthetic states around the hold pose (an open-loop rollout of the
    # undamped arm with perturbed torques blows up — ilqr_solve docstring);
    # the test only needs both paths to see IDENTICAL (X, U)
    X = jnp.asarray(x0s[:, None, :]
                    + rng.normal(size=(B, N, n)) * 0.1, DTYPE)
    mask = np.asarray(jax.device_get(cs.mask), bool)
    lam = jnp.asarray(rng.uniform(0.0, 0.5, size=(B, N, cs.P)) * mask, DTYPE)
    mu = jnp.asarray(rng.uniform(0.5, 20.0, size=(B, N, cs.P)) * mask, DTYPE)
    rho = jnp.ones((B,), DTYPE)
    canon = canonical_stack(cs, n, m, dtype=DTYPE)
    assert canon is not None

    def exp_one(Xi, Ui, lam_i, mu_i):
        _, expansion_fn = al_cost_fns(obj, cs, dt_traj, lam_i, mu_i, 0.0)
        return expansion_fn(Xi, Ui)

    A, Bm = jax.vmap(lambda Xi, Ui: model.jacobian_traj(
        Xi[:-1], Ui, dt_traj))(X, U)
    exp = jax.vmap(exp_one)(X, U, lam, mu)
    Kr, dr, v1r, v2r, failr = riccati_sweep_pallas(
        jnp.asarray(A, DTYPE), jnp.asarray(Bm, DTYPE), exp.x, exp.u,
        exp.xx, exp.uu, exp.ux, rho, interpret=True)

    model_fns = (model.step_lanes, getattr(model, "base_step_lanes", None),
                 getattr(model, "slack_m", None))
    assert model_fns[0] is not None and model_fns[1] is not None
    Kf, df, v1f, v2f, failf = fused_al_backward_pallas(
        model_fns, canon, X, U, lam, mu, dt_traj, obj, rho, interpret=True)

    assert not bool(failr.any()) and not bool(failf.any())
    scale = float(jnp.max(jnp.abs(Kr)))
    assert float(jnp.max(jnp.abs(Kr - Kf))) < 5e-3 * scale
    assert float(jnp.max(jnp.abs(dr - df))) < 5e-3 * max(
        1e-3, float(jnp.max(jnp.abs(dr))))
    assert float(jnp.max(jnp.abs(v1r - v1f))) < 2e-3 * max(
        1e-6, float(jnp.max(jnp.abs(v1r))))


def test_fused_al_backward_matches_riccati_kernel():
    prob, model, cs, obj, x0s, X, U, dt_traj, lam, mu = _setup()
    B = X.shape[0]
    n, m = model.n, model.m
    rho = jnp.ones((B,), DTYPE)
    canon = canonical_stack(cs, n, m, dtype=DTYPE)

    def exp_one(Xi, Ui, lam_i, mu_i):
        _, expansion_fn = al_cost_fns(obj, cs, dt_traj, lam_i, mu_i, 0.0)
        return expansion_fn(Xi, Ui)

    A, Bm = jax.vmap(lambda Xi, Ui: model.jacobian_traj(
        Xi[:-1], Ui, dt_traj))(X, U)
    exp = jax.vmap(exp_one)(X, U, lam, mu)
    Kr, dr, v1r, v2r, failr = riccati_sweep_pallas(
        jnp.asarray(A, DTYPE), jnp.asarray(Bm, DTYPE), exp.x, exp.u,
        exp.xx, exp.uu, exp.ux, rho, interpret=True)

    model_fns = (model.step_lanes, getattr(model, "base_step_lanes", None),
                 getattr(model, "slack_m", None))
    assert model_fns[1] is not None and model_fns[2] == 2
    Kf, df, v1f, v2f, failf = fused_al_backward_pallas(
        model_fns, canon, X, U, lam, mu, dt_traj, obj, rho, interpret=True)

    assert not bool(failr.any()) and not bool(failf.any())
    scale = float(jnp.max(jnp.abs(Kr)))
    assert float(jnp.max(jnp.abs(Kr - Kf))) < 2e-3 * scale
    assert float(jnp.max(jnp.abs(dr - df))) < 2e-3 * max(
        1e-3, float(jnp.max(jnp.abs(dr))))
    assert float(jnp.max(jnp.abs(v1r - v1f))) < 1e-3 * max(
        1e-6, float(jnp.max(jnp.abs(v1r))))


def test_fused_al_forward_matches_forward_pass():
    prob, model, cs, obj, x0s, X, U, dt_traj, lam, mu = _setup()
    B = X.shape[0]
    n, m = model.n, model.m
    rho = jnp.ones((B,), DTYPE)
    drho = jnp.ones((B,), DTYPE)
    canon = canonical_stack(cs, n, m, dtype=DTYPE)
    model_fns = (model.step_lanes, getattr(model, "base_step_lanes", None),
                 getattr(model, "slack_m", None))
    K, d, v1, v2, fail = fused_al_backward_pallas(
        model_fns, canon, X, U, lam, mu, dt_traj, obj, rho, interpret=True)
    assert not bool(fail.any())

    def cost_one(Xi, Ui, lam_i, mu_i):
        cost_fn, _ = al_cost_fns(obj, cs, dt_traj, lam_i, mu_i, 0.0)
        return cost_fn(Xi, Ui)

    Jprev = jax.vmap(cost_one)(X, U, lam, mu)
    opts = iLQROptions()

    def fp_one(x0_, X_, U_, K_, d_, v1_, v2_, J_, r_, dr_, lam_, mu_):
        cost_fn, _ = al_cost_fns(obj, cs, dt_traj, lam_, mu_, 0.0)
        return forward_pass(model, cost_fn, x0_, X_, U_, K_, d_, v1_, v2_,
                            J_, r_, dr_, dt_traj, opts)

    Xr, Ur, Jr, rhor, drhor, alphar = jax.vmap(fp_one)(
        x0s, X, U, K, d, v1, v2, Jprev, rho, drho, lam, mu)

    opts_t = (opts.line_search_lower_bound, opts.line_search_upper_bound,
              opts.iterations_linesearch, opts.bp_reg_min,
              opts.bp_reg_increase_factor, opts.bp_reg_fp)
    Xf, Uf, Jf, rhof, drhof, alphaf = fused_al_forward_pallas(
        model.step_lanes, canon, x0s, X, U, K, d, v1, v2, Jprev, rho, drho,
        jnp.ones((B,), DTYPE), lam, mu, dt_traj, obj, opts_t,
        interpret=True)

    same_alpha = np.asarray(alphar) == np.asarray(alphaf)
    # f32 cost rounding can flip a borderline accept; require bulk identity
    assert same_alpha.mean() > 0.97
    assert float(jnp.max(jnp.abs(
        Jr[same_alpha] - Jf[same_alpha]))) < 1e-3 * max(
            1.0, float(jnp.max(jnp.abs(Jr))))
    assert float(jnp.max(jnp.abs(
        Xr[same_alpha] - Xf[same_alpha]))) < 1e-4 * max(
            1.0, float(jnp.max(jnp.abs(Xr))))


@pytest.mark.slow
def test_solver_fused_al_matches_plain_path():
    """fused=True + al_meta must not change batched CPU results (the
    custom_vmap fallback IS the closure path)."""
    from trajopt_tpu.parallel.batch import solve_batch_queued

    prob = _car_problem(N=21, dtype=jnp.float32)
    B = 8
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(size=(B, 3)) * 0.02, jnp.float32)
    base = ALOptions(iterations=10,
                     opts_uncon=iLQROptions(iterations=15),
                     penalty_scaling=10.0)
    import dataclasses

    fused = dataclasses.replace(
        base, opts_uncon=dataclasses.replace(base.opts_uncon, fused=True))
    r0 = jax.jit(lambda xs: solve_batch_queued(prob, base, xs, lanes=4))(x0s)
    r1 = jax.jit(lambda xs: solve_batch_queued(prob, fused, xs, lanes=4))(x0s)
    np.testing.assert_allclose(np.asarray(r0.J), np.asarray(r1.J),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r0.c_max), np.asarray(r1.c_max),
                               rtol=1e-5, atol=1e-7)
