"""Parallel layer tests: associative-scan Riccati equivalence (the rebuild's
sqrt_bp_tests.jl-style oracle), sqrt BP equivalence, sharded batch solve on a
virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trajopt_tpu as tt
from trajopt_tpu.models import zoo
from trajopt_tpu.ops.cost import cost_expansion
from trajopt_tpu.solvers.ilqr import backward_pass, iLQROptions
from trajopt_tpu.parallel.riccati import parallel_backward_pass
from trajopt_tpu.parallel.batch import (
    solve_batch, solve_batch_sharded, make_mesh,
)


def _bp_inputs(N=25, seed=5):
    model_d = tt.discretize(zoo.cartpole, "rk3")
    n, m = 4, 1
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.normal(size=(N, n)) * 0.3)
    U = jnp.asarray(rng.normal(size=(N - 1, m)) * 0.5)
    A, B = model_d.jacobian_traj(X[:-1], U, 0.05)
    xf = np.array([0, np.pi, 0, 0.0])
    obj = tt.LQRObjective(np.eye(n) * 1e-2, np.eye(m) * 1e-1, np.eye(n) * 100.0,
                          xf, N)
    exp = cost_expansion(obj, X, U, 0.05)
    return A, B, exp


def test_parallel_riccati_equals_sequential():
    """Associative-scan Riccati ≡ sequential sweep (K, d, ΔV) to fp64
    precision — the alternative-algorithm equivalence oracle (reference
    sqrt_bp_tests.jl:30-85 pattern)."""
    A, B, exp = _bp_inputs()
    rho = jnp.zeros(())
    drho = jnp.ones(())
    K0, d0, v1_0, v2_0, _, _ = backward_pass(A, B, exp, rho, drho, iLQROptions())
    K1, d1, v1_1, v2_1, _, _ = parallel_backward_pass(A, B, exp, 0.0)
    assert np.allclose(K0, K1, atol=1e-9)
    assert np.allclose(d0, d1, atol=1e-9)
    assert abs(float(v1_0 - v1_1)) < 1e-8
    assert abs(float(v2_0 - v2_1)) < 1e-8


def test_sqrt_bp_equals_standard():
    """QR square-root BP ≡ standard BP at ρ=0 (reference sqrt_bp_tests.jl)."""
    A, B, exp = _bp_inputs()
    rho = jnp.zeros(())
    drho = jnp.ones(())
    K0, d0, v1_0, v2_0, _, _ = backward_pass(A, B, exp, rho, drho, iLQROptions())
    K1, d1, v1_1, v2_1, _, _ = backward_pass(
        A, B, exp, rho, drho, iLQROptions(bp_type="sqrt"))
    assert np.allclose(K0, K1, atol=1e-9)
    assert np.allclose(d0, d1, atol=1e-9)
    assert abs(float(v1_0 - v1_1)) < 1e-8
    assert abs(float(v2_0 - v2_1)) < 1e-8


@pytest.mark.parametrize("bp_type", ["sqrt", "parallel"])
def test_full_solve_all_bp_types(bp_type):
    from trajopt_tpu.problems import zoo as probs
    prob = probs.pendulum()
    res = tt.al_solve(prob, tt.ALOptions(opts_uncon=iLQROptions(bp_type=bp_type)))
    assert float(res.c_max) < 1e-3


def test_sharded_batch_solve():
    """shard_map over the virtual 8-device CPU mesh: the multi-chip path."""
    assert len(jax.devices()) == 8, "conftest should give 8 virtual devices"
    from trajopt_tpu.problems import zoo as probs
    prob = probs.pendulum()
    mesh = make_mesh(8)
    B = 16
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(size=(B, 2)) * 0.2)
    res, stats = solve_batch_sharded(prob, tt.ALOptions(), x0s, mesh)
    assert int(stats.n_solved) == B
    assert float(stats.c_max_worst) < 1e-3
    assert res.X.shape == (B, 31, 2)


def test_vmap_batch_matches_single():
    """Batched solve reproduces the single solve bit-for-bit-ish."""
    from trajopt_tpu.problems import zoo as probs
    prob = probs.pendulum()
    res1 = tt.al_solve(prob, tt.ALOptions())
    x0s = jnp.zeros((3, 2))
    resB = solve_batch(prob, tt.ALOptions(), x0s)
    assert np.allclose(resB.X[0], res1.X, atol=1e-10)
    assert np.allclose(resB.U[2], res1.U, atol=1e-10)


def test_custom_vmap_dispatch_consistency():
    """The custom_vmap batching rules (fallback path on CPU) must reproduce
    the single-problem solve exactly — guards the Pallas dispatch plumbing."""
    from trajopt_tpu.problems import zoo as probs

    prob = probs.quadrotor()
    # unconstrained variant (quadrotor zoo problem has bounds; strip them)
    prob_u = tt.update_problem(
        prob, constraints=tt.ConstraintSet.build([], prob.N))
    opts = tt.ALOptions(opts_uncon=iLQROptions(iterations=12))
    res1 = tt.al_solve(prob_u, opts)

    x0s = jnp.broadcast_to(prob.x0, (4,) + prob.x0.shape)
    resB = solve_batch(prob_u, opts, x0s)
    # batched XLA programs reassociate float ops and mid-solve iLQR
    # amplifies bit-level differences, so compare solver-level outcomes:
    # identical iteration counts, matching costs, same trajectory to ~cm.
    # (Swapped/broadcast args in the dispatch rule would be wildly off.)
    assert np.array_equal(np.asarray(resB.iterations_total),
                          np.full(4, int(res1.iterations_total)))
    assert np.allclose(np.asarray(resB.J), float(res1.J), rtol=1e-6)
    assert np.allclose(np.asarray(resB.X[0]), np.asarray(res1.X),
                       rtol=1e-1, atol=1e-1)


@pytest.mark.slow
def test_time_sharded_riccati_on_mesh():
    """Time-axis (sequence-parallel) Riccati over the 8-device virtual mesh
    ≡ the single-device associative scan ≡ the sequential sweep
    (SURVEY §5.7)."""
    from jax.sharding import Mesh
    from trajopt_tpu.parallel.riccati import time_sharded_backward_pass

    A, B, exp = _bp_inputs(N=33)  # N-1 = 32 divisible by 8
    rho = jnp.zeros(())
    drho = jnp.ones(())
    K0, d0, v1_0, v2_0, _, _ = backward_pass(A, B, exp, rho, drho,
                                             iLQROptions())
    mesh = Mesh(np.array(jax.devices()), ("tp",))
    K, d, v1, v2, S, s = time_sharded_backward_pass(A, B, exp, 0.0, mesh)
    assert np.allclose(np.asarray(K), np.asarray(K0), atol=1e-8)
    assert np.allclose(np.asarray(d), np.asarray(d0), atol=1e-8)
    assert float(v1) == pytest.approx(float(v1_0), abs=1e-8)
    assert float(v2) == pytest.approx(float(v2_0), abs=1e-8)
    # divisibility guard
    with pytest.raises(ValueError):
        A2, B2, exp2 = _bp_inputs(N=24)  # N-1 = 23 not divisible
        time_sharded_backward_pass(A2, B2, exp2, 0.0, mesh)


def _quadrotor_bp_inputs(N, dtype):
    """Flagship quadrotor BP inputs at the dryrun shapes (R = 1e-4 —
    the tiny raw stage Quu that broke the round-1 value-form scan)."""
    from trajopt_tpu.ops.rollout import rollout
    from trajopt_tpu.ops.cost import cost_expansion
    from trajopt_tpu.problems.zoo import quadrotor_line

    prob = quadrotor_line(N=N, dtype=dtype)
    dt_traj = prob.dt_traj()
    X = rollout(prob.model, prob.x0, prob.U, dt_traj)
    A, B = prob.model.jacobian_traj(X[:-1], prob.U, dt_traj)
    exp = cost_expansion(prob.obj, X, prob.U, dt_traj)
    return A, B, exp


@pytest.mark.slow
def test_parallel_riccati_f32_flagship():
    """f32 square-root associative-scan sweep vs the f64 sequential oracle
    at the flagship quadrotor shapes (VERDICT r1 item 1: the round-1
    value-form 5-tuple scan NaN'd here; the sqrt form must stay accurate).

    At N=101 (the benchmark shape, dt=0.05) gains are essentially exact.
    At N=9 (the coarse-dt dryrun shape) the fused Quu reaches κ ~ 2e9 —
    beyond 1/ε_f32 — so K is asserted only to its conditioning limit;
    notably the f32 SEQUENTIAL sweep errs ~0.6 relative on the same
    inputs, so the parallel sweep is the more accurate f32 algorithm.
    The cost-to-go S (the sqrt scan's well-conditioned output) is tight
    at every shape.
    """
    from trajopt_tpu.parallel.riccati import parallel_backward_pass

    to32 = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), t)
    rel = lambda a, b: float(
        np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b)))
        / (np.max(np.abs(np.asarray(b))) + 1e-30))

    for N, ktol, dtol in ((9, 0.15, None), (101, 1e-3, 1e-2)):
        A, B, exp = _quadrotor_bp_inputs(N, jnp.float64)
        K0, d0, v10, v20, S0, s0 = parallel_backward_pass(A, B, exp, 0.0)
        # oracle cross-check: parallel f64 == sequential f64
        rho = jnp.zeros(())
        drho = jnp.ones(())
        Ks, ds, *_ = backward_pass(A, B, exp, rho, drho, iLQROptions())
        assert rel(K0, Ks) < 1e-6 and rel(d0, ds) < 1e-6

        K, d, v1, v2, S, s = parallel_backward_pass(
            to32(A), to32(B), to32(exp), 0.0)
        assert bool(jnp.all(jnp.isfinite(K))) and bool(
            jnp.all(jnp.isfinite(d)))
        assert rel(K, K0) < ktol, f"N={N}: K rel err {rel(K, K0):.3e}"
        assert rel(S, S0) < 1e-3, f"N={N}: S rel err {rel(S, S0):.3e}"
        if dtol is not None:
            assert rel(d, d0) < dtol, f"N={N}: d rel err {rel(d, d0):.3e}"
        assert abs(float(v1) - float(v10)) < 1e-2 * abs(float(v10))


def test_queued_batch_matches_vmap_solve():
    """Streaming/queued batch driver (lane hand-off) reproduces the plain
    vmapped AL solve per problem — iteration counts identical, trajectories
    to solver precision — while stragglers only occupy one lane."""
    from trajopt_tpu.parallel.batch import solve_batch_queued

    from trajopt_tpu.problems import zoo as probs
    prob = probs.pendulum()
    B = 24
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(size=(B, 2)) * 0.2)
    opts = tt.ALOptions()
    ref = solve_batch(prob, opts, x0s)
    out = jax.jit(lambda xs: solve_batch_queued(prob, opts, xs,
                                                lanes=8))(x0s)
    assert bool(jnp.all(out.c_max < 1e-3))
    assert np.array_equal(np.asarray(out.iterations_total),
                          np.asarray(ref.iterations_total))
    assert np.allclose(np.asarray(out.X), np.asarray(ref.X), atol=1e-6)
    # pool (24) > lanes (8): slots must have been recycled
    assert int(out.rounds) < 24 * int(jnp.max(ref.iterations))


def test_queued_batch_unconstrained_runs_to_inner_convergence():
    """For an UNCONSTRAINED problem c_max is identically zero, so the lane
    done-rule must gate on inner-solve convergence (exited below its
    iteration cap at FINAL tolerances), not on c_max — otherwise every
    lane 'converges' after one truncated round (solvers/al.py
    al_lane_stepper). Quality must match the plain al_solve arm even when
    the inner cap forces multiple rounds."""
    from trajopt_tpu.parallel.batch import solve_batch_queued
    from trajopt_tpu.problems import zoo as probs

    base = probs.pendulum()
    # strip constraints -> unconstrained swing-up (xf pull via cost only)
    prob = tt.update_problem(
        base, constraints=tt.ConstraintSet.build([], base.N))
    B = 12
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.normal(size=(B, 2)) * 0.2)

    ref = solve_batch(prob, tt.ALOptions(), x0s)          # single 300-cap inner
    opts = tt.ALOptions(iterations=30,
                        opts_uncon=tt.iLQROptions(iterations=7))
    out = jax.jit(lambda xs: solve_batch_queued(prob, opts, xs,
                                                lanes=4))(x0s)
    # same optimum to solver precision despite 7-iteration rounds
    assert np.allclose(np.asarray(out.J[:B]), np.asarray(ref.J), rtol=1e-4,
                       atol=1e-6)
    assert np.allclose(np.asarray(out.X[:B]), np.asarray(ref.X), atol=1e-3)
    # and the pool genuinely streamed through the 4 lanes
    assert int(out.rounds) >= B // 4


def test_queued_altro_batch_strips_slacks_and_scores_original():
    """solve_batch_queued_altro applies the infeasible-start transform +
    ALTRO penalty schedules, streams the pool, and returns original-dim
    trajectories scored on the ORIGINAL constraints."""
    from trajopt_tpu.parallel.batch import solve_batch_queued_altro
    from trajopt_tpu.problems import zoo as probs
    from trajopt_tpu.solvers.altro import ALTROOptions

    base = probs.pendulum()
    # finite state seed (straight-line interp) -> infeasible start
    seed = jnp.linspace(jnp.zeros(2), jnp.asarray(base.xf), base.N)
    prob = tt.update_problem(base, X=seed)
    B = 8
    rng = np.random.default_rng(2)
    x0s = jnp.asarray(rng.normal(size=(B, 2)) * 0.1)
    opts = ALTROOptions(R_inf=1e-4)
    out = jax.jit(lambda xs: solve_batch_queued_altro(prob, opts, xs,
                                                      lanes=4))(x0s)
    assert out.X.shape == (B, base.N, 2)
    assert out.U.shape == (B, base.N - 1, 1)
    # converged on the ORIGINAL constraints (goal + bounds)
    assert bool(jnp.all(out.c_max < 1e-3)), np.asarray(out.c_max)
    xf = np.asarray(base.xf)
    assert np.allclose(np.asarray(out.X[:, -1]), xf[None], atol=1e-2)


def test_queued_altro_retry_resolves_failed_subset():
    """solve_batch_queued_altro_retry re-enqueues exactly the
    non-converged problems under a scaled penalty schedule and merges
    only rows the retry actually solved (round-5 chaotic-failure rescue;
    no reference counterpart — the reference is single-solve)."""
    from trajopt_tpu.parallel.batch import (solve_batch_queued_altro,
                                            solve_batch_queued_altro_retry)
    from trajopt_tpu.problems import zoo as probs
    from trajopt_tpu.solvers.altro import ALTROOptions
    import dataclasses

    base = probs.pendulum()
    seed = jnp.linspace(jnp.zeros(2), jnp.asarray(base.xf), base.N)
    prob = tt.update_problem(base, X=seed)
    B = 8
    rng = np.random.default_rng(2)
    x0s = jnp.asarray(rng.normal(size=(B, 2)) * 0.1)
    opts = ALTROOptions(R_inf=1e-4)

    # a schedule too short to converge: every lane fails the first pass,
    # the retry (same outer budget, scaled mu0) must rescue some/all
    short = dataclasses.replace(
        opts, opts_al=dataclasses.replace(opts.opts_al, iterations=2))
    r0 = jax.jit(lambda xs: solve_batch_queued_altro(
        prob, short, xs, lanes=4))(x0s)
    n_fail0 = int(np.sum(~(np.asarray(r0.c_max) < 1e-3)))
    assert n_fail0 > 0, "schedule unexpectedly converged; tighten the test"

    r, n_retried = solve_batch_queued_altro_retry(
        prob, short, x0s, lanes=4, tol=1e-3, mu_retry_scale=100.0,
        max_retries=1)
    assert n_retried == n_fail0
    # merge can only improve: every row's c_max <= the first-pass row
    assert bool(np.all(np.asarray(r.c_max) <= np.asarray(r0.c_max) + 1e-12))
    assert r.X.shape == r0.X.shape and r.U.shape == r0.U.shape

    # converged pools skip the retry entirely
    r_full, n0 = solve_batch_queued_altro_retry(
        prob, opts, x0s, lanes=4, tol=1e-3)
    assert n0 == 0
    assert bool(np.all(np.asarray(r_full.c_max) < 1e-3))


def test_parallel_riccati_overactuated_and_psd_stage_cost():
    """Two review regressions of the square-root scan form:
    (a) m > n (over-actuated / ALTRO slack-augmented models) crashed at
    trace time in the U padding; (b) a merely-PSD stage Hessian (zero cost
    weight on a state — Q = diag(1,1,0,1) — or control) NaN'd the joint
    Cholesky. Both must match the sequential sweep."""
    from trajopt_tpu.parallel.riccati import parallel_backward_pass

    rng = np.random.default_rng(11)
    rho = jnp.zeros(())
    drho = jnp.ones(())

    # (a) n=2, m=3 random stable system
    N, n, m = 17, 2, 3
    A = jnp.asarray(rng.normal(size=(N - 1, n, n)) * 0.4
                    + np.eye(n) * 0.8)
    B = jnp.asarray(rng.normal(size=(N - 1, n, m)) * 0.3)
    from trajopt_tpu.ops.cost import Expansion
    exp = Expansion(
        x=jnp.asarray(rng.normal(size=(N, n))),
        u=jnp.asarray(rng.normal(size=(N - 1, m))),
        xx=jnp.broadcast_to(jnp.eye(n) * 2.0, (N, n, n)),
        uu=jnp.broadcast_to(jnp.eye(m) * 0.5, (N - 1, m, m)),
        ux=jnp.zeros((N - 1, m, n)))
    K0, d0, v1_0, v2_0, _, _ = backward_pass(A, B, exp, rho, drho,
                                             iLQROptions())
    K1, d1, v1_1, v2_1, _, _ = parallel_backward_pass(A, B, exp, 0.0)
    assert np.allclose(np.asarray(K1), np.asarray(K0), atol=1e-8)
    assert np.allclose(np.asarray(d1), np.asarray(d0), atol=1e-8)

    # (b) PSD-singular stage Q on the cartpole shapes
    A2, B2, exp2 = _bp_inputs()
    n2 = 4
    Qsing = jnp.asarray(np.diag([1.0, 1.0, 0.0, 1.0]) * 1e-2)
    import dataclasses
    exp2 = dataclasses.replace(exp2, xx=exp2.xx.at[:-1].set(
        jnp.broadcast_to(Qsing * 0.05, exp2.xx[:-1].shape)))
    K0, d0, *_ = backward_pass(A2, B2, exp2, rho, drho, iLQROptions())
    K1, d1, *_ = parallel_backward_pass(A2, B2, exp2, 0.0)
    assert np.all(np.isfinite(np.asarray(K1)))
    assert np.allclose(np.asarray(K1), np.asarray(K0), atol=1e-6)
    assert np.allclose(np.asarray(d1), np.asarray(d0), atol=1e-6)


@pytest.mark.slow
def test_end_to_end_time_sharded_solve():
    """END-TO-END iLQR/AL solve with the horizon sharded over the 8-device
    virtual mesh (iLQROptions(bp_type='parallel', tp_mesh=mesh)): every
    backward pass inside the while_loops runs time-sharded; result must
    match the single-device solve (SURVEY §5.7, VERDICT r2 item 4)."""
    from jax.sharding import Mesh

    N = 4097  # N-1 = 4096 divisible by 8
    n, m = 2, 1
    model_d = tt.discretize(zoo.pendulum, "rk3")
    xf = np.array([np.pi, 0.0])
    obj = tt.LQRObjective(np.eye(n) * 1e-2, np.eye(m) * 1e-1,
                          np.eye(n) * 100.0, xf, N)
    prob = tt.problem(model_d, obj, N=N, tf=5.0,
                      x0=np.zeros(n), xf=xf,
                      U0=np.full((N - 1, m), 0.1))

    mesh = Mesh(np.array(jax.devices()), ("tp",))
    opts_tp = tt.ALOptions(opts_uncon=iLQROptions(
        iterations=12, bp_type="parallel", tp_mesh=mesh))
    opts_1d = tt.ALOptions(opts_uncon=iLQROptions(
        iterations=12, bp_type="parallel"))

    res_tp = tt.al_solve(prob, opts_tp)
    res_1d = tt.al_solve(prob, opts_1d)
    assert np.all(np.isfinite(np.asarray(res_tp.X)))
    # same iteration path and matching cost: the tp sweep is algebraically
    # identical to the single-device scan (f64 here), so the while_loops
    # must branch identically
    assert int(res_tp.iterations_total) == int(res_1d.iterations_total)
    assert float(res_tp.J) == pytest.approx(float(res_1d.J), rel=1e-8)
    assert np.allclose(np.asarray(res_tp.X), np.asarray(res_1d.X),
                       atol=1e-6)
    # and the solve actually works: pendulum swings up
    assert abs(float(res_tp.X[-1, 0]) - np.pi) < 1e-2


@pytest.mark.slow
def test_solve_batch_warm_dispersed_car_escape():
    """Homotopy batch driver (parallel/batch.py solve_batch_warm): a
    sigma=0.02 dispersed car_escape pool warm-started from one canonical
    ALTRO solve converges on the FEASIBLE path (no slack transform) under
    the capped local-correction schedule — the dispersion-robustness
    pattern for trap problems (BENCH_LOCAL.md round 3)."""
    import dataclasses

    from trajopt_tpu.parallel.batch import solve_batch_warm
    from trajopt_tpu.problems import zoo as probs
    from trajopt_tpu.problems.tuned import tuned_altro_options

    dtype = jnp.float32
    prob = probs.car_escape(dtype=dtype)
    topts = dataclasses.replace(tuned_altro_options("car_escape"),
                                projected_newton=False)
    B = 4
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.asarray(prob.x0)[None]
                      + np.concatenate([rng.normal(size=(B, 2)) * 0.02,
                                        np.zeros((B, 1))], 1), dtype)
    r = solve_batch_warm(prob, topts, x0s, lanes=B)
    cm = np.asarray(r.c_max)
    assert np.all(cm < 1e-2), cm
    assert np.all(np.asarray(r.iterations_total) <= 10 * 25)
