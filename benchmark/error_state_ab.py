"""A/B: quaternion error-state iLQR on the two headline benches."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

import trajopt_tpu as tt
from trajopt_tpu.parallel.batch import solve_batch
from trajopt_tpu.problem import update_problem
from trajopt_tpu.problems import zoo as probs
from trajopt_tpu.solvers.al import al_solve
from trajopt_tpu.solvers.altro import ALTROOptions, _penalty_rows, infeasible_problem
from trajopt_tpu.solvers.ilqr import iLQROptions


def bench_ilqr(es, bp='scan'):
    from __graft_entry__ import _quadrotor_problem

    dtype = jnp.float32
    prob = _quadrotor_problem(N=101, dtype=dtype)
    B = 256
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.tile(np.asarray(prob.x0)[None], (B, 1))
        + np.concatenate([rng.normal(size=(B, 3)) * 0.1,
                          np.zeros((B, 10))], axis=1), dtype)
    opts = tt.ALOptions(opts_uncon=iLQROptions(iterations=100, error_state=es, bp_type=bp))
    solve = jax.jit(lambda xs: solve_batch(prob, opts, xs))
    res = solve(x0s)
    jax.block_until_ready(res.X)
    t0 = time.perf_counter()
    for _ in range(3):
        res = solve(x0s)
        jax.block_until_ready(res.X)
    dt = (time.perf_counter() - t0) / 3
    pos_err = np.asarray(jnp.linalg.norm(
        res.X[:, -1, :3] - jnp.asarray([0.0, 60.0, 10.0], dtype), axis=-1))
    its = np.asarray(res.iterations_total)
    print(f"ilqr es={es} bp={bp}: {B/dt:.0f} solves/s conv={np.mean(pos_err < 0.5):.4f}"
          f" err med/p95={np.median(pos_err):.4f}/{np.percentile(pos_err,95):.4f}"
          f" it med/max={np.median(its):.0f}/{its.max()}", flush=True)


def bench_maze(es, inner=10):
    dtype = jnp.float32
    prob = probs.quadrotor_maze(dtype=dtype)
    prob_inf = infeasible_problem(prob, 1e-8)
    al_sched = tt.ALOptions(penalty_initial=1.0, penalty_scaling=25.0)
    mu0, sca = _penalty_rows(prob_inf.constraints,
                             ALTROOptions(R_inf=1e-8, opts_al=al_sched), dtype)
    B = 128
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.tile(np.asarray(prob.x0)[None], (B, 1))
        + np.concatenate([rng.normal(size=(B, 3)) * 0.05,
                          np.zeros((B, 10))], axis=1), dtype)
    opts = tt.ALOptions(iterations=40,
                        opts_uncon=iLQROptions(iterations=inner, error_state=es),
                        cost_tolerance=1e-5, cost_tolerance_intermediate=1e-3,
                        constraint_tolerance=1e-3,
                        penalty_initial=1.0, penalty_scaling=25.0)

    def one(x0):
        p = update_problem(prob_inf, x0=x0, X=prob_inf.X.at[0].set(x0))
        return al_solve(p, opts, mu_init=mu0[None, :], penalty_scaling=sca)

    solve = jax.jit(jax.vmap(one))
    r = solve(x0s)
    jax.block_until_ready(r.X)
    t0 = time.perf_counter()
    r = solve(x0s)
    jax.block_until_ready(r.X)
    dt = time.perf_counter() - t0
    Xs, Us = r.X[:, :, :13], r.U[:, :, :4]
    C = jax.vmap(lambda X_, U_: prob.constraints.evaluate(X_, U_))(Xs, Us)
    cmax = jax.vmap(prob.constraints.max_violation)(C)
    conv = float(jnp.mean((cmax < 1e-3).astype(jnp.float32)))
    itot = np.asarray(r.iterations_total)
    print(f"maze es={es} i{inner}: {B/dt:.1f} solves/s conv@1e-3={conv:.3f}"
          f" med_cmax={float(jnp.median(cmax)):.2e}"
          f" it med/max={np.median(itot):.0f}/{itot.max()}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "ilqr"):
        bench_ilqr(True)
    if which == "sqrt":
        bench_ilqr(True, bp="sqrt")
    if which in ("both", "maze"):
        bench_maze(True)
        bench_maze(True, inner=15)
