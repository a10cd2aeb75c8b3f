"""A/B: line_search_warm_start off/on for the two headline benches."""
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


def bench_ilqr(ws):
    from __graft_entry__ import _quadrotor_problem

    dtype = jnp.float32
    prob = _quadrotor_problem(N=101, dtype=dtype)
    B = 256
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.tile(np.asarray(prob.x0)[None], (B, 1))
        + np.concatenate([rng.normal(size=(B, 3)) * 0.1,
                          np.zeros((B, 10))], axis=1), dtype)
    opts = tt.ALOptions(opts_uncon=iLQROptions(iterations=100,
                                               line_search_warm_start=ws))
    solve = jax.jit(lambda xs: solve_batch(prob, opts, xs))
    res = solve(x0s)
    jax.block_until_ready(res.X)
    pos_err = jnp.linalg.norm(
        res.X[:, -1, :3] - jnp.asarray([0.0, 60.0, 10.0], dtype), axis=-1)
    conv = float(jnp.mean((pos_err < 0.5).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(3):
        res = solve(x0s)
        jax.block_until_ready(res.X)
    dt = (time.perf_counter() - t0) / 3
    print(f"ilqr ws={ws}: {B/dt:.0f} solves/s conv={conv:.3f} "
          f"med_err={float(jnp.median(pos_err)):.4f}", flush=True)


def bench_maze(ws):
    dtype = jnp.float32
    prob = probs.quadrotor_maze(dtype=dtype)
    prob_inf = infeasible_problem(prob, 1e-8)
    mu0, sca = _penalty_rows(prob_inf.constraints, ALTROOptions(R_inf=1e-8), dtype)
    B = 128
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.tile(np.asarray(prob.x0)[None], (B, 1))
        + np.concatenate([rng.normal(size=(B, 3)) * 0.05,
                          np.zeros((B, 10))], axis=1), dtype)
    opts = tt.ALOptions(iterations=40,
                        opts_uncon=iLQROptions(iterations=60,
                                               line_search_warm_start=ws),
                        cost_tolerance=1e-5, cost_tolerance_intermediate=1e-4,
                        constraint_tolerance=1e-3)

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
    conv = float(jnp.mean((cmax < 1e-2).astype(jnp.float32)))
    itot = np.asarray(r.iterations_total)
    print(f"maze ws={ws}: {B/dt:.1f} solves/s conv={conv:.3f} "
          f"med_cmax={float(jnp.median(cmax)):.2e} "
          f"it med/max={np.median(itot):.0f}/{itot.max()}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "maze"):
        bench_maze(True)
    if which in ("both", "ilqr"):
        bench_ilqr(True)
