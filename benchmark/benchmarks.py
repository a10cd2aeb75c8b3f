"""Benchmark suite.

TPU-native counterpart of the reference BenchmarkTools suite
(reference benchmark/benchmarks.jl:8-51, benchmark/car_benchmarks.jl etc.):
the same problem × solver matrix — {doubleintegrator, pendulum, cartpole,
acrobot, parallel_park, car_3obs, car_escape, quadrotor, quadrotor_maze}
× {iLQR, AL-iLQR, ALTRO, DIRCOL} — timed on the current JAX backend.

Usage:
    python benchmark/benchmarks.py [--problems pendulum,cartpole]
                                   [--solvers al,altro] [--batch 16]
Prints one JSON line per (problem, solver) with wall time, iterations, and
solution quality, plus batched-throughput entries (solves/s) for the AL path.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it explicitly
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import argparse
import json
import time

import numpy as np


def run_case(name, solver_name, batch=0):
    import jax
    import jax.numpy as jnp
    import trajopt_tpu as tt
    from trajopt_tpu.problems import zoo as probs
    from trajopt_tpu.solvers import altro as alt
    from trajopt_tpu.solvers.dircol import DIRCOLOptions, dircol_solve
    from trajopt_tpu.parallel.batch import solve_batch

    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    prob = probs.PROBLEMS[name](dtype=dtype)

    infeasible = bool(np.all(np.isfinite(np.asarray(prob.X))))

    def do_solve():
        if solver_name == "ilqr":
            prob_u = tt.update_problem(
                prob, constraints=tt.ConstraintSet.build([], prob.N),
                X=jnp.full_like(prob.X, jnp.nan).at[0].set(prob.x0))
            return tt.al_solve(prob_u, tt.ALOptions())
        if solver_name == "al":
            p = prob
            if infeasible:
                p = tt.update_problem(
                    prob, X=jnp.full_like(prob.X, jnp.nan).at[0].set(prob.x0))
            return tt.al_solve(p, tt.ALOptions())
        if solver_name == "altro":
            from trajopt_tpu.problems.tuned import tuned_altro_options
            return alt.altro_solve(prob, tuned_altro_options(name))
        if solver_name == "dircol":
            return dircol_solve(prob, DIRCOLOptions(
                feasibility_tolerance=1e-6))
        raise ValueError(solver_name)

    # warmup (compile) + timed reps
    res = do_solve()
    jax.block_until_ready(res.X)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        res = do_solve()
        jax.block_until_ready(res.X)
    wall = (time.perf_counter() - t0) / reps

    out = {
        "problem": name,
        "solver": solver_name,
        "wall_s": round(wall, 4),
        "c_max": float(getattr(res, "c_max", np.nan)),
        "J": float(res.J),
        "iterations": int(np.asarray(getattr(res, "iterations_total",
                                             getattr(res, "iterations", 0)))),
        "device": jax.default_backend(),
    }
    print(json.dumps(out))

    if batch and solver_name == "altro":
        # batched ALTRO throughput (infeasible-start problems like
        # car_escape / kuka_obstacles need the slack transform; plain AL
        # cannot converge them — the documented seed trap)
        x0s = jnp.broadcast_to(prob.x0, (batch,) + prob.x0.shape)

        from trajopt_tpu.problems.tuned import tuned_altro_options
        import dataclasses
        # batched throughput measures the AL stage (PN polish off): the
        # vmapped block-tridiagonal PN factorization at B=128 over the
        # larger constraint stacks crashes the remote TPU compile helper,
        # and the AL stage is the throughput-relevant phase (the maze
        # bench measures the same stage)
        topts = dataclasses.replace(tuned_altro_options(name),
                                    projected_newton=False)

        def one_altro(x0):
            p = tt.update_problem(prob, x0=x0,
                                  X=jnp.asarray(prob.X).at[0].set(x0))
            # transform decision must be static under vmap
            return alt.altro_solve(p, topts, infeasible=infeasible,
                                   minimum_time=False)

        fn = jax.jit(jax.vmap(one_altro))
        r = fn(x0s)
        jax.block_until_ready(r.X)
        t0 = time.perf_counter()
        r = fn(x0s)
        jax.block_until_ready(r.X)
        dt_b = time.perf_counter() - t0
        print(json.dumps({
            "problem": name, "solver": "altro_batched", "batch": batch,
            "solves_per_s": round(batch / dt_b, 2),
            "converged_frac": float(np.mean(
                np.asarray(r.c_max) < 1e-2)),
            "med_c_max": float(np.median(np.asarray(r.c_max))),
            "device": jax.default_backend(),
        }))

    if batch and solver_name == "al":
        # plain AL with a finite infeasible X seed returns the seed
        # (the documented trap) — batch the NaN-seeded problem
        p_b = prob
        if infeasible:
            p_b = tt.update_problem(
                prob, X=jnp.full_like(prob.X, jnp.nan).at[0].set(prob.x0))
        x0s = jnp.broadcast_to(prob.x0, (batch,) + prob.x0.shape)
        fn = jax.jit(lambda xs: solve_batch(p_b, tt.ALOptions(), xs))
        r = fn(x0s)
        jax.block_until_ready(r.X)
        t0 = time.perf_counter()
        r = fn(x0s)
        jax.block_until_ready(r.X)
        dt_b = time.perf_counter() - t0
        print(json.dumps({
            "problem": name, "solver": "al_batched", "batch": batch,
            "solves_per_s": round(batch / dt_b, 2),
            "device": jax.default_backend(),
        }))


DEFAULT_PROBLEMS = ["doubleintegrator", "pendulum", "cartpole",
                    "parallel_park", "car_3obs", "car_escape", "quadrotor"]
DEFAULT_SOLVERS = ["ilqr", "al", "altro"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problems", default=",".join(DEFAULT_PROBLEMS))
    ap.add_argument("--solvers", default=",".join(DEFAULT_SOLVERS))
    ap.add_argument("--batch", type=int, default=0)
    args = ap.parse_args()
    for p in args.problems.split(","):
        for s in args.solvers.split(","):
            try:
                run_case(p, s, batch=args.batch)
            except Exception as e:  # keep the matrix running
                print(json.dumps({"problem": p, "solver": s,
                                  "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
