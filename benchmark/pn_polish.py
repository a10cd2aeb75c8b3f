"""AL → PN polish on the maze pool (the full ALTRO story at batch scale).

The reference's flagship narrative is the AL stage to c_max ~ 1e-3-1e-5
followed by a projected-Newton polish to 1e-8 (reference
examples/quadrotor/altro_times.txt:17-27, projected_newton.jl:200-324).
This records the batched equivalent: a maze pool through the queued
fused-AL driver, then `pn_polish_batch` projecting every trajectory to
machine-precision feasibility — med/max c_max before and after, on TPU
f32 (iterative refinement) or CPU f64 (--cpu).

PN at maze shapes is memory-heavy (q = n + P = 89 block rows → the
block-tridiagonal factors are (N, 89, 89) per problem), so the polish
streams the pool in small vmapped chunks.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true", help="f64 CPU (1e-8 target)")
ap.add_argument("--x64", action="store_true",
                help="f64 PN on the current backend (TPU: emulated f64 — "
                "slow, but the q=89 maze KKT is f32-conditioning-limited; "
                "round-5 f32 run degraded c_max med 5.6e-6 → 7.1e-5)")
ap.add_argument("--batch", type=int, default=256)
ap.add_argument("--chunk", type=int, default=8)
ap.add_argument("--al-cache", default="",
                help="npz path: load the AL-stage pool from it if present, "
                "else solve and save. Lets the PN run in a separate "
                "process/config — the Pallas AL programs fault the TPU "
                "under jax_enable_x64 (round 5), so --x64 should only see "
                "the (Pallas-free) PN stage")
args = ap.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
elif args.x64:
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

import trajopt_tpu as tt
from trajopt_tpu.parallel.batch import pn_polish_batch, solve_batch_queued_altro
from trajopt_tpu.problems import zoo as probs
from trajopt_tpu.solvers.altro import ALTROOptions
from trajopt_tpu.solvers.ilqr import iLQROptions
from trajopt_tpu.solvers.projected_newton import PNOptions


def main():
    dtype = jnp.float64 if args.cpu else jnp.float32
    B = args.batch
    prob = probs.quadrotor_maze(dtype=dtype)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.tile(np.asarray(prob.x0)[None], (B, 1))
        + np.concatenate([rng.normal(size=(B, 3)) * 0.05,
                          np.zeros((B, 10))], axis=1), dtype)
    al = tt.ALOptions(
        iterations=40,
        opts_uncon=iLQROptions(iterations=10, fused=not args.cpu),
        cost_tolerance=1e-5, cost_tolerance_intermediate=1e-3,
        constraint_tolerance=1e-3, penalty_initial=1.0, penalty_scaling=25.0)
    opts = ALTROOptions(R_inf=1e-8, opts_al=al)
    if args.al_cache and os.path.exists(args.al_cache):
        st = np.load(args.al_cache)
        Xs_np, Us_np, c_al = st["X"], st["U"], st["c_max"]
        assert Xs_np.shape[0] == B, (Xs_np.shape, B)
        print(f"AL stage loaded from {args.al_cache}  "
              f"c_max med {np.median(c_al):.2e} max {c_al.max():.2e}",
              flush=True)
        r = None
    else:
        solve = jax.jit(lambda xs: solve_batch_queued_altro(
            prob, opts, xs, lanes=min(128, B), infeasible=True))
        t0 = time.perf_counter()
        r = solve(x0s)
        jax.block_until_ready(r.X)
        t_al = time.perf_counter() - t0
        c_al = np.asarray(r.c_max)
        Xs_np, Us_np = np.asarray(r.X), np.asarray(r.U)
        print(f"AL stage: {B} solves in {t_al:.1f}s (incl. compile)  "
              f"c_max med {np.median(c_al):.2e} max {c_al.max():.2e}",
              flush=True)
        if args.al_cache:
            np.savez(args.al_cache, X=Xs_np, U=Us_np, c_max=c_al)
            print(f"AL pool saved to {args.al_cache}", flush=True)
            return

    ftol = 1e-8 if (args.cpu or args.x64) else 1e-6
    pn_opts = PNOptions(feasibility_tolerance=ftol, refine_iters=25)
    prob_pn = prob
    if args.x64 and not args.cpu:
        # AL stage stays f32 (fast path); the PN KKT runs in emulated f64
        prob_pn = probs.quadrotor_maze(dtype=jnp.float64)
    polish = jax.jit(lambda Xs, Us: pn_polish_batch(prob_pn, Xs, Us,
                                                    pn_opts))

    Xs = Xs_np
    Us = Us_np
    viols, c_pn = [], []
    t0 = time.perf_counter()
    pn_dtype = jnp.float64 if (args.cpu or args.x64) else jnp.float32
    for i in range(0, B, args.chunk):
        out = polish(jnp.asarray(Xs[i:i + args.chunk], pn_dtype),
                     jnp.asarray(Us[i:i + args.chunk], pn_dtype))
        jax.block_until_ready(out.X)
        viols.append(np.asarray(out.viol))
        c_pn.append(np.asarray(out.c_max))
    t_pn = time.perf_counter() - t0
    viols = np.concatenate(viols)
    c_pn = np.concatenate(c_pn)
    row = {
        "problem": "quadrotor_maze", "pool": B,
        "backend": str(jax.devices()[0]),
        "dtype": str(np.dtype(Xs.dtype)),
        "al_c_max_med": float(np.median(c_al)),
        "al_c_max_max": float(c_al.max()),
        "pn_c_max_med": float(np.median(c_pn)),
        "pn_c_max_max": float(c_pn.max()),
        "pn_viol_med": float(np.median(viols)),
        "pn_viol_max": float(viols.max()),
        "pn_s_per_solve": round(t_pn / B, 4),
        "pn_solves_per_s": round(B / t_pn, 2),
    }
    print(json.dumps(row), flush=True)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results_tpu_batched.jsonl")
    with open(out_path, "a") as f:
        f.write(json.dumps({"bench": "maze_pn_polish", **row}) + "\n")


if __name__ == "__main__":
    main()
