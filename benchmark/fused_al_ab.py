"""A/B: AL-aware fused iteration kernels vs the phase-split AL path.

The maze headline (bench.py bench_maze) runs the infeasible-start AL stage
of ALTRO through the queued pool driver. Phase-split per iLQR iteration:
XLA jacfwd + AL cost expansion (structured hooks) + Riccati kernel +
rollout kernel + AL cost per line-search candidate — 5 HBM round-trips and
~0.8 ms dispatch each. The fused path (ops/pallas_al_fused.py) runs the
whole iteration as TWO Pallas programs with the canonical constraint stack
(ops/canonical.py) evaluated in-VMEM. Same algorithm, same accept rules.

Modes:
  --mode pool   : full bench.py maze schedule through solve_batch_queued_altro
  --mode vmap   : one capped AL solve, plain vmap (isolates the kernels)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/trajopt_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import dataclasses

import trajopt_tpu as tt
from trajopt_tpu.problems import zoo as probs
from trajopt_tpu.solvers.altro import ALTROOptions
from trajopt_tpu.solvers.ilqr import iLQROptions


def _x0s(prob, B, dtype):
    rng = np.random.default_rng(0)
    return jnp.asarray(
        np.tile(np.asarray(prob.x0)[None], (B, 1))
        + np.concatenate([rng.normal(size=(B, 3)) * 0.05,
                          np.zeros((B, 10))], axis=1), dtype)


def _al_sched(fused: bool):
    return tt.ALOptions(
        iterations=40,
        opts_uncon=iLQROptions(iterations=10, fused=fused),
        cost_tolerance=1e-5, cost_tolerance_intermediate=1e-3,
        constraint_tolerance=1e-3,
        penalty_initial=1.0, penalty_scaling=25.0)


def run_pool(B=2048, lanes=128, fused=False, tag=""):
    from trajopt_tpu.parallel.batch import solve_batch_queued_altro

    dtype = jnp.float32
    prob = probs.quadrotor_maze(dtype=dtype)
    x0s = _x0s(prob, B, dtype)
    opts = ALTROOptions(R_inf=1e-8, opts_al=_al_sched(fused))
    solve = jax.jit(lambda xs: solve_batch_queued_altro(
        prob, opts, xs, lanes=lanes, infeasible=True))
    t0 = time.perf_counter()
    r = solve(x0s)
    jax.block_until_ready(r.X)
    t_compile = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = solve(x0s)
        jax.block_until_ready(r.X)
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[1]
    conv = float(jnp.mean((r.c_max < 1e-2).astype(jnp.float32)))
    print(f"{tag}: {B / dt:8.1f} solves/s  conv {conv:.4f}  "
          f"med c_max {float(jnp.median(r.c_max)):.2e}  "
          f"rounds {int(r.rounds)}  "
          f"(compile {t_compile:.1f}s, reps {[round(t, 2) for t in ts]})",
          flush=True)
    return B / dt


def run_vmap(B=128, fused=False, tag="", outer=6, inner=10):
    from trajopt_tpu.parallel.batch import solve_batch_queued_altro

    # vmap-free isolation is awkward (ALTRO transform is per-problem);
    # use the queued driver with pool == lanes so no refill happens
    return run_pool(B=B, lanes=B, fused=fused, tag=tag)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="pool", choices=["pool", "vmap"])
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--lanes", type=int, default=128)
    ap.add_argument("--fused-only", action="store_true")
    args = ap.parse_args()
    if args.mode == "pool":
        if args.fused_only:
            run_pool(args.batch, args.lanes, fused=True, tag="fused-AL   ")
            return
        r0 = run_pool(args.batch, args.lanes, fused=False, tag="phase-split")
        r1 = run_pool(args.batch, args.lanes, fused=True, tag="fused-AL   ")
    else:
        r0 = run_vmap(args.batch, fused=False, tag="phase-split")
        r1 = run_vmap(args.batch, fused=True, tag="fused-AL   ")
    print(f"speedup: {r1 / r0:.2f}x", flush=True)


if __name__ == "__main__":
    main()
