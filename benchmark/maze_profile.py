"""Device-side op breakdown of the maze pool round via the JAX profiler.

Captures a trace of a short fused (or phase-split) pool run and prints the
top device ops by total self-time — the only reliable per-kernel meter
through the TPU tunnel (separately-jitted timings carry tens of ms of
host noise; CLAUDE.md).
"""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

import trajopt_tpu as tt
from trajopt_tpu.parallel.batch import solve_batch_queued_altro
from trajopt_tpu.problems import zoo as probs
from trajopt_tpu.solvers.altro import ALTROOptions
from trajopt_tpu.solvers.ilqr import iLQROptions


def main(fused=True, B=256, outdir="/tmp/maze_trace", lanes=128):
    dtype = jnp.float32
    prob = probs.quadrotor_maze(dtype=dtype)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.tile(np.asarray(prob.x0)[None], (B, 1))
        + np.concatenate([rng.normal(size=(B, 3)) * 0.05,
                          np.zeros((B, 10))], axis=1), dtype)
    al = tt.ALOptions(
        iterations=40, opts_uncon=iLQROptions(iterations=10, fused=fused),
        cost_tolerance=1e-5, cost_tolerance_intermediate=1e-3,
        constraint_tolerance=1e-3, penalty_initial=1.0, penalty_scaling=25.0)
    opts = ALTROOptions(R_inf=1e-8, opts_al=al)
    solve = jax.jit(lambda xs: solve_batch_queued_altro(
        prob, opts, xs, lanes=lanes, infeasible=True))
    jax.block_until_ready(solve(x0s).X)          # compile outside the trace

    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        jax.block_until_ready(solve(x0s).X)

    # parse the trace: sum device-side event durations by name
    paths = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found under", outdir)
        return
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # device lanes: pid names containing TPU / device
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dev_pids = {p for p, nm in pid_names.items()
                if "TPU" in nm or "Device" in nm or "/device" in nm.lower()}
    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3      # ms
        agg[name] = agg.get(name, 0.0) + dur
        total += dur
    print(f"device total {total:.1f} ms across {len(agg)} op names "
          f"(pids {sorted(dev_pids)})", flush=True)
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms:9.1f} ms  {100 * ms / max(total, 1e-9):5.1f}%  "
              f"{name[:110]}")

    # glue-vs-kernel classification (VERDICT r4 item 5): attribute the
    # queued driver's per-round compaction scatter/gather + lane
    # bookkeeping as its own line item next to the Pallas kernels
    def _bucket(name):
        nl = name.lower()
        if "pallas" in nl or "custom-call" in nl or "tpu_custom_call" in nl:
            return "pallas_kernel"
        if ("scatter" in nl or "gather" in nl or "dynamic-update" in nl
                or "dynamic_update" in nl or "dynamic-slice" in nl
                or "cumsum" in nl or "sort" in nl or "iota" in nl):
            return "compaction_glue"
        if "copy" in nl or "bitcast" in nl or "transpose" in nl:
            return "layout"
        return "xla_other"
    buckets = collections.Counter()
    for name, ms in agg.items():
        buckets[_bucket(name)] += ms
    print("-- buckets --", flush=True)
    for bname, ms in buckets.most_common():
        print(f"{ms:9.1f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {bname}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--phase-split", action="store_true")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lanes", type=int, default=128)
    args = ap.parse_args()
    main(fused=not args.phase_split, B=args.batch, lanes=args.lanes)
