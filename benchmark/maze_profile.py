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
    # EXCLUSIVE-time accounting on the "XLA Ops" lane: device spans are
    # hierarchical (jit_fn > while > body > leaf ops), so flat summing
    # double-counts parents and hides everything executed inside loop
    # bodies. Stack-based self-time = span − direct children.
    ev = [e for e in events if e.get("ph") == "X"
          and e.get("pid") in dev_pids]
    ev.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
    self_t = collections.Counter()
    n_ex = collections.Counter()
    stack = []
    for e in ev:
        ts, dur, name = e["ts"], e.get("dur", 0), e.get("name", "?")
        while stack and ts >= stack[-1][0] + stack[-1][1]:
            stack.pop()
        if stack:
            self_t[stack[-1][2]] -= dur
        self_t[name] += dur
        n_ex[name] += 1
        stack.append((ts, dur, name))
    total = sum(self_t.values()) / 1e3
    print(f"device exclusive total {total:.1f} ms across {len(self_t)} "
          f"op names (pids {sorted(dev_pids)})", flush=True)
    for name, us in self_t.most_common(25):
        ms = us / 1e3
        print(f"{ms:9.1f} ms x{n_ex[name]:7d}  "
              f"{100 * ms / max(total, 1e-9):5.1f}%  {name[:100]}")

    # glue-vs-kernel classification (VERDICT r4 item 5): loop bodies with
    # untraced interiors (the Pallas kernel programs + retry/linesearch
    # whiles) vs the inter-kernel layout ops (lane reshapes/copies) vs
    # compaction scatter/gather.
    def _bucket(name):
        nl = name.lower()
        if nl.startswith("body") or nl.startswith("while") \
                or "custom-call" in nl or "pallas" in nl:
            return "kernel+loop_bodies"
        if ("scatter" in nl or "gather" in nl or "dynamic-update" in nl
                or "dynamic_update" in nl or "dynamic-slice" in nl
                or "cumsum" in nl or "sort" in nl or "iota" in nl):
            return "compaction_glue"
        if ("copy" in nl or "bitcast" in nl or "transpose" in nl
                or "reshape" in nl or "broadcast" in nl):
            return "layout_glue"
        return "xla_other"
    buckets = collections.Counter()
    for name, us in self_t.items():
        buckets[_bucket(name)] += us / 1e3
    print("-- buckets (exclusive) --", flush=True)
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
