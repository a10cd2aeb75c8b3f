"""Device-side op breakdown of the batched kuka_obstacles ALTRO AL stage.

Same trace-parsing approach as benchmark/maze_profile.py — decide where
kuka's 24 solves/s actually goes (VERDICT r4 item 4 suggested a
lane-batched Featherstone rollout; measure before building)."""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import dataclasses

import jax.numpy as jnp
import numpy as np

import trajopt_tpu as tt
import trajopt_tpu.solvers.altro as alt
from trajopt_tpu.problems import zoo as probs
from trajopt_tpu.problems.tuned import tuned_altro_options


def main(B=128, outdir="/tmp/kuka_trace"):
    dtype = jnp.float32
    prob = probs.kuka_obstacles(dtype=dtype)
    topts = dataclasses.replace(tuned_altro_options("kuka_obstacles"),
                                projected_newton=False)
    x0s = jnp.broadcast_to(prob.x0, (B,) + prob.x0.shape)

    def one(x0):
        p = tt.update_problem(prob, x0=x0,
                              X=jnp.asarray(prob.X).at[0].set(x0))
        return alt.altro_solve(p, topts, infeasible=True, minimum_time=False)

    fn = jax.jit(jax.vmap(one))
    jax.block_until_ready(fn(x0s).X)
    t0 = time.perf_counter()
    r = fn(x0s)
    jax.block_until_ready(r.X)
    wall = time.perf_counter() - t0
    print(f"wall {wall:.2f}s = {B / wall:.2f} solves/s  "
          f"conv {float(jnp.mean((r.c_max < 1e-2).astype(jnp.float32))):.3f}",
          flush=True)

    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        jax.block_until_ready(fn(x0s).X)
    paths = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    ev = [e for e in tr["traceEvents"] if e.get("ph") == "X"
          and e.get("pid") == 3 and e.get("tid") == 3]
    agg = collections.Counter()
    n = collections.Counter()
    for e in ev:
        agg[e["name"]] += e.get("dur", 0) / 1e3
        n[e["name"]] += 1
    for name, ms in agg.most_common(20):
        print(f"{ms:9.1f} ms x{n[name]:7d} avg {ms / n[name]:8.4f}  "
              f"{name[:90]}", flush=True)


if __name__ == "__main__":
    main()
