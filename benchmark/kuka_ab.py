"""A/B: kuka_obstacles batched ALTRO with fused_al ON vs OFF (TPU).

Round-5 check on the fk_sphere canonical rows (VERDICT r4 item 2): the
first TPU run with the fused path measured 22.5 solves/s vs round 4's
44.9 phase-split — this isolates whether the fused-AL kernels engage and
whether they help or hurt at kuka shapes.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

import trajopt_tpu as tt
from trajopt_tpu.problems import zoo as probs
from trajopt_tpu.problems.tuned import tuned_altro_options
from trajopt_tpu.solvers import altro as alt

BATCH = int(os.environ.get("KUKA_AB_BATCH", "128"))
VARIANTS = os.environ.get("KUKA_AB_VARIANTS", "fused,split").split(",")


def main():
    dtype = jnp.float32
    prob = probs.kuka_obstacles(dtype=dtype)
    base = dataclasses.replace(tuned_altro_options("kuka_obstacles"),
                               projected_newton=False)
    x0s = jnp.broadcast_to(prob.x0, (BATCH,) + prob.x0.shape)

    for variant in VARIANTS:
        fused = variant == "fused"
        topts = dataclasses.replace(
            base, opts_al=dataclasses.replace(
                base.opts_al, opts_uncon=dataclasses.replace(
                    base.opts_al.opts_uncon, fused_al=fused, fused=False)))

        def one(x0, _topts=topts):
            p = tt.update_problem(prob, x0=x0,
                                  X=jnp.asarray(prob.X).at[0].set(x0))
            return alt.altro_solve(p, _topts, infeasible=True,
                                   minimum_time=False)

        fn = jax.jit(jax.vmap(one))
        t0 = time.perf_counter()
        r = fn(x0s)
        jax.block_until_ready(r.X)
        t_compile = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(x0s)
            jax.block_until_ready(r.X)
            times.append(time.perf_counter() - t0)
        dt_b = float(np.median(times))
        print(json.dumps({
            "variant": variant, "batch": BATCH,
            "solves_per_s": round(BATCH / dt_b, 2),
            "reps_s": [round(t, 3) for t in times],
            "first_call_s": round(t_compile, 1),
            "converged_frac": float(np.mean(np.asarray(r.c_max) < 1e-3)),
            "med_c_max": float(np.median(np.asarray(r.c_max))),
        }), flush=True)


if __name__ == "__main__":
    main()
