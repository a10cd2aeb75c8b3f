"""IROS 2019 benchmark reproduction (reference examples/IROS_2019/*.jl).

Runs ALTRO (AL-iLQR + projected Newton) and the native DIRCOL on the paper's
problem set with the paper's solver options, reporting wall time, constraint
violation, and cost — the reference compares ALTRO vs Ipopt vs SNOPT; here
DIRCOL-native plays the interior-point role.

Usage: python examples/iros_2019.py [problem ...]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it explicitly
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import sys
import time

import numpy as np

import trajopt_tpu as tt
from trajopt_tpu.problems import zoo as probs
from trajopt_tpu.solvers import altro as alt
from trajopt_tpu.solvers.dircol import DIRCOLOptions, dircol_solve
from trajopt_tpu.solvers.projected_newton import PNOptions

MAX_VIOL = 1e-8


def run(name):
    import dataclasses

    import jax
    from trajopt_tpu.problems.tuned import tuned_altro_options

    prob = probs.PROBLEMS[name]()
    # the paper's per-problem option blocks (problems/tuned.py, extracted
    # from reference examples/IROS_2019/<name>.jl)
    opts = dataclasses.replace(
        tuned_altro_options(name),
        opts_pn=PNOptions(feasibility_tolerance=MAX_VIOL))

    t0 = time.perf_counter()
    res = alt.altro_solve(prob, opts)
    jax.block_until_ready(res.X)
    t_altro = time.perf_counter() - t0
    print(f"{name:>16} ALTRO : {t_altro:7.2f}s  c_max={float(res.c_max):.2e}"
          f"  J={float(res.J):10.4f}  iters={int(res.iterations_total)}")

    if name not in ("quadrotor_maze", "kuka_obstacles"):  # heavy for dircol
        t0 = time.perf_counter()
        resd = dircol_solve(prob, DIRCOLOptions(feasibility_tolerance=MAX_VIOL))
        jax.block_until_ready(resd.X)
        t_dircol = time.perf_counter() - t0
        print(f"{name:>16} DIRCOL: {t_dircol:7.2f}s  "
              f"defect={float(resd.defect_max):.2e} "
              f"c_max={float(resd.c_max):.2e}  J={float(resd.J):10.4f}")


if __name__ == "__main__":
    names = sys.argv[1:] or ["pendulum", "cartpole", "parallel_park",
                             "car_escape", "quadrotor"]
    for nm in names:
        run(nm)
