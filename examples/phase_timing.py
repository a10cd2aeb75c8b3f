"""Per-phase solve timing — the reference's stats[:timer] tables.

Reproduces the reference's TimerOutputs phase attribution (reference
ilqr_methods.jl:49-52 wraps jacobians / cost expansion / backward pass /
forward pass in @timeit spans; dumped tables are checked into
examples/quadrotor/ilqr_times.txt and altro_times.txt) on TPU/CPU via
``timed_solve(..., phases=True)``: each phase is jitted as its own program,
spans are synced with block_until_ready, and the fixed per-dispatch launch
latency (~0.8 ms through the remote TPU tunnel) is measured and subtracted.

Run:  python examples/phase_timing.py          # quadrotor on default device
      python examples/phase_timing.py --cpu    # force CPU (x64)

Note: phase mode trades throughput for attribution — the production path is
the fully fused single-program solve (see docs/performance.md); this table
tells you where that program's time would go.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true", help="force CPU x64")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

import trajopt_tpu as tt  # noqa: E402
from trajopt_tpu.models import zoo  # noqa: E402
from trajopt_tpu.utils.timing import timed_solve  # noqa: E402


def main():
    # the reference's table problem: unconstrained quadrotor iLQR
    # (examples/quadrotor/ilqr_times.txt: N=101, 24 iterations)
    n, m, N = 13, 4, 101
    model_d = tt.discretize(zoo.quadrotor, "rk3")
    x0 = np.zeros(n); x0[3] = 1.0
    xf = np.zeros(n); xf[1] = 20.0; xf[2] = 10.0; xf[3] = 1.0
    Q = np.eye(n) * 1e-3
    R = np.eye(m) * 1e-4
    Qf = np.eye(n) * 1000.0
    obj = tt.LQRObjective(Q, R, Qf, xf, N)
    U0 = np.full((N - 1, m), 0.5 * 9.81 / 4.0 * 2.0)
    prob = tt.problem(model_d, obj, x0=x0, xf=xf, N=N, tf=5.0, U0=U0)

    print(f"device: {jax.default_backend()}")
    res = timed_solve(prob, tt.iLQROptions(iterations=50), phases=True)
    err = float(np.linalg.norm(np.asarray(res.X)[-1, :3] - xf[:3]))
    print(f"\nquadrotor iLQR: {res.iterations} iterations, "
          f"J={res.J:.4f}, final position error {err * 1e3:.2f} mm")
    print(res.report())

    # constrained AL table (reference altro_times.txt layout)
    cons = tt.ConstraintSetBuilder(N)
    cons.add(tt.bound_constraint(n, m, u_min=0.0, u_max=12.0))
    cons.add(tt.goal_constraint(xf))
    prob_c = tt.problem(model_d, obj, constraints=cons, x0=x0, xf=xf,
                        N=N, tf=5.0, U0=U0)
    res_c = timed_solve(prob_c, tt.ALOptions(), phases=True)
    print(f"\nquadrotor AL: {res_c.iterations} outer / "
          f"{res_c.iterations_total} iLQR iterations, "
          f"c_max={res_c.c_max:.2e}")
    print(res_c.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
