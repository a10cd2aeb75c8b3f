"""Sweep AL penalty schedule + inner-iteration cap for maze throughput."""
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
from trajopt_tpu.problem import update_problem
from trajopt_tpu.problems import zoo as probs
from trajopt_tpu.solvers.al import al_solve
from trajopt_tpu.solvers.altro import ALTROOptions, _penalty_rows, infeasible_problem
from trajopt_tpu.solvers.ilqr import iLQROptions


def run(tag, mu0_v, scale_v, inner, outer=40, ctol_int=1e-4, ctol=1e-5, seed=0, mu_obs=None):
    dtype = jnp.float32
    prob = probs.quadrotor_maze(dtype=dtype)
    prob_inf = infeasible_problem(prob, 1e-8)
    al_base = tt.ALOptions(penalty_initial=mu0_v, penalty_scaling=scale_v)
    mu0, sca = _penalty_rows(
        prob_inf.constraints,
        ALTROOptions(R_inf=1e-8, opts_al=al_base), dtype)
    if mu_obs is not None:
        r0, r1 = prob_inf.constraints.row_slice("maze")
        mu0 = mu0.at[r0:r1].set(mu_obs)
    B = 128
    rng = np.random.default_rng(seed)
    x0s = jnp.asarray(
        np.tile(np.asarray(prob.x0)[None], (B, 1))
        + np.concatenate([rng.normal(size=(B, 3)) * 0.05,
                          np.zeros((B, 10))], axis=1), dtype)
    opts = tt.ALOptions(iterations=outer,
                        opts_uncon=iLQROptions(iterations=inner),
                        cost_tolerance=ctol, cost_tolerance_intermediate=ctol_int,
                        constraint_tolerance=1e-3,
                        penalty_initial=mu0_v, penalty_scaling=scale_v)

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
    strict = float(jnp.mean((cmax < 1e-3).astype(jnp.float32)))
    itot = np.asarray(r.iterations_total)
    print(f"{tag}: {B/dt:.1f} solves/s conv@1e-2={conv:.3f} @1e-3={strict:.3f}"
          f" med_cmax={float(jnp.median(cmax)):.2e}"
          f" it med/max={np.median(itot):.0f}/{itot.max()}", flush=True)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "round7":
        run("i10 mu_obs5        ", 1.0, 25.0, 10, ctol_int=1e-3, mu_obs=5.0)
        run("i10 s50            ", 1.0, 50.0, 10, ctol_int=1e-3)
        run("i10 ctolint3e-3    ", 1.0, 25.0, 10, ctol_int=3e-3)
    elif len(sys.argv) > 1 and sys.argv[1] == "round6":
        run("s25 i12 seed1      ", 1.0, 25.0, 12, ctol_int=1e-3, seed=1)
        run("s25 i12 seed2      ", 1.0, 25.0, 12, ctol_int=1e-3, seed=2)
        run("s25 i12 seed3      ", 1.0, 25.0, 12, ctol_int=1e-3, seed=3)
    elif len(sys.argv) > 1 and sys.argv[1] == "round5":
        run("s25 i8             ", 1.0, 25.0, 8, ctol_int=1e-3)
        run("s25 i6             ", 1.0, 25.0, 6, ctol_int=1e-3)
        run("s25 i10 seed1      ", 1.0, 25.0, 10, ctol_int=1e-3, seed=1)
        run("s25 i8 seed1       ", 1.0, 25.0, 8, ctol_int=1e-3, seed=1)
        run("s25 i10 seed2      ", 1.0, 25.0, 10, ctol_int=1e-3, seed=2)
    elif len(sys.argv) > 1 and sys.argv[1] == "round4":
        run("s25 i15 (repeat)   ", 1.0, 25.0, 15, ctol_int=1e-3)
        run("s25 i12            ", 1.0, 25.0, 12, ctol_int=1e-3)
        run("s25 i10            ", 1.0, 25.0, 10, ctol_int=1e-3)
        run("s25 i15 seed1      ", 1.0, 25.0, 15, ctol_int=1e-3, seed=1)
    elif len(sys.argv) > 1 and sys.argv[1] == "round3":
        run("s25 i20 ctolint1e-3", 1.0, 25.0, 20, ctol_int=1e-3)
        run("s25 i15 ctolint1e-3", 1.0, 25.0, 15, ctol_int=1e-3)
        run("s40 i25 ctolint1e-3", 1.0, 40.0, 25, ctol_int=1e-3)
        run("s25 i25 o30        ", 1.0, 25.0, 25, outer=30, ctol_int=1e-3)
    elif len(sys.argv) > 1 and sys.argv[1] == "round2":
        run("s25 i30 (bench)    ", 1.0, 25.0, 30)
        run("s25 i30 ctolint1e-3", 1.0, 25.0, 30, ctol_int=1e-3)
        run("s25 i25 ctolint1e-3", 1.0, 25.0, 25, ctol_int=1e-3)
        run("s25 i30 ctol1e-4   ", 1.0, 25.0, 30, ctol_int=1e-3, ctol=1e-4)
    else:
        run("base mu1 s10 i60", 1.0, 10.0, 60)
        run("inner30     ", 1.0, 10.0, 30)
        run("scale25     ", 1.0, 25.0, 60)
        run("mu10        ", 10.0, 10.0, 60)
        run("s25 inner30 ", 1.0, 25.0, 30)
