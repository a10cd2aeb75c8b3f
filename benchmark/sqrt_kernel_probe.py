"""Lockstep kernel-vs-scan probe for the Pallas sqrt BP stall (VERDICT r5 #1).

Round 4 isolated a seed-deterministic failure class to the Pallas sqrt
kernel's compiled arithmetic: on ~6% of maze x0 seeds the kernel path
converges 0% while the TPU-scan sqrt path converges 93.6% and CPU-scan 100%
(BENCH_LOCAL.md round 4).  This harness reruns ONE failing seed (tiled x128
so the batched kernel dispatch engages) under BOTH backward-pass
implementations with an identical Python-level AL/iLQR loop built from the
production pieces (al_cost_fns, _bp_batched_pallas, vmapped
_backward_pass_impl, forward_pass), records per-iteration diagnostics, and
snapshots the per-outer states so the first material divergence can be
cross-evaluated per knot.

Usage:
  python benchmark/sqrt_kernel_probe.py run --path kernel --seed-rank 0
  python benchmark/sqrt_kernel_probe.py run --path scan   --seed-rank 0
  python benchmark/sqrt_kernel_probe.py compare --seed-rank 0
  python benchmark/sqrt_kernel_probe.py cross --seed-rank 0 --outer 5 --inner 0

Snapshots land in /tmp/sqrt_probe/<rank>/<path>/.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if "--cpu" in sys.argv:
    # axon TPU plugin ignores JAX_PLATFORMS (CLAUDE.md) — force explicitly
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

LANES = 128
INNER = 10
OUTER = 40
STEP_LIMIT = 0.0   # iLQROptions.bp_step_limit for the sqrt sweeps
RHO_FLOOR = False  # floor rho at reg_noise_scale(mu) before each sweep


def build_problem(seed_rank: int):
    """Failing-seed maze problem (bench.py pool, round-4 failing subset)."""
    from trajopt_tpu.problems import zoo as probs
    from trajopt_tpu.solvers.altro import (ALTROOptions, _penalty_rows,
                                           infeasible_problem)
    import trajopt_tpu as tt
    from trajopt_tpu.solvers.ilqr import iLQROptions

    dtype = jnp.float32
    prob = probs.quadrotor_maze(dtype=dtype)
    B = 2048
    rng = np.random.default_rng(0)
    x0s = np.tile(np.asarray(prob.x0)[None], (B, 1)) + np.concatenate(
        [rng.normal(size=(B, 3)) * 0.05, np.zeros((B, 10))], 1)
    bad = np.load("/tmp/sqrt_bad_idx.npy")
    x0 = jnp.asarray(x0s[bad[seed_rank]], dtype)

    al_opts = tt.ALOptions(
        iterations=OUTER,
        opts_uncon=iLQROptions(iterations=INNER, bp_type="sqrt",
                               bp_step_limit=STEP_LIMIT),
        cost_tolerance=1e-5, cost_tolerance_intermediate=1e-3,
        constraint_tolerance=1e-3, penalty_initial=1.0, penalty_scaling=25.0)
    altro_opts = ALTROOptions(R_inf=1e-8, opts_al=al_opts)

    prob_t = infeasible_problem(prob, altro_opts.R_inf)
    mu0, sca = _penalty_rows(prob_t.constraints, altro_opts, dtype)

    # infeasible-start control seed (parallel/batch.py lane_U0)
    m = prob.model.m
    dt0 = prob.dt_traj()[0]
    s0 = prob.X[1] - prob.model.step(x0, prob.U[0], dt0)
    U0 = prob_t.U.at[0, m:].set(s0)
    return prob, prob_t, al_opts, mu0, sca, x0, U0


def make_step_fn(prob_t, al_opts, path: str):
    """One iLQR iteration over the (LANES,)-batched state, jitted.

    path='kernel': production Pallas batched BP (_bp_batched_pallas).
    path='scan':   production per-problem scan-sqrt BP, vmapped
                   (_backward_pass_impl) — exactly what _make_bp_dispatch
                   falls back to when the kernel is ineligible.
    """
    from trajopt_tpu.solvers.al import al_cost_fns
    from trajopt_tpu.solvers.ilqr import (_backward_pass_impl,
                                          _bp_batched_pallas,
                                          calculate_gradient, forward_pass)

    opts = al_opts.opts_uncon
    model = prob_t.model
    cs = prob_t.constraints
    obj = prob_t.obj
    dt_traj = prob_t.dt_traj()
    atol = al_opts.active_constraint_tolerance

    def one_iter(X, U, lam, mu, rho, drho, reg_scale):
        def jac_exp(X_, U_, lam_, mu_):
            _, expansion_fn = al_cost_fns(obj, cs, dt_traj, lam_, mu_, atol)
            A, B_ = model.jacobian_traj(X_[:-1], U_, dt_traj)
            return A, B_, expansion_fn(X_, U_)

        A, B_, exp = jax.vmap(jac_exp)(X, U, lam, mu)

        def cost_one(X_, U_, lam_, mu_):
            cfn, _ = al_cost_fns(obj, cs, dt_traj, lam_, mu_, atol)
            return cfn(X_, U_)

        if RHO_FLOOR:
            rho = jnp.maximum(rho, reg_scale)
        U_bp = U if opts.bp_step_limit > 0.0 else None
        if path == "kernel":
            K, d, dV1, dV2, rho_n, drho_n = _bp_batched_pallas(
                A, B_, exp, rho, drho, opts, U=U_bp, reg_scale=reg_scale)
        else:
            K, d, dV1, dV2, rho_n, drho_n = jax.vmap(
                lambda a, b, e, r, dr, rs, u: _backward_pass_impl(
                    a, b, e, r, dr, opts, U=u, reg_scale=rs)
            )(A, B_, exp, rho, drho, reg_scale, U)

        J_prev = jax.vmap(cost_one)(X, U, lam, mu)
        x0b = X[:, 0]

        def fp_one(x0_, X_, U_, K_, d_, v1, v2, Jp, r, dr, lam_, mu_):
            cfn, _ = al_cost_fns(obj, cs, dt_traj, lam_, mu_, atol)
            return forward_pass(model, cfn, x0_, X_, U_, K_, d_, v1, v2,
                                Jp, r, dr, dt_traj, opts)

        Xn, Un, J, rho_n, drho_n, alpha = jax.vmap(fp_one)(
            x0b, X, U, K, d, dV1, dV2, J_prev, rho_n, drho_n, lam, mu)

        grad = jax.vmap(lambda d_, U_: calculate_gradient(
            "todorov", d_, U_, None, None))(d, Un)
        diag = {
            "J": J, "J_prev": J_prev, "alpha": alpha, "rho": rho_n,
            "grad": grad, "d_max": jnp.max(jnp.abs(d), axis=(1, 2)),
            "K_max": jnp.max(jnp.abs(K), axis=(1, 2, 3)),
        }
        return Xn, Un, rho_n, drho_n, K, d, diag

    return jax.jit(one_iter)


def make_outer_fns(prob_t, al_opts):
    from trajopt_tpu.solvers.al import dual_update, penalty_update

    cs = prob_t.constraints

    @jax.jit
    def outer_update(X, U, lam, mu, scaling):
        C = jax.vmap(lambda X_, U_: cs.evaluate(X_, U_))(X, U)
        c_max = jax.vmap(cs.max_violation)(C)
        lam_n = jax.vmap(lambda C_, l_, m_: dual_update(
            cs, C_, l_, m_, al_opts))(C, lam, mu)
        mu_n = jax.vmap(lambda m_: penalty_update(
            cs, m_, scaling[None, :], al_opts))(mu)
        return lam_n, mu_n, c_max

    return outer_update


def run(args):
    from trajopt_tpu.solvers.ilqr import reg_noise_scale

    prob, prob_t, al_opts, mu0, sca, x0, U0 = build_problem(args.seed_rank)
    dtype = jnp.float32
    outdir = f"/tmp/sqrt_probe/{args.seed_rank}/{args.path}"
    os.makedirs(outdir, exist_ok=True)

    step = make_step_fn(prob_t, al_opts, args.path)
    outer_update = make_outer_fns(prob_t, al_opts)

    N, n_t = prob_t.X.shape
    X = jnp.broadcast_to(prob_t.X.at[0].set(x0), (LANES, N, n_t))
    U = jnp.broadcast_to(U0, (LANES,) + U0.shape)
    P = prob_t.constraints.P
    lam = jnp.zeros((LANES, N, P), dtype)
    mu = jnp.broadcast_to(mu0[None] * prob_t.constraints.mask,
                          (LANES, N, P))

    log = []
    for outer in range(OUTER):
        rho = jnp.zeros((LANES,), dtype)
        drho = jnp.ones((LANES,), dtype)
        rs = jax.vmap(lambda m_: reg_noise_scale(m_, dtype))(mu)
        np.savez(f"{outdir}/state_o{outer:02d}.npz",
                 X=np.asarray(X[0]), U=np.asarray(U[0]),
                 lam=np.asarray(lam[0]), mu=np.asarray(mu[0]))
        J_last = None
        for it in range(INNER):
            X, U, rho, drho, K, d, diag = step(X, U, lam, mu, rho, drho, rs)
            row = {k: float(v[0]) for k, v in diag.items()}
            row.update(outer=outer, inner=it)
            # lane-uniformity check: all lanes identical by construction
            row["lane_spread"] = float(jnp.max(jnp.abs(diag["J"] - diag["J"][0])))
            log.append(row)
            dJ = abs(row["J_prev"] - row["J"])
            J_last = row["J"]
            ctol_i = (al_opts.cost_tolerance if outer == OUTER - 1
                      else al_opts.cost_tolerance_intermediate)
            if 0.0 < dJ < ctol_i or row["grad"] < al_opts.gradient_norm_tolerance:
                break
        lam, mu, c_max = outer_update(X, U, lam, mu, sca)
        print(f"[{args.path}] outer {outer:2d}  J {J_last:.6e}  "
              f"c_max {float(c_max[0]):.3e}  inner {it + 1}", flush=True)
        log[-1]["c_max"] = float(c_max[0])
        if float(c_max[0]) < al_opts.constraint_tolerance:
            print(f"[{args.path}] CONVERGED at outer {outer}", flush=True)
            break
    with open(f"{outdir}/log.json", "w") as f:
        json.dump(log, f, indent=1)
    # score on ORIGINAL constraints
    n, m = prob.model.n, prob.model.m
    Xs, Us = X[0][:, :n], U[0][:, :m]
    C = prob.constraints.evaluate(Xs, Us)
    print(f"[{args.path}] final ORIGINAL c_max "
          f"{float(prob.constraints.max_violation(C)):.3e}", flush=True)


def find(args):
    """Regenerate /tmp/sqrt_bad_idx.npy: run the full 2048-x0 pool through
    the SAME lockstep kernel-path loop in 128-lane chunks (fixed schedule —
    no per-lane breaks; converged lanes stay feasible under rising penalty)
    and record the x0 indices whose final ORIGINAL c_max >= 1e-3."""
    from trajopt_tpu.problems import zoo as probs
    from trajopt_tpu.solvers.altro import (ALTROOptions, _penalty_rows,
                                           infeasible_problem)
    import trajopt_tpu as tt
    from trajopt_tpu.solvers.ilqr import iLQROptions, reg_noise_scale

    dtype = jnp.float32
    prob = probs.quadrotor_maze(dtype=dtype)
    B = 2048
    rng = np.random.default_rng(0)
    x0s_np = np.tile(np.asarray(prob.x0)[None], (B, 1)) + np.concatenate(
        [rng.normal(size=(B, 3)) * 0.05, np.zeros((B, 10))], 1)

    al_opts = tt.ALOptions(
        iterations=OUTER,
        opts_uncon=iLQROptions(iterations=INNER, bp_type="sqrt",
                               bp_step_limit=STEP_LIMIT),
        cost_tolerance=1e-5, cost_tolerance_intermediate=1e-3,
        constraint_tolerance=1e-3, penalty_initial=1.0, penalty_scaling=25.0)
    altro_opts = ALTROOptions(R_inf=1e-8, opts_al=al_opts)
    prob_t = infeasible_problem(prob, altro_opts.R_inf)
    mu0, sca = _penalty_rows(prob_t.constraints, altro_opts, dtype)
    m = prob.model.m
    dt0 = prob.dt_traj()[0]

    step = make_step_fn(prob_t, al_opts, args.path)
    outer_update = make_outer_fns(prob_t, al_opts)
    N, n_t = prob_t.X.shape
    P = prob_t.constraints.P

    n, mm = prob.model.n, prob.model.m
    score = jax.jit(jax.vmap(
        lambda X_, U_: prob.constraints.max_violation(
            prob.constraints.evaluate(X_[:, :n], U_[:, :mm]))))

    c_all = np.zeros(B)
    chunks = range(B // LANES) if args.chunk < 0 else [args.chunk]
    for ci in chunks:
        x0 = jnp.asarray(x0s_np[ci * LANES:(ci + 1) * LANES], dtype)
        s0 = jax.vmap(lambda x_: prob.X[1] - prob.model.step(
            x_, prob.U[0], dt0))(x0)
        U = jnp.broadcast_to(prob_t.U, (LANES,) + prob_t.U.shape
                             ).at[:, 0, m:].set(s0)
        X = jax.vmap(lambda x_: prob_t.X.at[0].set(x_))(x0)
        lam = jnp.zeros((LANES, N, P), dtype)
        mu_row = mu0[None] * prob_t.constraints.mask
        if args.mu_scale != 1.0:   # keep the scale-1 jaxpr byte-identical
            mu_row = mu_row * args.mu_scale
        mu = jnp.broadcast_to(mu_row, (LANES, N, P))
        for outer in range(OUTER):
            rho = jnp.zeros((LANES,), dtype)
            drho = jnp.ones((LANES,), dtype)
            rs = jax.vmap(lambda m_: reg_noise_scale(m_, dtype))(mu)
            for it in range(INNER):
                X, U, rho, drho, K, d, diag = step(
                    X, U, lam, mu, rho, drho, rs)
                if args.diag and outer < 2:
                    print(f"  o{outer} i{it} J[med] "
                          f"{float(jnp.median(diag['J'])):.4e} "
                          f"alpha[med] {float(jnp.median(diag['alpha'])):.3f} "
                          f"dmax[med] {float(jnp.median(diag['d_max'])):.3e} "
                          f"rho[med] {float(jnp.median(diag['rho'])):.2e}",
                          flush=True)
            lam, mu, c_max = outer_update(X, U, lam, mu, sca)
            if float(jnp.max(c_max)) < al_opts.constraint_tolerance:
                break
        c_orig = np.asarray(score(X, U))
        c_all[ci * LANES:(ci + 1) * LANES] = c_orig
        nfail = int((c_orig >= 1e-3).sum())
        print(f"[find/{args.path}] chunk {ci:2d}  outers {outer + 1}  "
              f"fail {nfail}/128  med c {np.median(c_orig):.2e}", flush=True)
    bad = np.where(c_all >= 1e-3)[0]
    print(f"[find/{args.path}] TOTAL fail {bad.size}/{B}", flush=True)
    tag = args.path + ("_cpu" if args.cpu else "") + (
        "" if args.mu_scale == 1.0 else f"_mu{args.mu_scale:g}")
    if args.chunk < 0 and tag == "kernel":
        np.save("/tmp/sqrt_bad_idx.npy", bad)
        np.save("/tmp/sqrt_cmax_kernel.npy", c_all)
        print(f"saved /tmp/sqrt_bad_idx.npy ({bad.size} idx)", flush=True)
    else:
        np.save(f"/tmp/sqrt_cmax_{tag}_c{args.chunk}.npy", c_all)


def compare(args):
    for p in ("kernel", "scan"):
        fn = f"/tmp/sqrt_probe/{args.seed_rank}/{p}/log.json"
        with open(fn) as f:
            log = json.load(f)
        print(f"== {p} ==")
        for r in log:
            tail = f"  c_max {r['c_max']:.3e}" if "c_max" in r else ""
            print(f"  o{r['outer']:2d} i{r['inner']}  J {r['J']:.6e}  "
                  f"a {r['alpha']:.4f}  rho {r['rho']:.2e}  "
                  f"dmax {r['d_max']:.3e}{tail}")


def cross(args):
    """Cross-evaluate both sweeps on ONE path's snapshot state: per-knot
    K/d diff between the compiled kernel and the vmapped scan sweep on
    identical (A, B, exp, rho) inputs."""
    from trajopt_tpu.solvers.al import al_cost_fns
    from trajopt_tpu.solvers.ilqr import sqrt_sweep
    from trajopt_tpu.ops.pallas_sqrt import sqrt_sweep_pallas

    prob, prob_t, al_opts, mu0, sca, x0, U0 = build_problem(args.seed_rank)
    src = f"/tmp/sqrt_probe/{args.seed_rank}/{args.src}"
    st = np.load(f"{src}/state_o{args.outer:02d}.npz")
    X = jnp.asarray(st["X"])
    U = jnp.asarray(st["U"])
    lam = jnp.asarray(st["lam"])
    mu = jnp.asarray(st["mu"])
    dt_traj = prob_t.dt_traj()
    cost_fn, expansion_fn = al_cost_fns(
        prob_t.obj, prob_t.constraints, dt_traj, lam, mu,
        al_opts.active_constraint_tolerance)
    A, B_ = prob_t.model.jacobian_traj(X[:-1], U, dt_traj)
    exp = expansion_fn(X, U)
    rho = jnp.asarray(args.rho, jnp.float32)

    tile = lambda a: jnp.broadcast_to(a, (LANES,) + a.shape)
    Kk, dk, v1k, v2k, failk = jax.jit(sqrt_sweep_pallas)(
        tile(A), tile(B_), tile(exp.x), tile(exp.u), tile(exp.xx),
        tile(exp.uu), tile(exp.ux), jnp.full((LANES,), rho))
    Ks, ds, v1s, v2s, fails = jax.jit(sqrt_sweep)(A, B_, exp, rho)
    Kk0, dk0 = np.asarray(Kk[0]), np.asarray(dk[0])
    Ks0, ds0 = np.asarray(Ks), np.asarray(ds)
    rK = np.max(np.abs(Kk0 - Ks0), axis=(1, 2)) / (
        np.max(np.abs(Ks0), axis=(1, 2)) + 1e-12)
    rd = np.max(np.abs(dk0 - ds0), axis=1) / (
        np.max(np.abs(ds0), axis=1) + 1e-12)
    print(f"fail kernel={bool(failk[0])} scan={bool(fails)}  "
          f"dV kernel=({float(v1k[0]):.4e},{float(v2k[0]):.4e}) "
          f"scan=({float(v1s):.4e},{float(v2s):.4e})")
    worst = np.argsort(rd)[::-1][:10]
    print("worst knots by rel d diff:")
    for k in worst:
        print(f"  k={k:3d}  rel_d {rd[k]:.3e}  rel_K {rK[k]:.3e}  "
              f"|d_scan| {np.max(np.abs(ds0[k])):.3e}  "
              f"|d_kern| {np.max(np.abs(dk0[k])):.3e}")
    print(f"median rel_d {np.median(rd):.3e}  median rel_K {np.median(rK):.3e}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["run", "compare", "cross", "find"])
    ap.add_argument("--chunk", type=int, default=-1,
                    help="find mode: single 128-lane chunk (-1 = all)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--diag", action="store_true",
                    help="find mode: print per-iteration lane medians for "
                    "the first two outers")
    ap.add_argument("--mu-scale", type=float, default=1.0,
                    help="find mode: scale mu0 (input-only perturbation — "
                    "no recompile; tests whether the failing set is "
                    "seed-systematic or rounding-chaotic)")
    ap.add_argument("--path", default="kernel", choices=["kernel", "scan"])
    ap.add_argument("--seed-rank", type=int, default=0)
    ap.add_argument("--src", default="kernel", choices=["kernel", "scan"])
    ap.add_argument("--outer", type=int, default=0)
    ap.add_argument("--inner", type=int, default=0)
    ap.add_argument("--rho", type=float, default=0.0)
    args = ap.parse_args()
    if args.mode == "run":
        run(args)
    elif args.mode == "compare":
        compare(args)
    elif args.mode == "find":
        find(args)
    else:
        cross(args)
