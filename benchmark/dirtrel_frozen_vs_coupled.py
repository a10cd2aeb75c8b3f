"""DIRTREL frozen-per-outer vs fully-coupled δ(Z) quantification.

VERDICT r4 item 9: the rebuild freezes the robust-constraint vertex
offsets (columns of sqrtm(E), sqrtm(K E Kᵀ)) per outer AL iteration —
differentiating through δ(Z) breaks the block-tridiagonal inner Newton
(measured stall, solvers/dirtrel.py vertex_con_values docstring) — while
the reference (dirtrel.jl:310-420) differentiates through δ and hands the
NLP to Ipopt's quasi-Newton. This experiment quantifies what the freeze
costs on a small robust pendulum (f64, CPU): a dense BFGS inner solver CAN
afford the coupled gradient at N=11, so both variants run the same
per-vertex AL formulation to convergence and we compare the robust cost,
nominal cost, bound backoff, and vertex-row feasibility at each solution.

Run: python benchmark/dirtrel_frozen_vs_coupled.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import trajopt_tpu as tt
from trajopt_tpu.models import zoo
from trajopt_tpu.models.base import DiscreteModel
from trajopt_tpu.solvers.dircol import hs_cost, hs_defects
from trajopt_tpu.solvers.dirtrel import (
    DIRTRELOptions, RobustSpec, _discretize_uncertain, dirtrel_solve,
    psd_sqrt, robust_cost,
)

N = 11
n, m = 2, 1
nm = n + m
DT = 0.45  # same 4.5 s horizon as the N=31/dt=0.15 test problem


def make_problem():
    model_c = zoo.pendulum_uncertain
    model_d = tt.discretize(zoo.pendulum, "rk3")
    dmodel = DiscreteModel(model_d.step, 2, 1, model=model_c,
                          integrator="rk3", name="pendulum_unc")
    xf = np.array([np.pi, 0.0])
    obj = tt.LQRObjective(np.eye(n) * 1e-3, np.eye(m) * 1e-3,
                          np.eye(n) * 1e-3, xf, N)
    cons = tt.ConstraintSetBuilder(N)
    cons.add(tt.bound_constraint(n, m, u_min=-3.0, u_max=3.0))
    cons.add(tt.goal_constraint(xf))
    return tt.problem(dmodel, obj, constraints=cons, x0=np.zeros(n), xf=xf,
                      N=N, dt=DT, U0=np.ones((N - 1, m)))


def spec():
    return RobustSpec(
        E1=jnp.eye(2) * 1e-6, D=jnp.eye(1) * 4e-2,
        Q_lqr=jnp.eye(2) * 10.0, R_lqr=jnp.eye(1), Qf_lqr=jnp.eye(2) * 100.0,
        Q_r=jnp.eye(2), R_r=jnp.eye(1), Qf_r=jnp.eye(2))


def coupled_solve(prob, sp, opts: DIRTRELOptions):
    """Per-vertex AL DIRTREL with δ(Z) INSIDE the inner minimization
    (reference dirtrel.jl coupling), dense BFGS inner solver."""
    cmodel = prob.model.model
    f = cmodel.dynamics
    f_nom = lambda x, u: f(x, u, jnp.zeros((cmodel.r,), x.dtype))
    step_w = _discretize_uncertain(f)
    cs = prob.constraints
    dt = jnp.asarray(prob.dt)
    P = cs.P
    V = 1 + 2 * n + 2 * m
    ineq = ~np.asarray(jax.device_get(cs.is_eq))
    vmask_np = np.zeros((V, 1, P), bool)
    vmask_np[0] = True
    # bound rows depend on their own column; goal rows are equalities.
    # Mirror dirtrel_solve._row_deps via the canonical descriptors.
    from trajopt_tpu.ops.canonical import constraint_canon

    depx = np.ones((P,), bool)
    depu = np.ones((P,), bool)
    for con, (r0, r1) in zip(cs.cons, cs.slices):
        c = constraint_canon(con, n, m)
        if c is None:
            continue
        if c[0] == "sphere":
            depx[r0:r1] = True
            depu[r0:r1] = False
        else:
            for i, (col, _sign) in enumerate(c[1]):
                depx[r0 + i] = col < n
                depu[r0 + i] = col >= n
    for v in range(1, 1 + 2 * n):
        vmask_np[v, 0] = ineq & depx
    for v in range(1 + 2 * n, V):
        vmask_np[v, 0] = ineq & depu
    vmask = jnp.asarray(vmask_np) & cs.mask[None]

    def split(Z):
        return Z[:, :n], Z[:, n:]

    def eq_residuals(Z):
        X, UN = split(Z)
        g = hs_defects(f_nom, X, UN, dt)
        return jnp.concatenate([(X[0] - prob.x0)[None], g], axis=0)

    def deltas(Z):
        X, UN = split(Z)
        _, (E, K) = robust_cost(step_w, X, UN, dt, sp)
        dX = psd_sqrt(E, opts.eig_pad)
        KEK = jnp.einsum("kin,knl,kjl->kij", K, E[:-1], K)
        dU = psd_sqrt(KEK, opts.eig_pad)
        return dX, dU

    def vertex_con_values(Z, dX, dU):
        X, UN = split(Z)
        U_s = UN[:-1]
        C_nom = cs.evaluate(X, U_s)
        dXv = jnp.concatenate(
            [jnp.moveaxis(dX, 2, 0), -jnp.moveaxis(dX, 2, 0)], axis=0)
        dUv = jnp.concatenate(
            [jnp.moveaxis(dU, 2, 0), -jnp.moveaxis(dU, 2, 0)], axis=0)
        Cx = jax.vmap(lambda d: cs.evaluate(X + d, U_s))(dXv)
        Cu = jax.vmap(lambda d: cs.evaluate(X, U_s + d))(dUv)
        return jnp.concatenate([C_nom[None], Cx, Cu], axis=0)

    def al_value(Zf, lam_d, mu_d, lam_c, mu_c):
        Z = Zf.reshape(N, nm)
        X, UN = split(Z)
        J = hs_cost(prob.obj, f_nom, X, UN, dt)
        lE, _ = robust_cost(step_w, X, UN, dt, sp)
        gd = eq_residuals(Z)
        Jd = jnp.sum(lam_d * gd + 0.5 * mu_d * gd * gd)
        dX, dU = deltas(Z)                       # ← the coupling: AD flows
        C = vertex_con_values(Z, dX, dU)         #   through δ(Z)
        a = ((C >= 0.0) | (lam_c > 0))
        a = a.at[0].set(a[0] | cs.is_eq[None, :]) & vmask
        Imu = jnp.where(a, mu_c, 0.0)
        Jc = jnp.sum(lam_c * C + 0.5 * C * Imu * C)
        return J + lE + Jd + Jc

    X0 = (jnp.linspace(0, 1, N)[:, None] * (prob.xf - prob.x0)[None]
          + prob.x0[None])
    U0 = jnp.concatenate([prob.U, prob.U[-1:]], axis=0)
    Z = jnp.concatenate([X0, U0], axis=1).reshape(-1)
    lam_d = jnp.zeros((N, n))
    mu_d = jnp.full((N, n), opts.penalty_initial)
    lam_c = jnp.zeros((V, N, P))
    mu_c = jnp.full((V, N, P), opts.penalty_initial) * vmask

    from jax.scipy.optimize import minimize

    # BFGS (no block structure to lose) tolerates the coupled gradient but
    # breaks down once penalties pass ~1e4 (status 3 line-search failures,
    # viol exploding) — cap the schedule and keep the best-viol iterate,
    # which is the honest comparison point for the coupled formulation.
    best = (float("inf"), Z)
    pen_cap = 1e5
    for it in range(opts.iterations_outer):
        res = minimize(al_value, Z, args=(lam_d, mu_d, lam_c, mu_c),
                       method="BFGS", options={"maxiter": 600})
        Z = res.x
        Zm = Z.reshape(N, nm)
        gd = eq_residuals(Zm)
        dX, dU = deltas(Zm)
        C = vertex_con_values(Zm, dX, dU)
        eq0 = jnp.zeros((V, 1, P), bool).at[0, 0].set(cs.is_eq)
        vv = jnp.where(eq0, jnp.abs(C), jnp.maximum(C, 0.0))
        viol = max(float(jnp.max(jnp.abs(gd))),
                   float(jnp.max(jnp.where(vmask, vv, 0.0))))
        print(f"  coupled outer {it:2d}: viol {viol:.3e}  "
              f"inner status {int(res.status)}", flush=True)
        if np.isfinite(viol) and viol < best[0]:
            best = (viol, Z)
        if viol < opts.feasibility_tolerance:
            break
        if not np.isfinite(viol) or viol > 10.0 * best[0] + 1.0:
            print("  coupled: inner diverged — stopping at best iterate",
                  flush=True)
            break
        lam_d = lam_d + mu_d * gd
        mu_d = jnp.minimum(mu_d * opts.penalty_scaling, pen_cap)
        lam_c = jnp.where(vmask, lam_c + mu_c * C, 0.0)
        lam_c = jnp.where(eq0, lam_c, jnp.maximum(lam_c, 0.0))
        mu_c = jnp.minimum(mu_c * opts.penalty_scaling, pen_cap) * vmask
    print(f"  coupled: best viol {best[0]:.3e}", flush=True)
    return (best[1].reshape(N, nm), vmask, vertex_con_values, deltas,
            eq_residuals)


def metrics(tag, X, UN, prob, sp, vmask, vcv, deltas_fn, eqres):
    step_w = _discretize_uncertain(prob.model.model.dynamics)
    f = prob.model.model.dynamics
    f_nom = lambda x, u: f(x, u, jnp.zeros((1,), x.dtype))
    dt = jnp.asarray(prob.dt)
    lE, _ = robust_cost(step_w, X, UN, dt, sp)
    Jnom = hs_cost(prob.obj, f_nom, X, UN, dt)
    Z = jnp.concatenate([X, UN], axis=1)
    dX, dU = deltas_fn(Z)
    C = vcv(Z, dX, dU)
    eq0 = jnp.zeros(C.shape, bool).at[0].set(
        jnp.broadcast_to(prob.constraints.is_eq[None, :], C.shape[1:]))
    vv = jnp.where(eq0, jnp.abs(C), jnp.maximum(C, 0.0))
    viol = float(jnp.max(jnp.where(vmask, vv, 0.0)))
    gd = float(jnp.max(jnp.abs(eqres(Z))))
    row = {
        "variant": tag,
        "robust_cost": round(float(lE), 6),
        "nominal_cost": round(float(Jnom), 6),
        "merit": round(float(lE + Jnom), 6),
        "u_max_abs": round(float(jnp.max(jnp.abs(UN[:-1]))), 4),
        "bound_backoff": round(3.0 - float(jnp.max(jnp.abs(UN[:-1]))), 4),
        "vertex_viol_max": viol,
        "defect_max": gd,
        "goal_err": round(float(jnp.linalg.norm(
            X[-1] - jnp.asarray([np.pi, 0.0]))), 8),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    prob = make_problem()
    sp = spec()
    opts = DIRTRELOptions()

    print("== coupled (δ(Z) differentiated, dense BFGS inner) ==", flush=True)
    Zc, vmask, vcv, deltas_fn, eqres = coupled_solve(prob, sp, opts)
    row_c = metrics("coupled", Zc[:, :n], Zc[:, n:], prob, sp, vmask, vcv,
                    deltas_fn, eqres)

    print("== frozen-per-outer (shipping dirtrel_solve) ==", flush=True)
    res = dirtrel_solve(prob, sp, opts)
    UNf = jnp.concatenate([res.U_knots[:, :],], axis=0) \
        if res.U_knots.shape[0] == N else res.U_knots
    row_f = metrics("frozen", res.X, UNf, prob, sp, vmask, vcv,
                    deltas_fn, eqres)

    print(json.dumps({
        "bench": "dirtrel_frozen_vs_coupled", "N": N,
        "robust_cost_ratio_frozen_over_coupled": round(
            row_f["robust_cost"] / max(row_c["robust_cost"], 1e-12), 4),
        "merit_ratio": round(row_f["merit"] / max(row_c["merit"], 1e-12), 4),
        "backoff_delta": round(
            row_f["bound_backoff"] - row_c["bound_backoff"], 4),
    }), flush=True)


if __name__ == "__main__":
    main()
