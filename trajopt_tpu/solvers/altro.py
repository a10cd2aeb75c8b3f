"""ALTRO meta-solver.

TPU-native counterpart of reference src/solvers/altro/. ALTRO = problem
transforms (infeasible start, minimum time) + AL-iLQR primary solve +
optional projected-Newton polish + result post-processing
(reference altro_methods.jl:2-124).

The transforms change array shapes (slack controls, τ=√dt augmentation), so
they run at problem-build time in Python (static reshaping, SURVEY.md §7
"hard parts"); each resulting solve stage is a single jit-compiled program.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.models.base import DiscreteModel
from trajopt_tpu.ops.cost import (
    Expansion, Objective, total_cost, cost_expansion,
)
from trajopt_tpu.ops.constraints import (
    Constraint, ConstraintSet, bound_constraint, infeasible_constraint,
)
from trajopt_tpu.ops.rollout import rollout
from trajopt_tpu.problem import Problem, update_problem
from trajopt_tpu.solvers.al import ALOptions, al_solve
from trajopt_tpu.solvers.ilqr import iLQROptions, tvlqr_projection
from trajopt_tpu.solvers.projected_newton import PNOptions, pn_solve
from trajopt_tpu.utils.tree import pytree_dataclass, static_dataclass, static_field


@static_dataclass
class ALTROOptions:
    """(reference ALTROSolverOptions, altro_solver.jl:6-65). Same defaults."""

    opts_al: ALOptions = ALOptions()
    # infeasible start
    constraint_tolerance_infeasible: float = 1e-5
    R_inf: float = 1.0
    dynamically_feasible_projection: bool = True
    resolve_feasible_problem: bool = True
    penalty_initial_infeasible: float = 1.0
    penalty_scaling_infeasible: float = 10.0
    # minimum time
    R_minimum_time: float = 1.0
    dt_max: float = 1.0
    dt_min: float = 1e-3
    penalty_initial_minimum_time_inequality: float = 1.0
    penalty_initial_minimum_time_equality: float = 1.0
    penalty_scaling_minimum_time_inequality: float = 1.0
    penalty_scaling_minimum_time_equality: float = 1.0
    # projected newton
    projected_newton: bool = False
    opts_pn: PNOptions = None
    projected_newton_tolerance: float = 1e-3


class ALTROResult(NamedTuple):
    X: jnp.ndarray
    U: jnp.ndarray
    J: jnp.ndarray
    c_max: jnp.ndarray
    iterations: jnp.ndarray
    iterations_total: jnp.ndarray
    gradient: jnp.ndarray
    dt_traj: jnp.ndarray  # per-interval dt (min-time solves return the found dts)
    tt: jnp.ndarray       # total trajectory time


# ------------------------------------------------------------ constraint lift

def lift_constraint(con: Constraint, n: int, m: int) -> Constraint:
    """Re-target a constraint built for (n, m) onto an augmented problem with
    extra trailing state/control dims (reference
    update_constraint_set_jacobians, constraint_sets.jl:286-302)."""

    def fn(x, u):
        return con.fn(x[:n], u[:m])

    lifted = Constraint(fn, con.p, con.label, con.equality, con.applies, None)
    if con.jac_fn is not None:
        def jac(x, u):
            cx, cu = con.jac_fn(x[:n], u[:m])
            cx_full = jnp.zeros((con.p, x.shape[0]), dtype=x.dtype).at[:, :n].set(cx)
            cu_full = jnp.zeros((con.p, u.shape[0]), dtype=x.dtype).at[:, :m].set(cu)
            return cx_full, cu_full

        lifted.jac_fn = jac
    tr = getattr(con, "term_rows", None)
    if tr is not None:
        lifted.term_rows = tr
    # canonical row descriptors are dimension-relative (x coords and u
    # indices are unchanged by trailing augmentation) — copy verbatim
    canon = getattr(con, "canon", None)
    if canon is not None:
        lifted.canon = canon
    hook = getattr(con, "al_terms", None)
    if hook is not None:
        # structured AL contributions (ConstraintSet.al_expansion_terms):
        # compute on the original dims, zero-pad into the augmented ones
        def al_terms(X, U_pad, g, imu, _hook=hook):
            t = _hook(X[:, :n], U_pad[:, :m], g, imu)
            N_ = X.shape[0]
            nb, mb = X.shape[1], U_pad.shape[1]
            dtype = X.dtype
            out = {}
            if "x" in t:
                out["x"] = jnp.zeros((N_, nb), dtype).at[:, :n].set(t["x"])
            if "u" in t:
                out["u"] = jnp.zeros((N_, mb), dtype).at[:, :m].set(t["u"])
            if "xx" in t:
                out["xx"] = jnp.zeros((N_, nb, nb), dtype).at[:, :n, :n].set(t["xx"])
            if "uu" in t:
                out["uu"] = jnp.zeros((N_, mb, mb), dtype).at[:, :m, :m].set(t["uu"])
            if "ux" in t:
                out["ux"] = jnp.zeros((N_, mb, nb), dtype).at[:, :m, :n].set(t["ux"])
            return out

        lifted.al_terms = al_terms
    return lifted


def _lift_entries(cs: ConstraintSet, n: int, m: int):
    """Lift every constraint of a stacked set onto augmented dims, keeping
    the original knot masks."""
    entries = []
    # device_get the WHOLE mask before slicing: cs.mask is a concrete
    # closure constant even under jit/vmap, but jnp-indexing it inside a
    # trace would produce a tracer and break the static rebuild (the
    # batched-ALTRO path hits exactly this)
    mask_np = np.asarray(jax.device_get(cs.mask))
    for con, (r0, r1) in zip(cs.cons, cs.slices):
        # reconstruct per-knot mask from any row of the block (rows share knots
        # except bound u-rows at terminal, which term_rows re-handles)
        kmask = mask_np[:, r0:r1].any(axis=1)
        entries.append((lift_constraint(con, n, m), kmask))
    return entries


# ---------------------------------------------------------- infeasible start

def infeasible_problem(prob: Problem, R_inf: float = 1.0) -> Problem:
    """Augment with n slack controls making the dynamics artificially fully
    actuated (reference infeasible_problem, infeasible.jl:2-34 +
    add_slack_controls, model.jl:761-779)."""
    base = prob.model
    n, m, N = base.n, base.m, prob.N
    dtype = prob.U.dtype

    def step(x, u, dt):
        return base.step(x, u[:m], dt) + u[m:]

    model_inf = DiscreteModel(step, n, m + n, model=base.model,
                              integrator=base.integrator,
                              name=base.name + "_infeasible")
    # the quaternion block lives on the DISCRETE model the solver reads;
    # copy it like the lane attrs (slack controls don't change the state)
    model_inf.quat_slice = getattr(base, "quat_slice", None)
    base_lanes = getattr(base, "step_lanes", None)
    if base_lanes is not None:
        # lane-batched step for the slack-augmented model (batch-last
        # layout: u is (m+n, B)) — keeps the Pallas forward pass active
        # through the infeasible-start transform
        model_inf.step_lanes = lambda x, u, dt: base_lanes(x, u[:m], dt) + u[m:]
        # fused-AL jacobian shortcut: the slack columns are exactly I, so
        # the in-kernel linearization only needs the base step (see
        # ops/pallas_al_fused._step_jac_cols)
        model_inf.base_step_lanes = base_lanes
        model_inf.slack_m = m
        if getattr(base, "state_diff_lanes", None) is not None:
            model_inf.state_diff_lanes = base.state_diff_lanes

    # structured Jacobian: the n slack controls enter linearly with an
    # identity block, so differentiate only the base step (n+m tangents
    # instead of 2n+m — the slack columns are exactly I)
    base_jac = base._jac

    def jac_inf(x, u, dt):
        A, Bm = base_jac(x, u[:m], dt)
        return A, jnp.concatenate(
            [Bm, jnp.eye(n, dtype=Bm.dtype)], axis=1)

    model_inf._jac = jac_inf

    # objective: R ← blkdiag(R, R_inf/dt · I)  (infeasible.jl:8-15)
    obj = prob.obj
    dt0 = float(jax.device_get(prob.dt))
    Rpad = jnp.zeros((N, m + n, m + n), dtype)
    Rpad = Rpad.at[:, :m, :m].set(obj.R)
    eye_block = (R_inf / dt0) * jnp.eye(n, dtype=dtype)
    Rpad = Rpad.at[:-1, m:, m:].set(jnp.broadcast_to(eye_block, (N - 1, n, n)))
    Hpad = jnp.zeros((N, m + n, n), dtype).at[:, :m, :].set(obj.H)
    rpad = jnp.zeros((N, m + n), dtype).at[:, :m].set(obj.r)
    obj_inf = Objective(Q=obj.Q, R=Rpad, H=Hpad, q=obj.q, r=rpad, c=obj.c)

    # constraints: lifted originals + u_inf = 0 equality (infeasible.jl:17-29)
    entries = _lift_entries(prob.constraints, n, m)
    kmask = np.zeros(N, bool)
    kmask[: N - 1] = True
    entries.append((infeasible_constraint(n, m), kmask))
    cs_inf = ConstraintSet.build(entries, N)

    # slack seeding from state-trajectory defects (infeasible.jl:62-80)
    X_ref = prob.X
    Xc = jnp.concatenate([prob.x0[None], X_ref[1:-1]], axis=0)
    dt_traj = prob.dt_traj()
    f_next = jax.vmap(base.step)(Xc, prob.U, dt_traj)
    u_slack = X_ref[1:] - f_next
    U_inf = jnp.concatenate([prob.U, u_slack], axis=1)

    return update_problem(prob, model=model_inf, obj=obj_inf,
                          constraints=cs_inf, U=U_inf)


# --------------------------------------------------------------- minimum time

@pytree_dataclass
class MinTimeObjective:
    """Objective for the τ=√dt augmented problem (reference MinTimeCost,
    minimum_time.jl:150-281): stage = base_stage(x,u)·τ² + R_mt·τ²;
    terminal = base terminal on the original states. Expansion via AD
    (replacing the reference's analytic τ chain rule)."""

    base: Objective
    R_mt: jnp.ndarray

    @property
    def N(self):
        return self.base.N

    def _stage_k(self, k, x, u):
        h = u[-1]
        xb, ub = x[:-1], u[:-1]
        Q, R, H = self.base.Q[k], self.base.R[k], self.base.H[k]
        q, r, c = self.base.q[k], self.base.r[k], self.base.c[k]
        ell = 0.5 * xb @ Q @ xb + 0.5 * ub @ R @ ub + q @ xb + r @ ub + c \
            + ub @ (H @ xb)
        return ell * h * h + self.R_mt * h * h

    def total(self, X, U, dt_ignored):
        ks = jnp.arange(U.shape[0])
        J_stage = jnp.sum(jax.vmap(self._stage_k)(ks, X[:-1], U))
        xN = X[-1, :-1]
        return J_stage + 0.5 * xN @ self.base.Q[-1] @ xN + self.base.q[-1] @ xN \
            + self.base.c[-1]

    def expansion(self, X, U, dt_ignored):
        gx = jax.grad(self._stage_k, argnums=1)
        gu = jax.grad(self._stage_k, argnums=2)
        hxx = jax.jacfwd(gx, argnums=1)
        huu = jax.jacfwd(gu, argnums=2)
        hux = jax.jacfwd(gu, argnums=1)
        ks = jnp.arange(U.shape[0])
        Xs = X[:-1]
        lx_s = jax.vmap(gx)(ks, Xs, U)
        lu_s = jax.vmap(gu)(ks, Xs, U)
        lxx_s = jax.vmap(hxx)(ks, Xs, U)
        luu_s = jax.vmap(huu)(ks, Xs, U)
        lux_s = jax.vmap(hux)(ks, Xs, U)

        nb = X.shape[-1] - 1
        lxN = jnp.zeros((nb + 1,), X.dtype).at[:nb].set(
            self.base.Q[-1] @ X[-1, :-1] + self.base.q[-1])
        lxxN = jnp.zeros((nb + 1, nb + 1), X.dtype).at[:nb, :nb].set(self.base.Q[-1])
        lx = jnp.concatenate([lx_s, lxN[None]], axis=0)
        lxx = jnp.concatenate([lxx_s, lxxN[None]], axis=0)
        return Expansion(x=lx, u=lu_s, xx=lxx, uu=luu_s, ux=lux_s)


def mintime_equality(n: int, m: int) -> Constraint:
    """τ consistency across knots: u[end] − x[end] = 0
    (reference mintime_equality, minimum_time.jl:112-124)."""

    def fn(x, u):
        return (u[-1] - x[-1])[None]

    def jac(x, u):
        cx = jnp.zeros((1, x.shape[0]), x.dtype).at[0, -1].set(-1.0)
        cu = jnp.zeros((1, u.shape[0]), x.dtype).at[0, -1].set(1.0)
        return cx, cu

    con = Constraint(fn, 1, "min_time_eq", equality=True, applies="stage",
                     jac_fn=jac)

    def al_terms(X, U_pad, g, imu):
        # cx = -e_last, cu = +e_last: scalar contributions on the τ entries
        N_, nb = X.shape
        mb = U_pad.shape[1]
        dtype = X.dtype
        g0, i0 = g[:, 0], imu[:, 0]
        return {
            "x": jnp.zeros((N_, nb), dtype).at[:, -1].set(-g0),
            "u": jnp.zeros((N_, mb), dtype).at[:, -1].set(g0),
            "xx": jnp.zeros((N_, nb, nb), dtype).at[:, -1, -1].set(i0),
            "uu": jnp.zeros((N_, mb, mb), dtype).at[:, -1, -1].set(i0),
            "ux": jnp.zeros((N_, mb, nb), dtype).at[:, -1, -1].set(-i0),
        }

    con.al_terms = al_terms
    return con


def minimum_time_problem(prob: Problem, R_min_time: float = 1.0,
                         dt_max: float = 1.0, dt_min: float = 1e-3) -> Problem:
    """τ=√dt state/control augmentation (reference minimum_time_problem,
    minimum_time.jl:2-37 + add_min_time_controls, :85-110)."""
    base = prob.model
    n, m, N = base.n, base.m, prob.N
    dtype = prob.U.dtype

    def step(x, u, dt):
        h = u[-1]
        xn = base.step(x[:-1], u[:-1], h * h)
        return jnp.concatenate([xn, h[None]])

    model_mt = DiscreteModel(step, n + 1, m + 1, model=base.model,
                             integrator=base.integrator,
                             name=base.name + "_mintime")

    obj_mt = MinTimeObjective(base=prob.obj, R_mt=jnp.asarray(R_min_time, dtype))

    # constraints: lift originals; add τ bounds at all stage knots and the τ
    # equality at interior knots (minimum_time.jl:126-147)
    entries = _lift_entries(prob.constraints, n, m)

    tau_bnd = bound_constraint(n + 1, m + 1,
                               u_min=[-np.inf] * m + [np.sqrt(dt_min)],
                               u_max=[np.inf] * m + [np.sqrt(dt_max)],
                               label="min_time_bnd")
    kmask_b = np.zeros(N, bool)
    kmask_b[: N - 1] = True
    entries.append((tau_bnd, kmask_b))

    kmask_eq = np.zeros(N, bool)
    kmask_eq[1: N - 1] = True  # 1 < k < N in 1-based == knots 1..N-2 here
    entries.append((mintime_equality(n, m), kmask_eq))
    cs_mt = ConstraintSet.build(entries, N)

    sqrt_dt = jnp.sqrt(prob.dt).astype(dtype)
    U_mt = jnp.concatenate(
        [prob.U, jnp.full((N - 1, 1), sqrt_dt, dtype)], axis=1)
    if bool(jnp.all(jnp.isfinite(prob.X))):
        X_mt = jnp.concatenate([prob.X, jnp.full((N, 1), sqrt_dt, dtype)], axis=1)
        X_mt = X_mt.at[0, -1].set(0.0)
    else:
        X_mt = jnp.full((N, n + 1), jnp.nan, dtype)
    x0_mt = jnp.concatenate([prob.x0, jnp.zeros((1,), dtype)])
    xf_mt = jnp.concatenate([prob.xf, jnp.zeros((1,), dtype)])

    return update_problem(prob, model=model_mt, obj=obj_mt, constraints=cs_mt,
                          U=U_mt, X=X_mt, x0=x0_mt, xf=xf_mt)


def total_time(prob: Problem, U=None) -> jnp.ndarray:
    """(reference total_time, minimum_time.jl:74-82)."""
    U = prob.U if U is None else U
    if bool(jax.device_get(prob.tf) == 0.0):
        return jnp.sum(U[:, -1] ** 2)
    return prob.dt * (prob.N - 1)


# --------------------------------------------------------------- main solve

def _penalty_rows(cs: ConstraintSet, opts: ALTROOptions, dtype):
    """Per-row penalty_initial / penalty_scaling vectors implementing the
    ALTRO-specific schedules for infeasible and min-time rows."""
    P = cs.P
    mu0 = np.full(P, float(opts.opts_al.penalty_initial))
    sca = np.full(P, float(opts.opts_al.penalty_scaling))
    for con, (r0, r1) in zip(cs.cons, cs.slices):
        if con.label == "infeasible":
            mu0[r0:r1] = opts.penalty_initial_infeasible
            sca[r0:r1] = opts.penalty_scaling_infeasible
        elif con.label == "min_time_bnd":
            mu0[r0:r1] = opts.penalty_initial_minimum_time_inequality
            sca[r0:r1] = opts.penalty_scaling_minimum_time_inequality
        elif con.label == "min_time_eq":
            mu0[r0:r1] = opts.penalty_initial_minimum_time_equality
            sca[r0:r1] = opts.penalty_scaling_minimum_time_equality
    return jnp.asarray(mu0, dtype), jnp.asarray(sca, dtype)


def altro_solve(prob: Problem, opts: ALTROOptions = ALTROOptions(),
                infeasible: Optional[bool] = None,
                minimum_time: Optional[bool] = None) -> ALTROResult:
    """(reference solve!, altro_methods.jl:2-53).

    The infeasible / minimum-time transforms are selected from concrete
    problem data (state seed non-NaN ⇒ infeasible start, tf == 0 ⇒ min time,
    reference altro_methods.jl:98-124); pass explicit flags when calling
    under trace.
    """
    dtype = prob.U.dtype
    if infeasible is None:
        infeasible = bool(np.all(np.isfinite(jax.device_get(prob.X))))
    if minimum_time is None:
        minimum_time = bool(jax.device_get(prob.tf) == 0.0)

    prob_altro = prob
    if infeasible:
        prob_altro = infeasible_problem(prob_altro, opts.R_inf)
    if minimum_time:
        prob_altro = minimum_time_problem(prob_altro, opts.R_minimum_time,
                                          opts.dt_max, opts.dt_min)

    # PN handoff tolerance (altro_methods.jl:6-14)
    ctol = opts.opts_al.constraint_tolerance
    kickout = opts.opts_al.kickout_max_penalty
    if opts.projected_newton:
        if opts.projected_newton_tolerance >= 0:
            ctol = opts.projected_newton_tolerance
        else:
            ctol = 0.0
            kickout = True
    opts_al = ALOptions(**{**_al_fields(opts.opts_al),
                           "constraint_tolerance": ctol,
                           "kickout_max_penalty": kickout})

    mu0, sca = _penalty_rows(prob_altro.constraints, opts, dtype)
    res_al = al_solve(prob_altro, opts_al, mu_init=mu0[None, :],
                      penalty_scaling=sca)
    X_a, U_a = res_al.X, res_al.U
    iterations_total = res_al.iterations_total
    c_max = res_al.c_max
    J = res_al.J

    prob_solved = update_problem(prob_altro, X=X_a, U=U_a)

    # projected newton polish (altro_methods.jl:30-40)
    if opts.projected_newton:
        pn_opts = opts.opts_pn if opts.opts_pn is not None else PNOptions()
        res_pn = pn_solve(prob_solved, pn_opts)
        X_a, U_a = res_pn.X, res_pn.U
        c_max = res_pn.c_max
        J = res_pn.J
        prob_solved = update_problem(prob_solved, X=X_a, U=U_a)

    # ---------------- process results (altro_methods.jl:56-95)
    n, m = prob.model.n, prob.model.m
    X_out = X_a[:, :n]
    U_out = U_a[:, :m]
    dt_out = (U_a[:, -1] ** 2 if minimum_time
              else jnp.broadcast_to(prob.dt, (prob.N - 1,)))

    if infeasible:
        # strip slacks, project to feasible, optionally re-solve (infeasible.jl:38-59)
        prob_feas = update_problem(prob, X=X_out, U=U_out)
        if minimum_time:
            prob_feas = minimum_time_problem(prob_feas, opts.R_minimum_time,
                                             opts.dt_max, opts.dt_min)
            X_seed = prob_feas.X.at[:, -1].set(
                jnp.concatenate([jnp.zeros((1,), dtype), X_a[1:, -1]]))
            U_seed = prob_feas.U.at[:, -1].set(U_a[:, -1])
            prob_feas = update_problem(prob_feas, X=X_seed, U=U_seed)

        if opts.dynamically_feasible_projection:
            dtf = prob_feas.dt_traj()

            def exp_fn(X, U):
                return prob_feas.obj.expansion(X, U, dtf)

            Xp, Up = tvlqr_projection(prob_feas.model, exp_fn, prob_feas.x0,
                                      prob_feas.X, prob_feas.U, dtf,
                                      opts.opts_al.opts_uncon)
            prob_feas = update_problem(prob_feas, X=Xp, U=Up)

        if opts.resolve_feasible_problem:
            mu0f, scaf = _penalty_rows(prob_feas.constraints, opts, dtype)
            res2 = al_solve(prob_feas, opts_al, mu_init=mu0f[None, :],
                            penalty_scaling=scaf)
            iterations_total = iterations_total + res2.iterations_total
            c_max = res2.c_max
            J = res2.J
            X_out = res2.X[:, :n]
            U_out = res2.U[:, :m]
            if minimum_time:
                dt_out = res2.U[:, -1] ** 2

    tt = jnp.sum(dt_out)
    # final violation on the ORIGINAL constraints (reference max_violation(prob)
    # post-solve, problem.jl:242-267 — the augmented rows are internal)
    C_out = prob.constraints.evaluate(X_out, U_out)
    c_max = prob.constraints.max_violation(C_out)
    return ALTROResult(X=X_out, U=U_out, J=J, c_max=c_max,
                       iterations=res_al.iterations,
                       iterations_total=iterations_total,
                       gradient=res_al.gradient, dt_traj=dt_out, tt=tt)


def _al_fields(o: ALOptions):
    import dataclasses
    return {f.name: getattr(o, f.name) for f in dataclasses.fields(o)}
