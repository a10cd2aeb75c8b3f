"""Augmented Lagrangian (outer loop) solver.

TPU-native counterpart of reference src/solvers/augmented_lagrangian/. The
AL objective decorator (augmented_lagrangian_methods.jl:129-229) becomes a
pair of pure closures over (λ, μ) that the iLQR core consumes; dual/penalty
updates are fixed-shape masked array ops over the stacked constraint layout.
The outer loop is a ``lax.while_loop``, so a full constrained ALTRO solve is
ONE compiled XLA program (and vmappable over problem batches).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from trajopt_tpu.ops.cost import Expansion, cost_expansion, total_cost
from trajopt_tpu.ops.constraints import ConstraintSet
from trajopt_tpu.problem import Problem
from trajopt_tpu.solvers.ilqr import (
    ALFusedMeta, ILQRResult, iLQROptions, ilqr_solve,
)
from trajopt_tpu.utils.tree import precise, static_dataclass


def _al_fused_canon(prob: Problem, opts: ALOptions):
    """Canonical constraint stack for the AL-aware fused kernels — built
    once per trace when the inner solver has ``fused``/``fused_al`` on
    (``fused_al`` defaults True) and every constraint is
    data-representable (ops/canonical.py); None otherwise (the solver
    keeps the closure-based phases)."""
    if not (opts.opts_uncon.fused or opts.opts_uncon.fused_al):
        return None
    from trajopt_tpu.ops.canonical import canonical_stack

    return canonical_stack(prob.constraints, prob.model.n, prob.model.m,
                           dtype=prob.U.dtype)


@static_dataclass
class ALOptions:
    """(reference AugmentedLagrangianSolverOptions,
    augmented_lagrangian_solver.jl:8-66). Same defaults."""

    opts_uncon: iLQROptions = iLQROptions()
    cost_tolerance: float = 1e-4
    cost_tolerance_intermediate: float = 1e-3
    gradient_norm_tolerance: float = 1e-5
    gradient_norm_tolerance_intermediate: float = 1e-5
    constraint_tolerance: float = 1e-3
    constraint_tolerance_intermediate: float = 1e-3
    iterations: int = 30
    dual_min: float = -1e8
    dual_max: float = 1e8
    penalty_max: float = 1e8
    penalty_initial: float = 1.0
    penalty_scaling: float = 10.0
    # gated outer-loop update (reference knobs penalty_scaling_no /
    # constraint_decrease_ratio, augmented_lagrangian_solver.jl:52-58):
    # with outer_loop_update_type="feedback", an outer iteration with
    # sufficient constraint decrease (c_max ≤ ratio·c_max_prev) updates the
    # DUALS and scales penalties only by penalty_scaling_no; an
    # insufficient one keeps the duals and scales by penalty_scaling —
    # the classic Bertsekas switch, per problem under vmap. "default"
    # reproduces the reference default (dual update + unconditional scale).
    penalty_scaling_no: float = 1.0
    constraint_decrease_ratio: float = 0.25
    outer_loop_update_type: str = "default"
    active_constraint_tolerance: float = 0.0
    kickout_max_penalty: bool = False
    # live per-outer-iteration row via jax.debug.print (reference OuterLoop
    # table, augmented_lagrangian_methods.jl:79-97 + logger.jl)
    verbose: bool = False


class ALResult(NamedTuple):
    X: jnp.ndarray
    U: jnp.ndarray
    lam: jnp.ndarray
    mu: jnp.ndarray
    C: jnp.ndarray
    c_max: jnp.ndarray
    J: jnp.ndarray
    iterations: jnp.ndarray
    iterations_total: jnp.ndarray
    gradient: jnp.ndarray
    history: dict  # per-outer-iteration stats arrays (reference stats dicts,
    #                augmented_lagrangian_methods.jl:79-97); render with
    #                utils.logging.print_al_history


def _empty_history(iterations: int, dtype):
    z = jnp.zeros((iterations,), dtype)
    return {
        "cost": z, "c_max": z, "penalty_max": z, "gradient": z,
        "iterations_inner": jnp.zeros((iterations,), jnp.int32),
    }


def _record_history(hist, it, J, c_max, penalty_max, inner, grad):
    return {
        "cost": hist["cost"].at[it].set(J),
        "c_max": hist["c_max"].at[it].set(c_max),
        "penalty_max": hist["penalty_max"].at[it].set(penalty_max),
        "gradient": hist["gradient"].at[it].set(grad),
        "iterations_inner": hist["iterations_inner"].at[it].set(inner),
    }


def al_cost_fns(obj, cs: ConstraintSet, dt_traj, lam, mu, tol=0.0):
    """Build (cost_fn, expansion_fn) for the AL-decorated objective.

    cost: J + Σ_k λᵀc + ½ cᵀ Iμ c   with Iμ = diag(active ⊙ μ)
    (reference aula_cost, augmented_lagrangian_methods.jl:284-286; expansion
    terms from cost_expansion!, :186-229).
    """

    def cost_fn(X, U):
        J = obj.total(X, U, dt_traj)
        C = cs.evaluate(X, U)
        a = cs.active_set(C, lam, tol)
        Imu = jnp.where(a, mu, 0.0)
        Jc = jnp.sum(lam * C + 0.5 * C * Imu * C)
        return J + Jc

    def expansion_fn(X, U):
        e = obj.expansion(X, U, dt_traj)
        C = cs.evaluate(X, U)
        a = cs.active_set(C, lam, tol)
        Imu = jnp.where(a, mu, 0.0)
        g = Imu * C + lam                    # (N,P), masked
        # structure-aware contributions (sparse-Jacobian hooks with a dense
        # generic fallback — see ConstraintSet.al_expansion_terms)
        tx, tu, txx, tuu, tux = cs.al_expansion_terms(X, U, g, Imu)
        return Expansion(x=e.x + tx, u=e.u + tu[:-1], xx=e.xx + txx,
                         uu=e.uu + tuu[:-1], ux=e.ux + tux[:-1])

    return cost_fn, expansion_fn


def dual_update(cs: ConstraintSet, C, lam, mu, opts: ALOptions):
    """λ ← clamp(λ + μ∘c, dual_min, dual_max); inequality rows projected to
    λ ≥ 0 (reference dual_update!, augmented_lagrangian_methods.jl:107-118)."""
    lam_new = jnp.clip(lam + mu * C, opts.dual_min, opts.dual_max)
    lam_new = jnp.where(cs.is_eq[None, :], lam_new, jnp.maximum(0.0, lam_new))
    return jnp.where(cs.mask, lam_new, 0.0)


def penalty_update(cs: ConstraintSet, mu, scaling, opts: ALOptions):
    """μ ← min(scaling·μ, μ_max) (reference penalty_update!, :121-126)."""
    mu_new = jnp.clip(scaling * mu, 0.0, opts.penalty_max)
    return jnp.where(cs.mask, mu_new, 0.0)


def max_violation(cs: ConstraintSet, C):
    return cs.max_violation(C)


class ALLaneState(NamedTuple):
    """Resumable per-problem AL state for the streaming batch driver
    (parallel/batch.py solve_batch_queued): one outer iteration at a time,
    so a converged lane can hand its slot to a fresh problem."""

    x0: jnp.ndarray
    X: jnp.ndarray
    U: jnp.ndarray
    lam: jnp.ndarray
    mu: jnp.ndarray
    c_max: jnp.ndarray
    J: jnp.ndarray
    it: jnp.ndarray            # outer iterations done
    it_total: jnp.ndarray      # inner iLQR iterations total
    gradient: jnp.ndarray
    converged: jnp.ndarray


def al_lane_stepper(prob: Problem, opts: ALOptions, constraint_tolerance=None,
                    mu_init=None, penalty_scaling=None):
    """(init, step) pair for one AL OUTER iteration per call — the same
    semantics as one trip of ``al_solve``'s while_loop (tolerance
    stitching, dual/penalty updates, kickout), factored out so the
    streaming batch driver can interleave problems on lanes. Equivalence
    with ``al_solve`` is pinned by tests/test_parallel.py."""
    cs = prob.constraints
    dtype = prob.U.dtype
    dt_traj = prob.dt_traj()
    ctol = jnp.asarray(
        opts.constraint_tolerance if constraint_tolerance is None
        else constraint_tolerance, dtype)
    N, P = cs.N, cs.P
    scaling = jnp.broadcast_to(
        jnp.asarray(opts.penalty_scaling if penalty_scaling is None
                    else penalty_scaling, dtype), (P,))
    mu0_row = jnp.broadcast_to(
        jnp.asarray(opts.penalty_initial if mu_init is None else mu_init,
                    dtype), (N, P)) * cs.mask
    atol = opts.active_constraint_tolerance
    canon = _al_fused_canon(prob, opts) if cs.P > 0 else None
    big = jnp.asarray(jnp.inf, dtype)

    def init(x0, U0):
        X0 = prob.X.at[0].set(x0)
        return ALLaneState(
            x0=x0, X=X0, U=U0, lam=jnp.zeros((N, P), dtype), mu=mu0_row,
            c_max=big, J=big, it=jnp.zeros((), jnp.int32),
            it_total=jnp.zeros((), jnp.int32), gradient=big,
            converged=jnp.asarray(False))

    unconstrained = P == 0

    def step(st: ALLaneState) -> ALLaneState:
        if unconstrained:
            # no duals/penalties to stitch tolerances around: every round
            # runs at FINAL tolerances (matching al_solve's unconstrained
            # plain-iLQR arm) — rounds just continue the same descent
            cost_tol = jnp.asarray(opts.cost_tolerance, dtype)
            grad_tol = jnp.asarray(opts.gradient_norm_tolerance, dtype)
        else:
            last = st.it == opts.iterations - 1
            cost_tol = jnp.where(last, opts.cost_tolerance,
                                 opts.cost_tolerance_intermediate)
            grad_tol = jnp.where(last, opts.gradient_norm_tolerance,
                                 opts.gradient_norm_tolerance_intermediate)
        cost_fn, expansion_fn = al_cost_fns(prob.obj, cs, dt_traj, st.lam,
                                            st.mu, atol)
        meta = None if canon is None else ALFusedMeta(
            objective=prob.obj, cs=cs, canon=canon, lam=st.lam, mu=st.mu,
            atol=atol)
        from trajopt_tpu.solvers.ilqr import reg_noise_scale

        res = ilqr_solve(prob.model, cost_fn, expansion_fn, st.x0, st.X,
                         st.U, dt_traj, opts.opts_uncon,
                         cost_tol=cost_tol, grad_tol=grad_tol, al_meta=meta,
                         reg_scale=reg_noise_scale(st.mu, dtype))
        C = cs.evaluate(res.X, res.U)
        c_max_new = cs.max_violation(C)
        if opts.outer_loop_update_type == "feedback":
            good = c_max_new <= opts.constraint_decrease_ratio * st.c_max
            lam_up = dual_update(cs, C, st.lam, st.mu, opts)
            lam = jnp.where(good, lam_up, st.lam)
            sc = jnp.where(good, opts.penalty_scaling_no, scaling)
            mu = penalty_update(cs, st.mu, sc[None, :], opts)
        else:
            lam = dual_update(cs, C, st.lam, st.mu, opts)
            mu = penalty_update(cs, st.mu, scaling[None, :], opts)
        converged = c_max_new < ctol
        if unconstrained:
            # c_max is identically 0 — a lane is done only when the INNER
            # solve converged by its own dJ/grad rules rather than being
            # cut by the round boundary
            converged = converged & res.converged
        if opts.kickout_max_penalty and not unconstrained:
            # (P=0 guard: jnp.max of the zero-size (N, 0) mu has no identity)
            converged = converged | (jnp.max(mu) >= opts.penalty_max)
        return ALLaneState(
            x0=st.x0, X=res.X, U=res.U, lam=lam, mu=mu, c_max=c_max_new,
            J=res.J, it=st.it + 1, it_total=st.it_total + res.iterations,
            gradient=res.gradient, converged=converged)

    return init, step


@precise
def al_solve(
    prob: Problem,
    opts: ALOptions = ALOptions(),
    constraint_tolerance=None,
    mu_init=None,
    penalty_scaling=None,
) -> ALResult:
    """AL solve (reference solve!, augmented_lagrangian_methods.jl:2-31).

    ``mu_init`` / ``penalty_scaling`` may be (P,) row vectors so ALTRO can
    give its infeasible/min-time rows their own penalty schedule
    (reference altro_solver.jl:26-53 options).
    """
    cs = prob.constraints
    dtype = prob.U.dtype
    dt_traj = prob.dt_traj()
    ctol = jnp.asarray(
        opts.constraint_tolerance if constraint_tolerance is None
        else constraint_tolerance, dtype)

    if not cs.is_constrained:
        # unconstrained: plain iLQR (reference augmented_lagrangian_methods.jl:33-36)
        def cost_fn(X, U):
            return prob.obj.total(X, U, dt_traj)

        def expansion_fn(X, U):
            return prob.obj.expansion(X, U, dt_traj)

        res = ilqr_solve(prob.model, cost_fn, expansion_fn, prob.x0, prob.X,
                         prob.U, dt_traj, opts.opts_uncon,
                         cost_tol=opts.cost_tolerance,
                         grad_tol=opts.gradient_norm_tolerance,
                         objective=prob.obj)
        zp = jnp.zeros((prob.N, 0), dtype)
        hist = _empty_history(1, dtype)
        hist = _record_history(hist, 0, res.J, jnp.zeros((), dtype),
                               jnp.zeros((), dtype), res.iterations,
                               res.gradient)
        hist["iterations"] = jnp.ones((), jnp.int32)
        return ALResult(X=res.X, U=res.U, lam=zp, mu=zp, C=zp,
                        c_max=jnp.zeros((), dtype), J=res.J,
                        iterations=jnp.ones((), jnp.int32),
                        iterations_total=res.iterations, gradient=res.gradient,
                        history=hist)

    N, P = cs.N, cs.P
    lam0 = jnp.zeros((N, P), dtype)
    mu0 = jnp.broadcast_to(
        jnp.asarray(opts.penalty_initial if mu_init is None else mu_init, dtype),
        (N, P)) * cs.mask
    scaling = jnp.broadcast_to(
        jnp.asarray(opts.penalty_scaling if penalty_scaling is None
                    else penalty_scaling, dtype), (P,))

    atol = opts.active_constraint_tolerance

    canon = _al_fused_canon(prob, opts)

    def inner_solve(X, U, lam, mu, cost_tol, grad_tol):
        cost_fn, expansion_fn = al_cost_fns(prob.obj, cs, dt_traj, lam, mu, atol)
        meta = None if canon is None else ALFusedMeta(
            objective=prob.obj, cs=cs, canon=canon, lam=lam, mu=mu,
            atol=atol)
        from trajopt_tpu.solvers.ilqr import reg_noise_scale

        return ilqr_solve(prob.model, cost_fn, expansion_fn, prob.x0, X, U,
                          dt_traj, opts.opts_uncon,
                          cost_tol=cost_tol, grad_tol=grad_tol, al_meta=meta,
                          reg_scale=reg_noise_scale(mu, dtype))

    def cond_fn(st):
        X, U, lam, mu, c_max, J, it, it_total, grad, converged, hist = st
        return (~converged) & (it < opts.iterations)

    def body_fn(st):
        X, U, lam, mu, c_max, J, it, it_total, grad, _, hist = st

        # tolerance stitching (reference set_tolerances!, :39-50)
        last = it == opts.iterations - 1
        cost_tol = jnp.where(last, opts.cost_tolerance,
                             opts.cost_tolerance_intermediate)
        grad_tol = jnp.where(last, opts.gradient_norm_tolerance,
                             opts.gradient_norm_tolerance_intermediate)

        res = inner_solve(X, U, lam, mu, cost_tol, grad_tol)
        C = cs.evaluate(res.X, res.U)
        c_max_prev = c_max
        c_max_new = cs.max_violation(C)
        if opts.outer_loop_update_type == "feedback":
            # Bertsekas switch (see ALOptions): good progress → dual step,
            # mild penalty growth; stall → hold duals, grow penalties
            good = c_max_new <= opts.constraint_decrease_ratio * c_max_prev
            lam_up = dual_update(cs, C, lam, mu, opts)
            lam = jnp.where(good, lam_up, lam)
            sc = jnp.where(good, opts.penalty_scaling_no, scaling)
            mu = penalty_update(cs, mu, sc[None, :], opts)
        else:
            lam = dual_update(cs, C, lam, mu, opts)
            mu = penalty_update(cs, mu, scaling[None, :], opts)

        c_max = c_max_new
        converged = c_max < ctol
        if opts.kickout_max_penalty:
            converged = converged | (jnp.max(mu) >= opts.penalty_max)
        hist = _record_history(hist, it, res.J, c_max, jnp.max(mu),
                               res.iterations, res.gradient)
        if opts.verbose:
            jax.debug.print(
                "AL outer {it:>3}  cost {J:.6e}  c_max {c:.3e}  "
                "penalty_max {p:.2e}  inner {inner}",
                it=it + 1, J=res.J, c=c_max, p=jnp.max(mu),
                inner=res.iterations)
        return (res.X, res.U, lam, mu, c_max, res.J, it + 1,
                it_total + res.iterations, res.gradient, converged, hist)

    big = jnp.asarray(jnp.inf, dtype)
    init = (prob.X, prob.U, lam0, mu0, big, big,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32), big,
            jnp.asarray(False), _empty_history(opts.iterations, dtype))
    X, U, lam, mu, c_max, J, it, it_total, grad, conv, hist = \
        jax.lax.while_loop(cond_fn, body_fn, init)
    hist["iterations"] = it
    C = cs.evaluate(X, U)
    return ALResult(X=X, U=U, lam=lam, mu=mu, C=C, c_max=c_max, J=J,
                    iterations=it, iterations_total=it_total, gradient=grad,
                    history=hist)
