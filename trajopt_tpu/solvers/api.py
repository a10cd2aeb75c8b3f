"""Top-level solve dispatch.

Counterpart of reference src/solvers.jl: the options object selects the
solver (reference ``AbstractSolver(prob, opts)``, solvers.jl:60; ``solve!``
dispatch, solvers.jl:91-123). Non-mutating by construction — solvers return
new (X, U) plus a stats pytree.
"""
from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp

from trajopt_tpu.problem import Problem, update_problem
from trajopt_tpu.solvers.ilqr import iLQROptions
from trajopt_tpu.solvers.al import ALOptions, al_solve
from trajopt_tpu.solvers.altro import ALTROOptions, altro_solve
from trajopt_tpu.solvers.projected_newton import PNOptions, pn_solve
from trajopt_tpu.solvers.dircol import (
    DIRCOLMinTimeOptions, DIRCOLOptions, dircol_mintime_solve, dircol_solve,
)
from trajopt_tpu.solvers.dirtrel import DIRTRELOptions, dirtrel_solve


class SolverStats(NamedTuple):
    """Per-solve statistics (reference stats dicts, SURVEY.md §5.5)."""

    J: jnp.ndarray
    c_max: jnp.ndarray
    iterations: jnp.ndarray
    iterations_total: jnp.ndarray
    gradient: jnp.ndarray


def solve(prob: Problem, opts, spec=None) -> tuple[Problem, SolverStats]:
    """Solve ``prob`` with the solver selected by ``opts``'s type.

    ``spec``: a ``RobustSpec`` — required when ``opts`` is
    ``DIRTRELOptions`` (the disturbance model is problem data, not a
    solver knob).

    Returns (solved problem with updated X/U, stats).
    """
    if isinstance(opts, ALTROOptions):
        res = altro_solve(prob, opts)
        prob_out = update_problem(prob, X=res.X, U=res.U)
        return prob_out, SolverStats(
            J=res.J, c_max=res.c_max, iterations=res.iterations,
            iterations_total=res.iterations_total, gradient=res.gradient)
    if isinstance(opts, ALOptions):
        res = al_solve(prob, opts)
        prob_out = update_problem(prob, X=res.X, U=res.U)
        return prob_out, SolverStats(
            J=res.J, c_max=res.c_max, iterations=res.iterations,
            iterations_total=res.iterations_total, gradient=res.gradient)
    if isinstance(opts, iLQROptions):
        # plain iLQR ignores constraints (reference iLQRSolver solves the
        # unconstrained problem regardless, ilqr_methods.jl:3-45)
        from trajopt_tpu.ops.constraints import empty_constraints

        prob_uncon = update_problem(prob, constraints=empty_constraints(prob.N))
        res = al_solve(prob_uncon, ALOptions(
            opts_uncon=opts, cost_tolerance=opts.cost_tolerance,
            gradient_norm_tolerance=opts.gradient_norm_tolerance))
        prob_out = update_problem(prob, X=res.X, U=res.U)
        return prob_out, SolverStats(
            J=res.J, c_max=res.c_max, iterations=res.iterations,
            iterations_total=res.iterations_total, gradient=res.gradient)
    if isinstance(opts, PNOptions):
        res = pn_solve(prob, opts)
        prob_out = update_problem(prob, X=res.X, U=res.U)
        return prob_out, SolverStats(
            J=res.J, c_max=res.c_max, iterations=res.iterations,
            iterations_total=res.iterations, gradient=jnp.zeros(()))
    if isinstance(opts, DIRCOLOptions):
        res = dircol_solve(prob, opts)
        prob_out = update_problem(prob, X=res.X, U=res.U)
        return prob_out, SolverStats(
            J=res.J, c_max=jnp.maximum(res.c_max, res.defect_max),
            iterations=res.iterations, iterations_total=res.iterations,
            gradient=jnp.zeros(()))
    if isinstance(opts, DIRCOLMinTimeOptions):
        res = dircol_mintime_solve(
            prob, R_min_time=opts.R_min_time, h_max=opts.h_max,
            h_min=opts.h_min, opts=opts.dircol, equal_steps=opts.equal_steps)
        prob_out = update_problem(prob, X=res.X, U=res.U)
        return prob_out, SolverStats(
            J=res.J, c_max=jnp.maximum(res.c_max, res.defect_max),
            iterations=res.iterations, iterations_total=res.iterations,
            gradient=jnp.zeros(()))
    if isinstance(opts, DIRTRELOptions):
        if spec is None:
            raise ValueError(
                "DIRTREL needs the disturbance model: solve(prob, opts, "
                "spec=RobustSpec(...))")
        res = dirtrel_solve(prob, spec, opts)
        prob_out = update_problem(prob, X=res.X, U=res.U)
        return prob_out, SolverStats(
            J=res.J, c_max=jnp.maximum(res.c_max, res.defect_max),
            iterations=res.iterations, iterations_total=res.iterations,
            gradient=jnp.zeros(()))
    raise TypeError(f"unknown options type: {type(opts)}")
