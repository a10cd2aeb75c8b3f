"""Hierarchical wall-clock timing (reference TimerOutputs, SURVEY.md §5.1).

The reference wraps every solver phase in ``@timeit`` spans and dumps
tables (reference ilqr_methods.jl:49-52, examples/quadrotor/altro_times.txt).
Under jit, per-phase host timing is impossible *inside* a compiled solve, so
this module provides the TPU-native equivalents:

- :class:`Timer` — hierarchical spans around host-level calls, each span
  bracketed by ``jax.block_until_ready`` so device work is attributed to the
  span that launched it; ``report()`` renders the TimerOutputs-style table.
- :func:`timed_solve` — wraps ``solvers.api.solve`` recording ``time`` (and
  ``time_compile`` on the first call), the wall-clock stats the reference
  records per solve (reference altro_methods.jl:46-50: ``:time``,
  ``:time_al``, ``:time_pn``).
- :func:`timed_solve_phases` (``timed_solve(..., phases=True)``) — the
  reference's per-phase split (jacobians / cost expansion / backward pass /
  forward pass; ilqr_methods.jl:49-52): the solve re-runs with each phase
  jitted as its own program, spans synced with ``block_until_ready``, and
  the fixed per-dispatch launch latency measured and subtracted. For
  kernel-level attribution inside the fused production program use the JAX
  profiler (``jax.profiler.trace``).
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Optional

import jax


class Timer:
    """Hierarchical timer with TimerOutputs-style reporting.

    >>> t = Timer()
    >>> with t("solve"):
    ...     with t("al stage"):
    ...         ...
    >>> print(t.report())
    """

    def __init__(self):
        # path (tuple of names) -> [ncalls, total_seconds]
        self._spans: dict[tuple, list] = {}
        self._stack: list[str] = []

    @contextmanager
    def __call__(self, name: str, sync=None):
        """Time a span. ``sync``: optional pytree passed to
        ``jax.block_until_ready`` before closing the span so asynchronous
        device work is charged to this span."""
        self._stack.append(name)
        path = tuple(self._stack)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            try:
                if sync is not None:
                    jax.block_until_ready(sync)
            finally:
                # record + pop even if block_until_ready raises, so the
                # span stack stays consistent for later spans
                dt = time.perf_counter() - t0
                rec = self._spans.setdefault(path, [0, 0.0])
                rec[0] += 1
                rec[1] += dt
                self._stack.pop()

    def total(self, name: str) -> float:
        """Total seconds across all spans whose leaf name is ``name``."""
        return sum(v[1] for k, v in self._spans.items() if k[-1] == name)

    def report(self, dispatch_floor: float = 0.0) -> str:
        """TimerOutputs-style table (reference ilqr_times.txt layout:
        Section / ncalls / time / %tot / avg).

        ``dispatch_floor``: seconds of fixed per-dispatch overhead to
        subtract from every span (ncalls × floor) — separately-jitted
        phases through the TPU tunnel each pay ~0.8 ms of launch latency
        that is NOT phase work (measure it with
        :func:`measure_dispatch_floor`). Corrected times are clamped ≥ 0.
        """
        def corrected(path):
            ncalls, tot = self._spans[path]
            return ncalls, max(tot - ncalls * dispatch_floor, 0.0)

        top_total = sum(corrected(p)[1] for p in self._spans if len(p) == 1)
        hdr = (f"{'Section':<28} {'ncalls':>7} {'time':>10} {'%tot':>7} "
               f"{'avg':>10}")
        lines = [hdr, "-" * len(hdr)]

        def fmt_t(s):
            if s >= 1.0:
                return f"{s:.2f}s"
            if s >= 1e-3:
                return f"{s * 1e3:.1f}ms"
            return f"{s * 1e6:.0f}us"

        def emit(prefix):
            kids = sorted(
                {p for p in self._spans
                 if len(p) == len(prefix) + 1 and p[:len(prefix)] == prefix},
                key=lambda p: -corrected(p)[1])
            for path in kids:
                ncalls, tot = corrected(path)
                pct = 100.0 * tot / top_total if top_total > 0 else 0.0
                label = "  " * (len(path) - 1) + path[-1]
                lines.append(
                    f"{label:<28} {ncalls:>7} {fmt_t(tot):>10} {pct:>6.1f}% "
                    f"{fmt_t(tot / max(ncalls, 1)):>10}")
                emit(path)

        emit(())
        if dispatch_floor > 0.0:
            lines.append(f"(per-dispatch floor of {dispatch_floor * 1e3:.3f} "
                         "ms x ncalls subtracted from every span)")
        return "\n".join(lines)


def timed_solve(prob, opts, timer: Optional[Timer] = None,
                phases: bool = False):
    """``solve(prob, opts)`` with wall-clock stats (reference
    altro_methods.jl:46-50 records ``:time`` per solve; first-call compile
    time is reported separately since XLA compiles once per shape).

    Returns (prob_out, stats, times) where times = {"time", "time_compile"}.

    With ``phases=True``, returns a :class:`PhaseTimedResult` instead: the
    solve runs with the four iLQR phases (jacobians / cost expansion /
    backward pass / forward pass) jitted separately and timed with
    dispatch-floor correction — the reference's stats[:timer] tables
    (ilqr_methods.jl:49-52, examples/quadrotor/ilqr_times.txt). Phase mode
    trades throughput for attribution; the fused single-program solve above
    stays the production path.
    """
    from trajopt_tpu.solvers.api import solve

    if phases:
        return timed_solve_phases(prob, opts, timer)

    timer = timer or Timer()
    # per-call deltas (Timer.total() aggregates across ALL same-named spans,
    # which would double-count when the caller reuses one Timer)
    before = timer.total("solve (incl. compile)")
    with timer("solve (incl. compile)"):
        out = solve(prob, opts)
        jax.block_until_ready(out[0].X)
    t_first = timer.total("solve (incl. compile)") - before
    before = timer.total("solve")
    with timer("solve"):
        out = solve(prob, opts)
        jax.block_until_ready(out[0].X)
    t_steady = timer.total("solve") - before
    times = {"time": t_steady, "time_compile": max(t_first - t_steady, 0.0)}
    return out[0], out[1], times


def measure_dispatch_floor(reps: int = 30) -> float:
    """Median wall time of dispatching ONE trivial jitted program — the
    fixed per-dispatch launch latency every separately-jitted phase pays
    (measured ~0.8 ms through the remote TPU tunnel, ~30 µs locally).
    Subtract ncalls × floor from phase spans to attribute only phase work
    (BENCH_LOCAL.md dispatch-floor methodology)."""
    import jax.numpy as jnp

    noop = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    jax.block_until_ready(noop(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(noop(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


class PhaseTimedResult:
    """Result of :func:`timed_solve` with ``phases=True``: solver outputs
    plus the hierarchical phase timer (reference stats[:timer],
    ilqr_methods.jl:49-52 / altro_solver.jl:86-92)."""

    def __init__(self, X, U, J, c_max, iterations, iterations_total,
                 timer: Timer, dispatch_floor: float):
        self.X, self.U, self.J = X, U, J
        self.c_max = c_max
        self.iterations = iterations
        self.iterations_total = iterations_total
        self.timer = timer
        self.dispatch_floor = dispatch_floor

    def report(self, corrected: bool = True) -> str:
        return self.timer.report(self.dispatch_floor if corrected else 0.0)

    def phase_ms(self, name: str, corrected: bool = True) -> float:
        """Total corrected milliseconds across all spans named ``name``."""
        tot, calls = 0.0, 0
        for path, (n, t) in self.timer._spans.items():
            if path[-1] == name:
                tot += t
                calls += n
        if corrected:
            tot = max(tot - calls * self.dispatch_floor, 0.0)
        return tot * 1e3


def _phase_timed_ilqr(model, cost_fn, expansion_fn, x0, X0, U0, dt_traj,
                      opts, timer: Timer, cost_tol, grad_tol, lam, mu,
                      rho0=None, jits: dict | None = None):
    """Host-level iLQR main loop with the reference's four phase spans
    (jacobians / cost expansion / backward pass / forward pass,
    ilqr_methods.jl:47-53) timed around separately-jitted programs.

    Replicates ilqr_solve's convergence rules exactly (solvers/ilqr.py
    body_fn); the fused while_loop solver stays the production path —
    this mode trades throughput for the reference-style phase attribution
    that a single compiled program fuses away. ``jits`` caches compiled
    phases across AL outer iterations; ``cost_fn``/``expansion_fn`` take
    (X, U, λ, μ) with the multipliers as TRACED args so every phase
    compiles exactly once — re-jitting per outer iteration would charge
    trace time to the phase spans and swamp the real phase work."""
    import jax.numpy as jnp

    from trajopt_tpu.ops.rollout import rollout
    from trajopt_tpu.solvers.ilqr import (
        backward_pass, forward_pass, gradient_todorov,
    )
    from trajopt_tpu.utils.tree import precise

    opts_i = opts
    dtype = U0.dtype
    jits = jits if jits is not None else {}

    qs = getattr(model, "quat_slice", None) if opts_i.error_state else None
    if qs is not None:
        from trajopt_tpu.models.quaternions import project_error_state

    if "jac" not in jits:
        jits["jac"] = jax.jit(precise(
            lambda X, U: model.jacobian_traj(X[:-1], U, dt_traj)))
        jits["bp"] = jax.jit(precise(
            lambda A, B, e, r, dr: backward_pass(A, B, e, r, dr, opts_i)))
        jits["rollout"] = jax.jit(precise(
            lambda x, U: rollout(model, x, U, dt_traj)))
        jits["grad"] = jax.jit(gradient_todorov)
        jits["cost"] = jax.jit(precise(cost_fn))
        if qs is None:
            jits["exp"] = jax.jit(precise(expansion_fn))
        else:
            def exp_proj(X, U, la, m_, A, B):
                e = expansion_fn(X, U, la, m_)
                return project_error_state(X, A, B, e, qs)
            jits["exp"] = jax.jit(precise(exp_proj))
        jits["fp"] = jax.jit(precise(
            lambda X, U, K, d, v1, v2, Jp, r, dr, la, m_: forward_pass(
                model, lambda Xc, Uc: cost_fn(Xc, Uc, la, m_), x0, X, U,
                K, d, v1, v2, Jp, r, dr, dt_traj, opts_i)))
    cost_j, exp_j, fp_j = jits["cost"], jits["exp"], jits["fp"]

    X, U = X0, U0
    # initial rollout if no valid state seed (matches ilqr_solve)
    if not bool(jnp.all(jnp.isfinite(X))):
        with timer("rollout (seed)"):
            X = jits["rollout"](x0, U)
            jax.block_until_ready(X)
        if not bool(jnp.all(jnp.isfinite(X))):
            X = jnp.broadcast_to(x0, X.shape)
    with timer("cost"):
        J_prev = float(cost_j(X, U, lam, mu))

    rho = jnp.asarray(opts_i.bp_reg_initial if rho0 is None else rho0, dtype)
    drho = jnp.ones((), dtype)
    dJ_zero, it, converged = 0, 0, False
    grad = float("inf")

    while (not converged) and it < opts_i.iterations \
            and J_prev < opts_i.max_cost_value:
        with timer("jacobians"):
            A, B = jits["jac"](X, U)
            jax.block_until_ready(B)
        with timer("cost expansion"):
            if qs is None:
                exp = exp_j(X, U, lam, mu)
            else:
                A, B, exp = exp_j(X, U, lam, mu, A, B)
            jax.block_until_ready(exp.xx)
        with timer("backward pass"):
            K, d, dV1, dV2, rho, drho = jits["bp"](A, B, exp, rho, drho)
            jax.block_until_ready(K)
        with timer("forward pass"):
            X, U, J, rho, drho, alpha = fp_j(X, U, K, d, dV1, dV2,
                                             jnp.asarray(J_prev, dtype),
                                             rho, drho, lam, mu)
            jax.block_until_ready(X)
        with timer("convergence"):
            J = float(J)
            dJ = abs(J - J_prev)
            grad = float(jits["grad"](d, U))
            dJ_zero = dJ_zero + 1 if dJ == 0.0 else 0
            converged = ((0.0 < dJ < float(cost_tol))
                         or grad < float(grad_tol)
                         or dJ_zero > opts_i.dJ_counter_limit)
            J_prev = J
        it += 1
    return X, U, J_prev, it, grad, rho


def timed_solve_phases(prob, opts, timer: Optional[Timer] = None):
    """Phase-attributed solve (reference stats[:timer] tables,
    examples/quadrotor/ilqr_times.txt / altro_times.txt).

    ``opts`` may be iLQROptions (unconstrained iLQR phase table) or
    ALOptions (AL outer loop: per-outer 'uncon solve' spans containing the
    four iLQR phases, plus 'constraints' / 'dual update' spans). Phases are
    jitted separately and warmed up before timing, so the table reports
    steady-state phase work; the per-dispatch launch floor is measured and
    subtracted in ``report()`` (reference tables measure in-process Julia
    calls, which have no such floor).

    Returns a :class:`PhaseTimedResult`.
    """
    import jax.numpy as jnp

    from trajopt_tpu.solvers.al import ALOptions, dual_update, penalty_update
    from trajopt_tpu.solvers.ilqr import iLQROptions

    if isinstance(opts, iLQROptions):
        opts = ALOptions(opts_uncon=opts)
    if not isinstance(opts, ALOptions):
        raise TypeError(
            "phases=True supports iLQR/AL solves (the solvers the reference "
            "ships phase tables for); got " + type(opts).__name__)

    timer = timer or Timer()
    floor = measure_dispatch_floor()
    cs = prob.constraints
    dtype = prob.U.dtype
    dt_traj = prob.dt_traj()
    oi = opts.opts_uncon

    # warm-up: compile every phase once outside the timed spans
    warm_timer = Timer()

    if not cs.is_constrained:
        # (λ, μ) slots unused but kept in the signature so the phase loop
        # compiles one program shape for both modes
        def cost_fn(X, U, lam, mu):
            return prob.obj.total(X, U, dt_traj)

        def expansion_fn(X, U, lam, mu):
            return prob.obj.expansion(X, U, dt_traj)

        z = jnp.zeros((), dtype)
        jits: dict = {}
        _phase_timed_ilqr(prob.model, cost_fn, expansion_fn, prob.x0,
                          prob.X, prob.U, dt_traj, oi, warm_timer,
                          opts.cost_tolerance, opts.gradient_norm_tolerance,
                          z, z, jits=jits)
        with timer("iLQR solve"):
            X, U, J, it, grad, _ = _phase_timed_ilqr(
                prob.model, cost_fn, expansion_fn, prob.x0, prob.X, prob.U,
                dt_traj, oi, timer, opts.cost_tolerance,
                opts.gradient_norm_tolerance, z, z, jits=jits)
        return PhaseTimedResult(X, U, J, 0.0, it, it, timer, floor)

    # constrained: AL outer loop (reference altro_times.txt layout).
    # AL cost/expansion with (λ, μ) as TRACED args (same math as
    # solvers.al.al_cost_fns, which closes over them) so phases compile once
    # across all outer iterations.
    N, P = cs.N, cs.P
    atol = opts.active_constraint_tolerance

    def cost_fn(X, U, lam, mu):
        J = prob.obj.total(X, U, dt_traj)
        C = cs.evaluate(X, U)
        a = cs.active_set(C, lam, atol)
        Imu = jnp.where(a, mu, 0.0)
        return J + jnp.sum(lam * C + 0.5 * C * Imu * C)

    def expansion_fn(X, U, lam, mu):
        from trajopt_tpu.ops.cost import Expansion
        e = prob.obj.expansion(X, U, dt_traj)
        C = cs.evaluate(X, U)
        a = cs.active_set(C, lam, atol)
        Imu = jnp.where(a, mu, 0.0)
        g = Imu * C + lam
        tx, tu, txx, tuu, tux = cs.al_expansion_terms(X, U, g, Imu)
        return Expansion(x=e.x + tx, u=e.u + tu[:-1], xx=e.xx + txx,
                         uu=e.uu + tuu[:-1], ux=e.ux + tux[:-1])

    def run(t: Timer, jits: dict):
        lam = jnp.zeros((N, P), dtype)
        mu = jnp.broadcast_to(
            jnp.asarray(opts.penalty_initial, dtype), (N, P)) * cs.mask
        X, U = prob.X, prob.U
        c_max = float("inf")
        it_total = 0
        rho0 = None
        if "al_eval" not in jits:
            jits["al_eval"] = jax.jit(cs.evaluate)
            jits["al_dual"] = jax.jit(lambda C, lam, mu: (
                dual_update(cs, C, lam, mu, opts),
                penalty_update(cs, mu,
                               jnp.asarray(opts.penalty_scaling, dtype),
                               opts)))
        eval_j, dual_j = jits["al_eval"], jits["al_dual"]
        outer = 0
        for outer in range(1, opts.iterations + 1):
            last = outer == opts.iterations
            ct = opts.cost_tolerance if last else \
                opts.cost_tolerance_intermediate
            gt = opts.gradient_norm_tolerance if last else \
                opts.gradient_norm_tolerance_intermediate
            with t("uncon solve"):
                X, U, J, it, grad, rho = _phase_timed_ilqr(
                    prob.model, cost_fn, expansion_fn, prob.x0, X, U,
                    dt_traj, oi, t, ct, gt, lam, mu, rho0=rho0, jits=jits)
            it_total += it
            with t("constraints"):
                C = eval_j(X, U)
                jax.block_until_ready(C)
                c_max = float(cs.max_violation(C))
            with t("dual update"):
                lam, mu = dual_j(C, lam, mu)
                jax.block_until_ready(lam)
            if c_max < opts.constraint_tolerance:
                break
        return X, U, float(prob.obj.total(X, U, dt_traj)), c_max, outer, \
            it_total

    jits = {}
    run(warm_timer, jits)   # compile everything once
    with timer("AL solve"):
        X, U, J, c_max, outer, it_total = run(timer, jits)
    return PhaseTimedResult(X, U, J, c_max, outer, it_total, timer, floor)
