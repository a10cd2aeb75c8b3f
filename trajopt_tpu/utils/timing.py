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
- For intra-solve phase attribution use the JAX profiler
  (``jax.profiler.trace``) — the compiled program fuses phases, so the
  reference's per-phase split only exists pre-fusion.
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

    def report(self) -> str:
        """TimerOutputs-style table (reference altro_times.txt layout)."""
        lines = [f"{'Section':<40} {'ncalls':>8} {'time':>12}"]
        lines.append("-" * 62)
        for path in sorted(self._spans, key=lambda p: (len(p), p)):
            ncalls, tot = self._spans[path]
            label = "  " * (len(path) - 1) + path[-1]
            lines.append(f"{label:<40} {ncalls:>8} {tot:>11.4f}s")
        return "\n".join(lines)


def timed_solve(prob, opts, timer: Optional[Timer] = None):
    """``solve(prob, opts)`` with wall-clock stats (reference
    altro_methods.jl:46-50 records ``:time`` per solve; first-call compile
    time is reported separately since XLA compiles once per shape).

    Returns (prob_out, stats, times) where times = {"time", "time_compile"}.
    """
    from trajopt_tpu.solvers.api import solve

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
