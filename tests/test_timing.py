"""Phase-attributed solve timing (reference stats[:timer], SURVEY.md §5.1).

The reference wraps the four iLQR phases in @timeit spans
(ilqr_methods.jl:49-52) and the AL stages in their own
(augmented_lagrangian_methods.jl:58-63); ``timed_solve(..., phases=True)``
is the TPU-native counterpart (separately-jitted phases + dispatch-floor
correction). These tests pin the contract: the phase-timed loop must
reproduce the fused production solver's outcome, and the table must carry
the reference's span names.
"""
import numpy as np
import pytest

import trajopt_tpu as tt
from trajopt_tpu.models import zoo
from trajopt_tpu.utils.timing import (
    Timer, measure_dispatch_floor, timed_solve,
)


def _pendulum(constrained):
    n, m, N = 2, 1, 31
    model_d = tt.discretize(zoo.pendulum, "rk3")
    xf = np.array([np.pi, 0.0])
    obj = tt.LQRObjective(np.eye(n) * 1e-3, np.eye(m) * 1e-3,
                          np.eye(n) * 1e-3, xf, N)
    cons = None
    if constrained:
        cons = tt.ConstraintSetBuilder(N)
        cons.add(tt.bound_constraint(n, m, u_min=-3.0, u_max=3.0))
        cons.add(tt.goal_constraint(xf))
    return tt.problem(model_d, obj, constraints=cons, x0=np.zeros(n),
                      xf=xf, N=N, dt=0.15, U0=np.ones((N - 1, m)))


def test_phase_timed_ilqr_matches_fused():
    prob = _pendulum(constrained=False)
    res = timed_solve(prob, tt.iLQROptions(), phases=True)
    fused = tt.al_solve(prob, tt.ALOptions(opts_uncon=tt.iLQROptions()))
    # host loop replicates the fused while_loop's convergence rules exactly
    assert int(res.iterations) == int(fused.iterations_total)
    assert float(res.J) == pytest.approx(float(fused.J), rel=1e-10)
    # the reference's four phase spans all appear with one call per iter
    table = res.report()
    for name in ("jacobians", "cost expansion", "backward pass",
                 "forward pass"):
        assert name in table
        assert res.phase_ms(name, corrected=False) > 0.0
    calls = {p[-1]: n for p, (n, _) in res.timer._spans.items()}
    assert calls["backward pass"] == int(res.iterations)
    assert calls["jacobians"] == int(res.iterations)


def test_phase_timed_al_matches_fused():
    prob = _pendulum(constrained=True)
    res = timed_solve(prob, tt.ALOptions(), phases=True)
    fused = tt.al_solve(prob, tt.ALOptions())
    assert float(res.c_max) == pytest.approx(float(fused.c_max), rel=1e-6)
    assert int(res.iterations_total) == int(fused.iterations_total)
    assert abs(float(res.X[-1, 0]) - np.pi) < 2e-3
    table = res.report()
    for name in ("uncon solve", "constraints", "dual update",
                 "backward pass"):
        assert name in table
    # dispatch-floor correction: corrected never exceeds raw
    for name in ("backward pass", "forward pass"):
        assert res.phase_ms(name, corrected=True) <= \
            res.phase_ms(name, corrected=False) + 1e-12


def test_dispatch_floor_and_report_correction():
    floor = measure_dispatch_floor(reps=10)
    assert 0.0 < floor < 0.1  # sub-100ms even through a tunnel
    t = Timer()
    with t("a"):
        pass
    raw = t.report()
    corr = t.report(dispatch_floor=10.0)  # huge floor clamps to zero
    assert "a" in raw and "0us" in corr
