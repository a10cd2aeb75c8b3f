"""Structured AL expansion (sparse-Jacobian al_terms hooks) must be
numerically identical to the generic dense-Jacobian Gauss-Newton path
(reference cost_expansion!, augmented_lagrangian_methods.jl:186-229).

The hooks exploit per-constraint structure (circle fields -> 2x2 position
blocks, bounds -> diagonals, goal/infeasible -> identities); this suite pins
them against the hook-less einsum fallback on random trajectories and duals,
covering every hooked constraint family including the ALTRO lift padding.
"""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.ops.constraints import ConstraintSet
from trajopt_tpu.problems import zoo as probs
from trajopt_tpu.solvers.al import al_cost_fns
from trajopt_tpu.solvers.altro import infeasible_problem, minimum_time_problem


def _strip_hooks(cs: ConstraintSet) -> ConstraintSet:
    """Clone the set with every al_terms hook removed -> generic path only."""
    stripped = []
    for con in cs.cons:
        c2 = copy.copy(con)
        if hasattr(c2, "al_terms"):
            del c2.al_terms
        stripped.append(c2)
    return ConstraintSet(mask=cs.mask, is_eq=cs.is_eq, cons=tuple(stripped),
                         slices=cs.slices, N=cs.N, P=cs.P)


def _random_inputs(prob, seed=0):
    rng = np.random.default_rng(seed)
    N, n = prob.X.shape
    m = prob.U.shape[1]
    P = prob.constraints.P
    X = jnp.asarray(rng.normal(size=(N, n)))
    U = jnp.asarray(rng.normal(size=(N - 1, m)))
    lam = jnp.asarray(rng.normal(size=(N, P))) * prob.constraints.mask
    # inequality duals must be >= 0 (dual_update projects them)
    lam = jnp.where(prob.constraints.is_eq[None, :], lam, jnp.abs(lam))
    mu = jnp.asarray(rng.uniform(0.5, 50.0, size=(N, P))) * prob.constraints.mask
    return X, U, lam, mu


def _problem(name):
    if name == "parallel_park":
        return probs.parallel_park()
    if name == "car_escape":
        return probs.car_escape()
    if name == "maze_infeasible":
        return infeasible_problem(probs.quadrotor_maze(), R_inf=1e-8)
    if name == "pendulum_mintime":
        return minimum_time_problem(probs.pendulum())
    if name == "kuka_obstacles":
        return probs.kuka_obstacles()
    raise KeyError(name)


@pytest.mark.parametrize("name", ["parallel_park", "car_escape",
                                  "maze_infeasible", "pendulum_mintime",
                                  "kuka_obstacles"])
def test_structured_expansion_matches_generic(name):
    prob = _problem(name)
    cs = prob.constraints
    # every family this test is about must actually carry a hook
    hooked = [c.label for c in cs.cons if getattr(c, "al_terms", None)]
    assert hooked, f"{name}: no hooked constraints — test is vacuous"

    X, U, lam, mu = _random_inputs(prob, seed=hash(name) % 2**31)
    dt_traj = prob.dt_traj()

    _, efn = al_cost_fns(prob.obj, cs, dt_traj, lam, mu)
    _, efn_ref = al_cost_fns(prob.obj, _strip_hooks(cs), dt_traj, lam, mu)

    e = jax.jit(efn)(X, U)
    e_ref = jax.jit(efn_ref)(X, U)
    for label in ("x", "u", "xx", "uu", "ux"):
        np.testing.assert_allclose(np.asarray(getattr(e, label)),
                                   np.asarray(getattr(e_ref, label)),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"{name}: expansion.{label}")


def test_structured_terms_respect_knot_masks():
    """parallel_park attaches bnd1 at knot 0 only and bnd2 at 1..N-2: the
    hook contributions must vanish where the mask does."""
    prob = _problem("parallel_park")
    cs = prob.constraints
    X, U, lam, mu = _random_inputs(prob, seed=3)
    C = cs.evaluate(X, U)
    a = cs.active_set(C, lam)
    Imu = jnp.where(a, mu, 0.0)
    g = Imu * C + lam
    lx, lu, lxx, luu, lux = cs.al_expansion_terms(X, U, g, Imu)

    r0, r1 = cs.row_slice("bnd2")
    # zero all rows except bnd2's, recompute: knot 0 must contribute nothing
    keep = jnp.zeros_like(g).at[:, r0:r1].set(1.0)
    lx2, lu2, *_ = cs.al_expansion_terms(X, U, g * keep, Imu * keep)
    assert np.allclose(np.asarray(lx2[0]), 0.0)
    assert np.allclose(np.asarray(lu2[0]), 0.0)
    assert not np.allclose(np.asarray(lx2[1]), 0.0)  # active at knot 1
