"""Problem-zoo spec parity: horizons, timesteps, costs, bounds, seeds match
the reference problems/ definitions (SURVEY §2.3)."""
import numpy as np
import jax.numpy as jnp
import pytest

from trajopt_tpu.problems import zoo as probs


def _P(name):
    return probs.PROBLEMS[name]()


def test_pendulum_spec():
    """reference problems/pendulum.jl: N=31, dt=0.15, u∈[-3,3], goal."""
    p = _P("pendulum")
    assert p.N == 31
    assert float(p.dt) == pytest.approx(0.15)
    assert p.n == 2 and p.m == 1
    assert np.allclose(np.asarray(p.xf), [np.pi, 0.0])
    assert "goal" in p.constraints.labels()
    assert np.allclose(np.asarray(p.obj.Q[0]), np.eye(2) * 1e-3)


def test_doubleintegrator_spec():
    """reference problems/doubleintegrator.jl: N=21, dt=0.1, u∈[-1.5,1.5]."""
    p = _P("doubleintegrator")
    assert p.N == 21
    assert float(p.dt) == pytest.approx(0.1)


def test_cartpole_spec():
    """reference problems/cartpole.jl: N=101, tf=5, u∈[-3,3], goal."""
    p = _P("cartpole")
    assert p.N == 101
    assert float(p.dt) == pytest.approx(5.0 / 100)
    assert p.n == 4 and p.m == 1
    assert np.allclose(np.asarray(p.xf), [0.0, np.pi, 0.0, 0.0])


def test_parallel_park_spec():
    """reference problems/parallel_park.jl: car, N=51, dt=0.06, state box."""
    p = _P("parallel_park")
    assert p.N == 51
    assert float(p.dt) == pytest.approx(0.06)
    assert p.n == 3 and p.m == 2


def test_acrobot_spec():
    """reference problems/acrobot.jl: N=151, dt=0.01."""
    p = _P("acrobot")
    assert p.N == 151
    assert float(p.dt) == pytest.approx(0.01)


def test_car_escape_spec():
    """reference problems/car_escape.jl: N=101, tf=3, 170 circles (3*30+50+2*15),
    infeasible interp_rows seed."""
    p = _P("car_escape")
    assert p.N == 101
    assert float(p.dt) == pytest.approx(3.0 / 100)
    r0, r1 = p.constraints.row_slice("trap")
    assert r1 - r0 == 170
    # infeasible-start state seed present and finite
    assert bool(jnp.all(jnp.isfinite(p.X)))


def test_car_3obs_spec():
    p = _P("car_3obs")
    r0, r1 = p.constraints.row_slice("obs")
    assert r1 - r0 == 3


def test_quadrotor_maze_spec():
    """reference problems/quadrotor_maze.jl: N=101, tf=5, 44 cylinders (5+5+4+5+5+10+10),
    waypoint seed, state box, terminal velocity rows."""
    p = _P("quadrotor_maze")
    assert p.N == 101
    assert float(p.dt) == pytest.approx(0.05)
    r0, r1 = p.constraints.row_slice("maze")
    assert r1 - r0 == 44
    assert bool(jnp.all(jnp.isfinite(p.X)))       # waypoint seed
    assert np.allclose(np.asarray(p.xf)[:3], [0.0, 60.0, 10.0])


def test_quadrotor_spec():
    """reference problems/quadrotor.jl: N=101, 50 m translation (y+50)."""
    p = _P("quadrotor")
    assert p.N == 101
    assert p.n == 13 and p.m == 4
    dy = np.asarray(p.xf)[:3] - np.asarray(p.x0)[:3]
    assert np.linalg.norm(dy) == pytest.approx(50.0, rel=0.2)


def test_kuka_obstacles_spec():
    """reference problems/kuka_obstacles.jl: 7-DOF arm, obstacle bubbles."""
    p = _P("kuka_obstacles")
    assert p.n == 14 and p.m == 7
    assert any("obs" in l for l in p.constraints.labels())


def test_all_zoo_problems_build():
    for name, ctor in probs.PROBLEMS.items():
        p = ctor()
        assert p.N >= 2 and p.U.shape == (p.N - 1, p.m), name


def test_rigidbody_dynamics_has_no_dot_general():
    """The spatial-algebra products must stay on the VPU: as dot_general
    they lower to MXU matmuls that pad 6x6 tiles and pay the 6-pass bf16
    'highest'-precision multiplier (measured 19.5 -> 2.6 ms per kuka
    trajectory-Jacobian batch at B=128). Guard the mul+sum formulation
    (models/rigidbody.py _mm/_mv/_vdot) against regressions."""
    import jax
    import jax.numpy as jnp

    from trajopt_tpu.models.robots import kuka_model

    m = kuka_model()
    x = jnp.zeros(14)
    u = jnp.zeros(7)
    for fn in (lambda: jax.make_jaxpr(m)(x, u),
               lambda: jax.make_jaxpr(lambda x, u: m.jacobian(x, u))(x, u)):
        jaxpr = fn()
        assert "dot_general" not in str(jaxpr), (
            "rigid-body dynamics lowered to dot_general (MXU) — keep the "
            "spatial algebra on broadcast mul+sum (VPU)")
