"""Analytic dynamics model zoo.

TPU-native counterparts of the reference model zoo (reference dynamics/*.jl,
loaded as the ``Dynamics`` module, src/dynamics.jl:10-33). All models are
pure jnp functions of (x, u) [plus (w,) for uncertain variants], fully
traceable, vmappable and dtype-polymorphic.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from trajopt_tpu.models.base import Model
from trajopt_tpu.ops.linalg import spd_solve_vec

# ---------------------------------------------------------------- pendulum
# reference dynamics/pendulum.jl:3-14

def pendulum_dynamics(x, u):
    m, b, lc, I_, g = 1.0, 0.1, 0.5, 0.25, 9.81
    return jnp.stack([
        x[1],
        (u[0] - m * g * lc * jnp.sin(x[0]) - b * x[1]) / I_,
    ])


pendulum = Model(pendulum_dynamics, 2, 1, name="pendulum")


def pendulum_dynamics_uncertain(x, u, w):
    # reference dynamics/pendulum.jl:18-29 (unknown mass)
    m = 1.0 + w[0]
    b, lc, g = 0.1, 0.5, 9.81
    return jnp.stack([
        x[1],
        u[0] / (m * lc * lc) - g * jnp.sin(x[0]) / lc - b * x[1] / (m * lc * lc),
    ])


pendulum_uncertain = Model(pendulum_dynamics_uncertain, 2, 1, r=1,
                           name="pendulum_uncertain")

# ------------------------------------------------------- double integrator
# reference dynamics/double_integrator.jl:1-9

def double_integrator_dynamics(x, u):
    return jnp.stack([x[1], u[0]])


doubleintegrator = Model(double_integrator_dynamics, 2, 1,
                         name="doubleintegrator")

# --------------------------------------------------------------------- car
# reference dynamics/car.jl:3-11 (Dubins/unicycle kinematics)

def car_dynamics(x, u):
    return jnp.stack([
        u[0] * jnp.cos(x[2]),
        u[0] * jnp.sin(x[2]),
        u[1],
    ])


car = Model(car_dynamics, 3, 2, name="car")

# ---------------------------------------------------------------- cartpole
# reference dynamics/cartpole.jl:9-40 (manipulator equations)

def cartpole_dynamics(x, u):
    mc, mp, l, g = 1.0, 0.2, 0.5, 9.81
    q, qd = x[:2], x[2:]
    s, c = jnp.sin(q[1]), jnp.cos(q[1])

    H = jnp.array([[mc + mp, mp * l * c], [mp * l * c, mp * l * l]], dtype=x.dtype)
    C = jnp.array([[0.0, -mp * qd[1] * l * s], [0.0, 0.0]], dtype=x.dtype)
    G = jnp.array([0.0, mp * g * l * s], dtype=x.dtype)
    B = jnp.array([1.0, 0.0], dtype=x.dtype)

    qdd = -spd_solve_vec(H, C @ qd + G - B * u[0])
    return jnp.concatenate([qd, qdd])


cartpole = Model(cartpole_dynamics, 4, 1, name="cartpole")


def cartpole_dynamics_uncertain(x, u, w):
    # reference dynamics/cartpole.jl:44-72 (unknown force disturbance)
    mc, mp, l, g = 1.0, 0.2, 0.5, 9.81
    q, qd = x[:2], x[2:]
    s, c = jnp.sin(q[1]), jnp.cos(q[1])

    H = jnp.array([[mc + mp, mp * l * c], [mp * l * c, mp * l * l]], dtype=x.dtype)
    C = jnp.array([[0.0, -mp * qd[1] * l * s], [0.0, 0.0]], dtype=x.dtype)
    G = jnp.array([0.0, mp * g * l * s], dtype=x.dtype)
    B = jnp.array([1.0, 0.0], dtype=x.dtype)

    qdd = -spd_solve_vec(H, C @ qd + G - B * u[0] - B * w[0])
    return jnp.concatenate([qd, qdd])


cartpole_uncertain = Model(cartpole_dynamics_uncertain, 4, 1, r=1,
                           name="cartpole_uncertain")

# ------------------------------------------------------------ ball on beam
# reference dynamics/ballonbeam.jl:3-24

def ballonbeam_dynamics(x, u):
    g, m1, m2, l = 9.81, 0.35, 2.0, 0.5
    z, theta, zdot, thetadot = x[0], x[1], x[2], x[3]
    F = u[0]
    zddot = z * thetadot**2 - g * jnp.sin(theta)
    thetaddot = (
        F * l * jnp.cos(theta)
        - 2.0 * m1 * z * zdot * thetadot
        - m1 * g * z * jnp.cos(theta)
        - (m2 * g * l * jnp.cos(theta)) / 2.0
    ) / (m2 * l**2 / 3.0 + m1 * z**2)
    return jnp.stack([zdot, thetadot, zddot, thetaddot])


ballonbeam = Model(ballonbeam_dynamics, 4, 1, name="ballonbeam")

# ---------------------------------------------------- double pendulum family
# The reference builds these from dynamics/urdf/doublependulum.urdf through
# RigidBodyDynamics (dynamics/doublependulum.jl, dynamics/acrobot.jl). Here
# the same mechanism (two-link pendulum: m1=m2=1, link1 joint->joint 1 m,
# COM at 0.5 m, iyy1=0.083; link2 COM at 1 m, iyy2=0.33; joint damping 0.1)
# is written analytically via the planar manipulator equations.

# damping = 0: the reference builds these via RigidBodyDynamics.jl, which
# ignores URDF <dynamics damping> (see models/rigidbody.py)
_DP = dict(m1=1.0, m2=1.0, l1=1.0, lc1=0.5, lc2=1.0, I1=0.083, I2=0.33,
           b1=0.0, b2=0.0, g=9.81)


def _two_link_dynamics(x, tau):
    p = _DP
    q1, q2, qd1, qd2 = x[0], x[1], x[2], x[3]
    c2, s2 = jnp.cos(q2), jnp.sin(q2)

    # Mass matrix (standard 2R manipulator, e.g. Spong eq. 7.87)
    a = p["I1"] + p["I2"] + p["m1"] * p["lc1"] ** 2 \
        + p["m2"] * (p["l1"] ** 2 + p["lc2"] ** 2)
    b = p["m2"] * p["l1"] * p["lc2"]
    d = p["I2"] + p["m2"] * p["lc2"] ** 2

    H11 = a + 2.0 * b * c2
    H12 = d + b * c2
    H22 = d
    H = jnp.array([[H11, H12], [H12, H22]], dtype=x.dtype)

    # Coriolis + centrifugal
    C = jnp.array([
        -b * s2 * qd2 * (2.0 * qd1 + qd2),
        b * s2 * qd1 * qd1,
    ], dtype=x.dtype)

    # Gravity (q measured from straight-down equilibrium)
    g1 = (p["m1"] * p["lc1"] + p["m2"] * p["l1"]) * p["g"] * jnp.sin(q1) \
        + p["m2"] * p["lc2"] * p["g"] * jnp.sin(q1 + q2)
    g2 = p["m2"] * p["lc2"] * p["g"] * jnp.sin(q1 + q2)
    G = jnp.array([g1, g2], dtype=x.dtype)

    damp = jnp.array([p["b1"] * qd1, p["b2"] * qd2], dtype=x.dtype)
    qdd = spd_solve_vec(H, tau - C - G - damp)
    return jnp.concatenate([x[2:], qdd])


def doublependulum_dynamics(x, u):
    return _two_link_dynamics(x, u)


def acrobot_dynamics(x, u):
    # elbow-only actuation (reference dynamics/acrobot.jl:6, B = [0; 1])
    tau = jnp.stack([jnp.zeros((), dtype=x.dtype), u[0]])
    return _two_link_dynamics(x, tau)


doublependulum = Model(doublependulum_dynamics, 4, 2, name="doublependulum")
acrobot = Model(acrobot_dynamics, 4, 1, name="acrobot")

# -------------------------------------------------- quadrotor (quaternion)
# reference dynamics/quadrotor.jl:1-73 + dynamics/quaternions.jl.
# State (13): pos(3), quaternion [w,x,y,z](4), vel(3), omega(3).

QUAD_PARAMS = dict(
    m=0.5,
    J=jnp.diag(jnp.array([0.0023, 0.0023, 0.004])),
    Jinv=jnp.diag(1.0 / jnp.array([0.0023, 0.0023, 0.004])),
    gravity=jnp.array([0.0, 0.0, -9.81]),
    motor_dist=0.1750,
    kf=1.0,
    km=0.0245,
)


def quat_mul(q1, q2):
    """Hamilton product q1 ⊗ q2, scalar-first [w, x, y, z]."""
    w1, v1 = q1[0], q1[1:]
    w2, v2 = q2[0], q2[1:]
    w = w1 * w2 - v1 @ v2
    v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
    return jnp.concatenate([w[None], v])


def quat_rotate(q, r):
    """Rotate vector r by unit quaternion q (matches reference q*r,
    dynamics/quaternions.jl:31-37 which computes conj(q)-matrix action)."""
    w, v = q[0], q[1:]
    return r + 2.0 * jnp.cross(v, jnp.cross(v, r) + w * r)


def quadrotor_dynamics(x, u, params=None):
    p = QUAD_PARAMS if params is None else params
    q = x[3:7]
    q = q / jnp.linalg.norm(q)
    v = x[7:10]
    omega = x[10:13]

    kf, km, L = p["kf"], p["km"], p["motor_dist"]
    F_rotors = kf * u  # (4,)
    F_body = jnp.array([0.0, 0.0, 1.0], dtype=x.dtype) * jnp.sum(F_rotors)
    M = km * u
    tau = jnp.stack([
        L * (F_rotors[1] - F_rotors[3]),
        L * (F_rotors[2] - F_rotors[0]),
        M[0] - M[1] + M[2] - M[3],
    ])

    qdot = 0.5 * quat_mul(q, jnp.concatenate([jnp.zeros((1,), dtype=x.dtype), omega]))
    vdot = p["gravity"].astype(x.dtype) + quat_rotate(q, F_body) / p["m"]
    J = p["J"].astype(x.dtype)
    Jinv = p["Jinv"].astype(x.dtype)
    omegadot = Jinv @ (tau - jnp.cross(omega, J @ omega))

    return jnp.concatenate([v, qdot, vdot, omegadot])


quadrotor = Model(quadrotor_dynamics, 13, 4, name="quadrotor")
quadrotor.quat_slice = (3, 7)  # unit quaternion at x[3:7]

# ------------------------------------------------------- quadrotor (Euler)
# reference dynamics/quadrotor_euler.jl. State (12): pos(3), rpy(3),
# vel(3), rpy rates(3).


def _rpy2rotmat(rpy):
    cr, sr = jnp.cos(rpy[0]), jnp.sin(rpy[0])
    cp, sp = jnp.cos(rpy[1]), jnp.sin(rpy[1])
    cy, sy = jnp.cos(rpy[2]), jnp.sin(rpy[2])
    return jnp.array([
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
        [-sp, cp * sr, cp * cr],
    ], dtype=rpy.dtype)


def _rpydot2angularvel_matrix(rpy):
    p, y = rpy[1], rpy[2]
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.array([
        [cp * cy, -sy, 0.0],
        [cp * sy, cy, 0.0],
        [-sp, 0.0, 1.0],
    ], dtype=rpy.dtype)


def _angularvel2rpydot_matrix(rpy):
    p, y = rpy[1], rpy[2]
    sp, cp = jnp.sin(p), jnp.cos(p)
    sy, cy = jnp.sin(y), jnp.cos(y)
    tp = sp / cp
    return jnp.array([
        [cy / cp, sy / cp, 0.0],
        [-sy, cy, 0.0],
        [cy * tp, tp * sy, 1.0],
    ], dtype=rpy.dtype)


def quadrotor_euler_dynamics(x, u):
    m = 0.5
    J = jnp.diag(jnp.array([0.0023, 0.0023, 0.004])).astype(x.dtype)
    Jinv = jnp.diag(1.0 / jnp.array([0.0023, 0.0023, 0.004])).astype(x.dtype)
    g, L, kf, km = 9.81, 0.1750, 1.0, 0.0245

    rpy = x[3:6]
    rpyd = x[9:12]

    R = _rpy2rotmat(rpy)
    F = kf * u
    Mo = km * u

    xyz_ddot = (jnp.array([0.0, 0.0, -m * g], dtype=x.dtype)
                + R @ jnp.array([0.0, 0.0, 1.0], dtype=x.dtype) * jnp.sum(F)) / m

    # body angular velocity from rpy rates (world->body via R^T as in ref)
    pqr = R.T @ (_rpydot2angularvel_matrix(rpy) @ rpyd)
    tau = jnp.stack([L * (F[1] - F[3]), L * (F[2] - F[0]),
                     Mo[0] - Mo[1] + Mo[2] - Mo[3]])
    pqr_dot = Jinv @ (tau - jnp.cross(pqr, J @ pqr))

    # rpy accelerations — full product rule on rpyd = G(rpy)·pqr with
    # G = Phi·R (reference quadrotor_euler.jl:63-83 expands dPhi and Rdot
    # by hand; here Ġ = jvp(G)(rpy; rpyd) is the same two correction terms
    # derived by AD):  rpÿ = G·pqṙ + Ġ·pqr.
    def G(rpy_):
        return _angularvel2rpydot_matrix(rpy_) @ _rpy2rotmat(rpy_)

    G_val, G_dot = jax.jvp(G, (rpy,), (rpyd,))
    rpy_ddot = G_val @ pqr_dot + G_dot @ pqr

    return jnp.concatenate([x[6:12], xyz_ddot, rpy_ddot])


quadrotor_euler = Model(quadrotor_euler_dynamics, 12, 4, name="quadrotor_euler")


def _robot_models():
    """URDF-rig models (lazy import to avoid cycles)."""
    from trajopt_tpu.models import robots
    return {
        "kuka": robots.kuka_model,
        "doublependulum_urdf": robots.doublependulum_urdf_model,
        "acrobot_urdf": robots.acrobot_urdf_model,
        "cartpole_urdf": robots.cartpole_urdf_model,
    }


MODELS = {
    "pendulum": pendulum,
    "pendulum_uncertain": pendulum_uncertain,
    "doubleintegrator": doubleintegrator,
    "car": car,
    "cartpole": cartpole,
    "cartpole_uncertain": cartpole_uncertain,
    "ballonbeam": ballonbeam,
    "doublependulum": doublependulum,
    "acrobot": acrobot,
    "quadrotor": quadrotor,
    "quadrotor_euler": quadrotor_euler,
}
