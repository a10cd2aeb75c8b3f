"""Native robot descriptions.

The reference ships URDF asset files (reference dynamics/urdf/*) loaded via
RigidBodyDynamics.jl. Here the same public robot parameters (KUKA iiwa 14
from the kuka_iiwa_description package; the REx-lab cartpole / double
pendulum / acrobot rigs) are encoded directly as Python structures and built
into :class:`RigidBodyChain` models — no file I/O, fully traceable.
``model_from_urdf`` still accepts user URDF files.
"""
from __future__ import annotations

import numpy as np

from trajopt_tpu.models.base import Model
from trajopt_tpu.models.rigidbody import (
    RigidBodyChain, UrdfJoint, UrdfLink, make_chain_dynamics,
)

_PI = float(np.pi)
_HP = _PI / 2.0


def _link(name, mass=0.0, com=(0, 0, 0), I_diag=(0, 0, 0), iyz=0.0):
    inertia = np.diag(np.asarray(I_diag, dtype=np.float64))
    inertia[1, 2] = inertia[2, 1] = iyz
    return UrdfLink(name=name, mass=mass, com=np.asarray(com, dtype=np.float64),
                    inertia=inertia)


def _joint(name, jtype, parent, child, xyz=(0, 0, 0), rpy=(0, 0, 0),
           axis=(0, 0, 1), damping=0.0):
    return UrdfJoint(name=name, jtype=jtype, parent=parent, child=child,
                     origin_xyz=np.asarray(xyz, dtype=np.float64),
                     origin_rpy=np.asarray(rpy, dtype=np.float64),
                     axis=np.asarray(axis, dtype=np.float64), damping=damping)


def _chain(links, joints):
    return RigidBodyChain(links={l.name: l for l in links}, joints=joints)


# ------------------------------------------------------- KUKA iiwa 14 (7R)
# Kinematics + inertials from the public kuka_iiwa_description URDF
# (reference dynamics/urdf/kuka_iiwa.urdf).

def kuka_chain() -> RigidBodyChain:
    links = [
        _link("base"),
        _link("l0", 5.0, (-0.1, 0, 0.07), (0.05, 0.06, 0.03)),
        _link("l1", 5.76, (0, -0.03, 0.12), (0.033, 0.0333, 0.0123), iyz=0.004887),
        _link("l2", 6.35, (0.0003, 0.059, 0.042), (0.0305, 0.0304, 0.011), iyz=0.004887),
        _link("l3", 3.5, (0, 0.03, 0.13), (0.025, 0.0238, 0.0076), iyz=0.00487),
        _link("l4", 3.5, (0, 0.067, 0.034), (0.017, 0.0164, 0.006), iyz=0.00284),
        _link("l5", 3.5, (0.0001, 0.021, 0.076), (0.01, 0.0087, 0.00449), iyz=0.00309),
        _link("l6", 1.8, (0, 0.0006, 0.0004), (0.0049, 0.0047, 0.0036), iyz=0.000246),
        _link("l7", 1.2, (0, 0, 0.02), (0.0002, 0.0002, 0.0003)),
        _link("ee"),
    ]
    d = 0.5
    joints = [
        _joint("j0", "fixed", "base", "l0"),
        _joint("j1", "revolute", "l0", "l1", xyz=(0, 0, 0.1575), damping=d),
        _joint("j2", "revolute", "l1", "l2", xyz=(0, 0, 0.2025), rpy=(_HP, 0, _PI), damping=d),
        _joint("j3", "revolute", "l2", "l3", xyz=(0, 0.2045, 0), rpy=(_HP, 0, _PI), damping=d),
        _joint("j4", "revolute", "l3", "l4", xyz=(0, 0, 0.2155), rpy=(_HP, 0, 0), damping=d),
        _joint("j5", "revolute", "l4", "l5", xyz=(0, 0.1845, 0), rpy=(-_HP, _PI, 0), damping=d),
        _joint("j6", "revolute", "l5", "l6", xyz=(0, 0, 0.2155), rpy=(_HP, 0, 0), damping=d),
        _joint("j7", "revolute", "l6", "l7", xyz=(0, 0.081, 0), rpy=(-_HP, _PI, 0), damping=d),
        _joint("jee", "fixed", "l7", "ee", xyz=(0, 0, 0.045)),
    ]
    return _chain(links, joints)


# --------------------------------------------- two-link pendulum mechanism
# (reference dynamics/urdf/doublependulum.urdf / acrobot.urdf — same rig)

def doublependulum_chain() -> RigidBodyChain:
    links = [
        _link("base"),
        _link("upper", 1.0, (0, 0, -0.5), (1.0, 0.083, 1.0)),
        _link("lower", 1.0, (0, 0, -1.0), (1.0, 0.33, 1.0)),
    ]
    joints = [
        _joint("shoulder", "continuous", "base", "upper", xyz=(0, 0.15, 0),
               axis=(0, 1, 0), damping=0.1),
        _joint("elbow", "continuous", "upper", "lower", xyz=(0, 0.1, -1),
               axis=(0, 1, 0), damping=0.1),
    ]
    return _chain(links, joints)


# ------------------------------------------------------------ cartpole rig
# (reference dynamics/urdf/cartpole.urdf: 1 kg cart, 10 kg pole at 0.5 m)

def cartpole_chain() -> RigidBodyChain:
    links = [
        _link("bar"),
        _link("cart", 1.0, (0, 0, 0), (1.0, 1.0, 1.0)),
        _link("pole", 10.0, (0, 0, 0.5), (1.0, 1.0, 1.0)),
    ]
    joints = [
        _joint("slide", "prismatic", "bar", "cart", axis=(1, 0, 0)),
        _joint("hinge", "continuous", "cart", "pole", axis=(0, 1, 0)),
    ]
    return _chain(links, joints)


def _model_from_chain(chain: RigidBodyChain, actuated=None, name="robot",
                      gravity=9.81) -> Model:
    nd = chain.ndof
    if actuated is None:
        B = None
        m = nd
    else:
        actuated = np.asarray(actuated, dtype=np.float64)
        cols = np.where(actuated != 0)[0]
        B = np.zeros((nd, len(cols)))
        for i, c in enumerate(cols):
            B[c, i] = actuated[c]
        m = len(cols)

    # use_damping=False matches the reference: RigidBodyDynamics.jl does
    # not parse URDF <dynamics damping> (reference model.jl:411-415).
    # Structured inverse-dynamics JVP — see rigidbody.make_chain_dynamics.
    f = make_chain_dynamics(chain, B=B, gravity=gravity, use_damping=False)

    model = Model(f, 2 * nd, m, name=name)
    model.chain = chain
    # dynamics metadata for the lane-batched Featherstone step factory
    # (models/rigidbody_lanes.py) — discretize() uses it to attach a
    # step_lanes so the Pallas rollout/forward kernels engage
    model.chain_meta = dict(B=B, gravity=gravity, use_damping=False)
    return model


def kuka_model() -> Model:
    """(reference dynamics/kuka.jl): n=14, m=7."""
    return _model_from_chain(kuka_chain(), name="kuka")


def doublependulum_urdf_model() -> Model:
    """(reference dynamics/doublependulum.jl)."""
    return _model_from_chain(doublependulum_chain(), name="doublependulum_urdf")


def acrobot_urdf_model() -> Model:
    """(reference dynamics/acrobot.jl): elbow-only actuation."""
    return _model_from_chain(doublependulum_chain(), actuated=[0.0, 1.0],
                             name="acrobot_urdf")


def cartpole_urdf_model() -> Model:
    """(reference dynamics/cartpole.jl cartpole_urdf): slider-only actuation."""
    return _model_from_chain(cartpole_chain(), actuated=[1.0, 0.0],
                             name="cartpole_urdf")


def kuka_hold_trajectory(chain: RigidBodyChain, q, N: int):
    """Gravity-compensation controls holding configuration q
    (reference hold_trajectory, dynamics/kuka.jl:129-145)."""
    import jax.numpy as jnp

    q = jnp.asarray(q)
    tau = chain.bias_forces(q, jnp.zeros_like(q))
    return jnp.broadcast_to(tau, (N - 1, q.shape[0]))


def kuka_ee_ik(chain: RigidBodyChain, point, ee_point=(0.0, 0.0, 0.0),
               iterations: int = 1000, attempts: int = 20, tol: float = 1e-2,
               alpha: float = 0.1, seed: int = 0):
    """Inverse kinematics for the end-effector point: find q with
    FK(q) ≈ ``point`` (reference kuka_ee_ik + jacobian_transpose_ik!,
    dynamics/kuka.jl:63-116).

    TPU-native formulation: the reference retries random seeds sequentially;
    here all ``attempts`` restarts run as ONE vmapped jacobian-transpose
    descent (α Jᵀ e updates via ``jax.jacrev`` of the FK point) and the best
    configuration is selected. Raises if no attempt reaches ``tol``
    (reference kuka.jl:79-81).

    Returns (q, err).
    """
    import jax
    import jax.numpy as jnp

    ftype = jnp.result_type(float)   # f64 under x64, f32 otherwise
    point = jnp.asarray(point, ftype)
    ee = jnp.asarray(ee_point, ftype)
    nd = len(chain.moving)

    def fk_point(q):
        return chain.forward_kinematics(q, point=ee)[1]

    jac = jax.jacrev(fk_point)

    def descend(q0):
        def step(_, q):
            e = point - fk_point(q)
            return q + alpha * (jac(q).T @ e)
        q = jax.lax.fori_loop(0, iterations, step, q0)
        return q, jnp.linalg.norm(point - fk_point(q))

    key = jax.random.PRNGKey(seed)
    q0s = jax.random.uniform(key, (attempts, nd), ftype,
                             -jnp.pi, jnp.pi)
    qs, errs = jax.jit(jax.vmap(descend))(q0s)
    # a diverged restart yields NaN; argmin would select it and NaN > tol
    # is False, so mask NaNs out before picking the best attempt
    errs = jnp.where(jnp.isnan(errs), jnp.inf, errs)
    best = int(jnp.argmin(errs))
    if float(errs[best]) > tol:
        raise RuntimeError(
            f"IK cannot get sufficiently close to the goal "
            f"(best err {float(errs[best]):.3g} > tol {tol})")
    return qs[best], float(errs[best])
