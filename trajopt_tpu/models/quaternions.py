"""Quaternion utilities (scalar-first [w, x, y, z]).

Counterpart of reference dynamics/quaternions.jl (custom Quaternion type
with Lmult/Rmult/skew used by the quadrotor model and quaternion-aware
constraint work). Functional jnp forms, jit/vmap/grad-safe.
"""
from __future__ import annotations

import jax.numpy as jnp

from trajopt_tpu.models.zoo import quat_mul, quat_rotate  # re-export


def skew(v):
    """(reference quaternions.jl:42-48)."""
    z = jnp.zeros((), v.dtype)
    return jnp.array([
        [z, -v[2], v[1]],
        [v[2], z, -v[0]],
        [-v[1], v[0], z],
    ])


def Lmult(q):
    """Left-multiplication matrix: Lmult(q) @ p == quat_mul(q, p)
    (reference quaternions.jl:50-56)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array([
        [w, -x, -y, -z],
        [x, w, -z, y],
        [y, z, w, -x],
        [z, -y, x, w],
    ])


def Rmult(q):
    """Right-multiplication matrix: Rmult(q) @ p == quat_mul(p, q)
    (reference quaternions.jl:58-64)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array([
        [w, -x, -y, -z],
        [x, w, z, -y],
        [y, -z, w, x],
        [z, y, -x, w],
    ])


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_to_rotmat(q):
    """Direction-cosine matrix of a unit quaternion (reference conj(q)
    matrix form, quaternions.jl:66-75)."""
    w, v = q[0], q[1:]
    S = skew(v)
    return jnp.outer(v, v) + w * w * jnp.eye(3, dtype=q.dtype) \
        + 2.0 * w * S + S @ S


def normalize(q):
    return q / jnp.linalg.norm(q)


def quat_error(q, q_ref):
    """3-parameter attitude error between unit quaternions: the Cayley/
    Rodrigues parameters of q_ref⁻¹ ⊗ q, δθ = vec(dq)/w(dq).

    Completes the reference's quaternion-aware ``state_diff`` TODO
    (reference rollout.jl:50-57); the parametrization follows the REx-lab
    quaternion-iLQR line of work (Lmult/quaternions.jl machinery).
    """
    # cancellation-free form: conj(q_ref) ⊗ q = [|q_ref|²,0,0,0]
    # + conj(q_ref) ⊗ (q − q_ref); the difference e is exact in floating
    # point and all products are small, so the f32 error is relative to
    # |δθ| instead of absolute ~ε (critical for f32 TPU solves with hot
    # feedback gains).
    #
    # The Cayley map is invariant to the q → −q double cover (both v and w
    # of dq negate, so 2v/w is unchanged); its real singularity is a 180°
    # relative rotation (w → 0), inherent to any 3-parameter chart. A
    # sign-preserving floor on the denominator keeps the output finite
    # there — a huge-but-finite δθ that the forward pass's divergence guard
    # handles, instead of an Inf/NaN that poisons the while_loop state.
    de = Lmult(quat_conj(q_ref)) @ (q - q_ref)
    w = q_ref @ q_ref + de[0]
    w_safe = jnp.where(jnp.abs(w) < 1e-6, jnp.where(w < 0, -1e-6, 1e-6), w)
    return 2.0 * de[1:] / w_safe


def quat_error_jacobian(q):
    """Attitude Jacobian G(q) (4, 3): d q / d δθ at δθ = 0 for the
    multiplicative perturbation q ⊗ [1; δθ/2] (unit-norm preserving)."""
    H = jnp.zeros((4, 3), q.dtype).at[1:, :].set(jnp.eye(3, dtype=q.dtype))
    return 0.5 * Lmult(q) @ H


def state_diff(x, x_ref, quat_slice=None):
    """δx between states whose ``quat_slice`` block is a unit quaternion:
    linear difference everywhere, 3-parameter ``quat_error`` for the
    attitude block — output has n-1 entries (reference rollout.jl:50-57
    TODO; identity fallback when ``quat_slice`` is None matches the
    reference's current behavior)."""
    if quat_slice is None:
        return x - x_ref
    a, b = quat_slice
    dth = quat_error(x[a:b], x_ref[a:b])
    return jnp.concatenate([x[:a] - x_ref[:a], dth, x[b:] - x_ref[b:]])


def state_diff_jacobian(x, quat_slice):
    """E(x) (n, n-1) with E[quat block] = G(q): maps error-state tangents
    to raw-state tangents (A_err = E(x')ᵀ A E(x), B_err = E(x')ᵀ B)."""
    a, b = quat_slice
    n = x.shape[0]
    E = jnp.zeros((n, n - 1), x.dtype)
    E = E.at[:a, :a].set(jnp.eye(a, dtype=x.dtype))
    E = E.at[a:b, a:a + 3].set(quat_error_jacobian(x[a:b]))
    E = E.at[b:, a + 3:].set(jnp.eye(n - b, dtype=x.dtype))
    return E


def state_diff_jacobian_inv(x, quat_slice):
    """E⁺(x) (n-1, n): Jacobian of ``state_diff(·, x)`` at coincidence —
    maps raw-state tangents to error-state tangents. For the attitude block
    this is 2·(L(q)ᵀ rows 1:), the pseudo-inverse of G(q) (GᵀG = I/4, so
    Eᵀ alone is NOT the inverse map)."""
    a, b = quat_slice
    n = x.shape[0]
    Ei = jnp.zeros((n - 1, n), x.dtype)
    Ei = Ei.at[:a, :a].set(jnp.eye(a, dtype=x.dtype))
    Ei = Ei.at[a:a + 3, a:b].set(2.0 * Lmult(x[a:b]).T[1:, :])
    Ei = Ei.at[a + 3:, b:].set(jnp.eye(n - b, dtype=x.dtype))
    return Ei
