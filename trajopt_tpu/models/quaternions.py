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
