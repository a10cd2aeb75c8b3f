"""Pallas TPU kernel: fused batched closed-loop rollout.

The iLQR forward pass re-simulates the trajectory for every line-search
candidate (reference rollout.jl:2-23). Under XLA this is a `lax.scan` whose
N~100 sequential iterations each pay loop overhead and HBM round-trips for
the tiny carry. This kernel runs the ENTIRE sweep inside one Pallas program:

- layout: batch on the LANE axis — states (n, B_tile), gains (m, n, B_tile)
  — so every dynamics operation is a vector op over 128 lanes,
- the state carry stays on-chip across the whole time loop,
- the divergence guard becomes a lane mask.

The dynamics is traced INTO the kernel from a batch-last step function; a
quadrotor RK3 implementation is provided (`quadrotor_step_lanes`). Grid =
batch tiles; each program handles 128 problems.

Used as an optional fast path (`rollout_closed_loop_pallas`); numerics are
validated against ops.rollout.rollout_closed_loop in tests/test_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


# ------------------------------------------------- batch-last quadrotor rk3

def _quat_mul_lanes(qw, qx, qy, qz, pw, px, py, pz):
    w = qw * pw - qx * px - qy * py - qz * pz
    x = qw * px + pw * qx + qy * pz - qz * py
    y = qw * py + pw * qy + qz * px - qx * pz
    z = qw * pz + pw * qz + qx * py - qy * px
    return w, x, y, z


def quadrotor_dynamics_lanes(x, u):
    """Continuous quadrotor dynamics, batch-last: x (13, B), u (4, B).

    Same model as models.zoo.quadrotor_dynamics (reference
    dynamics/quadrotor.jl) written as lane-parallel ops.
    """
    m_, L, kf, km = 0.5, 0.1750, 1.0, 0.0245
    Jx, Jy, Jz = 0.0023, 0.0023, 0.004
    g = -9.81

    qw, qx, qy, qz = x[3], x[4], x[5], x[6]
    # NOTE: 1/sqrt, not lax.rsqrt — TPU rsqrt is an approximation and the
    # error compounds over the rollout horizon
    qn = 1.0 / jnp.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
    qw, qx, qy, qz = qw * qn, qx * qn, qy * qn, qz * qn
    wx, wy, wz = x[10], x[11], x[12]

    F = kf * (u[0] + u[1] + u[2] + u[3])
    tx = L * kf * (u[1] - u[3])
    ty = L * kf * (u[2] - u[0])
    tz = km * (u[0] - u[1] + u[2] - u[3])

    dqw, dqx, dqy, dqz = _quat_mul_lanes(qw, qx, qy, qz,
                                         jnp.zeros_like(qw), wx, wy, wz)

    # world-frame thrust: R(q) (0,0,F)/m + g e3
    ax = 2.0 * (qx * qz + qw * qy) * F / m_
    ay = 2.0 * (qy * qz - qw * qx) * F / m_
    az = (1.0 - 2.0 * (qx * qx + qy * qy)) * F / m_ + g

    dwx = (tx - (Jz - Jy) * wy * wz) / Jx
    dwy = (ty - (Jx - Jz) * wz * wx) / Jy
    dwz = (tz - (Jy - Jx) * wx * wy) / Jz

    return jnp.stack([x[7], x[8], x[9],
                      0.5 * dqw, 0.5 * dqx, 0.5 * dqy, 0.5 * dqz,
                      ax, ay, az, dwx, dwy, dwz])


def quadrotor_state_diff_lanes(x, xr):
    """Lane-batched quaternion error state-diff for the quadrotor layout
    (quat at rows 3:7): rows [dp(3), dth(3), dv(3), dw(3)], each (B,)
    (models/quaternions.py state_diff with quat_slice=(3, 7))."""
    qw, qx, qy, qz = x[3], x[4], x[5], x[6]
    rw, rx, ry, rz = xr[3], xr[4], xr[5], xr[6]
    # cancellation-free: dq = conj(q_ref) ⊗ (q − q_ref), scalar += |q_ref|²
    # (see models/quaternions.quat_error)
    ew, ex, ey, ez = qw - rw, qx - rx, qy - ry, qz - rz
    dw, dx_, dy, dz = _quat_mul_lanes(rw, -rx, -ry, -rz, ew, ex, ey, ez)
    nrm = rw * rw + rx * rx + ry * ry + rz * rz
    # sign-preserving denominator floor at the 180°-error singularity
    # (kept equivalent to models/quaternions.quat_error)
    den = nrm + dw
    den = jnp.where(jnp.abs(den) < 1e-6,
                    jnp.where(den < 0, -1e-6, 1e-6), den)
    inv = 2.0 / den
    return jnp.stack([
        x[0] - xr[0], x[1] - xr[1], x[2] - xr[2],
        dx_ * inv, dy * inv, dz * inv,
        x[7] - xr[7], x[8] - xr[8], x[9] - xr[9],
        x[10] - xr[10], x[11] - xr[11], x[12] - xr[12],
    ])


def quadrotor_step_lanes(x, u, dt):
    """RK3-ZOH step, batch-last (reference integration.jl:149-158)."""
    k1 = dt * quadrotor_dynamics_lanes(x, u)
    k2 = dt * quadrotor_dynamics_lanes(x + 0.5 * k1, u)
    k3 = dt * quadrotor_dynamics_lanes(x - k1 + 2.0 * k2, u)
    return x + (k1 + 4.0 * k2 + k3) / 6.0


# ------------------------------------------------------ batch-last cartpole

def cartpole_dynamics_lanes(x, u):
    """Continuous cartpole dynamics, batch-last: x (4, B), u (1, B) — the
    2x2 mass-matrix solve written as an explicit inverse (same model as
    models.zoo.cartpole_dynamics, reference dynamics/cartpole.jl)."""
    mc, mp, l, g = 1.0, 0.2, 0.5, 9.81
    th, v, w = x[1], x[2], x[3]
    s = jnp.sin(th)
    c = jnp.cos(th)

    # H = [[mc+mp, mp l c], [mp l c, mp l^2]]
    h11 = mc + mp
    h12 = mp * l * c
    h22 = mp * l * l
    det = h11 * h22 - h12 * h12
    # rhs = B u - C qd - G  with C qd = [-mp w l s * w, 0], G = [0, mp g l s]
    r1 = u[0] + mp * w * l * s * w
    r2 = -mp * g * l * s
    vd = (h22 * r1 - h12 * r2) / det
    wd = (h11 * r2 - h12 * r1) / det
    return jnp.stack([v, w, vd, wd])


def cartpole_step_lanes(x, u, dt):
    """RK3-ZOH step, batch-last."""
    k1 = dt * cartpole_dynamics_lanes(x, u)
    k2 = dt * cartpole_dynamics_lanes(x + 0.5 * k1, u)
    k3 = dt * cartpole_dynamics_lanes(x - k1 + 2.0 * k2, u)
    return x + (k1 + 4.0 * k2 + k3) / 6.0


# ------------------------------------- batch-last car / pendulum / 2x-int

def _rk3_lanes(dyn):
    """RK3-ZOH step factory for batch-last lane dynamics
    (reference integration.jl:149-158)."""
    def step(x, u, dt):
        k1 = dt * dyn(x, u)
        k2 = dt * dyn(x + 0.5 * k1, u)
        k3 = dt * dyn(x - k1 + 2.0 * k2, u)
        return x + (k1 + 4.0 * k2 + k3) / 6.0
    return step


def car_dynamics_lanes(x, u):
    """Dubins car, batch-last: x (3, B), u (2, B) (same model as
    models.zoo.car_dynamics, reference dynamics/car.jl) — the scalar form
    is already row-indexed, so the lane layout reuses it verbatim."""
    return jnp.stack([u[0] * jnp.cos(x[2]), u[0] * jnp.sin(x[2]), u[1]])


def pendulum_dynamics_lanes(x, u):
    """Damped pendulum, batch-last: x (2, B), u (1, B) (same constants as
    models.zoo.pendulum_dynamics, reference dynamics/pendulum.jl)."""
    m, b, lc, I_, g = 1.0, 0.1, 0.5, 0.25, 9.81
    return jnp.stack([x[1], (u[0] - m * g * lc * jnp.sin(x[0]) - b * x[1]) / I_])


def double_integrator_dynamics_lanes(x, u):
    """Double integrator, batch-last (models.zoo.double_integrator_dynamics)."""
    return jnp.stack([x[1], u[0]])


car_step_lanes = _rk3_lanes(car_dynamics_lanes)
pendulum_step_lanes = _rk3_lanes(pendulum_dynamics_lanes)
double_integrator_step_lanes = _rk3_lanes(double_integrator_dynamics_lanes)


# ----------------------------------------------------------------- kernel

def _rollout_kernel(step_lanes, diff_lanes, N,
                    x0_ref, X_ref, U_ref, K_ref, d_ref, alpha_ref, dt_ref,
                    Xout_ref, Uout_ref, ok_ref):
    """One batch tile: full closed-loop sweep.

    Block shapes (leading grid dim squeezed by indexing [0]):
    x0 (1,n,B), X (1,N,n,B), U (1,N-1,m,B), K (1,N-1,m,n,B), d (1,N-1,m,B),
    alpha (1,1,B) → Xout (1,N,n,B), Uout (1,N-1,m,B), ok (1,1,B) [f32 mask].
    """
    alpha = alpha_ref[0, 0]                  # (B,)
    dt = dt_ref[0]                           # (1, B)
    Xout_ref[0, 0] = x0_ref[0]

    def body(k, carry):
        x, okm = carry                       # (n, B), (B,) f32 1/0
        dx = diff_lanes(x, X_ref[0, k])
        Kk = K_ref[0, k]                     # (m, ns, B) — ns = tangent dim
        u = U_ref[0, k] + jnp.sum(Kk * dx[None, :, :], axis=1) \
            + alpha[None, :] * d_ref[0, k]
        x_next = step_lanes(x, u, dt)
        good = (jnp.max(jnp.abs(x_next), axis=0) < 1e8) \
            & (jnp.max(jnp.abs(u), axis=0) < 1e8)
        finite = jnp.all(jnp.isfinite(x_next), axis=0)
        okm = okm * jnp.where(good & finite, 1.0, 0.0)
        x_next = jnp.where(okm[None, :] > 0, x_next, x)
        Xout_ref[0, k + 1] = x_next
        Uout_ref[0, k] = u
        return x_next, okm

    x = x0_ref[0]
    okm = jnp.ones_like(alpha)
    x, okm = jax.lax.fori_loop(0, N - 1, body, (x, okm))
    ok_ref[0, 0] = okm


def _rollout_closed_loop_pallas_impl(step_lanes, x0, X, U, K, d, alpha, dt,
                               interpret=False, diff_lanes=None):
    """Fused batched closed-loop rollout.

    Batch-first inputs matching ``vmap(rollout_closed_loop)``:
    x0 (B,n), X (B,N,n), U (B,N-1,m), K (B,N-1,m,n), d (B,N-1,m),
    alpha (B,). Returns (Xbar (B,N,n), Ubar (B,N-1,m), ok (B,) bool).

    B must be a multiple of 128 (lane width).
    """
    Bt = LANES
    Bsz, N, n = X.shape
    m = U.shape[-1]
    ns = K.shape[-1]                         # tangent dim (n, or n-1 error-state)
    assert Bsz % Bt == 0, "batch must be a multiple of 128"
    nb = Bsz // Bt
    dtype = X.dtype

    def to_lanes(a):
        a = a.reshape((nb, Bt) + a.shape[1:])
        return jnp.moveaxis(a, 1, -1)

    x0_l = to_lanes(x0)                      # (nb, n, Bt)
    X_l = to_lanes(X)                        # (nb, N, n, Bt)
    U_l = to_lanes(U)
    K_l = to_lanes(K)
    d_l = to_lanes(d)
    a_l = to_lanes(alpha[:, None])           # (nb, 1, Bt)
    dt_l = to_lanes(jnp.broadcast_to(jnp.asarray(dt, dtype), (Bsz,))[:, None])

    if diff_lanes is None:
        diff_lanes = lambda x, xr: x - xr
    kern = functools.partial(_rollout_kernel, step_lanes, diff_lanes, N)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape,
                            lambda i, _nd=nd: (i,) + (0,) * _nd,
                            memory_space=pltpu.VMEM)

    Xout, Uout, ok = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            bspec((n, Bt)),
            bspec((N, n, Bt)),
            bspec((N - 1, m, Bt)),
            bspec((N - 1, m, ns, Bt)),
            bspec((N - 1, m, Bt)),
            bspec((1, Bt)),
            bspec((1, Bt)),
        ],
        out_specs=(
            bspec((N, n, Bt)),
            bspec((N - 1, m, Bt)),
            bspec((1, Bt)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, N, n, Bt), dtype),
            jax.ShapeDtypeStruct((nb, N - 1, m, Bt), dtype),
            jax.ShapeDtypeStruct((nb, 1, Bt), dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x0_l, X_l, U_l, K_l, d_l, a_l, dt_l)

    def from_lanes(a):
        a = jnp.moveaxis(a, -1, 1)
        return a.reshape((Bsz,) + a.shape[2:])

    return from_lanes(Xout), from_lanes(Uout), from_lanes(ok)[:, 0] > 0


def rollout_closed_loop_pallas(step_lanes, x0, X, U, K, d, alpha, dt,
                               interpret=False, diff_lanes=None):
    """Chunked front-end (see pallas_riccati.riccati_sweep_pallas): ≤256
    problems per pallas_call to stay within VMEM under Mosaic's block
    double-buffering."""
    Bz = X.shape[0]
    chunk = 256 if (Bz % 256 == 0 and U.shape[-1] <= 8) else LANES
    if Bz <= chunk:
        return _rollout_closed_loop_pallas_impl(step_lanes, x0, X, U, K, d,
                                                alpha, dt, interpret,
                                                diff_lanes)
    nchunk = Bz // chunk

    def resh(x):
        return x.reshape((nchunk, chunk) + x.shape[1:])

    out = jax.lax.map(
        lambda args: _rollout_closed_loop_pallas_impl(step_lanes, *args, dt,
                                                      interpret, diff_lanes),
        tuple(resh(x) for x in (x0, X, U, K, d, alpha)))
    return tuple(o.reshape((Bz,) + o.shape[2:]) for o in out)
