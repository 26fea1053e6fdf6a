"""Sim(3) / SE(3) / SO(3) Lie-group operations in pure JAX.

TPU-native replacement for the reference's pypose usage and the device-side
Sim3 math in ``VSLAM/backend/src/gn_kernels.cu:178-440`` (quat_comp, actSO3,
actSim3, expSO3, expSim3, retrSim3, relSim3, apply_Sim3_adj_inv).

Conventions (matching pypose + the reference CUDA kernels):

* A Sim(3) element is an 8-vector ``[tx, ty, tz, qx, qy, qz, qw, s]``
  (translation, unit quaternion in xyzw order, positive scale).
* An SE(3) element is a 7-vector ``[tx, ty, tz, qx, qy, qz, qw]``.
* The Sim(3) tangent is a 7-vector ``xi = [tau(3), phi(3), sigma]``.
* Action: ``Y = s * R(q) * X + t``.
* Retraction is LEFT-multiplicative: ``retr(T, xi) = Exp(xi) * T``
  (``gn_kernels.cu:398-420`` retrSim3; ``CameraTracker.py:373``).
* The action Jacobian wrt a left perturbation is ``[I, -skew(Y), Y]``
  (3x7) as in ``VSLAM/mast3r_slam/geometry.py:47-54``.

All functions broadcast over arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


# ---------------------------------------------------------------------------
# Quaternions (xyzw)
# ---------------------------------------------------------------------------

def quat_mul(qi: jax.Array, qj: jax.Array) -> jax.Array:
    """Hamilton product ``qi * qj`` for xyzw quaternions."""
    xi, yi, zi, wi = jnp.split(qi, 4, axis=-1)
    xj, yj, zj, wj = jnp.split(qj, 4, axis=-1)
    return jnp.concatenate(
        [
            wi * xj + xi * wj + yi * zj - zi * yj,
            wi * yj - xi * zj + yi * wj + zi * xj,
            wi * zj + xi * yj - yi * xj + zi * wj,
            wi * wj - xi * xj - yi * yj - zi * zj,
        ],
        axis=-1,
    )


def quat_inv(q: jax.Array) -> jax.Array:
    """Conjugate of a unit quaternion."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_act(q: jax.Array, x: jax.Array) -> jax.Array:
    """Rotate vector(s) ``x`` by unit quaternion ``q`` (gn_kernels.cu actSO3)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, x)
    return x + qw * uv + jnp.cross(qv, uv)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (xyzw) -> 3x3 rotation matrix."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> unit quaternion (xyzw). Branch-free Shepperd."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best by max pivot.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) / 2
    q0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 4 * qw0 * qw0], -1) / jnp.maximum(4 * qw0, _EPS)[..., None]
    q0 = q0.at[..., 3].set(qw0)

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) / 2
    q1 = jnp.stack([4 * qx1 * qx1, (m01 + m10), (m02 + m20), (m21 - m12)], -1) / jnp.maximum(4 * qx1, _EPS)[..., None]
    q1 = q1.at[..., 0].set(qx1)

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) / 2
    q2 = jnp.stack([(m01 + m10), 4 * qy2 * qy2, (m12 + m21), (m02 - m20)], -1) / jnp.maximum(4 * qy2, _EPS)[..., None]
    q2 = q2.at[..., 1].set(qy2)

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) / 2
    q3 = jnp.stack([(m02 + m20), (m12 + m21), 4 * qz3 * qz3, (m10 - m01)], -1) / jnp.maximum(4 * qz3, _EPS)[..., None]
    q3 = q3.at[..., 2].set(qz3)

    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], -1)
    best = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, best[..., None, None].repeat(4, -1), axis=-2).squeeze(-2)
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def so3_exp(phi: jax.Array) -> jax.Array:
    """so(3) 3-vector -> unit quaternion (gn_kernels.cu expSO3 with Taylor guard)."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq)
    theta_p4 = theta_sq * theta_sq
    small = theta_sq < _EPS
    imag_small = 0.5 - theta_sq / 48.0 + theta_p4 / 3840.0
    real_small = 1.0 - theta_sq / 8.0 + theta_p4 / 384.0
    theta_safe = jnp.where(small, 1.0, theta)
    imag_big = jnp.sin(0.5 * theta) / theta_safe
    real_big = jnp.cos(0.5 * theta)
    imag = jnp.where(small, imag_small, imag_big)
    real = jnp.where(small, real_small, real_big)
    return jnp.concatenate([imag * phi, real], axis=-1)


def so3_log(q: jax.Array) -> jax.Array:
    """Unit quaternion -> so(3) 3-vector."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # Make qw >= 0 for shortest rotation.
    sign = jnp.where(qw < 0, -1.0, 1.0)
    qv, qw = qv * sign, qw * sign
    norm_v = jnp.linalg.norm(qv, axis=-1, keepdims=True)
    small = norm_v < _EPS
    norm_v_safe = jnp.where(small, 1.0, norm_v)
    qw_c = jnp.clip(qw, -1.0, 1.0)
    theta = 2.0 * jnp.arctan2(norm_v, qw_c)
    scale_small = 2.0 / jnp.clip(qw_c, _EPS, None)
    scale = jnp.where(small, scale_small, theta / norm_v_safe)
    return scale * qv


def skew(x: jax.Array) -> jax.Array:
    """3-vector(s) -> skew-symmetric matrix (geometry.py:5-9)."""
    o = jnp.zeros_like(x[..., 0])
    xx, yy, zz = x[..., 0], x[..., 1], x[..., 2]
    m = jnp.stack([o, -zz, yy, zz, o, -xx, -yy, xx, o], axis=-1)
    return m.reshape(x.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# Sim(3)
# ---------------------------------------------------------------------------

def sim3_identity(batch_shape=(), dtype=jnp.float32) -> jax.Array:
    e = jnp.asarray([0, 0, 0, 0, 0, 0, 1, 1], dtype=dtype)
    return jnp.broadcast_to(e, tuple(batch_shape) + (8,))


def sim3_t(T: jax.Array) -> jax.Array:
    return T[..., 0:3]


def sim3_q(T: jax.Array) -> jax.Array:
    return T[..., 3:7]


def sim3_s(T: jax.Array) -> jax.Array:
    return T[..., 7:8]


def sim3_normalize(T: jax.Array) -> jax.Array:
    """Re-normalize the quaternion part (pp.quat2unit equivalent)."""
    return jnp.concatenate(
        [T[..., 0:3], quat_normalize(T[..., 3:7]), T[..., 7:8]], axis=-1
    )


def sim3_act(T: jax.Array, X: jax.Array) -> jax.Array:
    """``Y = s R X + t``; T broadcasts against leading dims of X.

    T: (..., 8); X: (..., N, 3) or (..., 3).
    """
    t, q, s = T[..., 0:3], T[..., 3:7], T[..., 7:8]
    if X.ndim > T.ndim:  # T (...,8) applied to X (..., N, 3)
        t, q, s = t[..., None, :], q[..., None, :], s[..., None, :]
    return s * quat_act(q, X) + t


def sim3_act_jac(T: jax.Array, X: jax.Array):
    """Action + 3x7 Jacobian wrt a LEFT perturbation [tau, phi, sigma].

    Reference: ``geometry.py:47-54`` (act_Sim3 with jacobian=True).
    Returns (Y, J) with Y (..., 3), J (..., 3, 7).
    """
    Y = sim3_act(T, X)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=Y.dtype), Y.shape[:-1] + (3, 3))
    J = jnp.concatenate([eye, -skew(Y), Y[..., :, None]], axis=-1)
    return Y, J


def sim3_inv(T: jax.Array) -> jax.Array:
    t, q, s = T[..., 0:3], T[..., 3:7], T[..., 7:8]
    q_inv = quat_inv(q)
    s_inv = 1.0 / s
    t_inv = -s_inv * quat_act(q_inv, t)
    return jnp.concatenate([t_inv, q_inv, s_inv], axis=-1)


def sim3_mul(Ti: jax.Array, Tj: jax.Array) -> jax.Array:
    """Composition ``Ti * Tj`` (first apply Tj, then Ti)."""
    ti, qi, si = Ti[..., 0:3], Ti[..., 3:7], Ti[..., 7:8]
    tj, qj, sj = Tj[..., 0:3], Tj[..., 3:7], Tj[..., 7:8]
    q = quat_mul(qi, qj)
    s = si * sj
    t = si * quat_act(qi, tj) + ti
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_rel(Ti: jax.Array, Tj: jax.Array) -> jax.Array:
    """``Ti^-1 * Tj`` (gn_kernels.cu relSim3)."""
    return sim3_mul(sim3_inv(Ti), Tj)


def _sim3_W_coeffs(theta_sq: jax.Array, sigma: jax.Array):
    """Coefficients (C, A, B) of W = C I + A Phi + B Phi^2 where
    W = integral_0^1 e^{sigma s} exp(s Phi) ds (the Sim3 translation Jacobian).

    Semantics follow ``gn_kernels.cu:322-375`` (expSim3, from lietorch
    rxso3.h), but the numerics are redesigned for TPU: the reference's
    formulas suffer catastrophic cancellation near sigma/theta ~ 0 which TPU's
    approximate transcendentals (exp(1e-6) == 1.0 in f32 on the VPU) turn
    into O(1e4) coefficient errors.  We use expm1 + wide Taylor branches
    (|sigma| < 0.1, theta < 1e-2) so every branch is well-conditioned in f32.
    All inputs (..., 1).
    """
    theta = jnp.sqrt(theta_sq)
    m = jnp.expm1(sigma)  # e^sigma - 1, accurate near 0
    scale = 1.0 + m

    small_sigma = jnp.abs(sigma) < 0.1
    small_theta = theta < 1e-2

    sigma_safe = jnp.where(small_sigma, 1.0, sigma)
    theta_safe = jnp.where(small_theta, 1.0, theta)
    theta_sq_safe = jnp.where(small_theta, 1.0, theta_sq)

    # ---- C = (e^sigma - 1)/sigma ------------------------------------
    C_series = 1.0 + sigma * (0.5 + sigma * (1.0 / 6.0 + sigma / 24.0))
    C = jnp.where(small_sigma, C_series, m / sigma_safe)

    # ---- small-theta regime (ignore theta; error < theta^2/24 ~ 4e-6)
    A_st_series = 0.5 + sigma * (1.0 / 3.0 + sigma * (1.0 / 8.0 + sigma / 30.0))
    B_st_series = 1.0 / 6.0 + sigma * (1.0 / 8.0 + sigma * (1.0 / 20.0 + sigma / 72.0))
    # exact in sigma, cancellation-free via expm1:
    # A = ((sigma-1)e^s + 1)/s^2 = (sigma - m + sigma*m)/s^2
    A_st_exact = (sigma - m + sigma * m) / (sigma_safe * sigma_safe)
    # B = ((s^2/2 - s + 1)e^s - 1)/s^3 = ((m - s) + s^2(1+m)/2 - s*m)/s^3
    B_st_exact = ((m - sigma) + 0.5 * sigma * sigma * scale - sigma * m) / (
        sigma_safe * sigma_safe * sigma_safe
    )
    A_st = jnp.where(small_sigma, A_st_series, A_st_exact)
    B_st = jnp.where(small_sigma, B_st_series, B_st_exact)

    # ---- large-theta regime (theta >= 1e-2), any sigma ---------------
    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    half_sin = jnp.sin(0.5 * theta)
    one_minus_b = 2.0 * half_sin * half_sin - cos_t * m  # 1 - e^sigma cos(theta)
    a_ = scale * sin_t
    c = theta_sq + sigma * sigma  # >= 1e-4 here
    c_safe = jnp.where(small_theta, 1.0, c)
    A_lt = (a_ * sigma + one_minus_b * theta) / (theta_safe * c_safe)
    B_lt = (C - (-one_minus_b * sigma + a_ * theta) / c_safe) / theta_sq_safe

    A = jnp.where(small_theta, A_st, A_lt)
    B = jnp.where(small_theta, B_st, B_lt)
    return C, A, B


def sim3_exp(xi: jax.Array) -> jax.Array:
    """sim(3) 7-vector [tau, phi, sigma] -> Sim(3) 8-vector."""
    tau = xi[..., 0:3]
    phi = xi[..., 3:6]
    sigma = xi[..., 6:7]
    q = so3_exp(phi)
    s = jnp.exp(sigma)
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    C, A, B = _sim3_W_coeffs(theta_sq, sigma)
    phi_x_tau = jnp.cross(phi, tau)
    phi_x2_tau = jnp.cross(phi, phi_x_tau)
    t = C * tau + A * phi_x_tau + B * phi_x2_tau
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_log(T: jax.Array) -> jax.Array:
    """Sim(3) 8-vector -> sim(3) 7-vector. Inverse of sim3_exp."""
    t, q, s = T[..., 0:3], T[..., 3:7], T[..., 7:8]
    phi = so3_log(q)
    sigma = jnp.log(s)
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    C, A, B = _sim3_W_coeffs(theta_sq, sigma)
    # Invert W = C I + A Phi + B Phi^2 applied to tau: solve W tau = t.
    Phi = skew(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), Phi.shape)
    W = C[..., None] * eye + A[..., None] * Phi + B[..., None] * (Phi @ Phi)
    tau = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([tau, phi, sigma], axis=-1)


def sim3_retr(T: jax.Array, xi: jax.Array) -> jax.Array:
    """Left-multiplicative retraction ``Exp(xi) * T`` (retrSim3)."""
    return sim3_mul(sim3_exp(xi), T)


def sim3_matrix(T: jax.Array) -> jax.Array:
    """Sim(3) -> 4x4 homogeneous matrix with sR upper block."""
    t, q, s = T[..., 0:3], T[..., 3:7], T[..., 7:8]
    R = quat_to_matrix(q) * s[..., None]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-1] + (4,)
    )
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def sim3_from_matrix(M: jax.Array) -> jax.Array:
    """4x4 homogeneous (sR | t) -> Sim(3) 8-vector."""
    sR = M[..., :3, :3]
    s = jnp.linalg.det(sR)[..., None] ** (1.0 / 3.0)
    R = sR / s[..., None]
    q = matrix_to_quat(R)
    t = M[..., :3, 3]
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_adj_inv_transpose_apply(T: jax.Array, X: jax.Array) -> jax.Array:
    """``Y = Adj(T)^{-T} X`` on tangent row-vectors (apply_Sim3_adj_inv,
    gn_kernels.cu:279-299). Used to move gradients/Hessians between frames."""
    t, q, s = T[..., 0:3], T[..., 3:7], T[..., 7:8]
    s_inv = 1.0 / s
    a, b, c = X[..., 0:3], X[..., 3:6], X[..., 6:7]
    Ra = quat_act(q, a)
    y0 = s_inv * Ra
    y1 = quat_act(q, b) + s_inv * jnp.cross(t, Ra)
    y2 = c + s_inv * jnp.sum(t * Ra, axis=-1, keepdims=True)
    return jnp.concatenate([y0, y1, y2], axis=-1)


# ---------------------------------------------------------------------------
# SE(3) (7-vector [t, q]) — thin layer used by the mapper/eval code
# ---------------------------------------------------------------------------

def se3_identity(batch_shape=(), dtype=jnp.float32) -> jax.Array:
    e = jnp.asarray([0, 0, 0, 0, 0, 0, 1], dtype=dtype)
    return jnp.broadcast_to(e, tuple(batch_shape) + (7,))


def se3_act(T: jax.Array, X: jax.Array) -> jax.Array:
    t, q = T[..., 0:3], T[..., 3:7]
    if X.ndim > T.ndim:
        t, q = t[..., None, :], q[..., None, :]
    return quat_act(q, X) + t


def se3_inv(T: jax.Array) -> jax.Array:
    t, q = T[..., 0:3], T[..., 3:7]
    q_inv = quat_inv(q)
    return jnp.concatenate([-quat_act(q_inv, t), q_inv], axis=-1)


def se3_mul(Ti: jax.Array, Tj: jax.Array) -> jax.Array:
    ti, qi = Ti[..., 0:3], Ti[..., 3:7]
    tj, qj = Tj[..., 0:3], Tj[..., 3:7]
    return jnp.concatenate([quat_act(qi, tj) + ti, quat_mul(qi, qj)], axis=-1)


def se3_matrix(T: jax.Array) -> jax.Array:
    t, q = T[..., 0:3], T[..., 3:7]
    R = quat_to_matrix(q)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-1] + (4,)
    )
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def se3_from_matrix(M: jax.Array) -> jax.Array:
    return jnp.concatenate([M[..., :3, 3], matrix_to_quat(M[..., :3, :3])], axis=-1)


def sim3_to_se3(T: jax.Array) -> jax.Array:
    """Drop the scale (used when exporting trajectories)."""
    return T[..., 0:7]
