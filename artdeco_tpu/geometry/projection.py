"""Camera projection math with analytic Jacobians, in pure JAX.

TPU-native re-implementation of ``VSLAM/mast3r_slam/geometry.py`` (reference):
point_to_ray_dist (:17-34), constrain_points_to_ray (:38-43),
project_calib (:66-113), backproject (:116-124), get_pixel_coords (:127-132).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def point_to_dist(X: jax.Array) -> jax.Array:
    return jnp.linalg.norm(X, axis=-1, keepdims=True)


def point_to_ray_dist(X: jax.Array, jacobian: bool = False):
    """Normalize points to unit rays + distance: ``rd = [X/|X|, |X|]`` (dim 4).

    With ``jacobian=True`` also returns d(rd)/dX of shape (..., 4, 3).
    Reference: geometry.py:17-34.
    """
    d = point_to_dist(X)
    d_inv = 1.0 / d
    r = d_inv * X
    rd = jnp.concatenate([r, d], axis=-1)
    if not jacobian:
        return rd
    d_inv2 = d_inv * d_inv
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), X.shape[:-1] + (3, 3))
    outer = X[..., :, None] * X[..., None, :]
    dr_dX = d_inv[..., None] * (eye - d_inv2[..., None] * outer)
    dd_dX = r[..., None, :]
    drd_dX = jnp.concatenate([dr_dX, dd_dX], axis=-2)
    return rd, drd_dX


def decompose_K(K: jax.Array):
    return K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]


def backproject(p: jax.Array, z: jax.Array, K: jax.Array) -> jax.Array:
    """Pixels (...,2) + depth (...,1) + intrinsics (3,3) -> camera points (...,3).

    Reference: geometry.py:116-124.
    """
    fx, fy, cx, cy = decompose_K(K)
    x = (p[..., 0] - cx) / fx
    y = (p[..., 1] - cy) / fy
    ones = jnp.ones_like(x)
    dP_dz = jnp.stack([x, y, ones], axis=-1)
    return z * dP_dz


def get_pixel_coords(img_size, dtype=jnp.float32, batch: int | None = None) -> jax.Array:
    """(h, w) -> pixel grid of shape (h*w, 2) in (u, v) order, row-major
    (reference geometry.py:127-132 uses meshgrid indexing='xy')."""
    h, w = img_size
    u = jnp.arange(w, dtype=dtype)
    v = jnp.arange(h, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    uv = jnp.stack([uu, vv], axis=-1).reshape(-1, 2)
    if batch is not None:
        uv = jnp.broadcast_to(uv, (batch,) + uv.shape)
    return uv


def constrain_points_to_ray(img_size, Xs: jax.Array, K: jax.Array) -> jax.Array:
    """Re-backproject a pointmap using only its z, snapping x/y to pixel rays.

    Xs: (..., h*w, 3). Reference: geometry.py:38-43.
    """
    uv = get_pixel_coords(img_size, dtype=Xs.dtype)
    uv = jnp.broadcast_to(uv, Xs.shape[:-1] + (2,))
    return backproject(uv, Xs[..., 2:3], K)


def project_calib(
    P: jax.Array,
    K: jax.Array,
    img_size,
    jacobian: bool = False,
    border: int = 0,
    z_eps: float = 0.0,
    dP_df: jax.Array | None = None,
):
    """Project camera points to (u, v, log z) with validity gating.

    Returns ``(pz, valid)`` or ``(pz, dpz_dP(3x4), valid)`` with the 4th
    Jacobian column being d/d(focal) when ``dP_df`` (...,3,1) is given.
    Reference: geometry.py:66-113 (including the z-gated log and NaN guard).
    """
    h, w = img_size
    fx, fy, cx, cy = decompose_K(K)
    x, y, z = P[..., 0:1], P[..., 1:2], P[..., 2:3]
    z_safe = jnp.where(z > z_eps, z, 1.0)
    u = fx * x / z_safe + cx
    v = fy * y / z_safe + cy

    valid_u = (u > border) & (u < w - 1 - border)
    valid_v = (v > border) & (v < h - 1 - border)
    valid_z = z > z_eps
    valid = valid_u & valid_v & valid_z

    logz = jnp.where(valid_z, jnp.log(z_safe), 0.0)
    pz = jnp.concatenate([u, v, logz], axis=-1)

    if not jacobian:
        return pz, valid

    z_inv = jnp.where(valid_z[..., 0], 1.0 / z_safe[..., 0], 1.0)
    zero = jnp.zeros_like(z_inv)
    x0, y0 = x[..., 0], y[..., 0]
    # Rows: du, dv, dlogz; cols: dX, dY, dZ (geometry.py:102-108)
    j00 = fx * z_inv
    j11 = fy * z_inv
    j02 = -fx * x0 * z_inv * z_inv
    j12 = -fy * y0 * z_inv * z_inv
    j22 = z_inv

    if dP_df is None:
        j03 = zero
        j13 = zero
        j23 = zero
    else:
        dXdf = dP_df[..., 0, 0]
        dYdf = dP_df[..., 1, 0]
        dZdf = dP_df[..., 2, 0]
        z0 = z[..., 0]
        # geometry.py:110-112 (note the reference's 1/z_inv**2 == z^2 factor —
        # transcribed faithfully; used only when optimize_focal is on)
        j03 = x0 * z_inv + fx * (dXdf * z0 - dZdf * x0) * z0 * z0
        j13 = y0 * z_inv + fy * (dYdf * z0 - dZdf * y0) * z0 * z0
        j23 = z_inv * dZdf

    dpz_dP = jnp.stack(
        [
            jnp.stack([j00, zero, j02, j03], axis=-1),
            jnp.stack([zero, j11, j12, j13], axis=-1),
            jnp.stack([zero, zero, j22, j23], axis=-1),
        ],
        axis=-2,
    )
    return pz, dpz_dP, valid
