"""3D Gaussian -> 2D screen projection (pure JAX, vmap/XLA).

Replaces the projection stage of gsplat's CUDA rasterizer (the reference's
main training renderer, ``h3dgsv3.py:664-680``): EWA splatting projection
with the eps2d low-pass filter, producing per-Gaussian screen means, conics,
radii and camera depths.  Entirely elementwise over N — XLA maps it onto the
VPU with no kernel needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Projected(NamedTuple):
    means2d: jax.Array      # (N, 2) pixel coords
    conics: jax.Array       # (N, 3) upper-tri inverse 2D covariance (a, b, c)
    depths: jax.Array       # (N,) camera z
    radii: jax.Array        # (N, 2) per-axis 3-sigma pixel radii (0 if culled)
    compensations: jax.Array  # (N,) antialias opacity scale (1 for classic)


def quat_scale_to_cov3d(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """(N,4) wxyz quats (unnormalized ok) + (N,3) scales -> (N,3,3) covariance."""
    q = quats * jax.lax.rsqrt(
        jnp.sum(quats * quats, axis=-1, keepdims=True) + 1e-20
    )
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(q.shape[:-1] + (3, 3))
    M = R * scales[..., None, :]
    return M @ jnp.swapaxes(M, -1, -2)


def _rot_wxyz_inv(quats: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate batched vectors by the INVERSE of wxyz quats — elementwise VPU
    math (avoids per-gaussian 3x3 matmuls, which XLA lowers terribly).
    Zero quats (masked/inactive gaussians) are guarded against 0/0 NaNs,
    which would otherwise leak into gradients through jnp.where (eps must be
    INSIDE the sqrt: norm() has a NaN gradient at exactly 0)."""
    qn = quats * jax.lax.rsqrt(
        jnp.sum(quats * quats, axis=-1, keepdims=True) + 1e-20
    )
    qv = -qn[..., 1:4]  # conjugate
    qw = qn[..., 0:1]
    uv = 2.0 * jnp.cross(qv, v)
    return v + qw * uv + jnp.cross(qv, uv)


def project_gaussians(
    means: jax.Array,     # (N, 3) world
    quats: jax.Array,     # (N, 4) wxyz
    scales: jax.Array,    # (N, 3)
    viewmat: jax.Array,   # (4, 4) world->cam
    K: jax.Array,         # (3, 3)
    width: int,
    height: int,
    eps2d: float = 0.3,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    antialiased: bool = False,
    radius_clip: float = 0.0,
    frustum_hw: tuple | None = None,
) -> Projected:
    # frustum_hw: (H, W) used ONLY for the EWA Jacobian frustum clamp.  Row-
    # strip sharded rendering (parallel/splats.py) renders a strip with a
    # shifted principal point; the clamp must still use the FULL image
    # frustum or per-gaussian covariances would differ between the strip and
    # single-chip renders near strip borders.
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    p_cam = means @ R.T + t
    z = p_cam[..., 2]

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    u = fx * p_cam[..., 0] / z_safe + cx
    v = fy * p_cam[..., 1] / z_safe + cy
    means2d = jnp.stack([u, v], axis=-1)

    # EWA: cov2d = J W cov3d W^T J^T  (gsplat clamps x/z,y/z to the frustum
    # tangent bounds to stabilize the Jacobian for off-screen gaussians).
    # Formulated as pure elementwise math: with M = R(q) diag(s),
    # u = M^T a = s * R(q)^-1 a, so cov2d[ij] = <u_i, u_j> with no per-
    # gaussian matmuls (those lower to pathological tiny batched dots).
    f_h, f_w = frustum_hw if frustum_hw is not None else (height, width)
    tan_x = 0.5 * f_w / fx
    tan_y = 0.5 * f_h / fy
    lim_x = 1.3 * tan_x
    lim_y = 1.3 * tan_y
    tx = z_safe * jnp.clip(p_cam[..., 0] / z_safe, -lim_x, lim_x)
    ty = z_safe * jnp.clip(p_cam[..., 1] / z_safe, -lim_y, lim_y)

    z_inv = 1.0 / z_safe
    # rows of J @ W (W = viewmat rotation): a = J0 W, b = J1 W, each (N, 3)
    j00 = (fx * z_inv)[..., None]
    j02 = (-fx * tx * z_inv * z_inv)[..., None]
    j11 = (fy * z_inv)[..., None]
    j12 = (-fy * ty * z_inv * z_inv)[..., None]
    a = j00 * R[0][None, :] + j02 * R[2][None, :]
    b = j11 * R[1][None, :] + j12 * R[2][None, :]
    ma = scales * _rot_wxyz_inv(quats, a)  # (N, 3)
    mb = scales * _rot_wxyz_inv(quats, b)
    c00 = jnp.sum(ma * ma, axis=-1)
    c01 = jnp.sum(ma * mb, axis=-1)
    c11 = jnp.sum(mb * mb, axis=-1)

    det_orig = c00 * c11 - c01 * c01
    c00 = c00 + eps2d
    c11 = c11 + eps2d
    det = c00 * c11 - c01 * c01
    det_safe = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    if antialiased:
        compensations = jnp.sqrt(jnp.clip(det_orig / det_safe, 0.0, None))
    else:
        compensations = jnp.ones_like(det)

    conics = jnp.stack([c11 / det_safe, -c01 / det_safe, c00 / det_safe], axis=-1)

    # 3-sigma extent per axis (gsplat v1.4 uses +3.33 sigma of the larger
    # eigenvalue; per-axis sqrt-diagonal bounds the ellipse tightly enough
    # and keeps the math branch-free)
    rx = jnp.ceil(3.0 * jnp.sqrt(jnp.clip(c00, 0.0, None)))
    ry = jnp.ceil(3.0 * jnp.sqrt(jnp.clip(c11, 0.0, None)))

    valid = (
        (z > near_plane)
        & (z < far_plane)
        & (det > 0)
        & (u + rx > 0) & (u - rx < width)
        & (v + ry > 0) & (v - ry < height)
        & (jnp.maximum(rx, ry) > radius_clip)
    )
    radii = jnp.where(valid[..., None], jnp.stack([rx, ry], -1), 0.0)
    return Projected(means2d, conics, z, radii, compensations)
