"""N-view triangulation keeping the max-disparity candidate per point.

Reference: ``Reconstruct/poses/triangulator.py:18-143`` (matches_to_points +
TriangulatorInternal): two-view midpoint triangulation of each keypoint
against K candidate frames; per point keep the triangulation with the
largest disparity whose reprojection error passes ``max_error``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def matches_to_points(uv, uv_other, R, t, f, centre):
    """Two-view midpoint triangulation in the CURRENT camera frame.

    uv, uv_other (P, 2); (R, t) = relative transform current<-other.
    Returns (pts (P,3) in current cam, disparity (P,), reproj error (P,)).
    """
    d1 = jnp.concatenate(
        [(uv - centre) / f, jnp.ones((uv.shape[0], 1))], axis=1
    )
    d2o = jnp.concatenate(
        [(uv_other - centre) / f, jnp.ones((uv.shape[0], 1))], axis=1
    )
    d2 = d2o @ R.T  # other-frame ray in current frame
    o2 = t          # other camera centre in current frame

    # closest points of two rays: o1 + a*d1 ~ o2 + b*d2
    d11 = jnp.sum(d1 * d1, axis=1)
    d22 = jnp.sum(d2 * d2, axis=1)
    d12 = jnp.sum(d1 * d2, axis=1)
    den = jnp.maximum(d11 * d22 - d12 * d12, 1e-12)
    r = o2[None, :]
    r1 = jnp.sum(r * d1, axis=1)
    r2 = jnp.sum(r * d2, axis=1)
    a = (r1 * d22 - r2 * d12) / den
    b = (r1 * d12 - r2 * d11) / den
    p1 = a[:, None] * d1
    p2 = o2[None, :] + b[:, None] * d2
    pts = 0.5 * (p1 + p2)

    # disparity = angular separation of the rays
    cos = d12 / jnp.sqrt(jnp.maximum(d11 * d22, 1e-12))
    disparity = 1.0 - jnp.clip(cos, -1.0, 1.0)

    z = jnp.maximum(pts[:, 2:3], 1e-9)
    uv_hat = f * pts[:, :2] / z + centre
    err = jnp.linalg.norm(uv_hat - uv, axis=1) / f
    return pts, disparity, err


@partial(jax.jit, static_argnames=())
def triangulate(
    uv: jax.Array,          # (P, 2) current keypoints
    uvs_others: jax.Array,  # (K, P, 2), -1 marks missing matches
    Rt: jax.Array,          # (4, 4) current world->cam
    Rts_others: jax.Array,  # (K, 4, 4)
    f: jax.Array,
    centre: jax.Array,
    max_error: float,
    min_dis: float,
):
    """Returns (world points (P,3), depth (P,), disparity (P,), valid (P,))."""
    K = uvs_others.shape[0]

    def body(carry, k):
        kpts3d, best_dis = carry
        Rt_other_inv = jnp.linalg.inv(Rts_others[k])
        rel = Rt @ Rt_other_inv
        pts, dis, err = matches_to_points(
            uv, uvs_others[k], rel[:3, :3], rel[:3, 3], f, centre
        )
        ok = (
            (pts[:, 2] > 1e-6) & (dis > best_dis) & (err < max_error)
            & (uvs_others[k].min(axis=-1) > 0)
        )
        kpts3d = jnp.where(ok[:, None], pts, kpts3d)
        best_dis = jnp.where(ok, dis, best_dis)
        return (kpts3d, best_dis), None

    init = (jnp.zeros((uv.shape[0], 3)), jnp.zeros(uv.shape[0]))
    (kpts3d, best_dis), _ = jax.lax.scan(body, init, jnp.arange(K))
    depth = kpts3d[:, 2]
    world = (kpts3d - Rt[:3, 3]) @ Rt[:3, :3]
    return world, depth, best_dis, best_dis > min_dis
