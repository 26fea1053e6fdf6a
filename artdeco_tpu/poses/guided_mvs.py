"""Guided multi-view depth from sparse matches.

Reference: ``Reconstruct/poses/guided_mvs.py:16-76`` + ``guided_mvs.cu:39``
(uvToDepth): for each keypoint with a match in another view, recover the
depth along the current ray that best explains the matched pixel —
closed-form two-view depth, vectorized.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=())
def uv_to_depth(
    uv: jax.Array,        # (P, 2) pixels in the current frame
    uv_other: jax.Array,  # (P, 2) matched pixels in the other frame
    R: jax.Array,         # (3, 3) other<-current rotation
    t: jax.Array,         # (3,) other<-current translation
    f: jax.Array,
    centre: jax.Array,
):
    """Depth d such that proj(R * (d * ray(uv)) + t) ~= uv_other.

    Least-squares over the two pixel equations. Returns (depth (P,),
    residual (P,)).
    """
    ray = jnp.concatenate(
        [(uv - centre) / f, jnp.ones((uv.shape[0], 1))], axis=1
    )
    rc = ray @ R.T  # rotated rays (P, 3)
    xo = (uv_other - centre) / f  # normalized target coords (P, 2)

    # proj((d*rc + t)) = (d*rc_xy + t_xy) / (d*rc_z + t_z) = xo
    # => d * (rc_xy - xo * rc_z) = xo * t_z - t_xy   (2 eqs, 1 unknown)
    a = rc[:, :2] - xo * rc[:, 2:3]           # (P, 2)
    b = xo * t[2] - t[:2][None, :]            # (P, 2)
    denom = jnp.sum(a * a, axis=1)
    d = jnp.sum(a * b, axis=1) / jnp.maximum(denom, 1e-12)
    resid = jnp.linalg.norm(a * d[:, None] - b, axis=1)
    return d, resid


@partial(jax.jit, static_argnames=())
def guided_depth(
    uv: jax.Array,          # (P, 2)
    uvs_others: jax.Array,  # (K, P, 2), -1 marks missing
    Rt: jax.Array,          # (4, 4) current world->cam
    Rts_others: jax.Array,  # (K, 4, 4)
    f: jax.Array,
    centre: jax.Array,
    max_resid: float = 5e-3,
):
    """Best (min-residual) depth per keypoint across candidate views."""
    Kn = uvs_others.shape[0]

    def body(carry, k):
        depth, best_res = carry
        rel = Rts_others[k] @ jnp.linalg.inv(Rt)  # other <- current
        d, res = uv_to_depth(uv, uvs_others[k], rel[:3, :3], rel[:3, 3],
                             f, centre)
        ok = (
            (d > 1e-6) & (res < best_res) & (res < max_resid)
            & (uvs_others[k].min(axis=-1) > 0)
        )
        depth = jnp.where(ok, d, depth)
        best_res = jnp.where(ok, res, best_res)
        return (depth, best_res), None

    init = (jnp.zeros(uv.shape[0]), jnp.full(uv.shape[0], jnp.inf))
    (depth, res), _ = jax.lax.scan(body, init, jnp.arange(Kn))
    return depth, depth > 0
