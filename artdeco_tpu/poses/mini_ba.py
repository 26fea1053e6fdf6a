"""Mini bundle adjustment: batched Gauss-Newton over 6D-rot poses,
translations, optional focal and 3D points.

Reference: ``Reconstruct/poses/mini_ba.py:37-343`` (jit-scripted batched GN
with Huber weights and MAD outlier gating).  The TPU version jits one
``lax.fori_loop`` GN with dense normal equations per batch element — pose
counts here are tiny (bootstrap: ~8 cameras, P4P: 1 camera x N hypotheses).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from artdeco_tpu.mapper.keyframe import sixd_to_mtx


def project(xyz, R6D, t, f, centre):
    """World points -> pixels under (R6D, t, f) (mini_ba.py:19-25).

    xyz (P, 3), R6D (3, 2), t (3,).  Returns (P, 2) and camera z.
    """
    R = sixd_to_mtx(R6D)
    Xc = xyz @ R.T + t
    z = jnp.maximum(Xc[:, 2:3], 1e-9)
    uv = f * Xc[:, :2] / z + centre
    return uv, Xc[:, 2]


def _residuals(params, xyz, uv_obs, valid, f, centre,
               optimize_focal, optimize_pts):
    R6D, t, df, dX = params
    f_eff = f + df if optimize_focal else f
    X_eff = xyz + dX if optimize_pts else xyz

    def per_cam(R6, tc, uvs, val):
        uv_hat, z = project(X_eff, R6, tc, f_eff, centre)
        z_ok = z > 0.1
        r = (uv_hat - uvs) * val[:, None]
        # pixel residual only where depth is sane; a separate BOUNDED
        # cheirality penalty replaces it behind the camera — plain masking
        # makes "flip everything behind the camera" a zero-cost optimum,
        # while unbounded clamped-z residuals (f*x/1e-9) destabilize GN
        r = jnp.where(z_ok[:, None], r, 0.0)
        pen = 100.0 * jnp.maximum(0.1 - z, 0.0) * val
        return jnp.concatenate([r, pen[:, None]], axis=1)

    return jax.vmap(per_cam)(R6D, t, uv_obs, valid)  # (C, P, 3)


@partial(jax.jit, static_argnames=("iters", "optimize_focal", "optimize_pts",
                                   "huber_k"))
def mini_ba(
    R6D0: jax.Array,    # (C, 3, 2) initial 6D rotations
    t0: jax.Array,      # (C, 3)
    xyz: jax.Array,     # (P, 3)
    uv_obs: jax.Array,  # (C, P, 2) observed pixels
    valid: jax.Array,   # (C, P) bool
    f: jax.Array,       # () focal
    centre: jax.Array,  # (2,)
    iters: int = 20,
    lm: float = 1e-4,
    optimize_focal: bool = False,
    optimize_pts: bool = False,
    huber_k: float = 5.0,
):
    """GN over stacked parameters [poses(9C), focal(1), points(3P)].

    Returns (R6D, t, f, xyz, final_cost).
    """
    C = R6D0.shape[0]
    P = xyz.shape[0]
    n_pose = 9 * C
    dim = n_pose + (1 if optimize_focal else 0) + (3 * P if optimize_pts else 0)

    def pack(R6D, t, df, dX):
        parts = [jnp.concatenate([R6D.reshape(C, 6), t], axis=1).reshape(-1)]
        if optimize_focal:
            parts.append(df.reshape(1))
        if optimize_pts:
            parts.append(dX.reshape(-1))
        return jnp.concatenate(parts)

    def unpack(v):
        pose = v[:n_pose].reshape(C, 9)
        R6D = pose[:, :6].reshape(C, 3, 2)
        t = pose[:, 6:9]
        off = n_pose
        df = v[off] if optimize_focal else jnp.asarray(0.0)
        off += 1 if optimize_focal else 0
        dX = v[off:].reshape(P, 3) if optimize_pts else jnp.zeros_like(xyz)
        return R6D, t, df, dX

    def flat_res(v):
        R6D, t, df, dX = unpack(v)
        return _residuals((R6D, t, df, dX), xyz, uv_obs, valid, f, centre,
                          optimize_focal, optimize_pts).reshape(-1)

    v0 = pack(R6D0, t0, jnp.asarray(0.0), jnp.zeros_like(xyz))

    def step(_, v):
        r = flat_res(v)
        J = jax.jacfwd(flat_res)(v)
        w = jnp.where(jnp.abs(r) < huber_k, 1.0,
                      huber_k / jnp.maximum(jnp.abs(r), 1e-12))
        A = J.T @ (w[:, None] * J)
        # Marquardt scaling + trust-region style step clamp: keeps early
        # iterations from overshooting depths through zero
        A = A + lm * jnp.diag(jnp.diag(A)) + 1e-8 * jnp.eye(dim)
        g = J.T @ (w * r)
        dv = jnp.linalg.solve(A, g)
        norm = jnp.linalg.norm(dv)
        dv = dv * jnp.minimum(1.0, 0.5 / jnp.maximum(norm, 1e-12))
        return v - dv

    v = jax.lax.fori_loop(0, iters, step, v0)
    R6D, t, df, dX = unpack(v)
    cost = jnp.sum(flat_res(v) ** 2)
    return R6D, t, f + df, xyz + dX, cost
