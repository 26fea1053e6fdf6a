"""Batched RANSAC: 8-point fundamental matrices + Sampson inlier counting.

Reference: ``Reconstruct/poses/ransac.py:25-200`` + ``ransac.cu:43-148``
(cupy RawModule kernels ``batchFundMat8pts`` / ``sampsonInliers``).  The TPU
version vmaps the normalized 8-point DLT (batched SVD) and evaluates Sampson
errors for all hypotheses at once — one fused XLA computation instead of a
runtime-compiled CUDA module.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _normalize_pts(p: jax.Array):
    """Hartley normalization: zero-mean, sqrt(2) RMS. p (m, 2)."""
    mu = p.mean(axis=0)
    d = jnp.sqrt(jnp.sum((p - mu) ** 2, axis=1)).mean()
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-12)
    T = jnp.asarray([
        [s, 0.0, -s * mu[0]],
        [0.0, s, -s * mu[1]],
        [0.0, 0.0, 1.0],
    ])
    ph = jnp.concatenate([p, jnp.ones((p.shape[0], 1))], axis=1)
    return (T @ ph.T).T[:, :2], T


def _fund_8pt(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """One fundamental matrix from 8 correspondences (DLT + rank-2)."""
    p1n, T1 = _normalize_pts(p1)
    p2n, T2 = _normalize_pts(p2)
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=1
    )
    _, _, Vt = jnp.linalg.svd(A)
    F = Vt[-1].reshape(3, 3)
    U, S, Vt2 = jnp.linalg.svd(F)
    F = U @ jnp.diag(S.at[2].set(0.0)) @ Vt2
    F = T2.T @ F @ T1
    return F / jnp.maximum(jnp.abs(F[2, 2]), 1e-12) * jnp.sign(F[2, 2] + 1e-30)


def sampson_error(F: jax.Array, p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Sampson distance of all correspondences under one F."""
    ph1 = jnp.concatenate([p1, jnp.ones((p1.shape[0], 1))], axis=1)
    ph2 = jnp.concatenate([p2, jnp.ones((p2.shape[0], 1))], axis=1)
    Fx1 = ph1 @ F.T          # (n, 3)
    Ftx2 = ph2 @ F           # (n, 3)
    num = jnp.sum(ph2 * Fx1, axis=1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@partial(jax.jit, static_argnames=())
def batch_fundamental_ransac(
    mkpts1: jax.Array,  # (n, 2)
    mkpts2: jax.Array,  # (n, 2)
    sample_idx: jax.Array,  # (N, 8) int — precomputed random sample sets
    max_error: float,
):
    """Estimate N hypotheses, count Sampson inliers, return the best.

    Returns (F_best (3,3), inlier_mask (n,), n_inliers).
    """
    Fs = jax.vmap(lambda idx: _fund_8pt(mkpts1[idx], mkpts2[idx]))(sample_idx)
    errs = jax.vmap(lambda F: sampson_error(F, mkpts1, mkpts2))(Fs)  # (N, n)
    inliers = errs < max_error
    counts = inliers.sum(axis=1)
    best = jnp.argmax(counts)
    return Fs[best], inliers[best], counts[best]


class RANSACEstimator:
    """Host wrapper matching the reference estimator surface."""

    def __init__(self, N: int, max_error: float, seed: int = 0):
        self.N = N
        self.max_error = max_error
        self.seed = seed

    def estimate(self, mkpts1, mkpts2):
        import numpy as np

        n = int(mkpts1.shape[0])
        rng = np.random.RandomState(self.seed)
        idx = rng.randint(0, max(n, 1), size=(self.N, 8)).astype(np.int32)
        return batch_fundamental_ransac(
            jnp.asarray(mkpts1), jnp.asarray(mkpts2), jnp.asarray(idx),
            self.max_error,
        )
