"""Local diagonal covariance of pointmaps via box filtering (pure JAX/XLA).

Reference: ``VSLAM/utils_uncertainty.py:4-50`` (local_diag_cov_from_X1) —
box-filtered E[X], E[X^2] over a win x win reflected window, variance per
channel. XLA fuses the separable box filter into two small reduce-windows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _boxfilter(img_hwc: jax.Array, win: int) -> jax.Array:
    """Mean filter with reflect padding, separable (h then w)."""
    pad = win // 2
    x = jnp.pad(img_hwc, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
    # Separable sum via cumulative windows; win is tiny (3/5/7) so direct conv
    # via reduce_window is fine and XLA-friendly.
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (win, 1, 1), (1, 1, 1), "valid"
    )
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, win, 1), (1, 1, 1), "valid"
    )
    return x / float(win * win)


def local_diag_cov(
    X: jax.Array,
    H: int,
    W: int,
    win: int = 5,
    valid: jax.Array | None = None,
    var_floor: float = 1e-12,
) -> jax.Array:
    """Per-pixel local variance of a pointmap.

    X: (H*W, 3) -> returns diagonal variances (H*W, 3) (the reference stores a
    (N,3,3) matrix with only the diagonal set; we keep the compact form and
    expand where a full matrix is needed).
    """
    Xv = X.reshape(H, W, 3)
    if valid is None:
        valid_hw1 = (
            jnp.isfinite(Xv).all(-1) & (Xv[..., 2] > 0)
        ).astype(X.dtype)[..., None]
    else:
        valid_hw1 = valid.reshape(H, W, 1).astype(X.dtype)

    denom = jnp.clip(_boxfilter(valid_hw1, win), 1e-9, None)
    mean = _boxfilter(Xv * valid_hw1, win) / denom
    ex2 = _boxfilter(Xv * Xv * valid_hw1, win) / denom
    var = jnp.clip(ex2 - mean * mean, var_floor, None)
    return var.reshape(H * W, 3)


def diag_to_cov(var: jax.Array) -> jax.Array:
    """(N, 3) diagonal variances -> (N, 3, 3) covariance matrices."""
    return jax.vmap(jnp.diag)(var)
