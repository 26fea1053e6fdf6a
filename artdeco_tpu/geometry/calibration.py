"""Self-calibration from model pointmaps.

Reference behavior: when no calibration is given, the reference estimates
intrinsics with GeoCalib or a COLMAP subprocess
(``dataloaders/DatasetBasic.py:112-273``).  Neither tool is TPU-friendly
(both are separate NN/CPU pipelines), and the system already runs a pointmap
network on every frame — so the TPU-native redesign estimates the focal
directly from the first frame's mono pointmap, the same way DUSt3R's head
post-processing recovers focals from predicted geometry (Weiszfeld/IRLS fit
of ``(u - cx, v - cy) ≈ f * (x/z, y/z)``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("height", "width", "iters"))
def estimate_focal_weiszfeld(
    X: jax.Array,        # (H*W, 3) pointmap (camera frame)
    valid: jax.Array,    # (H*W,) bool — confidence gate
    height: int,
    width: int,
    iters: int = 10,
) -> jax.Array:
    """Robust (L1/Weiszfeld) single-focal estimate, principal point at the
    image center.  Returns a scalar focal in pixels at the pointmap's
    resolution."""
    u, v = jnp.meshgrid(
        jnp.arange(width, dtype=jnp.float32),
        jnp.arange(height, dtype=jnp.float32),
    )
    uv = jnp.stack(
        [(u - (width - 1) / 2.0).reshape(-1),
         (v - (height - 1) / 2.0).reshape(-1)], axis=-1,
    )  # (N, 2)
    z = jnp.where(jnp.abs(X[:, 2]) > 1e-9, X[:, 2], 1e-9)
    xz = jnp.stack([X[:, 0] / z, X[:, 1] / z], axis=-1)  # (N, 2)
    vm = (valid & (X[:, 2] > 1e-6)).astype(jnp.float32)

    dot = jnp.sum(uv * xz, axis=-1)
    nrm = jnp.sum(xz * xz, axis=-1)
    # robust init: median of per-pixel scale ratios |uv|/|xz| (a plain
    # least-squares init is dragged to ~0 by outliers with large |x/z|)
    ratio = jnp.linalg.norm(uv, axis=-1) / jnp.maximum(
        jnp.linalg.norm(xz, axis=-1), 1e-9
    )
    f0 = jnp.nanmedian(jnp.where(vm > 0, ratio, jnp.nan))

    def body(f, _):
        # IRLS with L1 weights on the 2D residual norm
        r = jnp.linalg.norm(uv - f * xz, axis=-1)
        w = vm / jnp.maximum(r, 1e-6)
        f_new = jnp.sum(w * dot) / jnp.maximum(jnp.sum(w * nrm), 1e-9)
        return f_new, None

    f, _ = jax.lax.scan(body, f0, None, length=iters)
    return jnp.maximum(f, 1e-3)
