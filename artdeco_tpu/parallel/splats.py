"""Multi-chip splat rendering: image-row-strip sharding over an ICI mesh.

Driver config 5 ("multi-chip splats", BASELINE.md): the render is sharded by
horizontal image strips — each device rasterizes the full (replicated)
gaussian set into its strip with the principal point shifted by the strip
offset, so the single-chip Pallas rasterizer is reused unchanged and the
strips concatenate exactly.  Per-strip tile culling automatically discards
gaussians outside each device's rows, so compute scales down with 1/n per
chip while staying embarrassingly parallel (no cross-chip compositing
order issues, unlike gaussian-sharded alpha blending).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from artdeco_tpu.ops.splat import api as splat_api


def make_row_sharded_render(mesh: Mesh, width: int, height: int,
                            sh_degree: int, eps2d: float = 0.3,
                            axis: str = "sp"):
    """Build a jitted sharded render over mesh axis ``axis``.

    height must be divisible by (16 * mesh size). Returns
    fn(means, quats, scales, opacities, colors, viewmat, K, valid_mask)
    -> (render (H, W, C), alpha (H, W, 1)).
    """
    n_dev = mesh.shape[axis]
    assert height % (16 * n_dev) == 0, (
        f"height {height} must be a multiple of 16*{n_dev}"
    )
    strip_h = height // n_dev

    def per_device(means, quats, scales, opacities, colors, viewmat, K,
                   valid_mask):
        d = jax.lax.axis_index(axis)
        y0 = d * strip_h
        K_local = K.at[1, 2].add(-y0.astype(K.dtype))
        render, alpha, meta = splat_api.rasterization(
            means, quats, scales, opacities, colors, viewmat, K_local,
            width, strip_h, sh_degree=sh_degree, render_mode="RGB+D",
            eps2d=eps2d, valid_mask=valid_mask,
            frustum_hw=(height, width),  # full-image EWA clamp, see project.py
        )
        return render, alpha

    rep = P()
    fn = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(rep,) * 8,
        out_specs=(P(axis), P(axis)),   # strips concatenate over rows
        check_vma=False,
    )
    return jax.jit(fn)
