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


def make_row_sharded_render_core(mesh: Mesh, width: int, height: int,
                                 sh_degree: int, eps2d: float,
                                 cluster_capacity: int, axis: str = "dp"):
    """Row-strip sharded render with FULL render_core semantics.

    Unlike :func:`make_row_sharded_render` (raw splats), this applies the
    scene model's dmax LOD fade + mlp_cov modulation (replicated math,
    mapper/scene_model.effective_params) before the strip-sharded
    rasterization, then the exposure affine / background / invdepth clamp —
    so eval and save renders over a mesh produce the SAME images as the
    single-chip ``render_core`` (VERDICT r3 task 8: the sharded renderer
    must do the product's real work, not a demo path).

    Returns fn(slab, gfeat, mlp, viewmat, exposure, K, bg)
    -> dict(render (3,H,W), invdepth (1,H,W), alpha (1,H,W)).
    """
    from artdeco_tpu.mapper.scene_model import effective_params

    n_dev = mesh.shape[axis]
    assert height % (16 * n_dev) == 0, (
        f"height {height} must be a multiple of 16*{n_dev}"
    )
    strip_h = height // n_dev

    def per_device(slab, gfeat, mlp, viewmat, exposure, K, bg):
        selection, opac, scale_eff, rot_eff, colors = effective_params(
            slab, gfeat, mlp, viewmat, cluster_capacity
        )
        d = jax.lax.axis_index(axis)
        y0 = d * strip_h
        K_local = K.at[1, 2].add(-y0.astype(K.dtype))
        render, alpha, meta = splat_api.rasterization(
            slab.xyz, rot_eff, scale_eff, opac, colors, viewmat, K_local,
            width, strip_h, sh_degree=sh_degree, render_mode="RGB+D",
            eps2d=eps2d, valid_mask=selection,
            frustum_hw=(height, width),  # full-image EWA clamp
        )
        # per-gaussian visibility: union over strips (replicated out)
        vis = (jnp.max(meta.radii, axis=-1) > 0) & selection
        vis = jax.lax.pmax(vis.astype(jnp.int32), axis) > 0
        return render, alpha, vis

    rep = P()
    strips = jax.shard_map(
        per_device, mesh=mesh, in_specs=(rep,) * 7,
        out_specs=(P(axis), P(axis), rep), check_vma=False,
    )

    def full(slab, gfeat, mlp, viewmat, exposure, K, bg):
        render, alpha, vis = strips(slab, gfeat, mlp, viewmat, exposure,
                                    K, bg)
        rgb = jnp.moveaxis(render[..., :3], -1, 0)     # (3, H, W)
        depth = jnp.moveaxis(render[..., 3:4], -1, 0)  # (1, H, W)
        a = jnp.moveaxis(alpha, -1, 0)
        rgb = rgb + (1.0 - a) * bg[:, None, None]
        invdepth = 1.0 / jnp.maximum(depth, 1e-2)
        h, w = rgb.shape[1:]
        rgb = (exposure[:3, :3] @ rgb.reshape(3, -1)
               + exposure[:3, 3:4]).reshape(3, h, w)
        gvis = jax.ops.segment_max(
            vis.astype(jnp.int32),
            jnp.clip(slab.cls_id, 0, cluster_capacity - 1),
            num_segments=cluster_capacity,
        ) > 0
        return dict(render=jnp.clip(rgb, 0.0, 1.0), invdepth=invdepth,
                    alpha=a, depth=depth, visibility=vis,
                    global_visibility=gvis)

    return jax.jit(full)
