"""gsplat-compatible rasterization API (the surface consumed by the scene
model — reference ``h3dgsv3.py:664-680``).

Pipeline: project (pure JAX, autodiff) -> SH colors -> depth sort -> tile
binning (stable sort) -> Pallas tile compositing (custom VJP).  Gradients for
the sort/gather stages come for free from XLA's gather-VJP (scatter-add).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from artdeco_tpu.ops.splat import binning, composite, project, sh
from artdeco_tpu.ops.splat.binning import TILE


class RasterMeta(NamedTuple):
    radii: jax.Array        # (N, 2)
    means2d: jax.Array      # (N, 2)
    depths: jax.Array       # (N,)
    num_pairs: jax.Array    # () — binning occupancy (overflow diagnostics)
    n_comp_dropped: jax.Array  # () — visible gaussians beyond compact_budget


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "sh_degree", "render_mode", "eps2d", "near_plane",
        "far_plane", "radius_clip", "antialiased", "kx", "ky", "frustum_hw",
        "compact_budget",
    ),
)
def rasterization(
    means: jax.Array,       # (N, 3)
    quats: jax.Array,       # (N, 4) wxyz
    scales: jax.Array,      # (N, 3)
    opacities: jax.Array,   # (N,)
    colors: jax.Array,      # (N, K, 3) SH coeffs if sh_degree is not None, else (N, 3)
    viewmat: jax.Array,     # (4, 4) world->cam
    K: jax.Array,           # (3, 3)
    width: int,
    height: int,
    sh_degree: Optional[int] = None,
    render_mode: str = "RGB+D",
    eps2d: float = 0.3,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    antialiased: bool = False,
    kx: int = 4,
    ky: int = 4,
    valid_mask: Optional[jax.Array] = None,
    frustum_hw: Optional[tuple] = None,
    compact_budget: Optional[int] = None,
):
    """Returns (render (H, W, C), alpha (H, W, 1), meta).

    render_mode "RGB" -> C=3; "RGB+D" -> C=4 with expected depth in [..., 3].

    ``compact_budget``: compact the visible set into at most this many rows
    BEFORE the depth sort, so the sort, binning (a 16V-pair sort), packed
    scatter and slot gathers all scale with the per-view VISIBLE count
    instead of the slab length — at a 262k slab with ~50k visible this is
    ~3x off the whole fwd+bwd (measured, scripts/profile_render.py).  The
    composited image is BIT-IDENTICAL to the full path whenever the budget
    covers the visible count: compaction preserves index order, the depth
    sort is stable, so every tile composites the same gaussians in the same
    order.  Visible gaussians beyond the budget are dropped for this render
    (highest indices first) and COUNTED in meta.n_comp_dropped — callers
    surface the counter and grow the budget (no silent caps).
    """
    n = means.shape[0]
    proj = project.project_gaussians(
        means, quats, scales, viewmat, K, width, height,
        eps2d=eps2d, near_plane=near_plane, far_plane=far_plane,
        antialiased=antialiased, radius_clip=radius_clip,
        frustum_hw=frustum_hw,
    )
    if valid_mask is not None:
        # external culling (active/LOD masks) without boolean indexing:
        # zeroed radii drop the gaussian from binning entirely
        proj = proj._replace(
            radii=jnp.where(valid_mask[:, None], proj.radii, 0.0)
        )

    cam_pos = -viewmat[:3, :3].T @ viewmat[:3, 3]
    with_depth = render_mode.endswith("+D")

    if compact_budget is not None and compact_budget < n:
        v = compact_budget
        ids = jnp.arange(n, dtype=jnp.int32)
        vis = jnp.max(proj.radii, axis=-1) > 0
        pos = jnp.cumsum(vis.astype(jnp.int32)) - 1
        tgt = jnp.where(vis & (pos < v), pos, v)
        sel = jnp.full((v,), n, jnp.int32).at[tgt].min(ids, mode="drop")
        sel_ok = sel < n
        safe = jnp.minimum(sel, n - 1)
        n_comp_dropped = (
            jnp.sum(vis.astype(jnp.int32))
            - jnp.sum(sel_ok.astype(jnp.int32))
        )
        means2d_v = proj.means2d[safe]
        conics_v = proj.conics[safe]
        radii_v = jnp.where(sel_ok[:, None], proj.radii[safe], 0.0)
        depths_v = proj.depths[safe]
        opac_v = opacities[safe] * proj.compensations[safe]
        # SH eval only on the compacted rows (the full-slab eval is pure
        # waste: invisible rows composite to nothing and their color grads
        # are zero either way)
        if sh_degree is not None:
            rgb_v = sh.sh_to_color(
                sh_degree, means[safe] - cam_pos, colors[safe]
            )
        else:
            rgb_v = colors[safe]
        n_rows = v
    else:
        n_comp_dropped = jnp.zeros((), jnp.int32)
        means2d_v = proj.means2d
        conics_v = proj.conics
        radii_v = proj.radii
        depths_v = proj.depths
        opac_v = opacities * proj.compensations
        if sh_degree is not None:
            rgb_v = sh.sh_to_color(sh_degree, means - cam_pos, colors)
        else:
            rgb_v = colors
        n_rows = n

    channels = (
        jnp.concatenate([rgb_v, depths_v[:, None]], axis=-1)
        if with_depth else rgb_v
    )
    n_ch = channels.shape[-1]
    assert n_ch <= composite.C_MAX - 1

    # depth sort (front to back; stable — ties keep index order, matching
    # the compacted and full paths to each other and to gsplat)
    order = jnp.argsort(depths_v)
    means2d_s = means2d_v[order]
    conics_s = conics_v[order]
    radii_s = radii_v[order]
    opac_s = opac_v[order]
    channels_s = channels[order]

    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    bins = binning.build_tile_bins(means2d_s, radii_s, tiles_x, tiles_y, kx, ky)

    packed = jnp.concatenate(
        [
            means2d_s,
            conics_s,
            opac_s[:, None],
            jnp.zeros((n_rows, 2), means.dtype),
            channels_s,
            jnp.zeros((n_rows, composite.C_MAX - n_ch), means.dtype),
        ],
        axis=-1,
    )  # (n_rows, 16)
    # scatter into chunk-aligned padded slots, transposed (D, S); the
    # where-VJP zeroes grads of padding slots, the gather-VJP scatter-adds
    # slot grads back onto gaussians
    slot_data = jnp.where(
        bins.slot_valid[None, :], packed.T[:, bins.slot_gauss], 0.0
    )

    out = composite.tile_composite(
        slot_data, bins.pad_starts, bins.pad_counts, tiles_x, tiles_y
    )  # (T, 256, 8)

    img = (
        out.reshape(tiles_y, tiles_x, TILE, TILE, composite.C_MAX)
        .transpose(0, 2, 1, 3, 4)
        .reshape(tiles_y * TILE, tiles_x * TILE, composite.C_MAX)
    )[:height, :width]
    render = img[..., :n_ch]
    alpha = img[..., composite.C_MAX - 1 : composite.C_MAX]

    meta = RasterMeta(
        radii=proj.radii, means2d=proj.means2d, depths=proj.depths,
        num_pairs=bins.num_pairs, n_comp_dropped=n_comp_dropped,
    )
    return render, alpha, meta
