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


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "sh_degree", "render_mode", "eps2d", "near_plane",
        "far_plane", "radius_clip", "antialiased", "kx", "ky", "frustum_hw",
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
):
    """Returns (render (H, W, C), alpha (H, W, 1), meta).

    render_mode "RGB" -> C=3; "RGB+D" -> C=4 with expected depth in [..., 3].
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

    if sh_degree is not None:
        cam_pos = -viewmat[:3, :3].T @ viewmat[:3, 3]
        dirs = means - cam_pos
        rgb = sh.sh_to_color(sh_degree, dirs, colors)
    else:
        rgb = colors
    opac = opacities * proj.compensations

    with_depth = render_mode.endswith("+D")
    channels = (
        jnp.concatenate([rgb, proj.depths[:, None]], axis=-1) if with_depth else rgb
    )
    n_ch = channels.shape[-1]
    assert n_ch <= composite.C_MAX - 1

    # depth sort (front to back)
    order = jnp.argsort(proj.depths)
    means2d_s = proj.means2d[order]
    conics_s = proj.conics[order]
    radii_s = proj.radii[order]
    opac_s = opac[order]
    channels_s = channels[order]

    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    bins = binning.build_tile_bins(means2d_s, radii_s, tiles_x, tiles_y, kx, ky)

    packed = jnp.concatenate(
        [
            means2d_s,
            conics_s,
            opac_s[:, None],
            jnp.zeros((n, 2), means.dtype),
            channels_s,
            jnp.zeros((n, composite.C_MAX - n_ch), means.dtype),
        ],
        axis=-1,
    )  # (N, 16)
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
        num_pairs=bins.num_pairs,
    )
    return render, alpha, meta
