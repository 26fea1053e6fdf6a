"""Tile binning for the splat rasterizer (pure JAX, static shapes).

Replaces gsplat's dynamic (tile, depth)-key radix sort with a static-shape
formulation: each depth-sorted Gaussian emits up to K = KX*KY (tile, gauss)
pairs from a clamped tile bounding box; a single stable sort by tile id then
groups pairs per tile while preserving global depth order within each tile.
Invalid pair slots carry tile id = num_tiles and sort to the end.

The footprint cap (KX x KY tiles) bounds memory and sort size; the scene
model's screen-size pruning (reference ``h3dgsv3.py:893-903``) keeps real
Gaussians well under it.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE = 16    # pixels per tile side
CHUNK = 128  # pair-slot alignment unit == compositor chunk size


class TileBins(NamedTuple):
    """Chunk-aligned padded tile runs.

    Every tile's pair run starts at a CHUNK-aligned slot (TPU DMA offsets in
    the minor dimension must be lane-aligned) and is padded to a CHUNK
    multiple; padding slots have slot_valid False and compose to opacity 0 in
    the kernel, so no lane masking is needed anywhere.
    """

    slot_gauss: jax.Array   # (S,) int32 — gaussian index per padded slot
    slot_valid: jax.Array   # (S,) bool
    pad_starts: jax.Array   # (T,) int32 — CHUNK-aligned run starts (slots)
    pad_counts: jax.Array   # (T,) int32 — padded run lengths (CHUNK multiples)
    tile_counts: jax.Array  # (T,) int32 — true pair counts
    num_pairs: jax.Array    # () int32 — total valid pairs


@partial(jax.jit, static_argnames=("tiles_x", "tiles_y", "kx", "ky"))
def build_tile_bins(
    means2d: jax.Array,  # (N, 2) — already depth-sorted
    radii: jax.Array,    # (N, 2) — 0 marks culled
    tiles_x: int,
    tiles_y: int,
    kx: int = 4,
    ky: int = 4,
) -> TileBins:
    n = means2d.shape[0]
    num_tiles = tiles_x * tiles_y
    valid = jnp.max(radii, axis=-1) > 0

    # clamped tile bbox; radius capped to the kx/ky footprint
    rx = jnp.minimum(radii[:, 0], (kx * TILE) / 2.0)
    ry = jnp.minimum(radii[:, 1], (ky * TILE) / 2.0)
    tx0 = jnp.clip(jnp.floor((means2d[:, 0] - rx) / TILE), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((means2d[:, 1] - ry) / TILE), 0, tiles_y - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((means2d[:, 0] + rx) / TILE), 0, tiles_x - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((means2d[:, 1] + ry) / TILE), 0, tiles_y - 1).astype(jnp.int32)
    tx1 = jnp.minimum(tx1, tx0 + kx - 1)
    ty1 = jnp.minimum(ty1, ty0 + ky - 1)

    # expand the static (kx, ky) offset grid
    dxs = jnp.arange(kx, dtype=jnp.int32)
    dys = jnp.arange(ky, dtype=jnp.int32)
    txs = tx0[:, None] + dxs[None, :]             # (N, kx)
    tys = ty0[:, None] + dys[None, :]             # (N, ky)
    in_x = txs <= tx1[:, None]
    in_y = tys <= ty1[:, None]
    tile_id = (
        tys[:, :, None] * tiles_x + txs[:, None, :]
    )  # (N, ky, kx)
    pair_valid = valid[:, None, None] & in_y[:, :, None] & in_x[:, None, :]
    pair_tile = jnp.where(pair_valid, tile_id, num_tiles).reshape(-1).astype(jnp.int32)
    pair_gauss = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None, None], (n, ky, kx)
    ).reshape(-1)

    # stable sort by tile id keeps depth order within each tile
    pair_tile_s, pair_gauss_s = jax.lax.sort(
        (pair_tile, pair_gauss), dimension=0, is_stable=True, num_keys=1
    )

    tile_range = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(pair_tile_s, tile_range, side="left").astype(jnp.int32)
    tile_starts = bounds[:-1]
    tile_counts = bounds[1:] - bounds[:-1]
    num_pairs = bounds[-1]

    # chunk-aligned padded layout
    chunks = -(-tile_counts // CHUNK)  # cdiv
    pad_counts = chunks * CHUNK
    pad_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pad_counts)[:-1]]
    ).astype(jnp.int32)
    # static upper bound, rounded to a CHUNK multiple for the chunk-level map
    num_slots = -(-(n * kx * ky) // CHUNK) * CHUNK + num_tiles * CHUNK

    # slot_valid from CHUNK-granular small-table lookups (runs are CHUNK-
    # aligned so per-chunk values broadcast; the 577-entry gathers are cheap)
    num_chunk_slots = num_slots // CHUNK
    chunk_q = jnp.arange(num_chunk_slots, dtype=jnp.int32)
    chunk_starts = pad_starts // CHUNK
    t_of_chunk = (
        jnp.searchsorted(chunk_starts, chunk_q, side="right").astype(jnp.int32) - 1
    )

    def bcast(per_tile):
        per_chunk = per_tile[t_of_chunk]  # (num_chunk_slots,) gather
        return jnp.broadcast_to(
            per_chunk[:, None], (num_chunk_slots, CHUNK)
        ).reshape(-1)

    slot_q = jnp.arange(num_slots, dtype=jnp.int32)
    off = slot_q - bcast(pad_starts)
    slot_valid = off < bcast(tile_counts)

    # slot_gauss by SCATTERING pairs to their slots: each sorted pair i of
    # tile t lands at pad_starts[t] + (i - tile_starts[t]).  The per-pair
    # table lookups are tiny (num_tiles entries); the unique-index scatter
    # runs at memory bandwidth, unlike the 2.3M-element random GATHER of the
    # inverse formulation (element-granular gathers were ~19 ms, 75% of the
    # whole binning pass).
    # dst = pair index + cumulative padding inserted before its tile.  The
    # padding offset is a per-tile step function of pair position; building
    # it with a tiny scatter + cumsum avoids per-pair table gathers (element-
    # granular gathers over millions of rows run at ~1% of HBM bandwidth).
    m_pairs = pair_tile_s.shape[0]
    i_pair = jnp.arange(m_pairs, dtype=jnp.int32)
    padoff = jnp.cumsum(pad_counts - tile_counts) - (pad_counts - tile_counts)
    delta = jnp.diff(padoff, prepend=jnp.zeros((1,), padoff.dtype))
    steps = jnp.zeros((m_pairs,), jnp.int32).at[tile_starts].add(
        delta.astype(jnp.int32), mode="drop")
    dst = i_pair + jnp.cumsum(steps)
    # drop invalid pairs via distinct out-of-range slots: a shared sentinel
    # would put duplicates in an indices vector promised unique below
    # (undefined behavior per the jax scatter contract even under drop)
    dst = jnp.where(i_pair < num_pairs, dst, num_slots + i_pair)
    # dst is monotonically non-decreasing (pairs are tile-sorted and runs
    # are laid out in tile order) and unique — let XLA use the fast path
    slot_gauss = (
        jnp.zeros((num_slots,), jnp.int32)
        .at[dst].set(pair_gauss_s, mode="drop", indices_are_sorted=True,
                     unique_indices=True)
    )
    return TileBins(
        slot_gauss, slot_valid, pad_starts, pad_counts, tile_counts, num_pairs
    )
