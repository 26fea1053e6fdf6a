"""Tile-based alpha compositing for 3D Gaussian splatting (Pallas TPU).

Replaces the per-pixel sequential front-to-back loop of gsplat's CUDA
rasterizer with a TPU-native formulation: within a tile, compositing over a
chunk of depth-ordered Gaussians is an associative scan —

    out(px) = sum_j  alpha_j(px) * exp( sum_{k<j} log(1 - alpha_k(px)) ) * c_j

so the transmittance prefix becomes a strictly-triangular ones-matmul on the
MXU and the weighted color sum a second matmul.  The pixel axis rides the
sublanes (256 px/tile), the chunk axis the lanes (256 pairs), so the VPU
evaluates all alphas of a chunk at once with no transposes.

Data layout: per-(tile, gaussian) "pair slots" produced by
``binning.build_tile_bins`` — each tile's run is CHUNK-aligned and padded,
padding slots have opacity 0 (self-masking), and the packed slot matrix is
TRANSPOSED (D, S) so chunk DMAs slice the minor dimension at 256-aligned
offsets (Mosaic requires lane-aligned dynamic slices).  Row layout (D = 16):
  [0] mean_x  [1] mean_y  [2] conic_a  [3] conic_b  [4] conic_c
  [5] opacity [6..7] pad  [8..8+C) channels (e.g. r, g, b, depth)

Backward: two in-kernel passes (totals, then prefix/suffix) — gsplat's
recompute strategy, vectorized; per-slot grads are written to a (D, S)
buffer whose invalid slots are discarded by the where-VJP outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
PIX = TILE * TILE          # 256 pixels per tile
CHUNK = 128                # pairs per inner step == slot alignment (lane-aligned)
D_PAIR = 16                # packed pair row count
C_MAX = 8                  # output channel slots (colors + alpha)
ALPHA_CLAMP = 0.999
ALPHA_MIN = 1.0 / 255.0
LOG_EPS = -9.21034         # log(1e-4): transmittance early-out


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pix_coords(t, tiles_x):
    """Pixel-center coordinates of tile t as (PIX, 1) columns."""
    ty = t // tiles_x
    tx = t % tiles_x
    lin = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tx * TILE + lin % TILE).astype(jnp.float32) + 0.5
    py = (ty * TILE + lin // TILE).astype(jnp.float32) + 0.5
    return px, py


def _chunk_alpha(d, px, py):
    """Alpha matrix (PIX, CHUNK) for one chunk of packed data (D, CHUNK).

    gsplat validity rules: sigma >= 0, alpha >= 1/255, clamp at 0.999
    (clamped pairs keep the value but drop param grads, via e=0).
    Padding slots have opacity 0 and fall out naturally.
    """
    mx, my = d[0:1, :], d[1:2, :]
    ca, cb, cc = d[2:3, :], d[3:4, :], d[4:5, :]
    op = d[5:6, :]

    dx = px - mx                       # (PIX, CHUNK)
    dy = py - my
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    raw = op * jnp.exp(-sigma)
    value_valid = (sigma >= 0.0) & (raw >= ALPHA_MIN)
    grad_valid = value_valid & (raw <= ALPHA_CLAMP)
    alpha = jnp.where(value_valid, jnp.minimum(raw, ALPHA_CLAMP), 0.0)
    e = jnp.where(grad_valid, jnp.exp(-sigma), 0.0)  # d alpha / d opacity
    return alpha, e


def _tri(strict: bool):
    """Ones matrix U with U[k', k] = 1 where k' < k (strict) or <= k."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return ((r < c) if strict else (r <= c)).astype(jnp.float32)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_c1(a, b):
    """Contract dim1 of a (PIX, CHUNK) with dim1 of b (C, CHUNK) -> (PIX, C)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_p(a, b):
    """Contract dim0 of a (PIX, CHUNK) with dim0 of b (PIX, C) -> (CHUNK, C)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(starts_ref, counts_ref, tiles_x_ref, data_hbm, out_ref,
                scratch, sem):
    t = pl.program_id(0)
    start = starts_ref[t]            # CHUNK-aligned slot offset
    num_chunks = counts_ref[t] // CHUNK
    px, py = _pix_coords(t, tiles_x_ref[0])

    def cond(state):
        ci, carry, accum = state
        return (ci < num_chunks) & (jnp.max(carry) > LOG_EPS)

    def body(state):
        ci, carry, accum = state
        cp = pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(pl.multiple_of(start + ci * CHUNK, CHUNK), CHUNK)], scratch, sem
        )
        cp.start()
        cp.wait()
        d = scratch[:, :]                              # (D, CHUNK)
        alpha, _ = _chunk_alpha(d, px, py)
        s = jnp.log1p(-alpha)                          # (PIX, CHUNK)
        cum_excl = _dot(s, _tri(strict=True)) + carry
        w = alpha * jnp.exp(cum_excl)                  # (PIX, CHUNK)
        colors = d[8:8 + C_MAX, :]                     # (8, CHUNK); pads 0
        accum = accum + _dot_c1(w, colors)             # (PIX, 8)
        carry = carry + jnp.sum(s, axis=1, keepdims=True)
        return ci + 1, carry, accum

    carry0 = jnp.zeros((PIX, 1), jnp.float32)
    accum0 = jnp.zeros((PIX, C_MAX), jnp.float32)
    _, carry, accum = jax.lax.while_loop(cond, body, (jnp.int32(0), carry0, accum0))
    alpha_img = 1.0 - jnp.exp(carry)
    out_ref[0, :, :] = jnp.concatenate([accum[:, : C_MAX - 1], alpha_img], axis=1)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(starts_ref, counts_ref, tiles_x_ref, data_hbm, gout_ref,
                grad_hbm, scratch, gscratch, sem, gsem):
    t = pl.program_id(0)
    start = starts_ref[t]
    num_chunks = counts_ref[t] // CHUNK
    px, py = _pix_coords(t, tiles_x_ref[0])

    g = gout_ref[0, :, :]                    # (PIX, 8); slot 7 is g_alpha
    g_alpha = g[:, C_MAX - 1:C_MAX]          # (PIX, 1)
    g_c = jnp.concatenate(
        [g[:, : C_MAX - 1], jnp.zeros((PIX, 1), jnp.float32)], axis=1
    )

    def load(ci):
        cp = pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(pl.multiple_of(start + ci * CHUNK, CHUNK), CHUNK)], scratch, sem
        )
        cp.start()
        cp.wait()
        return scratch[:, :]

    # ---- pass A: total weighted-grad mass + final transmittance ----------
    def bodyA(state):
        ci, carry, total_q = state
        d = load(ci)
        alpha, _ = _chunk_alpha(d, px, py)
        s = jnp.log1p(-alpha)
        cum_excl = _dot(s, _tri(strict=True)) + carry
        w = alpha * jnp.exp(cum_excl)
        colors = d[8:8 + C_MAX, :]
        cg = _dot(g_c, colors)             # (PIX, CHUNK): c_j . g(px)
        total_q = total_q + jnp.sum(w * cg, axis=1, keepdims=True)
        carry = carry + jnp.sum(s, axis=1, keepdims=True)
        return ci + 1, carry, total_q

    def condA(state):
        ci, carry, _ = state
        return (ci < num_chunks) & (jnp.max(carry) > LOG_EPS)

    zeros_p1 = jnp.zeros((PIX, 1), jnp.float32)
    _, carry_fin, total_q = jax.lax.while_loop(
        condA, bodyA, (jnp.int32(0), zeros_p1, zeros_p1)
    )
    galpha_T = g_alpha * jnp.exp(carry_fin)   # g_alpha * T_final, (PIX, 1)

    # ---- pass B: per-slot gradients ---------------------------------------
    def bodyB(state):
        # no early-out: every chunk of this tile's run must be written
        # (grad rows are otherwise uninitialized); skipped-by-forward chunks
        # get ~0 grads naturally (T_j <= 1e-4 there).
        ci, carry, pref_q = state
        d = load(ci)
        alpha, e = _chunk_alpha(d, px, py)
        s = jnp.log1p(-alpha)
        cum_excl = _dot(s, _tri(strict=True)) + carry
        Tj = jnp.exp(cum_excl)
        w = alpha * Tj
        colors = d[8:8 + C_MAX, :]
        cg = _dot(g_c, colors)
        q = w * cg
        prefix_incl = _dot(q, _tri(strict=False)) + pref_q
        suffix = total_q - prefix_incl
        inv_1ma = 1.0 / (1.0 - alpha)
        dL_dalpha = cg * Tj + (galpha_T - suffix) * inv_1ma   # (PIX, CHUNK)

        mx, my = d[0:1, :], d[1:2, :]
        ca, cb, cc = d[2:3, :], d[3:4, :], d[4:5, :]
        dx = px - mx
        dy = py - my
        g_sigma = -dL_dalpha * alpha
        ones_pix = jnp.ones((PIX, 1), jnp.float32)

        def colsum(m):                                        # -> (CHUNK, 1)
            return _dot_p(m, ones_pix)

        g_op = colsum(dL_dalpha * e)
        g_mx = colsum(g_sigma * -(ca * dx + cb * dy))
        g_my = colsum(g_sigma * -(cc * dy + cb * dx))
        g_ca = colsum(g_sigma * 0.5 * dx * dx)
        g_cb = colsum(g_sigma * dx * dy)
        g_cc = colsum(g_sigma * 0.5 * dy * dy)
        g_col = _dot_p(w, g_c)                                # (CHUNK, 8)

        grads = jnp.concatenate(
            [g_mx, g_my, g_ca, g_cb, g_cc, g_op,
             jnp.zeros((CHUNK, 2), jnp.float32), g_col],
            axis=1,
        )                                                     # (CHUNK, 16)
        gscratch[:, :] = grads.T                              # (16, CHUNK)
        cp = pltpu.make_async_copy(
            gscratch, grad_hbm.at[:, pl.ds(pl.multiple_of(start + ci * CHUNK, CHUNK), CHUNK)], gsem
        )
        cp.start()
        cp.wait()

        pref_q = pref_q + jnp.sum(q, axis=1, keepdims=True)
        carry = carry + jnp.sum(s, axis=1, keepdims=True)
        return ci + 1, carry, pref_q

    def condB(state):
        ci, _, _ = state
        return ci < num_chunks

    jax.lax.while_loop(condB, bodyB, (jnp.int32(0), zeros_p1, zeros_p1))


# ---------------------------------------------------------------------------
# Host-side wrappers + custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def tile_composite(slot_data, pad_starts, pad_counts, tiles_x, tiles_y):
    """Composite packed pair slots into per-tile images.

    slot_data: (D_PAIR, S) transposed packed slots (see module docstring);
    pad_starts/pad_counts: CHUNK-aligned per-tile runs.
    Returns (T, PIX, 8): channels 0..6 composited, slot 7 = alpha.
    """
    return _fwd_impl(slot_data, pad_starts, pad_counts, tiles_x, tiles_y)


def _fwd_impl(slot_data, pad_starts, pad_counts, tiles_x, tiles_y):
    num_tiles = tiles_x * tiles_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, PIX, C_MAX), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((D_PAIR, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, PIX, C_MAX), jnp.float32),
        interpret=_interpret(),
    )(pad_starts, pad_counts, jnp.asarray([tiles_x], jnp.int32), slot_data)


def _fwd_rule(slot_data, pad_starts, pad_counts, tiles_x, tiles_y):
    out = _fwd_impl(slot_data, pad_starts, pad_counts, tiles_x, tiles_y)
    return out, (slot_data, pad_starts, pad_counts)


def _bwd_rule(tiles_x, tiles_y, res, g_out):
    slot_data, pad_starts, pad_counts = res
    num_tiles = tiles_x * tiles_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, PIX, C_MAX), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((D_PAIR, CHUNK), jnp.float32),
            pltpu.VMEM((D_PAIR, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    grad_slots = pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(slot_data.shape, jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(pad_starts, pad_counts, jnp.asarray([tiles_x], jnp.int32),
      slot_data, g_out.astype(jnp.float32))
    # slots beyond the last padded run are never written (garbage); they are
    # sliced away by the where-VJP on slot_valid outside this custom_vjp.
    return grad_slots, None, None


tile_composite.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Pure-JAX reference compositor (golden tests; O(N * H * W))
# ---------------------------------------------------------------------------

def composite_reference(means2d, conics, opacities, channels, width, height):
    """Depth-ordered full-image compositing with the same alpha rules.

    means2d (N,2), conics (N,3), opacities (N,), channels (N,C) must already
    be depth-sorted front-to-back. Returns (H, W, C), alpha (H, W).
    """
    n, c = channels.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32) + 0.5,
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    px = xs.reshape(-1)[:, None]  # (HW, 1)
    py = ys.reshape(-1)[:, None]
    dx = px - means2d[None, :, 0]
    dy = py - means2d[None, :, 1]
    ca, cb, cc = conics[:, 0], conics[:, 1], conics[:, 2]
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    raw = opacities[None, :] * jnp.exp(-sigma)
    valid = (sigma >= 0.0) & (raw >= ALPHA_MIN)
    alpha = jnp.where(valid, jnp.minimum(raw, ALPHA_CLAMP), 0.0)  # (HW, N)
    s = jnp.log1p(-alpha)
    cum_excl = jnp.cumsum(s, axis=1) - s
    w = alpha * jnp.exp(cum_excl)
    img = w @ channels
    alpha_img = 1.0 - jnp.exp(jnp.sum(s, axis=1))
    return img.reshape(height, width, c), alpha_img.reshape(height, width)
