"""Pallas TPU kernel for the refine_matches dense window-argmax stencil.

Replaces ``refine_dense._dense_best``'s XLA ``fori_loop`` over the span^2
window offsets (81 dynamic-slice + multiply-reduce passes over the full
image, each re-streaming ~14 MB from HBM — measured 4-9 ms per dilation
level at 512x288xf24) with a single VMEM-resident kernel: each grid step
holds a row-band of the padded descriptor image and the claimed-query
grid in VMEM and runs all span^2 shifted dot products from there
(~0.3 ms/level; the whole 5-level cascade's dense phase drops ~25 ms).

Semantics are IDENTICAL to ``_dense_best`` (reference
``matching_kernels.cu:26-81``): scores accumulate in f32 from bf16
products, offsets scan i(u)-outer / j(v)-inner, and strict ``>`` updates
give CUDA first-max tie-breaking.

The caller (refine_dense) falls back to the XLA formulation whenever the
shapes don't tile (tiny tests) or the band would not fit VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _band_kernel(Ppad_hbm, G_ref, best_ref, bo_ref, scratch, sem,
                 *, span: int, d: int, TH: int, W: int, f: int):
    ty = pl.program_id(0)
    rd = (span // 2) * d
    # DMA this band's padded rows (TH + 2rd) x (W + 2rd) into VMEM
    copy = pltpu.make_async_copy(
        Ppad_hbm.at[:, pl.ds(ty * TH, TH + 2 * rd), :],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    G = G_ref[:]  # (f, TH, W) bf16

    # STATICALLY unrolled offsets: Mosaic requires dynamic slice starts in
    # the sublane/lane dims to be tile-aligned (j*d, i*d are not); static
    # unaligned slices lower to vector shifts instead
    best = jnp.full((TH, W), -jnp.inf, jnp.float32)
    bo = jnp.zeros((TH, W), jnp.int32)
    for o in range(span * span):
        i = o // span
        j = o % span
        p = scratch[:, j * d : j * d + TH, i * d : i * d + W]  # (f, TH, W)
        acc = jnp.sum((p * G).astype(jnp.float32), axis=0)  # (TH, W) f32
        upd = acc > best
        best = jnp.where(upd, acc, best)
        bo = jnp.where(upd, o, bo)
    best_ref[:] = best
    bo_ref[:] = bo


def _pick_band(H: int) -> int:
    """Largest divisor of H that is <= 128 (row band height)."""
    for th in range(min(H, 128), 0, -1):
        if H % th == 0:
            return th
    return H


def dense_best_supported(h: int, w: int, f: int, span: int, d: int) -> bool:
    """Shapes the kernel handles with a sane VMEM footprint."""
    rd = (span // 2) * d
    th = _pick_band(h)
    lanes = -(-(w + 2 * rd) // 128) * 128
    band_bytes = f * (th + 2 * rd) * lanes * 2
    g_bytes = f * th * (-(-w // 128) * 128) * 2
    out_bytes = th * w * 8
    return (band_bytes + g_bytes + 2 * out_bytes) < 10 * 1024 * 1024


@partial(jax.jit, static_argnames=("span", "d", "interpret"))
def dense_best_pallas(Ppad: jax.Array, G: jax.Array, *, span: int, d: int,
                      interpret: bool = False):
    """(f, H+2rd, W+2rd) bf16 padded image-1 descriptors x (f, H, W) bf16
    claimed query grid -> (best (H, W) f32, bo (H, W) int32)."""
    f, H, W = G.shape
    rd = (span // 2) * d
    TH = _pick_band(H)
    grid = (H // TH,)

    kernel = partial(_band_kernel, span=span, d=d, TH=TH, W=W, f=f)
    best, bo = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # Ppad stays in HBM
            pl.BlockSpec((f, TH, W), lambda ty: (0, ty, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TH, W), lambda ty: (ty, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, W), lambda ty: (ty, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((H, W), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((f, TH + 2 * rd, W + 2 * rd), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(Ppad, G)
    return best, bo
