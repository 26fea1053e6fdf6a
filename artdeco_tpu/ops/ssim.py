"""Fused SSIM loss (11x11 Gaussian window), pure JAX/XLA.

Reference: the fused-ssim CUDA extension
(``Reconstruct/submodules/fused-ssim/ssim.cu:62`` fwd, ``:286`` bwd, python
wrapper ``fused_ssim/__init__.py:8-40``): zero-padded 11x11 Gaussian-window
SSIM map, "same" or "valid" padding, loss = map.mean().

TPU-native design note: the reference hand-fuses the two-pass separable
convolution + SSIM formula + saved backward partials into one CUDA kernel
because torch would materialize every intermediate.  On TPU, XLA fuses the
separable reduce-window convolutions with the elementwise SSIM math on its
own, and autodiff of a conv is a conv — so a Pallas kernel would only
re-implement what the compiler already does.  This is the idiomatic form.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_WIN = 11
_SIGMA = 1.5
_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def _gaussian_kernel(dtype=jnp.float32):
    x = jnp.arange(_WIN, dtype=dtype) - (_WIN - 1) / 2.0
    g = jnp.exp(-(x * x) / (2.0 * _SIGMA * _SIGMA))
    return g / jnp.sum(g)


def _blur2d(img: jax.Array) -> jax.Array:
    """Separable zero-padded 11x11 Gaussian filter over (..., H, W)."""
    g = _gaussian_kernel(img.dtype)
    pad = _WIN // 2
    x = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(pad, pad), (0, 0)])
    # conv along H: window dot product via stacked shifts (XLA fuses these)
    x = sum(g[i] * x[..., i : i + img.shape[-2], :] for i in range(_WIN))
    y = jnp.pad(x, [(0, 0)] * (img.ndim - 2) + [(0, 0), (pad, pad)])
    return sum(g[i] * y[..., :, i : i + img.shape[-1]] for i in range(_WIN))


@partial(jax.jit, static_argnames=("padding",))
def ssim_map(img1: jax.Array, img2: jax.Array, padding: str = "same") -> jax.Array:
    """Per-pixel SSIM over (..., H, W) images in [0, 1].

    Matches the reference's zero-padding convention; "valid" crops 5 px.
    """
    mu1 = _blur2d(img1)
    mu2 = _blur2d(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1_sq = _blur2d(img1 * img1) - mu1_sq
    sigma2_sq = _blur2d(img2 * img2) - mu2_sq
    sigma12 = _blur2d(img1 * img2) - mu12

    m = ((2.0 * mu12 + _C1) * (2.0 * sigma12 + _C2)) / (
        (mu1_sq + mu2_sq + _C1) * (sigma1_sq + sigma2_sq + _C2)
    )
    if padding == "valid":
        m = m[..., 5:-5, 5:-5]
    return m


@partial(jax.jit, static_argnames=("padding",))
def fused_ssim(img1: jax.Array, img2: jax.Array, padding: str = "same") -> jax.Array:
    """Scalar SSIM score = mean of the SSIM map (fused_ssim surface)."""
    return jnp.mean(ssim_map(img1, img2, padding))
