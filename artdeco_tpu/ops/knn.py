"""Approximate K-nearest-neighbor distances via Morton-sorted windows.

Reference: the simple-knn CUDA extension
(``Reconstruct/submodules/simple-knn/simple_knn.cu:65-648``): Morton codes +
AABB-pruned boxed search producing mean 3-NN distance (``distCUDA2``) and
K-NN indices (``distIndex2``).  The reference's search is itself approximate
(box-pruned); ours sorts by Morton code once (XLA sort) and scans a +-window
in sorted order — a fully vectorized roll-and-compare that needs no kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _expand_bits(v: jax.Array) -> jax.Array:
    """Spread 10 bits over 30 (Morton interleave helper)."""
    u = jnp.uint32
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def morton_codes(xyz: jax.Array) -> jax.Array:
    """30-bit Morton codes of points normalized into their AABB."""
    mn = jnp.min(xyz, axis=0, keepdims=True)
    mx = jnp.max(xyz, axis=0, keepdims=True)
    u = (xyz - mn) / jnp.maximum(mx - mn, 1e-12)
    q = jnp.clip((u * 1023.0), 0, 1023).astype(jnp.uint32)
    return (
        (_expand_bits(q[:, 0]) << 2)
        | (_expand_bits(q[:, 1]) << 1)
        | _expand_bits(q[:, 2])
    ).astype(jnp.uint32)


@partial(jax.jit, static_argnames=("k", "window"))
def knn_mean_sq_dist(xyz: jax.Array, k: int = 3, window: int = 16) -> jax.Array:
    """Mean squared distance to the (approximate) k nearest neighbors.

    Matches the distCUDA2 surface (used to initialize gaussian scales).
    window: half-width of the Morton-sorted candidate scan.
    """
    n = xyz.shape[0]
    codes = morton_codes(xyz)
    order = jnp.argsort(codes)
    pts = xyz[order]

    big = jnp.float32(jnp.inf)
    # distances to +-window neighbors in sorted order
    dists = []
    for off in range(1, window + 1):
        for sign in (1, -1):
            rolled = jnp.roll(pts, sign * off, axis=0)
            d = jnp.sum((pts - rolled) ** 2, axis=-1)
            # wrap-around pairs are invalid
            idx = jnp.arange(n)
            bad = (idx - sign * off < 0) | (idx - sign * off >= n)
            dists.append(jnp.where(bad, big, d))
    dmat = jnp.stack(dists, axis=-1)  # (N, 2*window)
    # k smallest via top_k of negatives
    neg_topk, _ = jax.lax.top_k(-dmat, k)
    mean_knn = jnp.mean(-neg_topk, axis=-1)
    # undo the sort
    inv = jnp.argsort(order)
    return mean_knn[inv]
