"""Voxel hashing + per-voxel majority vote (segment ops, pure JAX).

Reference: ``h3dgsv3.py:227-316`` (update_voxel) uses torch_scatter.scatter_max
over a voxel hash grid to majority-vote cluster ids per voxel.  The TPU
replacement is ``jax.ops.segment_max`` / ``segment_sum`` over hashed voxel
keys with a static capacity table.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# large primes for 3D spatial hashing
_P1, _P2, _P3 = 73856093, 19349663, 83492791


def voxel_hash(xyz: jax.Array, voxel_size: float, table_size: int) -> jax.Array:
    """Hash 3D points into a table of ``table_size`` buckets."""
    ijk = jnp.floor(xyz / voxel_size).astype(jnp.int32)
    h = (ijk[..., 0] * _P1) ^ (ijk[..., 1] * _P2) ^ (ijk[..., 2] * _P3)
    return jnp.abs(h) % table_size


@partial(jax.jit, static_argnames=("num_segments", "num_classes"))
def segment_majority_vote(
    segment_ids: jax.Array,  # (N,) int32 bucket per point
    labels: jax.Array,       # (N,) int32 class label per point
    weights: jax.Array,      # (N,) float vote weight (use mask for validity)
    num_segments: int,
    num_classes: int,
):
    """Weighted majority class per segment.

    Returns (winner (S,), count (S,)) where winner is the argmax class of
    summed weights and count the total weight per segment.
    """
    # one-hot over classes then segment-sum: (S, C) tally
    oh = jax.nn.one_hot(labels, num_classes, dtype=weights.dtype) * weights[:, None]
    tally = jax.ops.segment_sum(oh, segment_ids, num_segments=num_segments)
    winner = jnp.argmax(tally, axis=-1).astype(jnp.int32)
    total = jnp.sum(tally, axis=-1)
    return winner, total
