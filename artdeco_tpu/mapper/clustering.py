"""Voxel-hash clustering with per-voxel majority voting (pure JAX).

Reference: ``h3dgsv3.py:227-316`` (update_voxel): exact voxelization with
torch.unique + torch_scatter majority votes, assigning incremental cluster
ids to new voxels.  TPU redesign: a persistent spatial hash table of
``table_size`` buckets (static) replaces torch.unique; the majority vote is
a sort-based run-length argmax (no one-hot blowup, no scatters in the hot
math).  Hash collisions merge distant voxels with probability ~V/table_size —
an accepted approximation that keeps every shape static.

Bit budget (int32 sort keys): bucket ids use 17 bits (table_size + parking
<= 2^17) and cluster ids 14 bits, so ``table_size <= 1<<16`` and
``max_clusters <= 1<<14``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

_P1, _P2, _P3 = 73856093, 19349663, 83492791
_LBITS = 14


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClusterState:
    voxel_cls: jax.Array     # (T,) int32 cluster id per bucket, -1 empty
    num_clusters: jax.Array  # () int32


def create_cluster_state(table_size: int) -> ClusterState:
    assert table_size <= 1 << 16
    return ClusterState(
        voxel_cls=jnp.full((table_size,), -1, jnp.int32),
        num_clusters=jnp.zeros((), jnp.int32),
    )


def bucket_of(xyz: jax.Array, voxel_size: float, table_size: int) -> jax.Array:
    ijk = jnp.floor(xyz / voxel_size).astype(jnp.int32)
    h = (ijk[..., 0] * _P1) ^ (ijk[..., 1] * _P2) ^ (ijk[..., 2] * _P3)
    return (jnp.abs(h) % table_size).astype(jnp.int32)


# alias: the spatial hash doubles as a generic voxel hash (the reference's
# torch.unique voxelization key, h3dgsv3.py:241-252)
voxel_hash = bucket_of


@partial(jax.jit, static_argnames=("num_segments", "num_classes"))
def segment_majority_vote(
    segment_ids: jax.Array,  # (N,) int32 bucket per point
    labels: jax.Array,       # (N,) int32 class label per point
    weights: jax.Array,      # (N,) float vote weight (use mask for validity)
    num_segments: int,
    num_classes: int,
):
    """Weighted majority class per segment (torch_scatter.scatter_max
    equivalent, h3dgsv3.py:289).

    Returns (winner (S,), count (S,)): argmax class of summed weights and
    total weight per segment.  One-hot + segment_sum — used by callers whose
    class count is small; ``update_clusters`` uses the sort-based vote."""
    oh = jax.nn.one_hot(labels, num_classes, dtype=weights.dtype) \
        * weights[:, None]
    tally = jax.ops.segment_sum(oh, segment_ids, num_segments=num_segments)
    winner = jnp.argmax(tally, axis=-1).astype(jnp.int32)
    total = jnp.sum(tally, axis=-1)
    return winner, total


@partial(jax.jit, static_argnames=("table_size", "max_clusters"))
def update_clusters(
    state: ClusterState,
    xyz: jax.Array,        # (N, 3) existing gaussians
    cls_id: jax.Array,     # (N,) int32
    active: jax.Array,     # (N,) bool
    new_xyz: jax.Array,    # (B, 3) candidates
    new_valid: jax.Array,  # (B,) bool
    voxel_size: float,
    table_size: int,
    max_clusters: int,
):
    """Re-vote existing gaussians' cluster ids and assign ids to candidates.

    Returns (new_state, updated_cls_id (N,), new_cls_id (B,), n_fresh).
    """
    assert max_clusters <= 1 << _LBITS
    n = xyz.shape[0]
    b = new_xyz.shape[0]
    park = table_size  # virtual bucket for inactive rows
    ts1 = table_size + 1

    bk = bucket_of(xyz, voxel_size, table_size)
    bk_eff = jnp.where(active, bk, park)

    # ---- exact majority vote per bucket: sort (bucket, label) pairs -------
    label = jnp.clip(cls_id, 0, max_clusters - 1)
    key = (bk_eff << _LBITS) | label  # int32-safe: 17 + 14 bits
    keys_sorted = jnp.sort(key)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), keys_sorted[1:] != keys_sorted[:-1]]
    )
    run_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # (N,)
    run_count = jax.ops.segment_sum(
        jnp.ones((n,), jnp.int32), run_id, num_segments=n
    )
    run_key = jax.ops.segment_max(keys_sorted, run_id, num_segments=n)
    run_bucket = run_key >> _LBITS
    run_label = run_key & ((1 << _LBITS) - 1)
    # empty run slots (run_id never reaches them) have count 0 / key 0; park
    # them so they can't win bucket 0
    run_bucket = jnp.where(run_count > 0, run_bucket, park)

    max_count = jax.ops.segment_max(run_count, run_bucket, num_segments=ts1)
    is_winner = run_count == max_count[run_bucket]
    winner = jax.ops.segment_min(
        jnp.where(is_winner, run_label, max_clusters), run_bucket,
        num_segments=ts1,
    )
    has_points = max_count[:table_size] > 0
    winner = jnp.where(has_points, winner[:table_size], -1).astype(jnp.int32)

    updated_cls = jnp.where(active, winner[bk], cls_id).astype(jnp.int32)

    # refresh the persistent table where we have live evidence
    voxel_cls = jnp.where(has_points, winner, state.voxel_cls)

    # ---- assign candidates -------------------------------------------------
    nb = bucket_of(new_xyz, voxel_size, table_size)
    nb_eff = jnp.where(new_valid, nb, park)
    existing = voxel_cls[jnp.minimum(nb_eff, table_size - 1)]
    hit = new_valid & (existing >= 0)

    # fresh ids for the first occurrence per unoccupied bucket
    cand_idx = jnp.arange(b, dtype=jnp.int32)
    miss = new_valid & ~hit
    first_idx = jax.ops.segment_min(
        jnp.where(miss, cand_idx, b), nb_eff, num_segments=ts1
    )
    is_first = miss & (cand_idx == first_idx[nb_eff])
    fresh_rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    fresh_id = jnp.clip(state.num_clusters + fresh_rank, 0, max_clusters - 1)
    bucket_fresh = jax.ops.segment_max(
        jnp.where(is_first, fresh_id, -1), nb_eff, num_segments=ts1
    )[:table_size]
    new_cls = jnp.where(
        hit, existing,
        jnp.where(miss, bucket_fresh[jnp.minimum(nb, table_size - 1)], 0),
    ).astype(jnp.int32)

    n_fresh = jnp.sum(is_first)
    num_clusters = jnp.minimum(
        state.num_clusters + n_fresh, max_clusters
    ).astype(jnp.int32)

    # register fresh buckets (elementwise table merge, no scatter)
    voxel_cls = jnp.where((voxel_cls < 0) & (bucket_fresh >= 0),
                          bucket_fresh, voxel_cls)

    return (
        ClusterState(voxel_cls=voxel_cls, num_clusters=num_clusters),
        updated_cls,
        new_cls,
        n_fresh,
    )
