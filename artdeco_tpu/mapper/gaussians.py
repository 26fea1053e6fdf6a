"""Gaussian parameter slabs with static capacity (TPU-native scene storage).

Reference: ``Reconstruct/scene/scene_models/h3dgsv3.py:124-171`` stores
gaussian params as concat-and-grow tensors with ``SparseGaussianAdam.
add_and_prune`` (``optimizers.py:163-219``) compacting/appending per
densification.  On TPU, dynamic shapes force recompiles, so the slab is
capacity-allocated with an ``active`` mask: prune = clearing bits, add =
scatter of a fixed candidate budget into free slots, and every consumer
(rasterizer, Adam, voting) runs at full static capacity with masking.
Per-gaussian Adam moments and the per-gaussian xyz learning rate ride in
the same structure.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from artdeco_tpu.ops import adam


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianSlab:
    """All arrays have leading dim = capacity (static)."""

    active: jax.Array        # (C,) bool
    kf_id: jax.Array         # (C,) int32 — creating keyframe (rigid transforms)
    cls_id: jax.Array        # (C,) int32 — voxel cluster id
    d_max: jax.Array         # (C, 1) — LOD distance bound
    xyz: jax.Array           # (C, 3)
    f_dc: jax.Array          # (C, 1, 3)
    f_rest: jax.Array        # (C, K-1, 3)
    scaling: jax.Array       # (C, 3) log-scales
    rotation: jax.Array      # (C, 4) wxyz
    opacity: jax.Array       # (C, 1) logits
    local_feat: jax.Array    # (C, Dl)
    xyz_lr: jax.Array        # (C,) per-gaussian position lr

    @property
    def capacity(self) -> int:
        return self.active.shape[0]

    def num_active(self) -> jax.Array:
        return jnp.sum(self.active)


TRAINED_KEYS = (
    "xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity", "local_feat",
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SlabOptState:
    xyz: adam.AdamState
    f_dc: adam.AdamState
    f_rest: adam.AdamState
    scaling: adam.AdamState
    rotation: adam.AdamState
    opacity: adam.AdamState
    local_feat: adam.AdamState


def create_slab(capacity: int, sh_degree: int, local_feat_dim: int,
                position_lr_init: float) -> GaussianSlab:
    k = (sh_degree + 1) ** 2
    return GaussianSlab(
        active=jnp.zeros((capacity,), bool),
        kf_id=jnp.zeros((capacity,), jnp.int32),
        cls_id=jnp.zeros((capacity,), jnp.int32),
        d_max=jnp.full((capacity, 1), 1e10, jnp.float32),
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        f_dc=jnp.zeros((capacity, 1, 3), jnp.float32),
        f_rest=jnp.zeros((capacity, k - 1, 3), jnp.float32),
        scaling=jnp.full((capacity, 3), -10.0, jnp.float32),
        rotation=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (capacity, 1)),
        opacity=jnp.full((capacity, 1), -10.0, jnp.float32),
        local_feat=jnp.zeros((capacity, local_feat_dim), jnp.float32),
        xyz_lr=jnp.full((capacity,), position_lr_init, jnp.float32),
    )


def create_opt_state(slab: GaussianSlab) -> SlabOptState:
    return SlabOptState(
        **{k: adam.init_state(getattr(slab, k)) for k in TRAINED_KEYS}
    )


@jax.jit
def prune(slab: GaussianSlab, keep_mask: jax.Array) -> GaussianSlab:
    """Deactivate gaussians outside ``keep_mask`` (no data movement)."""
    return dataclasses.replace(slab, active=slab.active & keep_mask)


@jax.jit
def insert(slab: GaussianSlab, opt: SlabOptState, new: dict,
           new_valid: jax.Array):
    """Scatter a fixed-budget batch of candidates into free slots.

    new: dict of (B, ...) arrays keyed like slab fields (subset ok);
    new_valid: (B,) bool — invalid candidates are dropped.
    Candidates beyond the free capacity are silently dropped (the caller can
    monitor occupancy via slab.num_active()).
    """
    cap = slab.capacity
    b = new_valid.shape[0]
    # i-th free slot: stable argsort puts active=False first, preserving order
    free_slots = jnp.argsort(slab.active, stable=True)  # (C,), free first
    n_free = cap - jnp.sum(slab.active)
    rank = jnp.cumsum(new_valid.astype(jnp.int32)) - 1   # (B,) rank among valid
    ok = new_valid & (rank < n_free)
    target = jnp.where(ok, free_slots[jnp.clip(rank, 0, cap - 1)], cap)  # cap = dropped

    def scat(dest, src):
        return dest.at[target].set(src, mode="drop")

    updates = {}
    for key, val in new.items():
        updates[key] = scat(getattr(slab, key), val)
    updates["active"] = slab.active.at[target].set(True, mode="drop")
    # reset adam moments + lr of the filled slots
    zeros_like = lambda arr: arr.at[target].set(0.0, mode="drop")
    new_opt = SlabOptState(
        **{
            k: adam.AdamState(
                zeros_like(getattr(opt, k).exp_avg),
                zeros_like(getattr(opt, k).exp_avg_sq),
            )
            for k in TRAINED_KEYS
        }
    )
    new_slab = dataclasses.replace(slab, **updates)
    return new_slab, new_opt, jnp.sum(ok)


@partial(jax.jit, static_argnames=("cfg_b1", "cfg_b2", "cfg_eps"))
def apply_adam(slab: GaussianSlab, opt: SlabOptState, grads: dict,
               visibility: jax.Array, lrs: dict,
               cfg_b1: float = 0.5, cfg_b2: float = 0.99,
               cfg_eps: float = 1e-15):
    """Visibility-masked Adam over all trained slab fields.

    grads: dict keyed by TRAINED_KEYS; lrs: dict of scalar lrs (xyz uses the
    per-gaussian slab.xyz_lr).  Only active & visible rows update.
    """
    vis = visibility & slab.active
    updates = {}
    new_states = {}
    for key in TRAINED_KEYS:
        lr = slab.xyz_lr if key == "xyz" else lrs[key]
        p, st = adam.adam_update_masked(
            getattr(slab, key), grads[key], getattr(opt, key), lr, vis,
            b1=cfg_b1, b2=cfg_b2, eps=cfg_eps,
        )
        updates[key] = p
        new_states[key] = st
    # xyz lr decay for visible rows (lr_dict semantics, optimizers.py:158-161)
    return (
        dataclasses.replace(slab, **updates),
        SlabOptState(**new_states),
    )


@jax.jit
def decay_xyz_lr(slab: GaussianSlab, visibility: jax.Array,
                 decay: float, lr_min: float) -> GaussianSlab:
    new_lr = adam.decay_lr_masked(slab.xyz_lr, visibility & slab.active, decay, lr_min)
    return dataclasses.replace(slab, xyz_lr=new_lr)


# ---------------------------------------------------------------------------
# Derived quantities
# ---------------------------------------------------------------------------

def scales_of(slab: GaussianSlab) -> jax.Array:
    return jnp.exp(slab.scaling)


def opacities_of(slab: GaussianSlab) -> jax.Array:
    return jax.nn.sigmoid(slab.opacity)


@jax.jit
def rigid_transform(slab: GaussianSlab, old_c2w: jax.Array, new_c2w: jax.Array
                    ) -> GaussianSlab:
    """Apply per-keyframe pose corrections to gaussians (loop closure).

    old_c2w/new_c2w: (Kf, 4, 4) camera-to-world per keyframe; each gaussian
    moves by delta = new[kf] @ inv(old[kf]) (reference
    ``Reconstruct/utils.py:28-60`` update_gaussians + ``h3dgsv3.py:955-966``).
    """
    old = old_c2w[slab.kf_id]
    new = new_c2w[slab.kf_id]
    # inverse of a rigid transform
    R_o = old[:, :3, :3]
    t_o = old[:, :3, 3]
    R_n = new[:, :3, :3]
    t_n = new[:, :3, 3]
    R_d = R_n @ jnp.swapaxes(R_o, -1, -2)
    t_d = t_n - jnp.einsum("nij,nj->ni", R_d, t_o)
    new_xyz = jnp.einsum("nij,nj->ni", R_d, slab.xyz) + t_d
    # rotate quaternion part: q_new = q(R_d) * q
    from artdeco_tpu.geometry import lie

    q_d_xyzw = lie.matrix_to_quat(R_d)
    q_xyzw = jnp.concatenate(
        [slab.rotation[:, 1:4], slab.rotation[:, 0:1]], axis=-1
    )
    q_new_xyzw = lie.quat_mul(q_d_xyzw, q_xyzw)
    new_rot = jnp.concatenate(
        [q_new_xyzw[:, 3:4], q_new_xyzw[:, 0:3]], axis=-1
    )
    return dataclasses.replace(slab, xyz=new_xyz, rotation=new_rot)


@partial(jax.jit, static_argnames=("new_capacity",))
def grow(slab: GaussianSlab, opt: SlabOptState, new_capacity: int):
    """Reallocate the slab at a larger capacity (one recompile per
    power-of-two step — the TPU answer to concat-and-grow).  Jitted so the
    growth-prediction prewarm can AOT-compile it (runtime/prewarm.py
    grow_slab); the xyz_lr fill rides as a traced scalar instead of a host
    readback."""
    old = slab.capacity
    assert new_capacity > old
    pad = new_capacity - old

    def pad0(x, fill=0.0):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    slab2 = GaussianSlab(
        active=pad0(slab.active, False),
        kf_id=pad0(slab.kf_id),
        cls_id=pad0(slab.cls_id),
        d_max=pad0(slab.d_max, 1e10),
        xyz=pad0(slab.xyz),
        f_dc=pad0(slab.f_dc),
        f_rest=pad0(slab.f_rest),
        scaling=pad0(slab.scaling, -10.0),
        rotation=jnp.concatenate(
            [slab.rotation,
             jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (pad, 1))], axis=0
        ),
        opacity=pad0(slab.opacity, -10.0),
        local_feat=pad0(slab.local_feat),
        xyz_lr=jnp.concatenate(
            [slab.xyz_lr, jnp.full((pad,), slab.xyz_lr[0])]
        ),
    )
    opt2 = SlabOptState(
        **{
            k: adam.AdamState(
                pad0(getattr(opt, k).exp_avg), pad0(getattr(opt, k).exp_avg_sq)
            )
            for k in TRAINED_KEYS
        }
    )
    return slab2, opt2
