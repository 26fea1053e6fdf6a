"""Mapper keyframes: learnable pose (6D rotation + t) and 3x4 exposure with
per-keyframe Adam, plus host-side image/inverse-depth pyramids.

Reference: ``Reconstruct/scene/keyframe.py:21-259``.  TPU-native split: the
small learnable params live in a capacity-allocated device pool (so the
jitted optimization step can dynamically index any keyframe), while image
pyramids stay in host numpy and stream in per step (the reference instead
keeps up to 400 keyframes' tensors on-GPU and randomly offloads).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from artdeco_tpu.ops import adam


def sixd_to_mtx(r: jax.Array) -> jax.Array:
    """6D rotation parametrization -> 3x3 matrix (utils.py:223-229).

    r: (..., 3, 2) — two column vectors; Gram-Schmidt.
    """
    b1 = r[..., 0]
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = r[..., 1] - jnp.sum(b1 * r[..., 1], axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def mtx_to_sixd(R: jax.Array) -> jax.Array:
    return R[..., :2]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KeyframePool:
    """Capacity-allocated learnable keyframe params (device)."""

    r_w2c: jax.Array      # (K, 3, 2) 6D rotation
    t_w2c: jax.Array      # (K, 3)
    exposure: jax.Array   # (K, 3, 4)
    lr_pose: jax.Array    # (K,)
    lr_exposure: jax.Array  # (K,)
    depth_loss_weight: jax.Array  # (K,)
    is_test: jax.Array    # (K,) bool
    used: jax.Array       # (K,) bool
    opt_r: adam.AdamState
    opt_t: adam.AdamState
    opt_e: adam.AdamState

    @property
    def capacity(self) -> int:
        return self.r_w2c.shape[0]


def create_pool(capacity: int) -> KeyframePool:
    r = jnp.tile(jnp.eye(3)[:, :2], (capacity, 1, 1))
    zeros3 = jnp.zeros((capacity, 3))
    expo = jnp.tile(jnp.eye(3, 4), (capacity, 1, 1))
    return KeyframePool(
        r_w2c=r,
        t_w2c=zeros3,
        exposure=expo,
        lr_pose=jnp.zeros((capacity,)),
        lr_exposure=jnp.zeros((capacity,)),
        depth_loss_weight=jnp.zeros((capacity,)),
        is_test=jnp.zeros((capacity,), bool),
        used=jnp.zeros((capacity,), bool),
        opt_r=adam.init_state(r),
        opt_t=adam.init_state(zeros3),
        opt_e=adam.init_state(expo),
    )


@jax.jit
def set_keyframe(pool: KeyframePool, idx, Rt_w2c: jax.Array,
                 exposure: jax.Array, lr_pose, lr_exposure,
                 depth_loss_weight, is_test) -> KeyframePool:
    """Register/overwrite keyframe ``idx`` (Rt 4x4 world->cam)."""
    return dataclasses.replace(
        pool,
        r_w2c=pool.r_w2c.at[idx].set(Rt_w2c[:3, :2]),
        t_w2c=pool.t_w2c.at[idx].set(Rt_w2c[:3, 3]),
        exposure=pool.exposure.at[idx].set(exposure),
        lr_pose=pool.lr_pose.at[idx].set(lr_pose),
        lr_exposure=pool.lr_exposure.at[idx].set(lr_exposure),
        depth_loss_weight=pool.depth_loss_weight.at[idx].set(depth_loss_weight),
        is_test=pool.is_test.at[idx].set(is_test),
        used=pool.used.at[idx].set(True),
        opt_r=adam.AdamState(
            pool.opt_r.exp_avg.at[idx].set(0.0),
            pool.opt_r.exp_avg_sq.at[idx].set(0.0),
        ),
        opt_t=adam.AdamState(
            pool.opt_t.exp_avg.at[idx].set(0.0),
            pool.opt_t.exp_avg_sq.at[idx].set(0.0),
        ),
        opt_e=adam.AdamState(
            pool.opt_e.exp_avg.at[idx].set(0.0),
            pool.opt_e.exp_avg_sq.at[idx].set(0.0),
        ),
    )


@jax.jit
def register_keyframe(pool: KeyframePool, idx, Rt_w2c: jax.Array,
                      lr_pose, lr_exposure, depth_loss_weight,
                      is_test) -> KeyframePool:
    """set_keyframe with the reference's exposure inheritance (previous
    keyframe's exposure, identity for keyframe 0) resolved IN-GRAPH — the
    host-side ``pool.exposure[idx - 1]`` slice was an eager dispatch on the
    per-keyframe path."""
    prev = jnp.where(idx > 0,
                     pool.exposure[jnp.maximum(idx - 1, 0)],
                     jnp.eye(3, 4))
    return set_keyframe(pool, idx, Rt_w2c, prev, lr_pose, lr_exposure,
                        depth_loss_weight, is_test)


def get_Rt(pool: KeyframePool, idx) -> jax.Array:
    """4x4 world->cam of keyframe idx (differentiable wrt pool params)."""
    R = sixd_to_mtx(pool.r_w2c[idx])
    t = pool.t_w2c[idx]
    top = jnp.concatenate([R, t[:, None]], axis=-1)
    return jnp.concatenate(
        [top, jnp.asarray([[0.0, 0.0, 0.0, 1.0]])], axis=0
    )


def get_all_Rt(pool: KeyframePool) -> jax.Array:
    R = sixd_to_mtx(pool.r_w2c)
    top = jnp.concatenate([R, pool.t_w2c[..., None]], axis=-1)
    bottom = jnp.tile(jnp.asarray([[[0.0, 0.0, 0.0, 1.0]]]), (pool.capacity, 1, 1))
    return jnp.concatenate([top, bottom], axis=1)


def get_all_c2w(pool: KeyframePool) -> jax.Array:
    Rt = get_all_Rt(pool)
    R = Rt[:, :3, :3]
    t = Rt[:, :3, 3]
    Rinv = jnp.swapaxes(R, -1, -2)
    tinv = -jnp.einsum("kij,kj->ki", Rinv, t)
    top = jnp.concatenate([Rinv, tinv[..., None]], axis=-1)
    bottom = jnp.tile(jnp.asarray([[[0.0, 0.0, 0.0, 1.0]]]), (pool.capacity, 1, 1))
    return jnp.concatenate([top, bottom], axis=1)


@dataclasses.dataclass
class KeyframeHostData:
    """Host-side per-keyframe payloads (numpy): image + idepth pyramids.

    Pyramid level 0 is map resolution; level l is avg-pooled by 2^l.
    """

    index: int
    global_frame_id: int
    image_name: str
    is_test: bool
    is_slam_keyframe: bool
    image_pyr: list            # [(3, H, W) f32] in [0, 1]
    idepth_pyr: list           # [(1, H, W) f32]
    conf_pyr: list             # [(1, H, W) f32]
    point_map: np.ndarray      # (H_slam, W_slam, 3) SLAM-resolution pointmap
    point_conf: np.ndarray     # (H_slam, W_slam)
    pyr_lvl: int = 0
    Rt_gt: Optional[np.ndarray] = None
    timestamp: float = 0.0


def _avg_pool2(x: np.ndarray) -> np.ndarray:
    c, h, w = x.shape
    h2, w2 = h // 2, w // 2
    return x[:, : h2 * 2, : w2 * 2].reshape(c, h2, 2, w2, 2).mean(axis=(2, 4))


def _resize_bilinear(x: np.ndarray, h: int, w: int) -> np.ndarray:
    """align_corners=True bilinear resize of (c, H, W)."""
    c, H, W = x.shape
    if (H, W) == (h, w):
        return x.copy()
    ys = np.linspace(0, H - 1, h)
    xs = np.linspace(0, W - 1, w)
    y0 = np.clip(np.floor(ys).astype(int), 0, H - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, W - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    wy = (ys - y0)[None, :, None]
    wx = (xs - x0)[None, None, :]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    c_ = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return (
        a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c_ * wy * (1 - wx) + d * wy * wx
    ).astype(x.dtype)


@partial(jax.jit, static_argnames=("pyr_levels", "h", "w"))
def _build_pyramids_jit(image, point_map, point_conf,
                        pyr_levels: int, h: int, w: int):
    """Keyframe pyramid construction ON DEVICE (same math as the numpy
    helpers below: align_corners resize + 2x average pooling).

    The reference builds these in torch on the GPU (keyframe.py:64-100);
    the round-4 TPU port pulled point/conf to host, built numpy pyramids
    and re-uploaded ~3 MB per keyframe — pure host<->device churn now that
    the dense-point pipeline keeps its outputs in HBM.
    """
    depth = point_map[..., 2][None]
    idepth = jnp.where(depth != 0, 1.0 / (depth + 1e-4), 1e4)
    conf = point_conf[None]

    def resize_ac(x, th, tw):
        """align_corners=True bilinear (matches _resize_bilinear below)."""
        c, H, W = x.shape
        if (H, W) == (th, tw):
            return x
        ys = jnp.linspace(0.0, H - 1.0, th)
        xs = jnp.linspace(0.0, W - 1.0, tw)
        y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
        y1 = jnp.clip(y0 + 1, 0, H - 1)
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
        x1 = jnp.clip(x0 + 1, 0, W - 1)
        wy = (ys - y0)[None, :, None]
        wx = (xs - x0)[None, None, :]
        a = x[:, y0][:, :, x0]
        b = x[:, y0][:, :, x1]
        c_ = x[:, y1][:, :, x0]
        d = x[:, y1][:, :, x1]
        return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
                + c_ * wy * (1 - wx) + d * wy * wx)

    def pool2(x):
        c, H, W = x.shape
        h2, w2 = H // 2, W // 2
        return x[:, : h2 * 2, : w2 * 2].reshape(c, h2, 2, w2, 2).mean((2, 4))

    image_pyr = [image.astype(jnp.float32)]
    idepth_pyr = [resize_ac(idepth, h, w)]
    conf_pyr = [resize_ac(conf, h, w)]
    for _ in range(pyr_levels - 1):
        image_pyr.append(pool2(image_pyr[-1]))
        idepth_pyr.append(pool2(idepth_pyr[-1]))
        conf_pyr.append(pool2(conf_pyr[-1]))
    return image_pyr, idepth_pyr, conf_pyr


def make_device_keyframe(
    index: int,
    global_frame_id: int,
    image,                    # (3, H, W) map-res in [0, 1] — device or host
    point_map,                # (H_slam, W_slam, 3) — device or host
    point_conf,               # (H_slam, W_slam)
    is_test: bool,
    is_slam_keyframe: bool,
    pyr_levels: int = 2,
    image_name: str = "",
    Rt_gt: Optional[np.ndarray] = None,
    timestamp: float = 0.0,
) -> "KeyframeHostData":
    """Device-resident keyframe ingest: ONE jitted dispatch builds all
    pyramids in HBM; no host pyramid pass, no re-upload.  The returned
    KeyframeHostData's array fields are jax arrays (np.asarray pulls them
    on demand for save/export paths — d2h is cheap on this backend)."""
    image = jnp.asarray(image)
    point_map = jnp.asarray(point_map)
    point_conf = jnp.asarray(point_conf)
    c, h, w = image.shape
    image_pyr, idepth_pyr, conf_pyr = _build_pyramids_jit(
        image, point_map, point_conf, pyr_levels, h, w
    )
    return KeyframeHostData(
        index=index,
        global_frame_id=global_frame_id,
        image_name=image_name or f"frame_{global_frame_id:06d}",
        is_test=is_test,
        is_slam_keyframe=is_slam_keyframe,
        image_pyr=list(image_pyr),
        idepth_pyr=list(idepth_pyr),
        conf_pyr=list(conf_pyr),
        point_map=point_map,
        point_conf=point_conf,
        pyr_lvl=pyr_levels - 1,
        Rt_gt=Rt_gt,
        timestamp=timestamp,
    )


def make_host_keyframe(
    index: int,
    global_frame_id: int,
    image: np.ndarray,        # (3, H, W) map-res in [0, 1]
    point_map: np.ndarray,    # (H_slam, W_slam, 3)
    point_conf: np.ndarray,   # (H_slam, W_slam)
    is_test: bool,
    is_slam_keyframe: bool,
    pyr_levels: int = 2,
    image_name: str = "",
    Rt_gt: Optional[np.ndarray] = None,
    timestamp: float = 0.0,
) -> KeyframeHostData:
    """Build pyramids (reference keyframe.py:64-100)."""
    c, h, w = image.shape
    depth = point_map[..., 2][None]  # (1, Hs, Ws)
    idepth = np.where(depth != 0, 1.0 / (depth + 1e-4), 1e4).astype(np.float32)
    conf = point_conf[None].astype(np.float32)

    image_pyr = [image.astype(np.float32)]
    idepth_pyr = [_resize_bilinear(idepth, h, w)]
    conf_pyr = [_resize_bilinear(conf, h, w)]
    for _ in range(pyr_levels - 1):
        image_pyr.append(_avg_pool2(image_pyr[-1]))
        idepth_pyr.append(_avg_pool2(idepth_pyr[-1]))
        conf_pyr.append(_avg_pool2(conf_pyr[-1]))

    return KeyframeHostData(
        index=index,
        global_frame_id=global_frame_id,
        image_name=image_name or f"frame_{global_frame_id:06d}",
        is_test=is_test,
        is_slam_keyframe=is_slam_keyframe,
        image_pyr=image_pyr,
        idepth_pyr=idepth_pyr,
        conf_pyr=conf_pyr,
        point_map=point_map.astype(np.float32),
        point_conf=point_conf.astype(np.float32),
        pyr_lvl=pyr_levels - 1,
        Rt_gt=Rt_gt,
        timestamp=timestamp,
    )
