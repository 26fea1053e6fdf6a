"""Keyframe store: fixed-capacity SoA of tracked keyframes.

Reference: ``VSLAM/SharedKeyframes.py:13-134`` — a 2048-slot ring of shared-
memory tensors used across the 3-process pipeline.  The TPU rebuild is a
single host process, so this is a plain host-side numpy SoA (no locks, no
shared memory); device code receives contiguous jnp views of the slices it
needs.  The fixed capacity is what keeps downstream XLA shapes static.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from artdeco_tpu.vslam.frame import Frame


@dataclasses.dataclass
class DensePoint:
    index: int
    point_map: np.ndarray  # (H, W, 3)
    point_conf: np.ndarray  # (H, W, 1)


class KeyframeStore:
    """Fixed-capacity keyframe SoA (reference buffer=2048)."""

    def __init__(self, h: int, w: int, K_slam=None, buffer: int = 2048,
                 dtype=np.float32):
        self.h, self.w = h, w
        self.buffer = buffer
        self.n_size = 0

        self.dataset_idx = np.zeros(buffer, np.int32)
        self.cam_id = np.zeros(buffer, np.int32)
        self.timestamp = np.zeros(buffer, np.float64)
        self.img = np.zeros((buffer, 3, h, w), dtype)
        self.T_WC = np.tile(
            np.asarray([0, 0, 0, 0, 0, 0, 1, 1], dtype), (buffer, 1)
        )
        self.X = np.zeros((buffer, h * w, 3), dtype)
        self.C = np.zeros((buffer, h * w, 1), dtype)
        self.N = np.zeros(buffer, np.int32)
        self.is_dirty = np.zeros(buffer, bool)
        # monotonically-increasing pointmap version per slot, for consumers
        # (e.g. the factor graph's device mirror) to sync lazily
        self.version = np.zeros(buffer, np.int64)
        self.K = None if K_slam is None else np.asarray(K_slam, dtype)
        # dense points for the mapper (rgb-less: xyz + conf)
        self.dense_point = np.zeros((buffer, h, w, 4), dtype)
        self.ready_for_map = np.zeros(buffer, bool)
        # cached MASt3R encoder embeddings (feat, pos) per keyframe
        self._embeddings: dict[int, tuple] = {}

    def __len__(self) -> int:
        return self.n_size

    def __getitem__(self, idx: int) -> Frame:
        import jax.numpy as jnp

        f = Frame(
            img=jnp.asarray(self.img[idx]),
            T_WC=jnp.asarray(self.T_WC[idx]),
            X_canon=jnp.asarray(self.X[idx]),
            C=jnp.asarray(self.C[idx]),
            N=jnp.asarray(self.N[idx]),
            frame_id=int(self.dataset_idx[idx]),
            frame_time=float(self.timestamp[idx]),
        )
        return f

    def __setitem__(self, idx: int, f: Frame) -> None:
        self.n_size = max(idx + 1, self.n_size)
        self.dataset_idx[idx] = f.frame_id
        self.timestamp[idx] = f.frame_time
        self.img[idx] = np.asarray(f.img)
        self.T_WC[idx] = np.asarray(f.T_WC).reshape(8)
        self.X[idx] = np.asarray(f.X_canon)
        self.C[idx] = np.asarray(f.C)
        self.N[idx] = int(f.N)
        self.is_dirty[idx] = True
        self.version[idx] += 1

    def append(self, f: Frame) -> int:
        idx = self.n_size
        self[idx] = f
        return idx

    def pop_last(self) -> None:
        self.n_size -= 1

    def last_keyframe(self) -> Optional[Frame]:
        if self.n_size == 0:
            return None
        return self[self.n_size - 1]

    def last_index(self) -> int:
        return self.n_size - 1

    def update_T_WCs(self, T_WCs, idx) -> None:
        self.T_WC[np.asarray(idx)] = np.asarray(T_WCs).reshape(-1, 8)

    def get_dirty_idx(self) -> np.ndarray:
        idx = np.where(self.is_dirty)[0]
        self.is_dirty[:] = False
        return idx

    # -- dense points for the mapper ------------------------------------
    def put_dense_point(self, index: int, dense: np.ndarray) -> None:
        self.dense_point[index] = dense
        self.ready_for_map[index] = True

    def get_dense_point(self, index: int) -> np.ndarray:
        return self.dense_point[index]

    # -- encoder embedding cache (Backend.py:38,214) --------------------
    def put_embedding(self, index: int, feat, pos) -> None:
        self._embeddings[index] = (feat, pos)

    def get_embedding(self, index: int):
        return self._embeddings.get(index)

    def set_intrinsics(self, K) -> None:
        self.K = np.asarray(K, np.float32)

    def get_intrinsics(self):
        return self.K
