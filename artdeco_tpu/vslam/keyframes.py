"""Keyframe store: fixed-capacity SoA of tracked keyframes.

Reference: ``VSLAM/SharedKeyframes.py:13-134`` — a 2048-slot ring of shared-
memory tensors used across the 3-process pipeline.  The TPU rebuild is a
single host process, so scalar metadata (poses, timestamps, versions) is a
host numpy SoA, while the O(H*W) payloads (image, pointmap, confidence)
stay as DEVICE arrays stored by reference: they are produced on device by
the model/tracker and consumed on device by the matcher/solver, so copying
them through host memory would put two slow PCIe hops on the per-frame
critical path (the reference likewise keeps keyframe tensors GPU-resident
via ``device_shared``).  The fixed capacity keeps downstream XLA shapes
static.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from artdeco_tpu.vslam.frame import Frame


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
        self.T_WC = np.tile(
            np.asarray([0, 0, 0, 0, 0, 0, 1, 1], dtype), (buffer, 1)
        )
        self.is_dirty = np.zeros(buffer, bool)
        # monotonically-increasing pointmap version per slot, for consumers
        # (e.g. the factor graph's device mirror) to sync lazily
        self.version = np.zeros(buffer, np.int64)
        self.K = None if K_slam is None else np.asarray(K_slam, dtype)
        # device-resident payloads, stored by reference (no copies)
        self._img: dict[int, object] = {}
        self._X: dict[int, object] = {}
        self._C: dict[int, object] = {}
        self._N: dict[int, object] = {}
        # cached MASt3R encoder embeddings (feat, pos) per keyframe
        self._embeddings: dict[int, tuple] = {}

    def __len__(self) -> int:
        return self.n_size

    def __getitem__(self, idx: int) -> Frame:
        import jax.numpy as jnp

        return Frame(
            img=self._img[idx],
            T_WC=jnp.asarray(self.T_WC[idx]),
            X_canon=self._X[idx],
            C=self._C[idx],
            N=self._N[idx],
            frame_id=int(self.dataset_idx[idx]),
            frame_time=float(self.timestamp[idx]),
        )

    def __setitem__(self, idx: int, f: Frame) -> None:
        import jax.numpy as jnp

        self.n_size = max(idx + 1, self.n_size)
        self.dataset_idx[idx] = f.frame_id
        self.timestamp[idx] = f.frame_time
        self.T_WC[idx] = np.asarray(f.T_WC).reshape(8)
        self._img[idx] = jnp.asarray(f.img)
        self._X[idx] = jnp.asarray(f.X_canon)
        self._C[idx] = jnp.asarray(f.C)
        self._N[idx] = jnp.asarray(f.N)
        self.is_dirty[idx] = True
        self.version[idx] += 1

    # device payload accessors (zero-copy)
    def X_dev(self, idx: int):
        return self._X[idx]

    def C_dev(self, idx: int):
        return self._C[idx]

    def N_dev(self, idx: int):
        return self._N[idx]

    def img_dev(self, idx: int):
        return self._img[idx]

    def update_payload(self, idx: int, X, C, N) -> None:
        """Update a slot's device payloads in place (no pose pull)."""
        self._X[idx] = X
        self._C[idx] = C
        self._N[idx] = N
        self.is_dirty[idx] = True
        self.version[idx] += 1

    def append(self, f: Frame) -> int:
        idx = self.n_size
        self[idx] = f
        return idx

    def pop_last(self) -> None:
        idx = self.n_size - 1
        self.n_size -= 1
        for d in (self._img, self._X, self._C, self._N, self._embeddings):
            d.pop(idx, None)

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

    # -- encoder embedding cache (Backend.py:38,214) --------------------
    def put_embedding(self, index: int, feat, pos) -> None:
        self._embeddings[index] = (feat, pos)

    def get_embedding(self, index: int):
        return self._embeddings.get(index)

    def set_intrinsics(self, K) -> None:
        self.K = np.asarray(K, np.float32)

    def get_intrinsics(self):
        return self.K
