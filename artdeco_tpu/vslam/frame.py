"""Frame state: the per-frame tracked entity (pointmap, confidence, pose).

Reference: ``VSLAM/ImageFrame.py`` (ImageFrame dataclass + Mode enum).
TPU-native design: a frozen pytree dataclass with pure-functional updates
(confidence-weighted pointmap fusion returns a new Frame), so frames can flow
through jitted functions.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax
import jax.numpy as jnp

from artdeco_tpu.geometry import lie


@jax.jit
def _fuse_pointmap_jit(X0, C0, N0, X, C):
    first = N0 == 0
    denom = jnp.where(first, 1.0, C0 + C)
    X_new = jnp.where(first, X, (C0 * X0 + C * X) / jnp.maximum(denom, 1e-12))
    C_new = jnp.where(first, C, C0 + C)
    # N rides inside the fusion program: `self.N + 1` on the host was one
    # extra eager jit(add) dispatch per update_pointmap call
    return X_new, C_new, N0 + jnp.int32(1)


@jax.jit
def _avg_conf_jit(C, N):
    return C / jnp.maximum(N, 1).astype(C.dtype)


_FRAME_ZEROS: dict = {}


class Mode(enum.IntEnum):
    TRACKING = 0
    RELOC = 1
    OPTIMIZING = 2
    TERMINATED = 3


class KeyframeStyle(enum.IntEnum):
    """Frontend frame classification (Frontend.py:85-102)."""
    LOST = 0
    KEYFRAME = 1       # SLAM keyframe -> backend global optimization
    MAPPER_FRAME = 2   # map-only frame -> dense points for the mapper
    COMMON = 3         # tracked, not propagated


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Frame:
    """One RGB frame with its canonical pointmap estimate.

    img:     (3, H, W) in [-1, 1] (reference normalization)
    T_WC:    (8,) Sim3 world-from-camera
    X_canon: (H*W, 3) canonical pointmap (camera frame)
    C:       (H*W, 1) accumulated confidence
    N:       scalar int — number of fused predictions
    """

    img: jax.Array
    T_WC: jax.Array
    X_canon: jax.Array
    C: jax.Array
    N: jax.Array
    frame_id: int = dataclasses.field(metadata=dict(static=True), default=0)
    frame_time: float = dataclasses.field(metadata=dict(static=True), default=0.0)

    @staticmethod
    def create(img: jax.Array, frame_id: int = 0, frame_time: float = 0.0,
               T_WC: Optional[jax.Array] = None) -> "Frame":
        c, h, w = img.shape
        n = h * w
        if T_WC is None:
            T_WC = lie.sim3_identity()
        # immutable zero-state buffers cached per shape: eagerly building
        # them costs 3 host round-trips (~9 ms each) PER TRACKED FRAME, and
        # jax arrays are immutable so sharing across frames is safe
        key = (n, str(img.dtype))
        zeros = _FRAME_ZEROS.get(key)
        if zeros is None:
            zeros = (jnp.zeros((n, 3), img.dtype), jnp.zeros((n, 1), img.dtype),
                     jnp.zeros((), jnp.int32))
            _FRAME_ZEROS[key] = zeros
        return Frame(
            img=img,
            T_WC=T_WC,
            X_canon=zeros[0],
            C=zeros[1],
            N=zeros[2],
            frame_id=frame_id,
            frame_time=frame_time,
        )

    def update_pointmap(self, X: jax.Array, C: jax.Array) -> "Frame":
        """Confidence-weighted fusion (ImageFrame.update_pointmap) — one
        jitted dispatch (run eagerly this is ~6 host round-trips of ~9 ms
        each on the tunneled backend)."""
        X_new, C_new, N_new = _fuse_pointmap_jit(
            self.X_canon, self.C, self.N, X, C
        )
        return dataclasses.replace(self, X_canon=X_new, C=C_new, N=N_new)

    def get_average_conf(self) -> jax.Array:
        return _avg_conf_jit(self.C, self.N)

    @property
    def hw(self):
        return self.img.shape[-2], self.img.shape[-1]
