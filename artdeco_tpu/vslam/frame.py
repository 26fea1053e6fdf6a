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
        return Frame(
            img=img,
            T_WC=T_WC,
            X_canon=jnp.zeros((n, 3), img.dtype),
            C=jnp.zeros((n, 1), img.dtype),
            N=jnp.zeros((), jnp.int32),
            frame_id=frame_id,
            frame_time=frame_time,
        )

    def update_pointmap(self, X: jax.Array, C: jax.Array) -> "Frame":
        """Confidence-weighted fusion (ImageFrame.update_pointmap)."""
        first = self.N == 0
        denom = jnp.where(first, 1.0, self.C + C)
        X_new = jnp.where(
            first, X, (self.C * self.X_canon + C * X) / jnp.maximum(denom, 1e-12)
        )
        C_new = jnp.where(first, C, self.C + C)
        return dataclasses.replace(
            self, X_canon=X_new, C=C_new, N=self.N + 1
        )

    def get_average_conf(self) -> jax.Array:
        return self.C / jnp.maximum(self.N, 1).astype(self.C.dtype)

    @property
    def hw(self):
        return self.img.shape[-2], self.img.shape[-1]
