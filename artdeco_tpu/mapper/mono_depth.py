"""Monocular inverse depth + gradient confidence (legacy interface).

Reference: ``Reconstruct/scene/mono_depth.py:29-199`` wraps DepthAnythingV2
for inverse depth with a gradient-based confidence map; ``dense_extractor.py``
wraps XFeat dense descriptors.  Those checkpoints are not shipped here, so
the default provider derives inverse depth from the SLAM pointmap (which the
main pipeline already does — keyframe.py builds idepth pyramids from
point_map) and exposes the same (idepth, confidence) surface for plugging a
learned model.  A full flax DepthAnythingV2 implementation + checkpoint
converter lives in ``models/depth_anything.py``
(``make_dav2_model_fn(checkpoint_path)`` plugs straight in here).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def idepth_from_pointmap(point_map: np.ndarray) -> np.ndarray:
    """(H, W, 3) SLAM pointmap -> (H, W) inverse depth."""
    z = point_map[..., 2]
    return np.where(z != 0, 1.0 / (z + 1e-4), 1e4).astype(np.float32)


def gradient_confidence(idepth: np.ndarray, scale: float = 10.0) -> np.ndarray:
    """Down-weight depth discontinuities (mono_depth.py confidence map)."""
    gy, gx = np.gradient(idepth)
    g = np.sqrt(gx * gx + gy * gy)
    return np.exp(-scale * g).astype(np.float32)


class MonoDepthEstimator:
    """Pluggable provider; pass ``model_fn(img_chw) -> idepth (H, W)`` to use
    a learned monocular network (DepthAnythingV2-role)."""

    def __init__(self, model_fn: Optional[Callable] = None):
        self.model_fn = model_fn

    def __call__(self, img_chw: np.ndarray,
                 point_map: Optional[np.ndarray] = None):
        if self.model_fn is not None:
            idepth = np.asarray(self.model_fn(img_chw), np.float32)
        elif point_map is not None:
            idepth = idepth_from_pointmap(point_map)
        else:
            raise ValueError("no mono-depth model and no pointmap provided")
        return idepth, gradient_confidence(idepth)


class DenseExtractor:
    """Dense per-pixel descriptors (dense_extractor.py surface).

    Default: multi-scale intensity+gradient channels; swap ``model_fn`` for
    a learned dense network (XFeat-role)."""

    def __init__(self, model_fn: Optional[Callable] = None, dim: int = 8):
        self.model_fn = model_fn
        self.dim = dim

    def __call__(self, img_chw: np.ndarray) -> np.ndarray:
        if self.model_fn is not None:
            return np.asarray(self.model_fn(img_chw), np.float32)
        gray = img_chw.mean(axis=0)
        gy, gx = np.gradient(gray)
        feats = [gray, gx, gy, np.abs(gx) + np.abs(gy)]
        g2 = gray
        while len(feats) < self.dim:
            g2 = 0.25 * (
                np.roll(g2, 1, 0) + np.roll(g2, -1, 0)
                + np.roll(g2, 1, 1) + np.roll(g2, -1, 1)
            )
            feats.append(g2)
        d = np.stack(feats[: self.dim], axis=-1)
        n = np.linalg.norm(d, axis=-1, keepdims=True)
        return (d / np.maximum(n, 1e-12)).astype(np.float32)
