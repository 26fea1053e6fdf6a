"""Keypoint detection + dense descriptors (XFeat-role replacement).

Reference: ``Reconstruct/poses/feature_detector.py:19-186`` wraps a jit-traced
XFeat network (keypoints, scores, 64-d descriptors).  XFeat weights are not
shipped in this image, so the default detector is a Shi-Tomasi corner
response with multi-scale patch-intensity descriptors — same interface
(kpts, scores, desc), swappable for a learned model via ``describe_fn``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class DescribedKeypoints:
    """(reference feature_detector.py DescribedKeypoints)"""

    kpts: jax.Array     # (P, 2) pixel coords
    scores: jax.Array   # (P,)
    desc: jax.Array     # (P, D)
    matches: dict = dataclasses.field(default_factory=dict)


def _gauss_blur(img, sigma: float = 1.0, radius: int = 2):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    pad = [(0, 0), (radius, radius)]
    h = jnp.pad(img, pad[::-1][:1] + [(0, 0)])  # pad W later; do both dims:
    h = jnp.pad(img, ((radius, radius), (0, 0)))
    h = sum(g[i] * h[i : i + img.shape[0], :] for i in range(2 * radius + 1))
    h = jnp.pad(h, ((0, 0), (radius, radius)))
    return sum(g[i] * h[:, i : i + img.shape[1]] for i in range(2 * radius + 1))


@partial(jax.jit, static_argnames=("num_kpts", "nms_radius", "patch"))
def detect_keypoints(
    gray: jax.Array,       # (H, W) in [0, 1]
    num_kpts: int = 1024,
    nms_radius: int = 4,
    patch: int = 8,
):
    """Shi-Tomasi corners + NMS + normalized patch descriptors.

    Returns (kpts (P,2) float, scores (P,), desc (P, patch*patch)).
    """
    h, w = gray.shape
    gx = jnp.gradient(gray, axis=1)
    gy = jnp.gradient(gray, axis=0)
    Ixx = _gauss_blur(gx * gx)
    Iyy = _gauss_blur(gy * gy)
    Ixy = _gauss_blur(gx * gy)
    tr = Ixx + Iyy
    det = Ixx * Iyy - Ixy * Ixy
    # min eigenvalue (Shi-Tomasi)
    response = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))

    # NMS via max-pool comparison
    win = 2 * nms_radius + 1
    pooled = jax.lax.reduce_window(
        response, -jnp.inf, jax.lax.max, (win, win), (1, 1), "SAME"
    )
    is_peak = (response >= pooled) & (response > 0)
    # zero the borders (patch extraction safety)
    m = jnp.zeros_like(response).at[patch:-patch, patch:-patch].set(1.0)
    score_map = jnp.where(is_peak, response, 0.0) * m

    flat = score_map.reshape(-1)
    scores, idx = jax.lax.top_k(flat, num_kpts)
    u = (idx % w).astype(jnp.float32)
    v = (idx // w).astype(jnp.float32)
    kpts = jnp.stack([u, v], axis=1)

    # patch descriptors: patch x patch neighborhood, mean-normalized
    offs = jnp.arange(-(patch // 2), patch // 2)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    samp_v = jnp.clip(v[:, None, None].astype(jnp.int32) + oy, 0, h - 1)
    samp_u = jnp.clip(u[:, None, None].astype(jnp.int32) + ox, 0, w - 1)
    patches = gray[samp_v, samp_u].reshape(num_kpts, -1)
    patches = patches - patches.mean(axis=1, keepdims=True)
    desc = patches * jax.lax.rsqrt(
        jnp.sum(patches * patches, axis=1, keepdims=True) + 1e-12
    )
    return kpts, scores, desc


class FeatureDetector:
    """Host wrapper (feature_detector.py surface).

    With ``xfeat_checkpoint`` (or $ARTDECO_XFEAT_NPZ) the learned XFeat
    detector (``models/xfeat.py`` flax port of the reference's traced hub
    model) produces the keypoints/descriptors; otherwise the classical
    Shi-Tomasi fallback runs — same (kpts, scores, desc) interface."""

    def __init__(self, num_kpts: int = 1024, describe_fn=None,
                 xfeat_checkpoint: str = ""):
        import os

        self.num_kpts = num_kpts
        self._xfeat = None
        xfeat_checkpoint = xfeat_checkpoint or os.environ.get(
            "ARTDECO_XFEAT_NPZ", "")
        if describe_fn is None and xfeat_checkpoint:
            from artdeco_tpu.models.xfeat import make_detector

            self._xfeat = make_detector(xfeat_checkpoint, top_k=num_kpts)
        self.describe_fn = describe_fn or (
            lambda g: detect_keypoints(g, num_kpts=self.num_kpts)
        )

    def __call__(self, img_chw) -> DescribedKeypoints:
        img = jnp.asarray(img_chw)
        if self._xfeat is not None:
            kpts, desc, scores = self._xfeat(img)
            return DescribedKeypoints(kpts=kpts, scores=scores, desc=desc)
        gray = img.mean(axis=0)
        if float(gray.min()) < -0.01:  # [-1, 1] -> [0, 1]
            gray = (gray + 1.0) / 2.0
        kpts, scores, desc = self.describe_fn(gray)
        return DescribedKeypoints(kpts=kpts, scores=scores, desc=desc)
