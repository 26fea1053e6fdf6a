"""XFeat keypoint detector + descriptors (flax), TPU-native.

Reference role: ``Reconstruct/poses/feature_detector.py:19-186`` (sparse
``Detector`` — the torch-hub XFeat jit-traced at fixed size) and
``Reconstruct/scene/dense_extractor.py:19-65`` (dense descriptor maps via the
stride-parameterized backbone variant ``extractor_model.py:28-168``).  This
module implements the public "XFeat: Accelerated Features for Lightweight
Image Matching" (CVPR 2024, Apache-2.0) architecture in flax and the exact
fixed-size detect-and-compute pipeline the reference traces:

* backbone: InstanceNorm'd grayscale -> 5 conv blocks + avg-pool skip ->
  pyramid fusion at 1/8 (sparse, ``block3_stride=2``) or 1/``stride`` (dense
  variant, ``block3_stride=1`` — the reference's ``XFeatModel(4)``);
* heads: 64-d dense descriptors, 65-channel keypoint logits over 8x8 cells
  (+dustbin), single-channel reliability heatmap;
* detection: softmax cell heatmap -> 5x5 max-pool NMS -> top-1.5k candidates
  -> reliability-weighted re-scoring -> top-k keypoints with bilinear
  descriptor sampling (``feature_detector.py:109-175`` NMS/detectAndCompute
  overrides, reproduced op-for-op including the grid_sample normalization
  quirks).

TPU notes: everything is static-shape (fixed top_k / nvalid), the NMS is a
reduce_window, and the sparse samplers are two-gather bilinear taps — no
data-dependent shapes anywhere, so the whole detect compiles into one XLA
program.  BatchNorm/InstanceNorm are affine-free running-stat normalizations
(inference only), stored as plain params.

``convert_xfeat_state_dict`` maps the released torch-hub checkpoint
(``verlab/accelerated_features`` XFeat weights, optionally under a ``net.``
prefix) onto the flax tree.  The fine-matcher MLP (128->512x4->64) of the
upstream repo is not converted: the reference never calls it (its matcher is
cosine similarity + MNN, ``poses/matcher.py``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class XFeatConfig:
    stride: int = 4          # block1 total downsample (1, 2 or 4)
    block3_stride: int = 2   # 2 = original/sparse (1/8 feats), 1 = dense
    top_k: int = 4096
    detection_threshold: float = 0.05
    compute_dtype: Any = jnp.float32


def sparse_config(top_k: int = 4096, **kw) -> XFeatConfig:
    """The torch-hub detector (feature_detector.py Detector)."""
    return XFeatConfig(stride=4, block3_stride=2, top_k=top_k, **kw)


def dense_config(**kw) -> XFeatConfig:
    """The dense-descriptor variant (dense_extractor.py, XFeatModel(4))."""
    return XFeatConfig(stride=4, block3_stride=1, **kw)


class BasicLayer(nn.Module):
    """Conv -> affine-free BatchNorm (running stats) -> ReLU
    (extractor_model.py:13-26)."""

    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad)] * 2, use_bias=False, name="conv",
        )(x)
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return nn.relu(x)


def _resize_bilinear(x, oh, ow):
    """torch F.interpolate(mode='bilinear', align_corners=False) — half-pixel
    centers, which is jax.image.resize 'linear'."""
    return jax.image.resize(x, (*x.shape[:-3], oh, ow, x.shape[-1]),
                            method="linear")


class XFeatModel(nn.Module):
    """Backbone + heads (extractor_model.py:28-168).  Input: (B, H, W, 1)
    instance-normalized grayscale.  Returns (feats, keypoint logits,
    heatmap), all NHWC."""

    cfg: XFeatConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        s = cfg.stride
        # skip1: AvgPool(stride) -> 1x1 conv (with bias)
        xskip = nn.avg_pool(x, (s, s), strides=(s, s))
        xskip = nn.Conv(24, (1, 1), name="skip1_conv")(xskip)

        b1_strides = {1: (1, 1, 1, 1), 2: (1, 2, 1, 1), 4: (1, 2, 1, 2)}[s]
        h = x
        for i, (f, st) in enumerate(zip((4, 8, 8, 24), b1_strides)):
            h = BasicLayer(f, stride=st, name=f"block1_{i}")(h)
        x1 = h

        h = x1 + xskip
        for i in range(2):
            h = BasicLayer(24, name=f"block2_{i}")(h)
        x2 = h

        h = BasicLayer(64, stride=cfg.block3_stride, name="block3_0")(x2)
        h = BasicLayer(64, name="block3_1")(h)
        x3 = BasicLayer(64, kernel=1, pad=0, name="block3_2")(h)

        h = BasicLayer(64, stride=2, name="block4_0")(x3)
        h = BasicLayer(64, name="block4_1")(h)
        x4 = BasicLayer(64, name="block4_2")(h)

        h = BasicLayer(128, stride=2, name="block5_0")(x4)
        h = BasicLayer(128, name="block5_1")(h)
        h = BasicLayer(128, name="block5_2")(h)
        x5 = BasicLayer(64, kernel=1, pad=0, name="block5_3")(h)

        oh, ow = x3.shape[-3], x3.shape[-2]
        x4 = _resize_bilinear(x4, oh, ow)
        x5 = _resize_bilinear(x5, oh, ow)
        h = x3 + x4 + x5
        h = BasicLayer(64, name="fusion_0")(h)
        h = BasicLayer(64, name="fusion_1")(h)
        feats = nn.Conv(64, (1, 1), name="fusion_conv")(h)

        h = BasicLayer(64, kernel=1, pad=0, name="heat_0")(feats)
        h = BasicLayer(64, kernel=1, pad=0, name="heat_1")(h)
        heatmap = nn.sigmoid(nn.Conv(1, (1, 1), name="heat_conv")(h))

        # keypoint head runs on the 8x8-unfolded INPUT (64ch at 1/8)
        k = _unfold2d(x, 8)
        for i in range(3):
            k = BasicLayer(64, kernel=1, pad=0, name=f"kpt_{i}")(k)
        keypoints = nn.Conv(65, (1, 1), name="kpt_conv")(k)
        return feats, keypoints, heatmap


def _unfold2d(x, ws: int):
    """(B, H, W, C) -> (B, H/ws, W/ws, C*ws*ws), channel order matching the
    torch ``x.unfold(2,ws,ws).unfold(3,ws,ws)`` + permute(0,1,4,2,3) reshape
    (extractor_model.py:124-131): output channel index = c*ws*ws + wy*ws + wx."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    # (b, h', w', c, wy, wx) -> flatten (c, wy, wx)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // ws, w // ws, c * ws * ws)


def instance_norm_gray(img_bchw):
    """mean over RGB -> InstanceNorm2d(1, affine=False) (forward :144-147)."""
    g = img_bchw.mean(axis=1, keepdims=True)
    mu = g.mean(axis=(2, 3), keepdims=True)
    var = g.var(axis=(2, 3), keepdims=True)
    return (g - mu) * jax.lax.rsqrt(var + 1e-5)


def get_kpts_heatmap(k_logits_nhwc):
    """Softmax over 65 cell classes, drop dustbin, 8x pixel-shuffle
    (upstream XFeat.get_kpts_heatmap)."""
    scores = jax.nn.softmax(k_logits_nhwc, axis=-1)[..., :64]
    b, h, w, _ = scores.shape
    hm = scores.reshape(b, h, w, 8, 8)
    hm = hm.transpose(0, 1, 3, 2, 4).reshape(b, h * 8, w * 8)
    return hm


def _grid_coord(pos, norm_size, x_size):
    """torch grid_sample(align_corners=False) coordinate of ``pos`` that was
    normalized by (norm_size - 1) (InterpolateSparse2d.normgrid):
    g = 2*pos/(norm-1) - 1;  p = ((g+1)*x_size - 1)/2."""
    g = 2.0 * pos / (norm_size - 1.0) - 1.0
    return ((g + 1.0) * x_size - 1.0) / 2.0


def _sample_nearest(img_hw, u, v, hn, wn):
    h, w = img_hw.shape
    pu = jnp.round(_grid_coord(u, wn, w)).astype(jnp.int32)
    pv = jnp.round(_grid_coord(v, hn, h)).astype(jnp.int32)
    inside = (pu >= 0) & (pu < w) & (pv >= 0) & (pv < h)
    val = img_hw[jnp.clip(pv, 0, h - 1), jnp.clip(pu, 0, w - 1)]
    return jnp.where(inside, val, 0.0)  # zeros padding_mode


def _sample_bilinear(img_hwc, u, v, hn, wn):
    h, w = img_hwc.shape[:2]
    pu = _grid_coord(u, wn, w)
    pv = _grid_coord(v, hn, h)
    u0 = jnp.floor(pu)
    v0 = jnp.floor(pv)
    du = (pu - u0)[:, None]
    dv = (pv - v0)[:, None]
    iu, iv = u0.astype(jnp.int32), v0.astype(jnp.int32)

    def tap(iv_, iu_):
        inside = (iu_ >= 0) & (iu_ < w) & (iv_ >= 0) & (iv_ < h)
        val = img_hwc[jnp.clip(iv_, 0, h - 1), jnp.clip(iu_, 0, w - 1)]
        return jnp.where(inside[:, None], val, 0.0)

    return ((1 - du) * (1 - dv) * tap(iv, iu)
            + du * (1 - dv) * tap(iv, iu + 1)
            + (1 - du) * dv * tap(iv + 1, iu)
            + du * dv * tap(iv + 1, iu + 1))


@partial(jax.jit, static_argnames=("cfg", "model"))
def detect_and_compute(params, img_bchw, *, cfg: XFeatConfig,
                       model: XFeatModel):
    """Fixed-size detectAndCompute (feature_detector.py:133-180).

    img_bchw: (1, 3, H, W) float in [0, 1].  Returns
    (kpts (top_k, 2) float at input resolution, feats (top_k, 64),
    scores (top_k,)) — zero-score keypoints carry zeroed descriptors, the
    reference's validity convention (DescribedKeypoints.valid)."""
    top_k = cfg.top_k
    H, W = img_bchw.shape[-2:]
    H32, W32 = (H // 32) * 32, (W // 32) * 32
    rh, rw = H / H32, W / W32
    x = instance_norm_gray(img_bchw)
    x = jax.image.resize(x, (*x.shape[:2], H32, W32), method="linear")
    x_nhwc = x.transpose(0, 2, 3, 1)

    M1, K1, H1 = model.apply({"params": params}, x_nhwc)
    M1 = M1[0] * jax.lax.rsqrt(
        jnp.sum(M1[0] ** 2, axis=-1, keepdims=True) + 1e-12)
    K1h = get_kpts_heatmap(K1)[0]   # (H32, W32)
    H1 = H1[0]                      # (H32/8, W32/8, 1)

    # NMS: 5x5 max-pool peaks above threshold, top 1.5k candidates
    nvalid = int(1.5 * top_k)
    pooled = jax.lax.reduce_window(
        K1h, -jnp.inf, jax.lax.max, (5, 5), (1, 1), "SAME")
    xTot = K1h * (K1h == pooled) * (K1h > cfg.detection_threshold)
    xOut, pos1d = jax.lax.top_k(xTot.reshape(-1), nvalid)
    mk_u = (pos1d % W32).astype(jnp.float32)
    mk_v = (pos1d // W32).astype(jnp.float32)

    # reliability scores: nearest(K1h) * bilinear(H1); all-zero kpts -> -1
    sc = (_sample_nearest(K1h, mk_u, mk_v, H32, W32)
          * _sample_bilinear(H1, mk_u, mk_v, H32, W32)[:, 0])
    sc = jnp.where((mk_u == 0) & (mk_v == 0), -1.0, sc)

    sc_top, idxs = jax.lax.top_k(sc, top_k)
    u = mk_u[idxs]
    v = mk_v[idxs]
    x_gate = xOut[idxs] > 0
    scores = sc_top * x_gate

    feats = _sample_bilinear(M1, u, v, H32, W32)
    feats = feats * jax.lax.rsqrt(
        jnp.sum(feats * feats, axis=-1, keepdims=True) + 1e-12)
    feats = feats * (scores[:, None] > 0)
    kpts = jnp.stack([u * rw, v * rh], axis=-1)
    return kpts, feats, scores


def dense_features(params, img_bchw, *, model: XFeatModel):
    """Dense descriptor map (dense_extractor.py role): returns the
    L2-normalized fused feature map, NHWC at 1/stride resolution.  The
    dense preprocess resizes with align_corners=True
    (dense_extractor.py:37-42)."""
    H, W = img_bchw.shape[-2:]
    H32, W32 = (H // 32) * 32, (W // 32) * 32
    x = instance_norm_gray(img_bchw)
    if (H32, W32) != (H, W):
        # align_corners=True: endpoints map to endpoints (linear gather)
        def ac_axis(a, axis, out_n):
            n = a.shape[axis]
            pos = jnp.linspace(0.0, n - 1.0, out_n)
            i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
            t = pos - i0
            lo = jnp.take(a, i0, axis=axis)
            hi = jnp.take(a, i0 + 1, axis=axis)
            shape = [1] * a.ndim
            shape[axis] = out_n
            t = t.reshape(shape)
            return lo * (1 - t) + hi * t

        x = ac_axis(ac_axis(x, 2, H32), 3, W32)
    feats, _, _ = model.apply({"params": params}, x.transpose(0, 2, 3, 1))
    return feats * jax.lax.rsqrt(
        jnp.sum(feats * feats, axis=-1, keepdims=True) + 1e-12)


# ---------------------------------------------------------------------------
# Checkpoint conversion (torch-hub verlab/accelerated_features weights)
# ---------------------------------------------------------------------------

def _np(t):
    return np.asarray(getattr(t, "detach", lambda: t)().cpu().numpy()
                      if hasattr(t, "cpu") else t)


def _conv(sd, key, bias=True):
    out = {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _basic(sd, key):
    return {
        "conv": _conv(sd, f"{key}.layer.0", bias=False),
        "bn_mean": _np(sd[f"{key}.layer.1.running_mean"]),
        "bn_var": _np(sd[f"{key}.layer.1.running_var"]),
    }


def convert_xfeat_state_dict(sd: dict, cfg: XFeatConfig | None = None) -> dict:
    """Torch-hub XFeat state dict -> flax params for :class:`XFeatModel`.

    Accepts the raw hub module dict (keys ``net.block1.0...``) or the bare
    XFeatModel dict (``block1.0...``)."""
    if any(k.startswith("net.") for k in sd):
        sd = {k[4:]: v for k, v in sd.items() if k.startswith("net.")}
    p: dict = {"skip1_conv": _conv(sd, "skip1.1")}
    for i in range(4):
        p[f"block1_{i}"] = _basic(sd, f"block1.{i}")
    for i in range(2):
        p[f"block2_{i}"] = _basic(sd, f"block2.{i}")
    for i in range(3):
        p[f"block3_{i}"] = _basic(sd, f"block3.{i}")
        p[f"block4_{i}"] = _basic(sd, f"block4.{i}")
        p[f"kpt_{i}"] = _basic(sd, f"keypoint_head.{i}")
    for i in range(4):
        p[f"block5_{i}"] = _basic(sd, f"block5.{i}")
    p["fusion_0"] = _basic(sd, "block_fusion.0")
    p["fusion_1"] = _basic(sd, "block_fusion.1")
    p["fusion_conv"] = _conv(sd, "block_fusion.2")
    p["heat_0"] = _basic(sd, "heatmap_head.0")
    p["heat_1"] = _basic(sd, "heatmap_head.1")
    p["heat_conv"] = _conv(sd, "heatmap_head.2")
    p["kpt_conv"] = _conv(sd, "keypoint_head.3")
    return p


def make_detector(checkpoint_path: str = "", top_k: int = 1024,
                  width: int = 0, height: int = 0):
    """Detector factory (feature_detector.py Detector surface).

    Returns ``fn(img_chw) -> (kpts, feats, scores)``; with no checkpoint the
    net runs with random init (mechanically correct detection pipeline —
    parity requires the converted hub weights via
    scripts/convert_checkpoints.py)."""
    cfg = sparse_config(top_k=top_k)
    model = XFeatModel(cfg)
    rng = jax.random.PRNGKey(0)
    hw = (height or 96, width or 128)
    init = model.init(rng, jnp.zeros((1, hw[0] // 32 * 32,
                                      hw[1] // 32 * 32, 1)))["params"]
    if checkpoint_path:
        if checkpoint_path.endswith(".npz"):
            from artdeco_tpu.utils.params_io import load_pytree_npz

            params = load_pytree_npz(checkpoint_path)
        else:
            import torch

            sd = torch.load(checkpoint_path, map_location="cpu",
                            weights_only=True)
            params = convert_xfeat_state_dict(sd, cfg)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        params = init

    def fn(img_chw):
        img = jnp.asarray(img_chw)[None]
        if float(img.min()) < -0.01:   # [-1, 1] -> [0, 1]
            img = (img + 1.0) / 2.0
        return detect_and_compute(params, img, cfg=cfg, model=model)

    return fn
