"""DepthAnythingV2 monocular relative-depth network (flax).

Reference role: ``Reconstruct/scene/mono_depth.py:29-199`` wraps the
Depth-Anything-V2 torch repo (downloaded at runtime — not vendored) to get
inverse depth + confidence for the legacy mapper path.  This is a TPU-native
implementation of that public architecture: a DINOv2 ViT encoder (no
register tokens) with four hooked intermediate layers feeding a
MiDaS/DPT-style fusion head.  ``convert_dav2_state_dict`` maps the released
``depth_anything_v2_{vits,vitb,vitl}.pth`` checkpoints onto it.

The encoder transformer blocks are shared with the Pi3 port
(``models/pi3.py`` BlockRope with RoPE disabled == a plain DINOv2 block).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from artdeco_tpu.models.pi3 import BlockRope


@dataclasses.dataclass(frozen=True)
class DAV2Config:
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    layerscale: float = 1.0
    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)
    layer_ids: Sequence[int] = (4, 11, 17, 23)
    compute_dtype: Any = jnp.float32


def dav2_config(encoder: str = "vitl", **kw) -> DAV2Config:
    """Per-size configs (mono_depth.py:44-66 model_configs)."""
    if encoder == "vits":
        return DAV2Config(embed_dim=384, depth=12, num_heads=6, features=64,
                          out_channels=(48, 96, 192, 384),
                          layer_ids=(2, 5, 8, 11), **kw)
    if encoder == "vitb":
        return DAV2Config(embed_dim=768, depth=12, num_heads=12, features=128,
                          out_channels=(96, 192, 384, 768),
                          layer_ids=(2, 5, 8, 11), **kw)
    if encoder == "vitl":
        return DAV2Config(**kw)
    raise ValueError(encoder)


def tiny_dav2_config(**kw) -> DAV2Config:
    return DAV2Config(embed_dim=64, depth=4, num_heads=4, features=32,
                      out_channels=(16, 24, 32, 48), layer_ids=(0, 1, 2, 3),
                      **kw)


class _Encoder(nn.Module):
    """DINOv2 ViT without registers, returning hooked patch-token maps."""

    cfg: DAV2Config

    @nn.compact
    def __call__(self, img):
        c = self.cfg
        b, _, h, w = img.shape
        p = c.patch_size
        nh, nw = h // p, w // p
        x = jnp.transpose(img, (0, 2, 3, 1)).astype(c.compute_dtype)
        x = nn.Conv(c.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embed", dtype=c.compute_dtype)(x)
        x = x.reshape(b, nh * nw, c.embed_dim)

        cls_tok = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, c.embed_dim))
        base = 37  # 518 / 14 pretraining grid
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, base * base, c.embed_dim))
        pos_resized = jax.image.resize(
            pos.reshape(1, base, base, c.embed_dim),
            (1, nh, nw, c.embed_dim), "cubic",
        ).reshape(1, nh * nw, c.embed_dim)
        x = x + pos_resized.astype(x.dtype)
        toks = jnp.concatenate(
            [jnp.broadcast_to(cls_tok, (b, 1, c.embed_dim)).astype(x.dtype), x],
            axis=1,
        )
        raw_hooks = []
        want = set(c.layer_ids)
        for i in range(c.depth):
            toks = BlockRope(
                c.embed_dim, c.num_heads, c.mlp_ratio, 100.0,
                layerscale=c.layerscale, use_rope=False,
                dtype=c.compute_dtype, name=f"block_{i}",
            )(toks)
            if i in want:
                raw_hooks.append(toks)
        # DINOv2 get_intermediate_layers defaults to norm=True: every hooked
        # layer passes through the FINAL encoder LayerNorm
        norm = nn.LayerNorm(name="norm", epsilon=1e-6, dtype=jnp.float32)
        hooks = [norm(t)[:, 1:].astype(jnp.float32) for t in raw_hooks]
        return hooks, (nh, nw)


class _ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(out)
        return out + x


def _upsample2_ac(x):
    """Bilinear x2, align_corners=True (see models/mast3r.py)."""

    def interp_axis(arr, axis):
        size = arr.shape[axis]
        pos = jnp.linspace(0.0, size - 1.0, 2 * size)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, size - 1)
        hi = jnp.clip(lo + 1, 0, size - 1)
        t = (pos - lo).astype(arr.dtype)
        a = jnp.take(arr, lo, axis=axis)
        b2 = jnp.take(arr, hi, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = -1
        return a * (1 - t.reshape(shape)) + b2 * t.reshape(shape)

    return interp_axis(interp_axis(x, 1), 2)


def _resize_bilinear_ac(x, oh, ow):
    """Arbitrary-size bilinear, align_corners=True."""

    def interp_axis(arr, axis, out_n):
        size = arr.shape[axis]
        pos = jnp.linspace(0.0, size - 1.0, out_n)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, size - 1)
        hi = jnp.clip(lo + 1, 0, size - 1)
        t = (pos - lo).astype(arr.dtype)
        a = jnp.take(arr, lo, axis=axis)
        b2 = jnp.take(arr, hi, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = -1
        return a * (1 - t.reshape(shape)) + b2 * t.reshape(shape)

    return interp_axis(interp_axis(x, 1, oh), 2, ow)


class _Fusion(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None):
        if skip is not None:
            x = x + _ResidualConvUnit(self.features, name="rcu1")(skip)
        x = _ResidualConvUnit(self.features, name="rcu2")(x)
        if out_hw is not None:
            x = _resize_bilinear_ac(x, out_hw[0], out_hw[1])
        else:
            x = _upsample2_ac(x)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DepthAnythingV2(nn.Module):
    """(B, 3, H, W) ImageNet-normalized -> (B, H, W) relative inverse depth."""

    cfg: DAV2Config = DAV2Config()

    @nn.compact
    def __call__(self, img):
        c = self.cfg
        hooks, (nh, nw) = _Encoder(c, name="encoder")(img)
        oc = c.out_channels
        f = c.features

        def tok2map(t):
            b, n, d = t.shape
            return t.reshape(b, nh, nw, d)

        maps = [tok2map(t) for t in hooks]
        l1 = nn.Conv(oc[0], (1, 1), name="project1")(maps[0])
        l1 = nn.ConvTranspose(oc[0], (4, 4), strides=(4, 4),
                              name="resize1")(l1)
        l2 = nn.Conv(oc[1], (1, 1), name="project2")(maps[1])
        l2 = nn.ConvTranspose(oc[1], (2, 2), strides=(2, 2),
                              name="resize2")(l2)
        l3 = nn.Conv(oc[2], (1, 1), name="project3")(maps[2])
        l4 = nn.Conv(oc[3], (1, 1), name="project4")(maps[3])
        l4 = nn.Conv(oc[3], (3, 3), strides=(2, 2), padding=1,
                     name="resize4")(l4)

        r1 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer1_rn")(l1)
        r2 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer2_rn")(l2)
        r3 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer3_rn")(l3)
        r4 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer4_rn")(l4)

        p4 = _Fusion(f, name="refinenet4")(r4, out_hw=r3.shape[1:3])
        p3 = _Fusion(f, name="refinenet3")(p4, r3, out_hw=r2.shape[1:3])
        p2 = _Fusion(f, name="refinenet2")(p3, r2, out_hw=r1.shape[1:3])
        p1 = _Fusion(f, name="refinenet1")(p2, r1)

        x = nn.Conv(f // 2, (3, 3), padding=1, name="output_conv1")(p1)
        x = _resize_bilinear_ac(x, nh * c.patch_size, nw * c.patch_size)
        x = nn.Conv(32, (3, 3), padding=1, name="output_conv2_0")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), name="output_conv2_2")(x)
        x = nn.relu(x)
        return x[..., 0]


# ---------------------------------------------------------------------------
# Checkpoint conversion (depth_anything_v2_vit{s,b,l}.pth layout)
# ---------------------------------------------------------------------------

def _dense(sd, name):
    return {"kernel": np.asarray(sd[f"{name}.weight"], np.float32).T,
            "bias": np.asarray(sd[f"{name}.bias"], np.float32)}


def _ln(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"], np.float32),
            "bias": np.asarray(sd[f"{name}.bias"], np.float32)}


def _conv(sd, name, bias=True):
    out = {"kernel": np.transpose(
        np.asarray(sd[f"{name}.weight"], np.float32), (2, 3, 1, 0))}
    if bias:
        out["bias"] = np.asarray(sd[f"{name}.bias"], np.float32)
    return out


def _deconv(sd, name):
    # spatial flip: see convert_mast3r._deconv
    w = np.asarray(sd[f"{name}.weight"], np.float32)[:, :, ::-1, ::-1]
    return {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))),
            "bias": np.asarray(sd[f"{name}.bias"], np.float32)}


def convert_dav2_state_dict(sd: dict, cfg: DAV2Config) -> dict:
    """torch DepthAnythingV2 state dict -> flax params."""
    sd = {k: v for k, v in sd.items()}
    pos = np.asarray(sd["pretrained.pos_embed"], np.float32)  # (1, 1+N, C)
    enc = {
        "patch_embed": _conv(sd, "pretrained.patch_embed.proj"),
        "cls_token": np.asarray(sd["pretrained.cls_token"], np.float32)
        + pos[:, :1],
        "pos_embed": pos[:, 1:],
        "norm": _ln(sd, "pretrained.norm"),
    }
    for i in range(cfg.depth):
        b = f"pretrained.blocks.{i}"
        enc[f"block_{i}"] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "attn": {"qkv": _dense(sd, f"{b}.attn.qkv"),
                     "proj": _dense(sd, f"{b}.attn.proj")},
            "ls1": {"gamma": np.asarray(sd[f"{b}.ls1.gamma"], np.float32)},
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp_fc1": _dense(sd, f"{b}.mlp.fc1"),
            "mlp_fc2": _dense(sd, f"{b}.mlp.fc2"),
            "ls2": {"gamma": np.asarray(sd[f"{b}.ls2.gamma"], np.float32)},
        }
    h = "depth_head"
    params = {"encoder": enc}
    for i in range(1, 5):
        params[f"project{i}"] = _conv(sd, f"{h}.projects.{i-1}")
    params["resize1"] = _deconv(sd, f"{h}.resize_layers.0")
    params["resize2"] = _deconv(sd, f"{h}.resize_layers.1")
    params["resize4"] = _conv(sd, f"{h}.resize_layers.3")
    for i in range(1, 5):
        params[f"layer{i}_rn"] = _conv(sd, f"{h}.scratch.layer{i}_rn",
                                       bias=False)
    for i in range(1, 5):
        rf = f"{h}.scratch.refinenet{i}"
        blk = {
            "rcu2": {"conv1": _conv(sd, f"{rf}.resConfUnit2.conv1"),
                     "conv2": _conv(sd, f"{rf}.resConfUnit2.conv2")},
            "out_conv": _conv(sd, f"{rf}.out_conv"),
        }
        if i != 4:  # refinenet4 has no skip input -> rcu1 unused
            blk["rcu1"] = {"conv1": _conv(sd, f"{rf}.resConfUnit1.conv1"),
                           "conv2": _conv(sd, f"{rf}.resConfUnit1.conv2")}
        params[f"refinenet{i}"] = blk
    params["output_conv1"] = _conv(sd, f"{h}.scratch.output_conv1")
    params["output_conv2_0"] = _conv(sd, f"{h}.scratch.output_conv2.0")
    params["output_conv2_2"] = _conv(sd, f"{h}.scratch.output_conv2.2")
    return {"params": params}


IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def make_dav2_model_fn(checkpoint_path: str = "", encoder: str = "vitl",
                       size: int = 518):
    """Returns ``model_fn(img_chw [0,1]) -> idepth (H, W)`` for
    ``mapper.mono_depth.MonoDepthEstimator`` (MonoDepthInternal surface,
    mono_depth.py:68-118: resize to 518 long side, ImageNet normalize,
    forward, resize back)."""
    import jax

    cfg = dav2_config(encoder)
    model = DepthAnythingV2(cfg)
    if checkpoint_path and checkpoint_path.endswith(".npz"):
        # pre-converted artifact from scripts/convert_checkpoints.py
        from artdeco_tpu.utils.params_io import load_pytree_npz

        params = load_pytree_npz(checkpoint_path)
    elif checkpoint_path:
        import torch

        sd = torch.load(checkpoint_path, map_location="cpu",
                        weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
        params = convert_dav2_state_dict(sd, cfg)
    else:
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 3, cfg.patch_size * 4, cfg.patch_size * 4)),
        )
    apply = jax.jit(model.apply)

    def model_fn(img_chw: np.ndarray) -> np.ndarray:
        c, h, w = img_chw.shape
        s = size / max(h, w)
        p = cfg.patch_size
        nh = max(int(round(h * s / p)), 1) * p
        nw = max(int(round(w * s / p)), 1) * p
        x = jnp.asarray(img_chw, jnp.float32).transpose(1, 2, 0)
        x = jax.image.resize(x, (nh, nw, 3), "bilinear")
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        d = apply(params, x.transpose(2, 0, 1)[None])[0]
        d = jax.image.resize(d, (h, w), "bilinear")
        return np.asarray(d, np.float32)

    return model_fn
