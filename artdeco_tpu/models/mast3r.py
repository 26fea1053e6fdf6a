"""MASt3R two-view pointmap regression network in JAX/flax.

Architecture parity with the reference's vendored model
(``VSLAM/thirdparty/mast3r/mast3r/model.py:40-68`` AsymmetricMASt3R over
``dust3r/dust3r/model.py:46-211`` AsymmetricCroCo3DStereo, blocks from
``croco/models/blocks.py``, heads ``mast3r/catmlp_dpt_head.py`` +
``croco/models/dpt_block.py``):

* siamese ViT-L encoder: 16x16 patch conv -> 1024-d, 24 blocks, 16 heads,
  RoPE2D(freq=100) position encoding, pre-LN
* dual cross-attention decoders (one per view): linear 1024->768, 12 blocks
  of self-attn + cross-attn (12 heads) with RoPE, y-branch LN (norm_mem)
* DPT head over hooks [enc, dec6, dec9, dec12] -> per-pixel pts3d (exp
  distance mode) + conf (1+exp)
* local-feature MLP head over cat(enc, dec12) -> 24-d descriptors
  (L2-normalized) + desc_conf via 16x pixel shuffle

TPU notes: attention runs in bf16 on the MXU with f32 accumulation; heads
run in f32 (the reference also disables autocast for heads).  Everything is
shape-static per (H, W); jit once per resolution.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MASt3RConfig:
    patch_size: int = 16
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    mlp_ratio: float = 4.0
    rope_freq: float = 100.0
    local_feat_dim: int = 24
    dpt_feature_dim: int = 256
    dpt_layer_dims: Sequence[int] = (96, 192, 384, 768)
    conf_vmin: float = 1.0
    desc_conf_vmin: float = 0.0
    compute_dtype: Any = jnp.bfloat16


def tiny_config(**kw) -> MASt3RConfig:
    """Small config for tests."""
    return MASt3RConfig(
        enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
        dec_embed_dim=48, dec_depth=4, dec_num_heads=4,
        dpt_feature_dim=32, dpt_layer_dims=(16, 24, 32, 48),
        local_feat_dim=8, **kw,
    )


# ---------------------------------------------------------------------------
# RoPE2D
# ---------------------------------------------------------------------------

def rope2d(tokens: jax.Array, positions: jax.Array, freq: float,
           layout: str = "bhnd") -> jax.Array:
    """2D rotary embedding (croco/models/pos_embed.py RoPE2D).

    tokens: (B, heads, N, D) for layout "bhnd" or (B, N, heads, D) for
    "bnhd"; positions: (B, N, 2) int (y, x).  The feature dim splits in
    half: first half rotated by y, second by x.
    """
    d = tokens.shape[-1]
    d_half = d // 2
    d_quarter = d_half // 2
    inv_freq = 1.0 / (freq ** (jnp.arange(0, d_half, 2, dtype=jnp.float32) / d_half))

    def rope1d(tok, pos1d):
        # tok (..., N-at-layout-axis, ..., d_half); pos1d (B, N)
        if layout == "bhnd":
            angles = pos1d[:, None, :, None].astype(jnp.float32) * inv_freq
        else:  # "bnhd"
            angles = pos1d[:, :, None, None].astype(jnp.float32) * inv_freq
        ang = jnp.concatenate([angles, angles], axis=-1)  # (..., d_half)
        cos = jnp.cos(ang).astype(tok.dtype)
        sin = jnp.sin(ang).astype(tok.dtype)
        t1, t2 = tok[..., :d_quarter], tok[..., d_quarter:]
        rot = jnp.concatenate([-t2, t1], axis=-1)
        return tok * cos + rot * sin

    y_tok, x_tok = tokens[..., :d_half], tokens[..., d_half:]
    y_tok = rope1d(y_tok, positions[..., 0])
    x_tok = rope1d(x_tok, positions[..., 1])
    return jnp.concatenate([y_tok, x_tok], axis=-1)


# ---------------------------------------------------------------------------
# Transformer blocks
# ---------------------------------------------------------------------------

class Attention(nn.Module):
    dim: int
    num_heads: int
    rope_freq: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, xpos):
        b, n, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=True, name="qkv", dtype=self.dtype)(x)
        # BNHD throughout: jax.nn.dot_product_attention's native layout, so
        # no head transposes (layout thrash) and XLA lowers the whole
        # softmax(QK^T)V as one fused attention (f32 logits internally)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = rope2d(q, xpos, self.rope_freq, layout="bnhd")
        k = rope2d(k, xpos, self.rope_freq, layout="bnhd")
        out = jax.nn.dot_product_attention(q, k, v).reshape(b, n, c)
        return nn.Dense(c, name="proj", dtype=self.dtype)(out)


class CrossAttention(nn.Module):
    dim: int
    num_heads: int
    rope_freq: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, query, key, value, qpos, kpos):
        b, nq, c = query.shape
        hd = c // self.num_heads

        def proj(x, name):
            return (
                nn.Dense(c, use_bias=True, name=name, dtype=self.dtype)(x)
                .reshape(b, -1, self.num_heads, hd)
            )

        q = rope2d(proj(query, "projq"), qpos, self.rope_freq, layout="bnhd")
        k = rope2d(proj(key, "projk"), kpos, self.rope_freq, layout="bnhd")
        v = proj(value, "projv")
        out = jax.nn.dot_product_attention(q, k, v).reshape(b, nq, c)
        return nn.Dense(c, name="proj", dtype=self.dtype)(out)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1", dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2", dtype=self.dtype)(x)


class EncoderBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    rope_freq: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, xpos):
        x = x + Attention(
            self.dim, self.num_heads, self.rope_freq, self.dtype, name="attn"
        )(nn.LayerNorm(name="norm1", dtype=jnp.float32)(x).astype(self.dtype), xpos)
        x = x + Mlp(
            int(self.dim * self.mlp_ratio), self.dim, self.dtype, name="mlp"
        )(nn.LayerNorm(name="norm2", dtype=jnp.float32)(x).astype(self.dtype))
        return x


class DecoderBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    rope_freq: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, y, xpos, ypos):
        x = x + Attention(
            self.dim, self.num_heads, self.rope_freq, self.dtype, name="attn"
        )(nn.LayerNorm(name="norm1", dtype=jnp.float32)(x).astype(self.dtype), xpos)
        y_ = nn.LayerNorm(name="norm_y", dtype=jnp.float32)(y).astype(self.dtype)
        x = x + CrossAttention(
            self.dim, self.num_heads, self.rope_freq, self.dtype,
            name="cross_attn",
        )(nn.LayerNorm(name="norm2", dtype=jnp.float32)(x).astype(self.dtype),
          y_, y_, xpos, ypos)
        x = x + Mlp(
            int(self.dim * self.mlp_ratio), self.dim, self.dtype, name="mlp"
        )(nn.LayerNorm(name="norm3", dtype=jnp.float32)(x).astype(self.dtype))
        return x


# ---------------------------------------------------------------------------
# Encoder / decoder stacks
# ---------------------------------------------------------------------------

class Encoder(nn.Module):
    cfg: MASt3RConfig

    @nn.compact
    def __call__(self, img):
        """img (B, 3, H, W) normalized -> (tokens (B,N,C), pos (B,N,2))."""
        c = self.cfg
        b, _, h, w = img.shape
        x = jnp.transpose(img, (0, 2, 3, 1))
        x = nn.Conv(
            c.enc_embed_dim, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
            name="patch_embed_proj", dtype=c.compute_dtype,
        )(x.astype(c.compute_dtype))
        nh, nw = h // c.patch_size, w // c.patch_size
        x = x.reshape(b, nh * nw, c.enc_embed_dim)
        ys = jax.lax.broadcasted_iota(jnp.int32, (nh, nw), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (nh, nw), 1)
        pos = jnp.stack([ys, xs], axis=-1).reshape(1, nh * nw, 2)
        pos = jnp.broadcast_to(pos, (b, nh * nw, 2))
        for i in range(c.enc_depth):
            x = EncoderBlock(
                c.enc_embed_dim, c.enc_num_heads, c.mlp_ratio, c.rope_freq,
                c.compute_dtype, name=f"enc_block_{i}",
            )(x, pos)
        x = nn.LayerNorm(name="enc_norm", dtype=jnp.float32)(x)
        return x.astype(jnp.float32), pos


class Decoder(nn.Module):
    """Dual cross decoder; returns hook outputs for both views."""

    cfg: MASt3RConfig

    @nn.compact
    def __call__(self, f1, pos1, f2, pos2):
        c = self.cfg
        hooks = {0}
        l2 = c.dec_depth
        hook_ids = [l2 * 2 // 4, l2 * 3 // 4, l2]  # decoder layers to expose

        out1 = [f1]
        out2 = [f2]
        embed = nn.Dense(c.dec_embed_dim, name="decoder_embed",
                         dtype=c.compute_dtype)
        cur1 = embed(f1.astype(c.compute_dtype))
        cur2 = embed(f2.astype(c.compute_dtype))
        for i in range(c.dec_depth):
            new1 = DecoderBlock(
                c.dec_embed_dim, c.dec_num_heads, c.mlp_ratio, c.rope_freq,
                c.compute_dtype, name=f"dec_block_{i}",
            )(cur1, cur2, pos1, pos2)
            new2 = DecoderBlock(
                c.dec_embed_dim, c.dec_num_heads, c.mlp_ratio, c.rope_freq,
                c.compute_dtype, name=f"dec_block2_{i}",
            )(cur2, cur1, pos2, pos1)
            cur1, cur2 = new1, new2
            if (i + 1) in hook_ids[:-1]:
                out1.append(cur1.astype(jnp.float32))
                out2.append(cur2.astype(jnp.float32))
        dn = nn.LayerNorm(name="dec_norm", dtype=jnp.float32)
        out1.append(dn(cur1))
        out2.append(dn(cur2))
        return out1, out2  # [enc, dec_mid1, dec_mid2, dec_final]


# ---------------------------------------------------------------------------
# DPT head
# ---------------------------------------------------------------------------

class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(out)
        return out + x


def _upsample2(x):
    """Bilinear x2 with align_corners=True (torch F.interpolate parity).

    jax.image.resize implements half-pixel centers (align_corners=False);
    the DPT fusion blocks and regression head use align_corners=True
    (``dpt_block.py:215,319``), so the grid is built explicitly: output
    position i samples input coordinate i*(n-1)/(2n-1)."""

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
        t = t.reshape(shape)
        return a * (1 - t) + b2 * t

    return interp_axis(interp_axis(x, 1), 2)


class FeatureFusion(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        x = _upsample2(x)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTHead(nn.Module):
    """DPT over 4 hooked token maps -> (B, H/2*2, W, num_channels)."""

    cfg: MASt3RConfig
    num_channels: int = 4  # pts3d + conf

    @nn.compact
    def __call__(self, hooks, nh, nw):
        c = self.cfg
        f = c.dpt_feature_dim
        ld = c.dpt_layer_dims

        def tok2map(t):
            b, n, d = t.shape
            return t.reshape(b, nh, nw, d)

        l1 = tok2map(hooks[0])
        l2 = tok2map(hooks[1])
        l3 = tok2map(hooks[2])
        l4 = tok2map(hooks[3])

        # act_postprocess (dpt_block.py:356-403)
        l1 = nn.Conv(ld[0], (1, 1), name="act1_conv")(l1)
        l1 = nn.ConvTranspose(ld[0], (4, 4), strides=(4, 4), name="act1_deconv")(l1)
        l2 = nn.Conv(ld[1], (1, 1), name="act2_conv")(l2)
        l2 = nn.ConvTranspose(ld[1], (2, 2), strides=(2, 2), name="act2_deconv")(l2)
        l3 = nn.Conv(ld[2], (1, 1), name="act3_conv")(l3)
        l4 = nn.Conv(ld[3], (1, 1), name="act4_conv")(l4)
        l4 = nn.Conv(ld[3], (3, 3), strides=(2, 2), padding=1, name="act4_conv2")(l4)

        # layer_rn 3x3 no-bias
        r1 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer1_rn")(l1)
        r2 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer2_rn")(l2)
        r3 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer3_rn")(l3)
        r4 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer4_rn")(l4)

        p4 = FeatureFusion(f, name="refinenet4")(r4)[:, : r3.shape[1], : r3.shape[2]]
        p3 = FeatureFusion(f, name="refinenet3")(p4, r3)
        p2 = FeatureFusion(f, name="refinenet2")(p3, r2)
        p1 = FeatureFusion(f, name="refinenet1")(p2, r1)

        # regression head (dpt_block.py:318-324); last_dim == feature_dim//2
        x = nn.Conv(f // 2, (3, 3), padding=1, name="head_conv1")(p1)
        x = _upsample2(x)
        x = nn.Conv(f // 2, (3, 3), padding=1, name="head_conv2")(x)
        x = nn.relu(x)
        return nn.Conv(self.num_channels, (1, 1), name="head_conv3")(x)


class LocalFeatHead(nn.Module):
    """MLP over cat(enc, dec) tokens -> pixel-shuffled descriptors."""

    cfg: MASt3RConfig

    @nn.compact
    def __call__(self, enc_tok, dec_tok, nh, nw):
        c = self.cfg
        idim = c.enc_embed_dim + c.dec_embed_dim
        odim = (c.local_feat_dim + 1) * c.patch_size ** 2
        x = jnp.concatenate([enc_tok, dec_tok], axis=-1)
        x = Mlp(int(4 * idim), odim, jnp.float32, name="head_local_features")(x)
        b, n, _ = x.shape
        p = c.patch_size
        # pixel shuffle: (B, nh, nw, C*p*p) -> (B, nh*p, nw*p, C)
        x = x.reshape(b, nh, nw, c.local_feat_dim + 1, p, p)
        x = x.transpose(0, 1, 4, 2, 5, 3)
        return x.reshape(b, nh * p, nw * p, c.local_feat_dim + 1)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

class MASt3R(nn.Module):
    cfg: MASt3RConfig = MASt3RConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        self.head1_dpt = DPTHead(self.cfg, name="head1_dpt")
        self.head2_dpt = DPTHead(self.cfg, name="head2_dpt")
        self.head1_local = LocalFeatHead(self.cfg, name="head1_local")
        self.head2_local = LocalFeatHead(self.cfg, name="head2_local")

    def encode(self, img):
        return self.encoder(img)

    def decode(self, f1, pos1, f2, pos2):
        return self.decoder(f1, pos1, f2, pos2)

    def head(self, head_num, hooks, nh, nw):
        dpt = self.head1_dpt if head_num == 1 else self.head2_dpt
        loc = self.head1_local if head_num == 1 else self.head2_local
        fmap = dpt(hooks, nh, nw)                       # (B, H, W, 4)
        lfeat = loc(hooks[0], hooks[-1], nh, nw)        # (B, H, W, D+1)
        return _postprocess(fmap, lfeat, self.cfg)

    def __call__(self, img1, img2):
        """Full symmetric forward (dust3r model.py:196-211).

        Returns (res1, res2): dicts with pts3d (B,H,W,3), conf (B,H,W),
        desc (B,H,W,D), desc_conf (B,H,W); res2 pts3d is in view1's frame.
        """
        f1, pos1 = self.encoder(img1)
        f2, pos2 = self.encoder(img2)
        d1, d2 = self.decoder(f1, pos1, f2, pos2)
        nh = img1.shape[2] // self.cfg.patch_size
        nw = img1.shape[3] // self.cfg.patch_size
        res1 = self.head(1, d1, nh, nw)
        res2 = self.head(2, d2, nh, nw)
        return res1, res2


def _postprocess(fmap, lfeat, cfg: MASt3RConfig):
    """exp-distance pts3d + 1+exp conf + normalized desc
    (mast3r/catmlp_dpt_head.py postprocess + dust3r postprocess.py).

    Note the released checkpoint's conf modes differ between heads:
    conf_mode=('exp', 1, inf) but desc_conf_mode=('exp', 0, inf) — desc_conf
    has NO +1 offset (model.py instantiation string)."""
    xyz = fmap[..., 0:3].astype(jnp.float32)
    d = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1, keepdims=True) + 1e-16)
    pts3d = xyz / jnp.clip(d, 1e-8, None) * jnp.expm1(d)
    conf = cfg.conf_vmin + jnp.exp(fmap[..., 3].astype(jnp.float32))
    desc = lfeat[..., : cfg.local_feat_dim].astype(jnp.float32)
    desc = desc * jax.lax.rsqrt(
        jnp.sum(desc * desc, axis=-1, keepdims=True) + 1e-16
    )
    desc_conf = cfg.desc_conf_vmin + jnp.exp(
        lfeat[..., cfg.local_feat_dim].astype(jnp.float32))
    return dict(pts3d=pts3d, conf=conf, desc=desc, desc_conf=desc_conf)
