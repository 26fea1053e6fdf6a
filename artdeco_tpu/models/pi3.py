"""Pi3 multi-view pointmap network in JAX/flax.

Reference: ``VSLAM/thirdparty/Pi3/pi3/models/pi3.py:16-216`` + layer modules:
DINOv2 ViT-L/14 encoder (cls + 4 register tokens, LayerScale), a 36-block
RoPE decoder alternating frame-local and global attention (5 decoder
register tokens, qk-norm, LayerScale 0.01), and three transformer heads:
local points (xy*z, exp z), confidence, and per-frame 4x4 camera pose via
SVD-orthogonalized 9D rotation; world points by unprojection.

Used by the accurate-loop-closure path (``retrieval_database.py:263-300``):
joint inference over <=24 keyframes resized to 392x518.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from artdeco_tpu.models.mast3r import rope2d


@dataclasses.dataclass(frozen=True)
class Pi3Config:
    patch_size: int = 14
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    enc_registers: int = 4
    dec_embed_dim: int = 1024
    dec_depth: int = 36
    dec_num_heads: int = 16
    dec_registers: int = 5
    head_dim: int = 1024
    head_depth: int = 5
    head_num_heads: int = 16
    camera_dim: int = 512
    mlp_ratio: float = 4.0
    rope_freq: float = 100.0
    layerscale_enc: float = 1.0
    layerscale_dec: float = 0.01
    compute_dtype: Any = jnp.bfloat16


def tiny_pi3_config(**kw) -> Pi3Config:
    return Pi3Config(
        enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
        dec_embed_dim=64, dec_depth=4, dec_num_heads=4,
        head_dim=64, head_depth=2, head_num_heads=4, camera_dim=32, **kw,
    )


class LayerScale(nn.Module):
    dim: int
    init: float

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", lambda k, s: jnp.full(s, self.init), (self.dim,)
        )
        return x * gamma


class RopeAttention(nn.Module):
    dim: int
    num_heads: int
    rope_freq: float
    qk_norm: bool = False
    use_rope: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, xpos):
        b, n, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, name="qkv", dtype=self.dtype)(x)
        # BNHD: dot_product_attention's native layout (fused attention, no
        # head transposes) — see mast3r.Attention
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.qk_norm:
            q = nn.LayerNorm(name="q_norm", dtype=jnp.float32)(q).astype(self.dtype)
            k = nn.LayerNorm(name="k_norm", dtype=jnp.float32)(k).astype(self.dtype)
        if self.use_rope and xpos is not None:
            q = rope2d(q, xpos, self.rope_freq, layout="bnhd")
            k = rope2d(k, xpos, self.rope_freq, layout="bnhd")
        out = jax.nn.dot_product_attention(q, k, v).reshape(b, n, c)
        return nn.Dense(c, name="proj", dtype=self.dtype)(out)


class BlockRope(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    rope_freq: float
    layerscale: Optional[float] = None
    qk_norm: bool = False
    use_rope: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, xpos=None):
        h = nn.LayerNorm(name="norm1", epsilon=1e-6, dtype=jnp.float32)(x)
        h = RopeAttention(
            self.dim, self.num_heads, self.rope_freq, self.qk_norm,
            self.use_rope, self.dtype, name="attn",
        )(h.astype(self.dtype), xpos)
        if self.layerscale is not None:
            h = LayerScale(self.dim, self.layerscale, name="ls1")(h)
        x = x + h
        h = nn.LayerNorm(name="norm2", epsilon=1e-6, dtype=jnp.float32)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1",
                     dtype=self.dtype)(h.astype(self.dtype))
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp_fc2", dtype=self.dtype)(h)
        if self.layerscale is not None:
            h = LayerScale(self.dim, self.layerscale, name="ls2")(h)
        return x + h


class DinoV2Encoder(nn.Module):
    """DINOv2-with-registers ViT: cls + register tokens + learned pos embed;
    returns normalized patch tokens (x_norm_patchtokens)."""

    cfg: Pi3Config

    @nn.compact
    def __call__(self, img):
        c = self.cfg
        b, _, h, w = img.shape
        p = c.patch_size
        nh, nw = h // p, w // p
        x = jnp.transpose(img, (0, 2, 3, 1)).astype(c.compute_dtype)
        x = nn.Conv(c.enc_embed_dim, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embed", dtype=c.compute_dtype)(x)
        x = x.reshape(b, nh * nw, c.enc_embed_dim)

        cls_tok = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, c.enc_embed_dim))
        reg_tok = self.param("register_tokens", nn.initializers.zeros,
                             (1, c.enc_registers, c.enc_embed_dim))
        # learned patch pos embed at a base grid, bilinear-resized (DINOv2
        # interpolate_pos_encoding)
        base = 37  # 518/14
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, base * base, c.enc_embed_dim))
        pos_grid = pos.reshape(1, base, base, c.enc_embed_dim)
        # bicubic to match DINOv2's interpolate_pos_encoding
        # (dinov2/models/vision_transformer.py:181-210, mode="bicubic")
        pos_resized = jax.image.resize(
            pos_grid, (1, nh, nw, c.enc_embed_dim), "cubic"
        ).reshape(1, nh * nw, c.enc_embed_dim)
        x = x + pos_resized.astype(x.dtype)

        toks = jnp.concatenate(
            [jnp.broadcast_to(cls_tok, (b, 1, c.enc_embed_dim)).astype(x.dtype),
             jnp.broadcast_to(reg_tok, (b, c.enc_registers, c.enc_embed_dim)
                              ).astype(x.dtype),
             x], axis=1,
        )
        for i in range(c.enc_depth):
            toks = BlockRope(
                c.enc_embed_dim, c.enc_num_heads, c.mlp_ratio, c.rope_freq,
                layerscale=c.layerscale_enc, use_rope=False,
                dtype=c.compute_dtype, name=f"block_{i}",
            )(toks)
        toks = nn.LayerNorm(name="norm", epsilon=1e-6, dtype=jnp.float32)(toks)
        return toks[:, 1 + c.enc_registers:].astype(jnp.float32)


class TransformerHead(nn.Module):
    """TransformerDecoder: project -> depth x BlockRope -> linear out."""

    cfg: Pi3Config
    out_dim: int

    @nn.compact
    def __call__(self, hidden, xpos):
        c = self.cfg
        x = nn.Dense(c.head_dim, name="project",
                     dtype=c.compute_dtype)(hidden.astype(c.compute_dtype))
        for i in range(c.head_depth):
            x = BlockRope(
                c.head_dim, c.head_num_heads, c.mlp_ratio, c.rope_freq,
                dtype=c.compute_dtype, name=f"block_{i}",
            )(x, xpos)
        return nn.Dense(self.out_dim, name="linear_out",
                        dtype=jnp.float32)(x.astype(jnp.float32))


class Pi3(nn.Module):
    cfg: Pi3Config = Pi3Config()

    @nn.compact
    def __call__(self, imgs):
        """imgs (B, N, 3, H, W) in [0, 1] -> dict(points, local_points, conf,
        camera_poses) (pi3.py:173-216)."""
        c = self.cfg
        mean = jnp.asarray([0.485, 0.456, 0.406]).reshape(1, 1, 3, 1, 1)
        std = jnp.asarray([0.229, 0.224, 0.225]).reshape(1, 1, 3, 1, 1)
        imgs = (imgs - mean) / std
        B, N, _, H, W = imgs.shape
        p = c.patch_size
        nh, nw = H // p, W // p

        hidden = DinoV2Encoder(c, name="encoder")(
            imgs.reshape(B * N, 3, H, W)
        )
        if c.enc_embed_dim != c.dec_embed_dim:
            hidden = nn.Dense(c.dec_embed_dim, name="enc2dec")(hidden)

        # decoder with 5 register tokens and +1-shifted patch positions
        reg = self.param(
            "register_token", nn.initializers.normal(1e-6),
            (1, 1, c.dec_registers, c.dec_embed_dim),
        )
        reg_b = jnp.broadcast_to(
            reg, (B, N, c.dec_registers, c.dec_embed_dim)
        ).reshape(B * N, c.dec_registers, c.dec_embed_dim)
        hidden = jnp.concatenate([reg_b, hidden], axis=1)
        hw = hidden.shape[1]

        ys = jax.lax.broadcasted_iota(jnp.int32, (nh, nw), 0) + 1
        xs = jax.lax.broadcasted_iota(jnp.int32, (nh, nw), 1) + 1
        pos_p = jnp.stack([ys, xs], -1).reshape(1, nh * nw, 2)
        pos = jnp.concatenate(
            [jnp.zeros((1, c.dec_registers, 2), jnp.int32), pos_p], axis=1
        )
        pos = jnp.broadcast_to(pos, (B * N, hw, 2))

        outputs = []
        x = hidden
        for i in range(c.dec_depth):
            if i % 2 == 0:
                xi = x.reshape(B * N, hw, -1)
                pi = pos.reshape(B * N, hw, 2)
            else:
                xi = x.reshape(B, N * hw, -1)
                pi = pos.reshape(B, N * hw, 2)
            x = BlockRope(
                c.dec_embed_dim, c.dec_num_heads, c.mlp_ratio, c.rope_freq,
                layerscale=c.layerscale_dec, qk_norm=True,
                dtype=c.compute_dtype, name=f"dec_block_{i}",
            )(xi, pi).reshape(B * N, hw, -1)
            if i + 1 in (c.dec_depth - 1, c.dec_depth):
                outputs.append(x)
        hidden2 = jnp.concatenate(outputs, axis=-1)  # (B*N, hw, 2*dec)
        pos_flat = pos.reshape(B * N, hw, 2)

        point_h = TransformerHead(c, c.head_dim, name="point_decoder")(
            hidden2, pos_flat
        )
        conf_h = TransformerHead(c, c.head_dim, name="conf_decoder")(
            hidden2, pos_flat
        )
        cam_h = TransformerHead(c, c.camera_dim, name="camera_decoder")(
            hidden2, pos_flat
        )

        r = c.dec_registers
        # LinearPts3d: per-token p*p*(out) then pixel shuffle
        def pts_head(h, out_dim, name):
            y = nn.Dense(out_dim * p * p, name=name)(h[:, r:])
            y = y.reshape(B * N, nh, nw, out_dim, p, p)
            y = y.transpose(0, 1, 4, 2, 5, 3)
            return y.reshape(B, N, H, W, out_dim)

        ret = pts_head(point_h, 3, "point_head")
        xy, z = ret[..., :2], ret[..., 2:3]
        z = jnp.exp(z)
        local_points = jnp.concatenate([xy * z, z], axis=-1)
        conf = pts_head(conf_h, 1, "conf_head")

        # CameraHead (camera_head.py): 2x ResConv(linear) -> mean-pool ->
        # MLP -> 9D rot (SVD orthogonalized) + t
        feat = cam_h[:, r:]
        for i in range(2):
            y = nn.relu(nn.Dense(c.camera_dim, name=f"cam_res{i}_1")(feat))
            y = nn.relu(nn.Dense(c.camera_dim, name=f"cam_res{i}_2")(y))
            y = nn.relu(nn.Dense(c.camera_dim, name=f"cam_res{i}_3")(y))
            feat = feat + y
        pooled = feat.mean(axis=1)
        m = nn.relu(nn.Dense(c.camera_dim, name="cam_mlp1")(pooled))
        m = nn.relu(nn.Dense(c.camera_dim, name="cam_mlp2")(m))
        out_t = nn.Dense(3, name="fc_t")(m)
        out_r = nn.Dense(9, name="fc_rot")(m).reshape(-1, 3, 3)
        # svd_orthogonalize (camera_head.py:74-93): rows are L2-normalized
        # BEFORE the SVD (this changes the orthogonal factors, not just the
        # singular values), and the SVD is taken of the TRANSPOSE:
        # m^T = u s v^T  =>  R = v' diag(1,1,det(v' u^T)) u^T with v' = v
        mn = out_r.astype(jnp.float32)
        mn = mn / jnp.sqrt(jnp.sum(mn * mn, axis=-1, keepdims=True) + 1e-24)
        u, s, vh = jnp.linalg.svd(jnp.swapaxes(mn, -1, -2))
        v = jnp.swapaxes(vh, -1, -2)
        ut = jnp.swapaxes(u, -1, -2)
        det = jnp.linalg.det(v @ ut)
        D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], -1)
        R = (v * D[:, None, :]) @ ut
        pose = jnp.zeros((B * N, 4, 4)).at[:, :3, :3].set(R)
        pose = pose.at[:, :3, 3].set(out_t).at[:, 3, 3].set(1.0)
        camera_poses = pose.reshape(B, N, 4, 4)

        # world points = camera_poses applied to homogeneous local points
        Rp = camera_poses[..., :3, :3]
        tp = camera_poses[..., :3, 3]
        points = jnp.einsum("bnij,bnhwj->bnhwi", Rp, local_points) + \
            tp[:, :, None, None, :]

        return dict(points=points, local_points=local_points, conf=conf,
                    camera_poses=camera_poses)


def load_pi3_apply(checkpoint_path: str = "", full: bool = True,
                   params=None, seed: int = 0):
    """Build a jitted Pi3 forward ``apply(imgs (1,N,3,H,W)) -> dict``.

    Loads the released safetensors/torch weights when ``checkpoint_path``
    exists (reference: ``retrieval_database.py:168-170``); otherwise falls
    back to random init (tiny config unless ``full``) so the accurate-LC
    code path stays executable without weights.  Returns
    ``(apply, resize_hw)`` where resize_hw is the joint-inference resolution
    (392x518 at full size, retrieval_database.py:265-276).
    """
    import os

    import numpy as np

    cfg = Pi3Config() if full else tiny_pi3_config()
    resize_hw = (392, 518) if full else (112, 140)
    model = Pi3(cfg)
    if params is None and checkpoint_path and os.path.isfile(checkpoint_path):
        if checkpoint_path.endswith(".npz"):
            # pre-converted by scripts/convert_checkpoints.py
            from artdeco_tpu.utils.params_io import load_pytree_npz

            params = load_pytree_npz(checkpoint_path)
        else:
            from artdeco_tpu.models.convert_pi3 import convert_pi3_state_dict

            if checkpoint_path.endswith(".safetensors"):
                from safetensors.numpy import load_file

                sd = load_file(checkpoint_path)
            else:
                import torch

                ckpt = torch.load(checkpoint_path, map_location="cpu",
                                  weights_only=False)
                sd = ckpt.get("model", ckpt)
            params = convert_pi3_state_dict(sd, cfg)
        print(f"loaded Pi3 weights from {checkpoint_path}")
    if params is None:
        h, w = resize_hw
        params = model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, 1, 3, (h // cfg.patch_size) * cfg.patch_size,
                       (w // cfg.patch_size) * cfg.patch_size)),
        )
        print("WARNING: no Pi3 checkpoint; accurate loop closure runs with "
              "random weights (verification will be meaningless)")

    @jax.jit
    def apply(imgs):
        return model.apply(params, imgs)

    return apply, resize_hw
