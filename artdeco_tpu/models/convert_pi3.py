"""Convert a Pi3 torch checkpoint into flax params for models/pi3.py.

The released weights (``model.safetensors``, loaded by the reference at
``VSLAM/mast3r_slam/retrieval_database.py:168-170`` via a plain
``load_state_dict``) use the module names of
``VSLAM/thirdparty/Pi3/pi3/models/pi3.py:16-216``:

- ``encoder.*``           DINOv2-with-registers ViT-L/14
  (``pi3/models/dinov2/models/vision_transformer.py``: cls_token,
  register_tokens, pos_embed of shape (1, 1+37*37, C), blocks.{i} with
  ls1/ls2 LayerScale, final ``norm``)
- ``decoder.{i}.*``       36 RoPE blocks with qk-norm + LayerScale
  (``pi3/models/layers/block.py`` / ``attention.py:238-262``)
- ``register_token``      (1, 1, 5, C) decoder register tokens
- ``{point,conf,camera}_decoder.*``  TransformerDecoder: ``projects``,
  ``blocks.{i}``, ``linear_out`` (``layers/transformer_head.py:9-56``)
- ``{point,conf}_head.proj``          LinearPts3d pixel-shuffle heads
- ``camera_head.*``       2x ResConvBlock (linear) + more_mlps + fc_t/fc_rot
  (``layers/camera_head.py:7-66``)

Usage:
    from safetensors.numpy import load_file
    params = convert_pi3_state_dict(load_file(path), cfg)
"""

from __future__ import annotations

import numpy as np

from artdeco_tpu.models.pi3 import Pi3Config


def _dense(sd, name):
    return {
        "kernel": np.asarray(sd[f"{name}.weight"], np.float32).T,
        "bias": np.asarray(sd[f"{name}.bias"], np.float32),
    }


def _ln(sd, name):
    return {
        "scale": np.asarray(sd[f"{name}.weight"], np.float32),
        "bias": np.asarray(sd[f"{name}.bias"], np.float32),
    }


def _ls(sd, name):
    return {"gamma": np.asarray(sd[f"{name}.gamma"], np.float32)}


def _block(sd, base, qk_norm=False, layerscale=False):
    """BlockRope torch module -> flax BlockRope params (models/pi3.py)."""
    attn = {
        "qkv": _dense(sd, f"{base}.attn.qkv"),
        "proj": _dense(sd, f"{base}.attn.proj"),
    }
    if qk_norm:
        attn["q_norm"] = _ln(sd, f"{base}.attn.q_norm")
        attn["k_norm"] = _ln(sd, f"{base}.attn.k_norm")
    out = {
        "norm1": _ln(sd, f"{base}.norm1"),
        "norm2": _ln(sd, f"{base}.norm2"),
        "attn": attn,
        "mlp_fc1": _dense(sd, f"{base}.mlp.fc1"),
        "mlp_fc2": _dense(sd, f"{base}.mlp.fc2"),
    }
    if layerscale:
        out["ls1"] = _ls(sd, f"{base}.ls1")
        out["ls2"] = _ls(sd, f"{base}.ls2")
    return out


def _transformer_head(sd, base, depth):
    out = {
        "project": _dense(sd, f"{base}.projects"),
        "linear_out": _dense(sd, f"{base}.linear_out"),
    }
    for i in range(depth):
        out[f"block_{i}"] = _block(sd, f"{base}.blocks.{i}")
    return out


def convert_pi3_state_dict(sd: dict, cfg: Pi3Config = Pi3Config()) -> dict:
    """torch/safetensors state_dict -> flax params tree {"params": {...}}."""
    sd = dict(sd)

    # encoder: fold the cls position embedding into the cls token (the
    # reference's interpolate_pos_encoding adds pos_embed[:, 0] to cls and
    # bicubic-resizes pos_embed[:, 1:] over the patch grid; our flax encoder
    # keeps a patch-only pos_embed and a cls token with the pos pre-added)
    pos = np.asarray(sd["encoder.pos_embed"], np.float32)  # (1, 1+N, C)
    cls_tok = np.asarray(sd["encoder.cls_token"], np.float32) + pos[:, :1]
    enc = {
        "patch_embed": {
            "kernel": np.transpose(
                np.asarray(sd["encoder.patch_embed.proj.weight"], np.float32),
                (2, 3, 1, 0),
            ),
            "bias": np.asarray(sd["encoder.patch_embed.proj.bias"], np.float32),
        },
        "cls_token": cls_tok,
        "register_tokens": np.asarray(sd["encoder.register_tokens"], np.float32),
        "pos_embed": pos[:, 1:],
        "norm": _ln(sd, "encoder.norm"),
    }
    for i in range(cfg.enc_depth):
        enc[f"block_{i}"] = _block(sd, f"encoder.blocks.{i}", layerscale=True)

    params = {
        "encoder": enc,
        "register_token": np.asarray(sd["register_token"], np.float32),
        "point_decoder": _transformer_head(sd, "point_decoder", cfg.head_depth),
        "conf_decoder": _transformer_head(sd, "conf_decoder", cfg.head_depth),
        "camera_decoder": _transformer_head(sd, "camera_decoder", cfg.head_depth),
        "point_head": _dense(sd, "point_head.proj"),
        "conf_head": _dense(sd, "conf_head.proj"),
        "cam_mlp1": _dense(sd, "camera_head.more_mlps.0"),
        "cam_mlp2": _dense(sd, "camera_head.more_mlps.2"),
        "fc_t": _dense(sd, "camera_head.fc_t"),
        "fc_rot": _dense(sd, "camera_head.fc_rot"),
    }
    for i in range(cfg.dec_depth):
        params[f"dec_block_{i}"] = _block(
            sd, f"decoder.{i}", qk_norm=True, layerscale=True
        )
    for i in range(2):
        for j in (1, 2, 3):
            params[f"cam_res{i}_{j}"] = _dense(
                sd, f"camera_head.res_conv.{i}.res_conv{j}"
            )
    return {"params": params}


def synth_pi3_state_dict(cfg: Pi3Config, seed: int = 0) -> dict:
    """Synthesize a random torch-layout Pi3 state dict (converter tests when
    the released checkpoint is unavailable)."""
    rng = np.random.RandomState(seed)
    sd = {}

    def dense(name, i, o):
        sd[f"{name}.weight"] = rng.randn(o, i).astype(np.float32) * 0.02
        sd[f"{name}.bias"] = rng.randn(o).astype(np.float32) * 0.02

    def ln(name, d):
        sd[f"{name}.weight"] = 1.0 + 0.01 * rng.randn(d).astype(np.float32)
        sd[f"{name}.bias"] = 0.01 * rng.randn(d).astype(np.float32)

    def block(name, d, hidden, layerscale=False):
        ln(f"{name}.norm1", d)
        ln(f"{name}.norm2", d)
        dense(f"{name}.attn.qkv", d, 3 * d)
        dense(f"{name}.attn.proj", d, d)
        dense(f"{name}.mlp.fc1", d, hidden)
        dense(f"{name}.mlp.fc2", hidden, d)
        if layerscale:
            sd[f"{name}.ls1.gamma"] = (
                0.01 * np.abs(rng.randn(d))).astype(np.float32)
            sd[f"{name}.ls2.gamma"] = (
                0.01 * np.abs(rng.randn(d))).astype(np.float32)

    def qk_block(name, d, hidden, num_heads, layerscale=True):
        block(name, d, hidden, layerscale=layerscale)
        hd = d // num_heads
        ln(f"{name}.attn.q_norm", hd)
        ln(f"{name}.attn.k_norm", hd)

    e, dd = cfg.enc_embed_dim, cfg.dec_embed_dim
    p = cfg.patch_size
    base = 37
    sd["encoder.patch_embed.proj.weight"] = (
        rng.randn(e, 3, p, p).astype(np.float32) * 0.02)
    sd["encoder.patch_embed.proj.bias"] = rng.randn(e).astype(np.float32) * 0.02
    sd["encoder.cls_token"] = rng.randn(1, 1, e).astype(np.float32) * 0.02
    sd["encoder.register_tokens"] = (
        rng.randn(1, cfg.enc_registers, e).astype(np.float32) * 0.02)
    sd["encoder.pos_embed"] = (
        rng.randn(1, 1 + base * base, e).astype(np.float32) * 0.02)
    ln("encoder.norm", e)
    for i in range(cfg.enc_depth):
        block(f"encoder.blocks.{i}", e, int(e * cfg.mlp_ratio),
              layerscale=True)

    sd["register_token"] = (
        rng.randn(1, 1, cfg.dec_registers, dd).astype(np.float32) * 1e-6)
    for i in range(cfg.dec_depth):
        qk_block(f"decoder.{i}", dd, int(dd * cfg.mlp_ratio),
                 cfg.dec_num_heads)

    hdim = cfg.head_dim
    for head, out_dim in (("point_decoder", hdim), ("conf_decoder", hdim),
                          ("camera_decoder", cfg.camera_dim)):
        dense(f"{head}.projects", 2 * dd, hdim)
        for i in range(cfg.head_depth):
            block(f"{head}.blocks.{i}", hdim, int(hdim * cfg.mlp_ratio))
        dense(f"{head}.linear_out", hdim, out_dim)
    dense("point_head.proj", hdim, 3 * p * p)
    dense("conf_head.proj", hdim, 1 * p * p)
    c = cfg.camera_dim
    for i in range(2):
        for j in (1, 2, 3):
            dense(f"camera_head.res_conv.{i}.res_conv{j}", c, c)
    dense("camera_head.more_mlps.0", c, c)
    dense("camera_head.more_mlps.2", c, c)
    dense("camera_head.fc_t", c, 3)
    dense("camera_head.fc_rot", c, 9)
    return sd
