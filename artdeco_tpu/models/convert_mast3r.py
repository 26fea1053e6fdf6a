"""Convert a MASt3R torch checkpoint into flax params for models/mast3r.py.

Usage:
    from artdeco_tpu.models.convert_mast3r import convert_state_dict
    params = convert_state_dict(torch.load(path)["model"], cfg)

Name mapping targets the released checkpoint layout
(``MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth``; module names from
the reference's vendored model classes — see models/mast3r.py docstring).
"""

from __future__ import annotations

import numpy as np

from artdeco_tpu.models.mast3r import MASt3RConfig


def _dense(sd, name):
    return {
        "kernel": np.asarray(sd[f"{name}.weight"]).T,
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


def _conv(sd, name, bias=True):
    out = {"kernel": np.transpose(np.asarray(sd[f"{name}.weight"]), (2, 3, 1, 0))}
    if bias:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _deconv(sd, name):
    # torch ConvTranspose2d weight (in, out, kh, kw) -> flax (kh, kw, in, out)
    # with a SPATIAL FLIP: torch's transposed conv places weight[ky, kx] at
    # output (y*s + ky, x*s + kx) while flax's ConvTranspose correlates with
    # the unflipped kernel (verified numerically against ConvTranspose2d;
    # the unflipped transpose reproduces every 4x4 block mirrored)
    w = np.asarray(sd[f"{name}.weight"])[:, :, ::-1, ::-1]
    return {
        "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))),
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


def _ln(sd, name):
    return {
        "scale": np.asarray(sd[f"{name}.weight"]),
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


def _attn(sd, base):
    return {
        "qkv": _dense(sd, f"{base}.qkv"),
        "proj": _dense(sd, f"{base}.proj"),
    }


def _cross_attn(sd, base):
    return {
        "projq": _dense(sd, f"{base}.projq"),
        "projk": _dense(sd, f"{base}.projk"),
        "projv": _dense(sd, f"{base}.projv"),
        "proj": _dense(sd, f"{base}.proj"),
    }


def _mlp(sd, base):
    return {"fc1": _dense(sd, f"{base}.fc1"), "fc2": _dense(sd, f"{base}.fc2")}


def _enc_block(sd, base):
    return {
        "norm1": _ln(sd, f"{base}.norm1"),
        "attn": _attn(sd, f"{base}.attn"),
        "norm2": _ln(sd, f"{base}.norm2"),
        "mlp": _mlp(sd, f"{base}.mlp"),
    }


def _dec_block(sd, base):
    return {
        "norm1": _ln(sd, f"{base}.norm1"),
        "attn": _attn(sd, f"{base}.attn"),
        "norm2": _ln(sd, f"{base}.norm2"),
        "norm3": _ln(sd, f"{base}.norm3"),
        "norm_y": _ln(sd, f"{base}.norm_y"),
        "cross_attn": _cross_attn(sd, f"{base}.cross_attn"),
        "mlp": _mlp(sd, f"{base}.mlp"),
    }


def _dpt_head(sd, base):
    d = f"{base}.dpt"
    out = {
        "act1_conv": _conv(sd, f"{d}.act_postprocess.0.0"),
        "act1_deconv": _deconv(sd, f"{d}.act_postprocess.0.1"),
        "act2_conv": _conv(sd, f"{d}.act_postprocess.1.0"),
        "act2_deconv": _deconv(sd, f"{d}.act_postprocess.1.1"),
        "act3_conv": _conv(sd, f"{d}.act_postprocess.2.0"),
        "act4_conv": _conv(sd, f"{d}.act_postprocess.3.0"),
        "act4_conv2": _conv(sd, f"{d}.act_postprocess.3.1"),
        "head_conv1": _conv(sd, f"{d}.head.0"),
        "head_conv2": _conv(sd, f"{d}.head.2"),
        "head_conv3": _conv(sd, f"{d}.head.4"),
    }
    for i in range(1, 5):
        out[f"layer{i}_rn"] = _conv(sd, f"{d}.scratch.layer{i}_rn", bias=False)
        rn = f"{d}.scratch.refinenet{i}"
        block = {
            "rcu2": {
                "conv1": _conv(sd, f"{rn}.resConfUnit2.conv1"),
                "conv2": _conv(sd, f"{rn}.resConfUnit2.conv2"),
            },
            "out_conv": _conv(sd, f"{rn}.out_conv"),
        }
        if i != 4:
            # refinenet4 has no skip input; its resConfUnit1 weights are dead
            # in the checkpoint too
            block["rcu1"] = {
                "conv1": _conv(sd, f"{rn}.resConfUnit1.conv1"),
                "conv2": _conv(sd, f"{rn}.resConfUnit1.conv2"),
            }
        out[f"refinenet{i}"] = block
    return out


def convert_state_dict(sd: dict, cfg: MASt3RConfig = MASt3RConfig()) -> dict:
    """torch state_dict -> flax params tree {"params": {...}}."""
    sd = {k: v for k, v in sd.items()}
    # second decoder weights may be shared in older checkpoints
    if not any(k.startswith("dec_blocks2") for k in sd):
        for k in list(sd.keys()):
            if k.startswith("dec_blocks."):
                sd[k.replace("dec_blocks.", "dec_blocks2.")] = sd[k]

    enc = {"patch_embed_proj": _conv(sd, "patch_embed.proj"),
           "enc_norm": _ln(sd, "enc_norm")}
    for i in range(cfg.enc_depth):
        enc[f"enc_block_{i}"] = _enc_block(sd, f"enc_blocks.{i}")

    dec = {"decoder_embed": _dense(sd, "decoder_embed"),
           "dec_norm": _ln(sd, "dec_norm")}
    for i in range(cfg.dec_depth):
        dec[f"dec_block_{i}"] = _dec_block(sd, f"dec_blocks.{i}")
        dec[f"dec_block2_{i}"] = _dec_block(sd, f"dec_blocks2.{i}")

    params = {
        "encoder": enc,
        "decoder": dec,
        "head1_dpt": _dpt_head(sd, "downstream_head1"),
        "head2_dpt": _dpt_head(sd, "downstream_head2"),
        "head1_local": {
            "head_local_features": _mlp(sd, "downstream_head1.head_local_features")
        },
        "head2_local": {
            "head_local_features": _mlp(sd, "downstream_head2.head_local_features")
        },
    }
    return {"params": params}


def synth_state_dict(cfg: MASt3RConfig) -> dict:
    """Synthesize a random torch-layout state dict (converter tests when no
    checkpoint is available)."""
    rng = np.random.RandomState(0)
    sd = {}

    def dense(name, i, o):
        sd[f"{name}.weight"] = rng.randn(o, i).astype(np.float32) * 0.02
        sd[f"{name}.bias"] = rng.randn(o).astype(np.float32) * 0.02

    def conv(name, i, o, k, bias=True):
        sd[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.02
        if bias:
            sd[f"{name}.bias"] = rng.randn(o).astype(np.float32) * 0.02

    def deconv(name, i, o, k):
        sd[f"{name}.weight"] = rng.randn(i, o, k, k).astype(np.float32) * 0.02
        sd[f"{name}.bias"] = rng.randn(o).astype(np.float32) * 0.02

    def ln(name, d):
        sd[f"{name}.weight"] = np.ones(d, np.float32)
        sd[f"{name}.bias"] = np.zeros(d, np.float32)

    def block(name, d, mlp_hidden):
        ln(f"{name}.norm1", d)
        ln(f"{name}.norm2", d)
        dense(f"{name}.attn.qkv", d, 3 * d)
        dense(f"{name}.attn.proj", d, d)
        dense(f"{name}.mlp.fc1", d, mlp_hidden)
        dense(f"{name}.mlp.fc2", mlp_hidden, d)

    def dec_block(name, d, mlp_hidden):
        block(name, d, mlp_hidden)
        ln(f"{name}.norm3", d)
        ln(f"{name}.norm_y", d)
        for p in ("projq", "projk", "projv", "proj"):
            dense(f"{name}.cross_attn.{p}", d, d)

    e, dd = cfg.enc_embed_dim, cfg.dec_embed_dim
    conv("patch_embed.proj", 3, e, cfg.patch_size)
    ln("enc_norm", e)
    for i in range(cfg.enc_depth):
        block(f"enc_blocks.{i}", e, int(e * cfg.mlp_ratio))
    dense("decoder_embed", e, dd)
    ln("dec_norm", dd)
    for i in range(cfg.dec_depth):
        dec_block(f"dec_blocks.{i}", dd, int(dd * cfg.mlp_ratio))
        dec_block(f"dec_blocks2.{i}", dd, int(dd * cfg.mlp_ratio))

    f = cfg.dpt_feature_dim
    ldim = cfg.dpt_layer_dims
    dims = [e, dd, dd, dd]
    for hn in (1, 2):
        b = f"downstream_head{hn}"
        conv(f"{b}.dpt.act_postprocess.0.0", dims[0], ldim[0], 1)
        deconv(f"{b}.dpt.act_postprocess.0.1", ldim[0], ldim[0], 4)
        conv(f"{b}.dpt.act_postprocess.1.0", dims[1], ldim[1], 1)
        deconv(f"{b}.dpt.act_postprocess.1.1", ldim[1], ldim[1], 2)
        conv(f"{b}.dpt.act_postprocess.2.0", dims[2], ldim[2], 1)
        conv(f"{b}.dpt.act_postprocess.3.0", dims[3], ldim[3], 1)
        conv(f"{b}.dpt.act_postprocess.3.1", ldim[3], ldim[3], 3)
        for i in range(1, 5):
            conv(f"{b}.dpt.scratch.layer{i}_rn", ldim[i - 1], f, 3, bias=False)
            rn = f"{b}.dpt.scratch.refinenet{i}"
            for u in (1, 2):
                conv(f"{rn}.resConfUnit{u}.conv1", f, f, 3)
                conv(f"{rn}.resConfUnit{u}.conv2", f, f, 3)
            conv(f"{rn}.out_conv", f, f, 1)
        conv(f"{b}.dpt.head.0", f, f // 2, 3)
        conv(f"{b}.dpt.head.2", f // 2, f // 2, 3)
        conv(f"{b}.dpt.head.4", f // 2, 4, 1)
        idim = e + dd
        odim = (cfg.local_feat_dim + 1) * cfg.patch_size ** 2
        dense(f"{b}.head_local_features.fc1", idim, int(4 * idim))
        dense(f"{b}.head_local_features.fc2", int(4 * idim), odim)
    return sd
