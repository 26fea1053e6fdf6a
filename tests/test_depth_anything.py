"""DepthAnythingV2 port: shapes, converter mapping, mono-depth wiring.

Reference role: ``Reconstruct/scene/mono_depth.py:29-199``."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from artdeco_tpu.models import depth_anything as DA


def synth_sd(cfg: DA.DAV2Config, seed=0):
    """Torch-layout random state dict (checkpoint converter tests)."""
    rng = np.random.RandomState(seed)
    sd = {}

    def t(name, *shape):
        sd[name] = (rng.randn(*shape) * 0.02).astype(np.float32)

    e = cfg.embed_dim
    p = cfg.patch_size
    t("pretrained.cls_token", 1, 1, e)
    t("pretrained.pos_embed", 1, 1 + 37 * 37, e)
    t("pretrained.patch_embed.proj.weight", e, 3, p, p)
    t("pretrained.patch_embed.proj.bias", e)
    t("pretrained.norm.weight", e)
    t("pretrained.norm.bias", e)
    hid = int(e * cfg.mlp_ratio)
    for i in range(cfg.depth):
        b = f"pretrained.blocks.{i}"
        t(f"{b}.norm1.weight", e); t(f"{b}.norm1.bias", e)
        t(f"{b}.attn.qkv.weight", 3 * e, e); t(f"{b}.attn.qkv.bias", 3 * e)
        t(f"{b}.attn.proj.weight", e, e); t(f"{b}.attn.proj.bias", e)
        t(f"{b}.ls1.gamma", e); t(f"{b}.ls2.gamma", e)
        t(f"{b}.norm2.weight", e); t(f"{b}.norm2.bias", e)
        t(f"{b}.mlp.fc1.weight", hid, e); t(f"{b}.mlp.fc1.bias", hid)
        t(f"{b}.mlp.fc2.weight", e, hid); t(f"{b}.mlp.fc2.bias", e)
    oc = cfg.out_channels
    f = cfg.features
    h = "depth_head"
    for i in range(4):
        t(f"{h}.projects.{i}.weight", oc[i], e, 1, 1)
        t(f"{h}.projects.{i}.bias", oc[i])
    t(f"{h}.resize_layers.0.weight", oc[0], oc[0], 4, 4)
    t(f"{h}.resize_layers.0.bias", oc[0])
    t(f"{h}.resize_layers.1.weight", oc[1], oc[1], 2, 2)
    t(f"{h}.resize_layers.1.bias", oc[1])
    t(f"{h}.resize_layers.3.weight", oc[3], oc[3], 3, 3)
    t(f"{h}.resize_layers.3.bias", oc[3])
    for i in range(1, 5):
        t(f"{h}.scratch.layer{i}_rn.weight", f, oc[i - 1], 3, 3)
        rf = f"{h}.scratch.refinenet{i}"
        for u in ("resConfUnit1", "resConfUnit2"):
            t(f"{rf}.{u}.conv1.weight", f, f, 3, 3)
            t(f"{rf}.{u}.conv1.bias", f)
            t(f"{rf}.{u}.conv2.weight", f, f, 3, 3)
            t(f"{rf}.{u}.conv2.bias", f)
        t(f"{rf}.out_conv.weight", f, f, 1, 1)
        t(f"{rf}.out_conv.bias", f)
    t(f"{h}.scratch.output_conv1.weight", f // 2, f, 3, 3)
    t(f"{h}.scratch.output_conv1.bias", f // 2)
    t(f"{h}.scratch.output_conv2.0.weight", 32, f // 2, 3, 3)
    t(f"{h}.scratch.output_conv2.0.bias", 32)
    t(f"{h}.scratch.output_conv2.2.weight", 1, 32, 1, 1)
    t(f"{h}.scratch.output_conv2.2.bias", 1)
    return sd


def test_forward_shape_and_finite():
    cfg = DA.tiny_dav2_config()
    model = DA.DepthAnythingV2(cfg)
    h = w = cfg.patch_size * 6
    img = jnp.asarray(np.random.RandomState(0).rand(2, 3, h, w), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(params, img)
    assert out.shape == (2, h, w)
    assert bool(jnp.isfinite(out).all())
    assert float(out.min()) >= 0.0  # relative inverse depth is ReLU-bounded


def test_converter_covers_every_weight():
    cfg = DA.tiny_dav2_config()
    sd = synth_sd(cfg)
    params = DA.convert_dav2_state_dict(sd, cfg)
    n_flax = len(jax.tree.leaves(params))
    # refinenet4.resConfUnit1 (4 tensors) is structurally dead (no skip);
    # the cls pos-embed row folds into cls_token without dropping a leaf
    assert n_flax == len(sd) - 4, (n_flax, len(sd))
    model = DA.DepthAnythingV2(cfg)
    h = w = cfg.patch_size * 4
    img = jnp.asarray(np.random.RandomState(1).rand(1, 3, h, w), jnp.float32)
    ref_shape = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img))
    # converted tree must match the model's own param tree structure
    conv_paths = set(jax.tree_util.tree_flatten_with_path(params)[0][i][0].__repr__()
                     for i in range(n_flax))
    init_flat = jax.tree_util.tree_flatten_with_path(ref_shape)[0]
    missing = [repr(p) for p, _ in init_flat if repr(p) not in conv_paths]
    assert not missing, missing[:5]
    out = model.apply(params, img)
    assert out.shape == (1, h, w) and bool(jnp.isfinite(out).all())


def test_mono_depth_estimator_with_model():
    from artdeco_tpu.mapper.mono_depth import MonoDepthEstimator

    cfg = DA.tiny_dav2_config()
    model = DA.DepthAnythingV2(cfg)
    img0 = jnp.zeros((1, 3, cfg.patch_size * 4, cfg.patch_size * 4))
    params = model.init(jax.random.PRNGKey(0), img0)
    apply = jax.jit(model.apply)

    def model_fn(img_chw):
        c, h, w = img_chw.shape
        p = cfg.patch_size
        nh = max(round(h / p), 1) * p
        nw = max(round(w / p), 1) * p
        x = jax.image.resize(
            jnp.asarray(img_chw, jnp.float32), (3, nh, nw), "bilinear")
        d = apply(params, x[None])[0]
        return np.asarray(jax.image.resize(d, (h, w), "bilinear"))

    est = MonoDepthEstimator(model_fn=model_fn)
    img = np.random.RandomState(0).rand(3, 60, 80).astype(np.float32)
    idepth, conf = est(img)
    assert idepth.shape == (60, 80) and conf.shape == (60, 80)
    assert np.isfinite(idepth).all() and (conf > 0).all() and (conf <= 1).all()
