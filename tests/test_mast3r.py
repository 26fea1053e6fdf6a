"""MASt3R architecture tests: shapes, RoPE golden, pixel-shuffle parity,
converter structural roundtrip, full pipeline smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artdeco_tpu.models import mast3r as M
from artdeco_tpu.models.convert_mast3r import convert_state_dict, synth_state_dict
from artdeco_tpu.models.mast3r_infer import Mast3rRunner

CFG = M.tiny_config(compute_dtype=jnp.float32)
H, W = 64, 80


def test_rope2d_matches_numpy():
    rng = np.random.RandomState(0)
    b, h, n, d = 1, 2, 12, 16
    tok = rng.randn(b, h, n, d).astype(np.float32)
    pos = rng.randint(0, 7, (b, n, 2)).astype(np.int32)
    got = np.asarray(M.rope2d(jnp.asarray(tok), jnp.asarray(pos), 100.0))

    # numpy transcription of croco RoPE2D
    def rope1d(t, p):  # t (b,h,n,dh), p (b,n)
        dh = t.shape[-1]
        inv = 1.0 / (100.0 ** (np.arange(0, dh, 2) / dh))
        ang = p[:, None, :, None] * inv  # (b,1,n,dh/2)
        ang = np.concatenate([ang, ang], -1)
        cos, sin = np.cos(ang), np.sin(ang)
        t1, t2 = t[..., : dh // 2], t[..., dh // 2:]
        rot = np.concatenate([-t2, t1], -1)
        return t * cos + rot * sin

    y, x = tok[..., : d // 2], tok[..., d // 2:]
    ref = np.concatenate([rope1d(y, pos[..., 0]), rope1d(x, pos[..., 1])], -1)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_pixel_shuffle_matches_torch():
    import torch

    rng = np.random.RandomState(1)
    b, nh, nw, c, p = 1, 3, 4, 5, 4
    tokens = rng.randn(b, nh * nw, c * p * p).astype(np.float32)
    # my layout: reshape (b, nh, nw, c, p, p) -> transpose -> (b, nh*p, nw*p, c)
    x = tokens.reshape(b, nh, nw, c, p, p).transpose(0, 1, 4, 2, 5, 3)
    mine = x.reshape(b, nh * p, nw * p, c)
    # torch: (B, C*p*p, nh, nw) -> pixel_shuffle -> (B, C, nh*p, nw*p)
    t = torch.from_numpy(tokens).transpose(-1, -2).reshape(b, c * p * p, nh, nw)
    ref = torch.nn.functional.pixel_shuffle(t, p).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(mine, ref, atol=1e-6)


def test_full_forward_shapes():
    model = M.MASt3R(CFG)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 3, H, W)) * 0.5
    params = model.init(jax.random.PRNGKey(0), img, img)
    r1, r2 = model.apply(params, img, img)
    assert r1["pts3d"].shape == (1, H, W, 3)
    assert r1["conf"].shape == (1, H, W)
    assert r1["desc"].shape == (1, H, W, CFG.local_feat_dim)
    assert r1["desc_conf"].shape == (1, H, W)
    # conf >= vmin; desc unit-norm
    assert float(r1["conf"].min()) >= CFG.conf_vmin
    n = np.linalg.norm(np.asarray(r1["desc"]), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-3)
    assert all(bool(jnp.isfinite(v).all()) for v in r1.values())


def test_converter_structural_roundtrip():
    sd = synth_state_dict(CFG)
    params = convert_state_dict(sd, CFG)
    model = M.MASt3R(CFG)
    img = jnp.zeros((1, 3, 32, 32))
    ref_params = model.init(jax.random.PRNGKey(0), img, img)

    # identical tree structure and shapes
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_params)[0]
    flat_got = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    )
    assert len(flat_ref) == len(flat_got)
    for path, leaf in flat_ref:
        key = jax.tree_util.keystr(path)
        assert key in flat_got, f"missing {key}"
        assert flat_got[key].shape == leaf.shape, (
            key, flat_got[key].shape, leaf.shape)

    # converted params actually run
    r1, r2 = model.apply(params, img, img)
    assert bool(jnp.isfinite(r1["pts3d"]).all())


def test_runner_mono_and_asymmetric():
    runner = Mast3rRunner.create(CFG, init_hw=(H, W), match_cfg=dict(
        max_iter=4, lambda_init=1e-8, convergence_thresh=1e-6,
        dist_thresh=0.1, radius=2, dilation_max=1,
    ))
    img = jnp.asarray(np.random.RandomState(0).rand(3, H, W).astype(np.float32)) * 2 - 1
    X, C, feat, pos = runner.inference_mono(img)
    assert X.shape == (2, H * W, 3) and C.shape == (2, H * W, 1)

    out = runner.match_asymmetric(img, img)
    idx_i2j, valid, Xii, Cii, Qii, Xji, Cji, Qji, f1, p1 = out
    assert idx_i2j.shape == (1, H * W)
    assert Xii.shape == (H * W, 3) and Qji.shape == (H * W, 1)


def test_runner_symmetric_batch():
    runner = Mast3rRunner.create(CFG, init_hw=(H, W), match_cfg=dict(
        max_iter=4, lambda_init=1e-8, convergence_thresh=1e-6,
        dist_thresh=0.1, radius=0, dilation_max=1,
    ))
    rng = np.random.RandomState(1)
    img_i = jnp.asarray(rng.rand(2, 3, H, W).astype(np.float32)) * 2 - 1
    img_j = jnp.asarray(rng.rand(2, 3, H, W).astype(np.float32)) * 2 - 1
    fi, pi = runner.encode_image(img_i)
    fj, pj = runner.encode_image(img_j)
    (idx_i2j, idx_j2i, vj, vi, Qii, Qjj, Qji, Qij) = runner.match_symmetric(
        fi, pi, fj, pj, (H, W)
    )
    assert idx_i2j.shape == (2, H * W) and idx_j2i.shape == (2, H * W)
    assert Qii.shape == (2, H * W, 1)


@pytest.mark.slow
def test_converter_full_size_forward():
    """VERDICT r1 item 8: convert a full ViT-L-shaped torch state dict and
    run one 512x384 forward; head output shapes/dtypes must match the
    reference surface (dust3r/model.py:127-211 heads)."""
    cfg = M.MASt3RConfig(compute_dtype=jnp.float32)
    sd = synth_state_dict(cfg)
    params = convert_state_dict(sd, cfg)
    # every torch tensor maps to a flax leaf, except the 8 dead
    # refinenet4.resConfUnit1 tensors per checkpoint (2 heads x conv1/conv2
    # weight+bias) that the converter intentionally drops (no skip input)
    n_torch = len(sd)
    n_flax = len(jax.tree.leaves(params))
    assert n_flax == n_torch - 8, (n_flax, n_torch)

    runner = Mast3rRunner.create(cfg, params=params, init_hw=(384, 512))
    h, w = 384, 512
    img = jnp.asarray(
        np.random.RandomState(0).rand(3, h, w).astype(np.float32) * 2 - 1
    )
    X, C, feat, pos = runner.inference_mono(img)
    assert X.shape == (2, h * w, 3) and X.dtype == jnp.float32
    assert C.shape == (2, h * w, 1)
    assert feat.shape == (1, (h // 16) * (w // 16), cfg.enc_embed_dim)
    assert bool(jnp.isfinite(X).all()) and bool(jnp.isfinite(C).all())
