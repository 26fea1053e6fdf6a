"""LPIPS metric tests: fallback sanity, converter mapping, evaluate() wiring.

Reference behavior: h3dgsv3.py:98,522-558 computes PSNR/SSIM/LPIPS per test
frame with lpips.LPIPS(net='alex').
"""

import numpy as np
import pytest

from artdeco_tpu.eval.lpips import (
    Lpips, convert_lpips_torch, random_lpips_params)

_ALEX = [(64, 11), (192, 5), (384, 3), (256, 3), (256, 3)]
_IDS = [0, 3, 6, 8, 10]


def _synth_torch_sd(rng):
    sd = {}
    in_ch = 3
    for (oc, k), i in zip(_ALEX, _IDS):
        sd[f"features.{i}.weight"] = rng.randn(oc, in_ch, k, k).astype(
            np.float32) * 0.02
        sd[f"features.{i}.bias"] = rng.randn(oc).astype(np.float32) * 0.01
        in_ch = oc
    for j, (oc, _) in enumerate(_ALEX):
        sd[f"lin{j}.model.1.weight"] = np.abs(
            rng.randn(1, oc, 1, 1)).astype(np.float32)
    return sd


def test_lpips_zero_on_identical_and_monotone():
    m = Lpips()
    rng = np.random.RandomState(0)
    a = rng.rand(3, 48, 64).astype(np.float32)
    small = np.clip(a + 0.05 * rng.randn(3, 48, 64), 0, 1).astype(np.float32)
    big = rng.rand(3, 48, 64).astype(np.float32)
    d0 = float(m(a, a))
    d1 = float(m(a, small))
    d2 = float(m(a, big))
    assert d0 == pytest.approx(0.0, abs=1e-6)
    assert 0 < d1 < d2


def test_lpips_converter_shapes_and_nonneg_heads():
    rng = np.random.RandomState(1)
    sd = _synth_torch_sd(rng)
    sd["lin0.model.1.weight"] -= 0.5  # some negative entries -> clamped
    p = convert_lpips_torch(sd)
    assert len(p.conv_w) == 5 and len(p.lin_w) == 5
    for w, (oc, k) in zip(p.conv_w, _ALEX):
        assert w.shape[0] == oc and w.shape[2] == k
    assert float(np.min(np.asarray(p.lin_w[0]))) >= 0.0
    m = Lpips(p)
    a = rng.rand(3, 48, 64).astype(np.float32)
    assert np.isfinite(float(m(a, np.roll(a, 3, axis=2))))


def test_lpips_fallback_deterministic():
    p1 = random_lpips_params(0)
    p2 = random_lpips_params(0)
    np.testing.assert_array_equal(np.asarray(p1.conv_w[0]),
                                  np.asarray(p2.conv_w[0]))


def test_evaluate_reports_lpips_and_active_gs():
    from artdeco_tpu.mapper.config import MapperConfig
    from __graft_entry__ import _tiny_scene

    cfg = MapperConfig(
        capacity=2048, cluster_capacity=512, voxel_table_size=4096,
        new_budget=512, keyframe_capacity=64, sh_degree=1,
        local_feat_dim=8, global_feat_dim=8, pyr_levels=1, gs_add_ratio=1.0,
        init_proba_scaler=4.0,
    )
    sm = _tiny_scene(cfg, 32, 32, n_keyframes=2)
    sm.keyframes[1].is_test = True
    metrics = sm.evaluate(with_lpips=True)
    assert "LPIPS" in metrics and np.isfinite(metrics["LPIPS"])
    # GS must be the ACTIVE count, not the padded slab capacity
    assert metrics["GS"] == sm.n_active_gaussians
    assert metrics["GS"] < cfg.capacity
