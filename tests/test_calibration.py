"""Model-based self-calibration (geometry/calibration.py).

Reference behavior being replaced: GeoCalib / COLMAP intrinsics estimation
(``dataloaders/DatasetBasic.py:112-273``)."""

import numpy as np
import jax.numpy as jnp

from artdeco_tpu.geometry.calibration import estimate_focal_weiszfeld


def _pointmap_from_focal(h, w, focal, rng, depth_lo=1.5, depth_hi=4.0):
    u, v = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32))
    z = rng.uniform(depth_lo, depth_hi, (h, w)).astype(np.float32)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    x = (u - cx) / focal * z
    y = (v - cy) / focal * z
    return np.stack([x, y, z], -1).reshape(-1, 3)


def test_focal_recovery_exact():
    h, w = 96, 128
    rng = np.random.RandomState(0)
    X = _pointmap_from_focal(h, w, 110.0, rng)
    f = float(estimate_focal_weiszfeld(
        jnp.asarray(X), jnp.ones((h * w,), bool), h, w))
    assert abs(f - 110.0) < 0.5, f


def test_focal_recovery_outliers():
    """30% corrupted points: the L1/Weiszfeld fit must still recover f."""
    h, w = 96, 128
    rng = np.random.RandomState(1)
    X = _pointmap_from_focal(h, w, 140.0, rng)
    n = h * w
    bad = rng.rand(n) < 0.3
    X[bad] = rng.randn(bad.sum(), 3) * 3 + np.asarray([0, 0, 2.5])
    f = float(estimate_focal_weiszfeld(
        jnp.asarray(X), jnp.ones((n,), bool), h, w))
    assert abs(f - 140.0) / 140.0 < 0.05, f


def test_focal_validity_gate():
    """Points behind the camera / gated invalid must not poison the fit."""
    h, w = 64, 96
    rng = np.random.RandomState(2)
    X = _pointmap_from_focal(h, w, 80.0, rng)
    n = h * w
    valid = np.ones(n, bool)
    kill = rng.rand(n) < 0.2
    X[kill, 2] = -1.0   # behind camera
    valid[kill] = False
    f = float(estimate_focal_weiszfeld(
        jnp.asarray(X), jnp.asarray(valid), h, w))
    assert abs(f - 80.0) < 1.0, f


def test_dataset_recalibrate_focal(tmp_path):
    import types

    from artdeco_tpu.dataio.dataset import SyntheticDataset

    args = types.SimpleNamespace(
        source_path="", images_dir="images", downsampling=2.0,
        max_size_slam=128, start_at=0, end_at=0, seq_length=0,
        image_sampling=0, test_hold=-1, calib=None,
        init_focal=-1.0, init_fov=-1.0, optimize_focal=False,
    )
    ds = SyntheticDataset(args, n_frames=2, width=256, height=192)
    # SyntheticDataset forces init_focal -> not a guess
    assert not ds.calib_is_guess
    old_slam_shape = (ds.H_slam, ds.W_slam)
    f_new = 300.0
    ds.recalibrate_focal(f_new)
    assert (ds.H_slam, ds.W_slam) == old_slam_shape
    # undistort may nudge the optimal matrix slightly; the SLAM-res focal is
    # the original-res focal divided by the (original/slam) scale
    assert abs(ds.transform.K_best[0, 0] - f_new) / f_new < 0.02
    assert abs(
        ds.K_slam[0, 0] * ds.transform.scale_slam_w
        - ds.transform.K_best[0, 0]
    ) < 1e-2
