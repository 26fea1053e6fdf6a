"""COLMAP dataset ingest (VERDICT r1 item 9): intrinsics + GT poses from a
binary model (reference utils_IO.py:107-523, DatasetBasic.py:127-273)."""

import os
import types

import numpy as np
import pytest

from artdeco_tpu.dataio.dataset import (
    ColmapDataset, _matrix_to_quat_xyzw, _quat_wxyz_to_matrix, load_dataset,
)
from artdeco_tpu.mapper.scene_io import write_colmap_model


def _make_scene(root, n=6, w=64, h=48):
    cv2 = pytest.importorskip("cv2")
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    names = []
    for i in range(n):
        name = f"img_{i:03d}.png"
        cv2.imwrite(os.path.join(img_dir, name),
                    rng.randint(0, 255, (h, w, 3), np.uint8))
        names.append(name)

    cameras = {1: dict(model_id=1, width=w, height=h,
                       params=[60.0, 62.0, w / 2, h / 2])}
    images = {}
    gt_twc = {}
    for i, name in enumerate(names):
        # random small world->cam pose
        axis = rng.randn(3)
        axis = axis / np.linalg.norm(axis)
        ang = 0.2 * rng.rand()
        qw = np.cos(ang / 2)
        qx, qy, qz = np.sin(ang / 2) * axis
        t = 0.5 * rng.randn(3)
        images[i + 1] = dict(qvec=[qw, qx, qy, qz], tvec=list(t),
                             camera_id=1, name=name)
        R = _quat_wxyz_to_matrix(qw, qx, qy, qz)
        gt_twc[name] = (-R.T @ t, R.T)
    write_colmap_model(os.path.join(root, "sparse", "0"), cameras, images)
    return names, gt_twc


def _args(root, **kw):
    d = dict(
        source_path=root, images_dir="images", downsampling=2.0,
        max_size_slam=64, start_at=0, end_at=0, seq_length=0,
        image_sampling=0, dataset_name="colmap", test_hold=-1,
        calib=None, init_focal=-1.0, init_fov=-1.0, optimize_focal=False,
    )
    d.update(kw)
    return types.SimpleNamespace(**d)


def test_colmap_dataset_loads_calib_and_poses(tmp_path):
    root = str(tmp_path)
    names, gt_twc = _make_scene(root)
    ds = load_dataset(_args(root))
    assert len(ds) == len(names)
    # intrinsics from the model, not the 0.7*W = 44.8 guess
    # (getOptimalNewCameraMatrix re-centers and may rescale by ~2%)
    np.testing.assert_allclose(ds.transform.K_best[0, 0], 60.0, rtol=0.03)
    np.testing.assert_allclose(ds.transform.K_best[1, 1], 62.0, rtol=0.03)
    # GT poses: Twc_gt = inverse of the stored world->cam
    assert ds.Twc_gt is not None and np.isfinite(ds.Twc_gt).all()
    for i, name in enumerate(names):
        t_wc, R_wc = gt_twc[name]
        np.testing.assert_allclose(ds.Twc_gt[i, :3], t_wc, atol=1e-6)
        R_got = _quat_wxyz_to_matrix(
            ds.Twc_gt[i, 6], *ds.Twc_gt[i, 3:6]
        )
        np.testing.assert_allclose(R_got, R_wc, atol=1e-6)
    img, info = ds[0]
    assert img.shape == (48, 64, 3)
    assert "Twc_gt" in info


def test_colmap_autodetect_from_selfcaptured(tmp_path):
    root = str(tmp_path)
    _make_scene(root)
    ds = load_dataset(_args(root, dataset_name="selfCaptured"))
    assert isinstance(ds, ColmapDataset)


def test_quat_roundtrip():
    rng = np.random.RandomState(1)
    for _ in range(20):
        axis = rng.randn(3)
        axis /= np.linalg.norm(axis)
        ang = rng.rand() * 3.0
        qw = np.cos(ang / 2)
        qx, qy, qz = np.sin(ang / 2) * axis
        R = _quat_wxyz_to_matrix(qw, qx, qy, qz)
        x, y, z, w = _matrix_to_quat_xyzw(R)
        R2 = _quat_wxyz_to_matrix(w, x, y, z)
        np.testing.assert_allclose(R, R2, atol=1e-9)
