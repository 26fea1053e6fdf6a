"""Scene export tests: PLY structure, COLMAP binary roundtrip, full save."""

import os

import numpy as np
import pytest

from artdeco_tpu.mapper import scene_io


def test_write_ply_roundtrip(tmp_path):
    p = str(tmp_path / "test.ply")
    n = 10
    fields = [("x", "f4"), ("y", "f4"), ("red", "u1")]
    x = np.arange(n, dtype=np.float32)
    scene_io.write_ply(p, fields, [x, 2 * x, (x % 3).astype(np.uint8)])
    raw = open(p, "rb").read()
    header, body = raw.split(b"end_header\n", 1)
    assert b"element vertex 10" in header
    assert b"property float x" in header and b"property uchar red" in header
    rec = np.frombuffer(body, dtype=[("x", "<f4"), ("y", "<f4"), ("red", "u1")])
    np.testing.assert_allclose(rec["x"], x)
    np.testing.assert_allclose(rec["y"], 2 * x)


def test_colmap_model_roundtrip(tmp_path):
    d = str(tmp_path)
    cams = {0: dict(model_id=0, width=640, height=480,
                    params=[500.0, 320.0, 240.0])}
    q = scene_io.rotmat_to_qvec(np.eye(3))
    imgs = {0: dict(qvec=q.tolist(), tvec=[1.0, 2.0, 3.0], camera_id=0,
                    name="frame_0.png")}
    scene_io.write_colmap_model(d, cams, imgs)
    c2, i2 = scene_io.read_colmap_model(d)
    assert c2[0]["width"] == 640 and c2[0]["params"][0] == 500.0
    assert i2[0]["name"] == "frame_0.png"
    np.testing.assert_allclose(i2[0]["tvec"], [1, 2, 3])
    np.testing.assert_allclose(i2[0]["qvec"], [1, 0, 0, 0], atol=1e-9)


def test_rotmat_qvec_consistency():
    from artdeco_tpu.geometry import lie
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    for _ in range(5):
        q_xyzw = rng.randn(4)
        q_xyzw /= np.linalg.norm(q_xyzw)
        R = np.asarray(lie.quat_to_matrix(jnp.asarray(q_xyzw, jnp.float32)))
        q_colmap = scene_io.rotmat_to_qvec(R)  # (w, x, y, z)
        expect = np.asarray([q_xyzw[3], *q_xyzw[:3]])
        if expect[0] < 0:
            expect = -expect
        np.testing.assert_allclose(q_colmap, expect, atol=1e-5)


def test_full_scene_save(tmp_path):
    """Build a small trained scene and save everything."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "tm", os.path.join(os.path.dirname(__file__), "test_mapper.py")
    )
    tm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tm)
    np.random.seed(0)
    sm = tm.SceneModel(tm.W, tm.H, tm.K, tm.CFG, seed=0)
    kf0, Rt0 = tm._plane_keyframe(0)
    sm.add_keyframe(kf0, Rt0)
    sm.add_new_gaussians(0)
    kf1, Rt1 = tm._plane_keyframe(1, t_x=0.02, is_test=True)
    sm.add_keyframe(kf1, Rt1)
    sm.optimization_loop(3)

    out = str(tmp_path / "scene")
    metrics = sm.save(out)
    assert metrics["num gaussians"] > 0
    assert os.path.isfile(os.path.join(out, "point_clouds", "gs.ply"))
    assert os.path.isfile(os.path.join(out, "point_clouds", "xyz_rgb.ply"))
    assert os.path.isfile(os.path.join(out, "metadata.json"))
    assert os.path.isfile(os.path.join(out, "colmap", "cameras.bin"))
    assert os.path.isfile(os.path.join(out, "colmap", "images.bin"))
    assert os.path.isfile(os.path.join(out, "onthefly.txt"))
    assert os.path.isfile(os.path.join(out, "onthefly.ply"))
    # test render got written for the test keyframe
    assert os.path.isfile(os.path.join(out, "test_images", "00001.png"))
    # gaussian ply parses: header field count matches
    raw = open(os.path.join(out, "point_clouds", "gs.ply"), "rb").read()
    n_props = raw.split(b"end_header")[0].count(b"property")
    k = (tm.CFG.sh_degree + 1) ** 2
    assert n_props == 3 + 3 + 3 + 3 * (k - 1) + 1 + 3 + 4
    # colmap readable
    cams, imgs = scene_io.read_colmap_model(os.path.join(out, "colmap"))
    assert len(cams) == 2 and len(imgs) == 2
    # finetune epoch runs
    sm.finetune_epoch()
    assert sm.n_active_gaussians > 0
