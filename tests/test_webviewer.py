"""WebViewer protocol tests: state header + all three render modes.

Reference surface: ``Reconstruct/webviewer/webviewer.py:23-111`` (JSON state
header -> client camera state -> JPEG reply) and the GaussianViewer render
mode picker ["Splats", "Depth", "Ellipsoids"] (gaussianviewer.py:96)."""

import json

import numpy as np
import pytest

from artdeco_tpu.mapper.config import MapperConfig
from artdeco_tpu.mapper.scene_model import SceneModel
from artdeco_tpu.runtime.webviewer import WebViewer

W, H = 64, 48
K = [[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]]

CFG = MapperConfig(
    capacity=2048, cluster_capacity=512, voxel_table_size=2048,
    new_budget=512, keyframe_capacity=16, sh_degree=1, local_feat_dim=8,
    global_feat_dim=8, pyr_levels=1, gs_add_ratio=1.0,
    init_proba_scaler=4.0,
)


@pytest.fixture(scope="module")
def scene():
    import jax.numpy as jnp

    from artdeco_tpu.mapper.keyframe import make_host_keyframe

    rng = np.random.RandomState(0)
    sm = SceneModel(W, H, K, CFG, seed=0)
    img = rng.rand(3, H, W).astype(np.float32)
    depth = 2.0 + 0.2 * rng.rand(H, W).astype(np.float32)
    u, v = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    pts = np.stack([
        (u - W / 2) / 60.0 * depth, (v - H / 2) / 60.0 * depth, depth,
    ], axis=-1).astype(np.float32)
    kf = make_host_keyframe(
        index=0, global_frame_id=0, image=img, point_map=pts,
        point_conf=np.ones((H, W), np.float32), is_test=False,
        is_slam_keyframe=True, pyr_levels=1, image_name="kf0", timestamp=0.0,
    )
    sm.add_keyframe(kf, np.eye(4, dtype=np.float32))
    sm.add_new_gaussians()
    return sm


def test_state_header(scene):
    viewer = WebViewer(scene)
    header = json.loads(viewer._state_header())
    assert header["trainer_state"] == "training"
    assert len(header["mean_pose"]) == 16
    assert header["n_keyframes"] == 1


@pytest.mark.parametrize("mode", ["splat", "depth", "ellipsoid"])
def test_render_modes(scene, mode):
    pytest.importorskip("cv2")
    viewer = WebViewer(scene)
    pose = np.eye(4)
    pose[:3, 1] *= -1   # client Y-up convention (server flips back)
    pose[:3, 2] *= -1
    data = dict(res_x=64, res_y=48, pose=pose.T.flatten().tolist(),
                snapToLast=False, mode=mode, state="play")
    buf = viewer._render_reply(data)
    assert buf[:2] == b"\xff\xd8"   # JPEG SOI
    assert len(buf) > 100


def test_snap_to_last(scene):
    pytest.importorskip("cv2")
    viewer = WebViewer(scene)
    data = dict(res_x=64, res_y=48, pose=np.eye(4).flatten().tolist(),
                snapToLast=True, state="play")
    buf = viewer._render_reply(data)
    assert buf[:2] == b"\xff\xd8"
