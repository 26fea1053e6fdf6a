"""Full-system integration: synthetic clip -> tracking + GN + mapping.

The oracle runner supplies ground-truth pointmaps (a perfectly-trained
model), so the entire pipeline's correctness — matching cascade, Sim(3)
tracking, keyframe logic, backend GN, dense points, mapper training,
trajectory evaluation, and save outputs — is tested end to end.
"""

import os
import types

import numpy as np
import pytest

from artdeco_tpu.dataio.dataset import SyntheticDataset
from artdeco_tpu.mapper.config import MapperConfig
from artdeco_tpu.models.oracle import OracleRunner
from artdeco_tpu.runtime.system import System
from artdeco_tpu.utils.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _args(**kw):
    d = dict(
        source_path="", images_dir="images", downsampling=2.0,
        max_size_slam=128, start_at=0, end_at=0, seq_length=0,
        image_sampling=0, dataset_name="synthetic", test_hold=8,
        calib=None, init_focal=-1.0, init_fov=-1.0, optimize_focal=False,
        covariance_filter=False, point_fusion_frontend=True,
        use_all_frames=False, use_same_set_of_keyframes=False,
        min_displacement=0.03, thres_keyframe=0.8, num_GBA=1,
        num_key_iterations=6, num_common_iterations=2,
        sh_degree=1, local_feat_dim=8, global_feat_dim=8, pyr_levels=1,
    )
    d.update(kw)
    return types.SimpleNamespace(**d)


@pytest.fixture(scope="module")
def ran_system(tmp_path_factory):
    args = _args()
    dataset = SyntheticDataset(args, n_frames=16, width=160, height=120)
    cfg = load_config(os.path.join(REPO, "config/base.yaml"))
    cfg["matching"]["radius"] = 1
    cfg["matching"]["dilation_max"] = 1
    cfg["matching"]["dist_thresh"] = 0.05

    runner = OracleRunner(
        (dataset.H_slam, dataset.W_slam), dataset.K_slam, cfg["matching"]
    )
    # pre-register every frame's GT pose with the oracle
    for i in range(len(dataset)):
        img, info = dataset[i]
        img_slam = dataset.transform.to_slam(img)
        T = np.zeros(8, np.float32)
        T[:7] = info["Twc_gt"]
        T[7] = 1.0
        runner.register(img_slam, i, T)

    mcfg = MapperConfig(
        capacity=4096, cluster_capacity=1024, voxel_table_size=4096,
        new_budget=1024, keyframe_capacity=64, sh_degree=1,
        local_feat_dim=8, global_feat_dim=8, pyr_levels=1,
        gs_add_ratio=1.0, init_proba_scaler=4.0,
    )
    sys_ = System(args, cfg, dataset, runner, mapper_cfg=mcfg)
    sys_.run(progress=False)
    out = str(tmp_path_factory.mktemp("out"))
    meta = sys_.save(out)
    return sys_, meta, out


def test_system_tracks_all_frames(ran_system):
    sys_, meta, out = ran_system
    assert sys_.n_frames == 16
    assert sys_.frontend.lost_number == 0
    assert len(sys_.keyframes) >= 1
    assert sys_.mapper_index >= 1


def test_system_trajectory_accuracy(ran_system):
    sys_, meta, out = ran_system
    traj = meta["trajectory"]
    assert "APE" in traj, traj
    # oracle pointmaps + GT-consistent matching: cm-level ATE on a 30cm path
    assert traj["APE"]["rmse"] < 0.03, traj


def test_system_mapper_metrics(ran_system):
    sys_, meta, out = ran_system
    assert meta["n_gaussians"] > 100
    if meta["metrics"].get("n_test_frames", 0) > 0:
        assert np.isfinite(meta["metrics"]["PSNR"])


def test_system_save_outputs(ran_system):
    sys_, meta, out = ran_system
    assert os.path.isfile(os.path.join(out, "metadata.json"))
    assert os.path.isfile(os.path.join(out, "slam", "frames.txt"))
    assert os.path.isfile(os.path.join(out, "slam", "keyframes.txt"))
    assert os.path.isfile(os.path.join(out, "slam", "lost_percentage.txt"))


def test_system_multichip_dp(tmp_path):
    """run_system --n_devices 8 path: System builds the dp mesh over the 8
    virtual CPU devices and the mapper trains through the shard_map step
    (VERDICT r2 task 7 — product integration of parallel/dp.py)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    args = _args(n_devices=8, num_key_iterations=2, num_common_iterations=1)
    dataset = SyntheticDataset(args, n_frames=8, width=160, height=120)
    cfg = load_config(os.path.join(REPO, "config/base.yaml"))
    cfg["matching"]["radius"] = 1
    cfg["matching"]["dilation_max"] = 1
    cfg["matching"]["dist_thresh"] = 0.05
    runner = OracleRunner(
        (dataset.H_slam, dataset.W_slam), dataset.K_slam, cfg["matching"]
    )
    for i in range(len(dataset)):
        img, info = dataset[i]
        T = np.zeros(8, np.float32)
        T[:7] = info["Twc_gt"]
        T[7] = 1.0
        runner.register(dataset.transform.to_slam(img), i, T)
    mcfg = MapperConfig(
        capacity=4096, cluster_capacity=1024, voxel_table_size=4096,
        new_budget=1024, keyframe_capacity=64, sh_degree=1,
        local_feat_dim=8, global_feat_dim=8, pyr_levels=1,
        gs_add_ratio=1.0, init_proba_scaler=4.0,
    )
    sys_ = System(args, cfg, dataset, runner, mapper_cfg=mcfg)
    assert sys_.scene_model._mesh is not None
    assert sys_.scene_model._mesh.size == 8
    sys_.run(progress=False)
    assert sys_.scene_model.n_active_gaussians > 0
    assert sys_.scene_model._dp_steps, "dp step never used"


def test_overlap_reproduces_sequential_trajectory(tmp_path):
    """The overlapped runtime (mapper half on a worker thread) must produce
    a bit-identical trajectory to the sequential schedule: nothing on the
    worker writes tracker-visible state (VERDICT r4 task 2 determinism)."""

    def run_once(overlap):
        args = _args()
        dataset = SyntheticDataset(args, n_frames=14, width=160, height=120)
        cfg = load_config(os.path.join(REPO, "config/base.yaml"))
        cfg["matching"]["radius"] = 1
        cfg["matching"]["dilation_max"] = 1
        cfg["matching"]["dist_thresh"] = 0.05
        runner = OracleRunner(
            (dataset.H_slam, dataset.W_slam), dataset.K_slam, cfg["matching"]
        )
        for i in range(len(dataset)):
            img, info = dataset[i]
            T = np.zeros(8, np.float32)
            T[:7] = info["Twc_gt"]
            T[7] = 1.0
            runner.register(dataset.transform.to_slam(img), i, T)
        mcfg = MapperConfig(
            capacity=4096, cluster_capacity=1024, voxel_table_size=4096,
            new_budget=1024, keyframe_capacity=64, sh_degree=1,
            local_feat_dim=8, global_feat_dim=8, pyr_levels=1,
            gs_add_ratio=1.0, init_proba_scaler=4.0,
        )
        sys_ = System(args, cfg, dataset, runner, mapper_cfg=mcfg)
        sys_.run(progress=False, overlap=overlap)
        est = sys_.frontend.estimated_trajectory()
        kfs = sys_.frontend.keyframe_trajectory()
        return est, kfs, sys_.mapper_index, sys_.scene_model

    est_s, kf_s, n_map_s, _ = run_once(False)
    est_o, kf_o, n_map_o, sm_o = run_once(True)

    assert est_s.shape == est_o.shape and len(est_s) > 4
    np.testing.assert_array_equal(est_s, est_o)
    np.testing.assert_array_equal(kf_s, kf_o)
    # the worker drained every mapper message before run() returned
    assert n_map_o == n_map_s
    assert sm_o.n_active_gaussians > 0
