"""Validate that every prewarmed executable is the one the runtime actually
uses: run prewarm_system(sync=True) on CPU, then stream frames with
``jax_explain_cache_misses`` — any listed function that misses the tracing
cache after the drain has an aval/static mismatch with its prewarm lowering
(weak_type being the classic silent one; see r5 GlobalFeats.lr).

Pure CPU: validates aval matching without TPU time.  Exit code 1 when a
prewarmed function misses.
"""

import logging
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["ARTDECO_FORCE_PREWARM"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_explain_cache_misses", True)

import numpy as np

# functions whose prewarm must be hit by the stream (names as they appear in
# jax's cache-miss explanations)
PREWARMED = {
    "_match_cascade", "track_step", "_edge_post", "_dense_point_jit",
    "_keyframe_point_jit", "render_from_pool_jit", "_build_pyramids_jit",
    "densify_all_lods_core", "insert", "_densify_prune_core",
    "optimization_burst_core", "weed_core", "_fuse_pointmap_jit",
    "_avg_conf_jit", "_rel_pose_jit", "_rel_sim3_jit",
    "_cross_writeback_jit", "register_keyframe", "_cam_centres_jit",
    "_high_water_jit", "_densify_counts_probe", "_set_poses_masked_jit",
    "rigid_transform", "update_clusters", "_densify_counts_jit",
    "_gather_pair_rows", "_stack_stale", "_gn_prep_jit", "_slice_edges",
    "_gn_calib_impl", "grow",
}


def main(n_frames=16):
    records = []

    class H(logging.Handler):
        def emit(self, rec):
            records.append(rec.getMessage())

    for name in ("jax._src.pjit", "jax._src.interpreters.pxla", "jax"):
        lg = logging.getLogger(name)
        lg.setLevel(logging.WARNING)
        lg.addHandler(H())

    from artdeco_tpu.dataio.dataset import SyntheticDataset
    from artdeco_tpu.mapper.config import MapperConfig
    from artdeco_tpu.models.oracle import OracleRunner
    from artdeco_tpu.runtime.system import System, _MapperWorker, _UploadAhead
    from artdeco_tpu.utils.config import load_config

    args = types.SimpleNamespace(
        source_path="", images_dir="images", downsampling=2.0,
        max_size_slam=128, start_at=0, end_at=0, seq_length=0,
        image_sampling=0, dataset_name="synthetic", test_hold=-1,
        calib=None, init_focal=-1.0, init_fov=-1.0, optimize_focal=False,
        covariance_filter=True, point_fusion_frontend=True,
        use_all_frames=False, use_same_set_of_keyframes=False,
        min_displacement=0.03, thres_keyframe=0.8, num_GBA=1,
        num_key_iterations=4, num_common_iterations=2,
        sh_degree=1, local_feat_dim=8, global_feat_dim=8, pyr_levels=1,
        accurate_loop_closure=False, model_size="tiny",
        retrieval_checkpoint_path="", pi3_checkpoint_path="",
        max_active_keyframes=64, prewarm=True,
    )
    dataset = SyntheticDataset(args, n_frames=n_frames, width=256, height=144)
    config = load_config("config/base.yaml")
    config["tracking"]["match_frac_thresh"] = 0.95
    runner = OracleRunner((dataset.H_slam, dataset.W_slam), dataset.K_slam,
                          config["matching"])
    for i in range(len(dataset)):
        img, info = dataset[i]
        T = np.zeros(8, np.float32)
        T[:7] = info["Twc_gt"]
        T[7] = 1.0
        runner.register(dataset.transform.to_slam(img), i, T)

    mcfg = MapperConfig(
        capacity=1 << 13, initial_capacity=1 << 12, new_budget=1 << 10,
        cluster_capacity=1 << 8, voxel_table_size=1 << 10,
        vis_budget_init=1 << 11,
        keyframe_capacity=64, sh_degree=1, local_feat_dim=8,
        global_feat_dim=8, pyr_levels=1, gs_add_ratio=1.0,
        init_proba_scaler=4.0,
    )
    system = System(args, config, dataset, runner, mapper_cfg=mcfg)
    from artdeco_tpu.runtime import prewarm

    prewarm.wait_all()
    records.clear()          # misses during prewarm/setup are expected

    worker = _MapperWorker(system)
    frames = iter(_UploadAhead(
        (dataset[i] for i in range(n_frames)), dataset.transform,
    ))
    for i in range(n_frames):
        img, info = next(frames)
        msg = system.frontend.process_frame(img, info)
        if msg is not None:
            work = system.backend.process_sync(msg)
            if work is not None:
                worker.submit(work)
    worker.close()

    bad = set()
    for msg in records:
        if "TRACING CACHE MISS" not in msg and "cache miss" not in msg.lower():
            continue
        for name in PREWARMED:
            if f"jit({name})" in msg or f"'{name}'" in msg or f" {name} " in msg:
                bad.add(name)
                print("MISS:", msg[:1200], "\n---")
    if bad:
        print("\nprewarm aval mismatches:", sorted(bad))
        sys.exit(1)
    print(f"OK: no prewarmed function re-traced during {n_frames} frames "
          f"({len(records)} total cache-miss records, none prewarmed)")


if __name__ == "__main__":
    main()
