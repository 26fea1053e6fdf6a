"""Identify every XLA compile that happens DURING streaming (after the
prewarm drain) — each one is a prewarm-coverage gap that lands a multi-second
stall on the per-frame critical path (BENCH r5: frame-4 keyframe cost 25 s of
bkd-sync on a warm persistent cache).

Runs the exact bench_pipeline setup (bench.py) for a handful of frames with
``jax_log_compiles`` on, and prints the compiles that fired after streaming
began.
"""

import logging
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_frames=14):
    from artdeco_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    import jax

    jax.config.update("jax_log_compiles", True)

    records = []

    class H(logging.Handler):
        def emit(self, rec):
            records.append((time.time(), rec.getMessage()))

    logging.getLogger("jax._src.dispatch").addHandler(H())
    logging.getLogger("jax._src.interpreters.pxla").addHandler(H())
    logging.getLogger("jax").setLevel(logging.DEBUG)

    from artdeco_tpu.dataio.dataset import SyntheticDataset
    from artdeco_tpu.mapper.config import MapperConfig
    from artdeco_tpu.models.oracle import OracleRunner
    from artdeco_tpu.runtime.system import System, _MapperWorker, _UploadAhead
    from artdeco_tpu.utils.config import load_config

    args = types.SimpleNamespace(
        source_path="", images_dir="images", downsampling=2.0,
        max_size_slam=512, start_at=0, end_at=0, seq_length=0,
        image_sampling=0, dataset_name="synthetic", test_hold=-1,
        calib=None, init_focal=-1.0, init_fov=-1.0, optimize_focal=False,
        covariance_filter=True, point_fusion_frontend=True,
        use_all_frames=False, use_same_set_of_keyframes=False,
        min_displacement=0.03, thres_keyframe=0.8, num_GBA=1,
        num_key_iterations=20, num_common_iterations=10,
        sh_degree=3, local_feat_dim=16, global_feat_dim=16, pyr_levels=2,
        accurate_loop_closure=False, model_size="tiny",
        retrieval_checkpoint_path="", pi3_checkpoint_path="",
        max_active_keyframes=400,
    )
    dataset = SyntheticDataset(args, n_frames=n_frames, width=1024, height=576)
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
        capacity=1 << 18, initial_capacity=1 << 17, new_budget=1 << 14,
        cluster_capacity=1 << 13, voxel_table_size=1 << 16,
        vis_budget_init=1 << 15,
        keyframe_capacity=256, sh_degree=3, local_feat_dim=16,
        global_feat_dim=16, pyr_levels=2, gs_add_ratio=1.0,
        init_proba_scaler=4.0,
    )
    system = System(args, config, dataset, runner, mapper_cfg=mcfg)
    from artdeco_tpu.runtime import prewarm

    prewarm.wait_all()
    import jax.numpy as jnp

    float(jnp.ravel(jnp.zeros(()) + 1.0)[0])   # wait out the remote backlog
    print("prewarm drained; streaming with compile logging", file=sys.stderr)
    t_stream = time.time()

    worker = _MapperWorker(system)
    frames = iter(_UploadAhead(
        (dataset[i] for i in range(n_frames)), dataset.transform,
    ))
    for i in range(n_frames):
        t0 = time.time()
        img, info = next(frames)
        msg = system.frontend.process_frame(img, info)
        if msg is not None:
            work = system.backend.process_sync(msg)
            if work is not None:
                worker.submit(work)
        print(f"frame {i}: {1000 * (time.time() - t0):.0f} ms",
              file=sys.stderr, flush=True)
    worker.close()

    print("\n=== compiles fired after streaming began ===")
    for ts, msg in records:
        if ts >= t_stream and "Compiling" in msg:
            print(f"+{ts - t_stream:7.1f}s  {msg[:160]}")


if __name__ == "__main__":
    main()
