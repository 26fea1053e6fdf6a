"""Warm per-stage timing of the streaming pipeline on the live backend.

Runs the oracle pipeline for a few frames (everything compiles / state
fills), then times each stage in isolation with true device syncs:

  * one tracking cascade + fused track step (the per-frame cost)
  * symmetric match at bucket sizes (the per-keyframe add_factors cost)
  * one GN solve at the graph's current size
  * one mapper iteration and a full 20-iteration burst
  * raw tunnel costs: scalar sync round-trip, 1.7 MB h2d, 2.3 MB d2h

Output tells us where the next factor of 2 lives (BENCH r4 steady state:
track ~450 ms / backend-sync ~2.5 s per keyframe).
"""

import sys
import time
import types

import numpy as np

sys.path.insert(0, ".")


def log(m):
    print(m, file=sys.stderr, flush=True)


def sync(x):
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


def timeit(name, fn, out_of, n=8):
    fn_out = fn()
    sync(out_of(fn_out))          # warm + ensure queue empty
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn()
    sync(out_of(o))
    dt = (time.perf_counter() - t0) / n
    log(f"  {name}: {1000 * dt:.1f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from artdeco_tpu.dataio.dataset import SyntheticDataset
    from artdeco_tpu.mapper.config import MapperConfig
    from artdeco_tpu.models.oracle import OracleRunner
    from artdeco_tpu.runtime.system import System
    from artdeco_tpu.utils.cache import setup_compilation_cache
    from artdeco_tpu.utils.config import load_config

    setup_compilation_cache()
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
    dataset = SyntheticDataset(args, n_frames=24, width=1024, height=576)
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
        capacity=1 << 18, initial_capacity=1 << 14, new_budget=1 << 14,
        cluster_capacity=1 << 13, voxel_table_size=1 << 16,
        keyframe_capacity=256, sh_degree=3, local_feat_dim=16,
        global_feat_dim=16, pyr_levels=2, gs_add_ratio=1.0,
        init_proba_scaler=4.0,
    )
    system = System(args, config, dataset, runner, mapper_cfg=mcfg)

    log("warming: streaming 24 frames (sequential)...")
    t0 = time.time()
    for i in range(24):
        img, info = dataset[i]
        msg = system.frontend.process_frame(img, info)
        if msg is not None:
            work = system.backend.process_sync(msg)
            if work is not None:
                mm = system.backend.process_async(work)
                if mm is not None:
                    system._handle_mapper_msg(mm)
        system.n_frames += 1
    log(f"warm done in {time.time() - t0:.0f}s, "
        f"kf={len(system.keyframes)}, gs={system.scene_model.n_active_gaussians}")

    h, w = dataset.H_slam, dataset.W_slam
    sm = system.scene_model
    fg = system.backend.factor_graph
    tracker = system.frontend.tracker

    # ---- raw tunnel costs -------------------------------------------------
    one = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(20):
        sync(one)
    log(f"  scalar sync round-trip: {1000 * (time.perf_counter() - t0) / 20:.1f} ms")

    img_host = np.random.rand(3, h, w).astype(np.float32)
    t0 = time.perf_counter()
    for _ in range(8):
        d = jnp.asarray(img_host)
        sync(d)
    log(f"  h2d 3x{h}x{w} ({img_host.nbytes / 1e6:.1f} MB) + sync: "
        f"{1000 * (time.perf_counter() - t0) / 8:.1f} ms")

    dev_map = jnp.zeros((h, w, 3))
    t0 = time.perf_counter()
    for _ in range(8):
        _ = np.asarray(dev_map)
    log(f"  d2h {h}x{w}x3 ({dev_map.nbytes / 1e6:.1f} MB): "
        f"{1000 * (time.perf_counter() - t0) / 8:.1f} ms")

    # ---- tracking stage ----------------------------------------------------
    kf_idx = system.keyframes.last_index()
    keyframe = system.keyframes[kf_idx]
    frame_img = runner._dev_cache[22][0]  # any registered frame
    img22, _ = dataset[22]
    slam22 = jnp.asarray(dataset.transform.to_slam(img22))

    timeit(
        "match_asymmetric (cascade b=1, incl oracle glue)",
        lambda: runner.match_asymmetric(
            slam22, keyframe.img, embeddings_j=tracker.last_embedding),
        lambda o: o[0],
    )

    from artdeco_tpu.vslam.frame import Frame
    fr = Frame.create(slam22, frame_id=22, frame_time=22.0,
                      T_WC=jnp.asarray(system.keyframes.T_WC[kf_idx]))
    (idx_f2k, vmk, Xff, Cff, Qff, Xkf, Ckf, Qkf, _, _) = (
        runner.match_asymmetric(slam22, keyframe.img,
                                embeddings_j=tracker.last_embedding))
    from artdeco_tpu.vslam import tracker as trk
    timeit(
        "track_step (fused LM + gates)",
        lambda: trk.track_step(
            Xff, Cff, fr.X_canon, fr.C, fr.N,
            Xkf, Ckf, keyframe.X_canon, keyframe.C, keyframe.N,
            idx_f2k, vmk, Qff, Qkf,
            fr.T_WC, keyframe.T_WC, tracker.K_slam,
            jnp.asarray(0.0, jnp.float32),
            float(tracker.min_displacement), (h, w), tracker.cfg,
            thres_keyframe=float(tracker.thres_keyframe),
            optimize_focal=tracker.optimize_focal,
            covariance_filter=tracker.covariance_filter,
        ),
        lambda o: o[-1],
    )

    # ---- backend stages ----------------------------------------------------
    for b in (1, 2, 4):
        ids_i = [max(0, kf_idx - 1 - j) for j in range(b)]
        feat_i = jnp.concatenate(
            [system.keyframes.get_embedding(i)[0] for i in ids_i], axis=0)
        pos_i = jnp.concatenate(
            [system.keyframes.get_embedding(i)[1] for i in ids_i], axis=0)
        feat_j = jnp.concatenate(
            [system.keyframes.get_embedding(kf_idx)[0]] * b, axis=0)
        pos_j = jnp.concatenate(
            [system.keyframes.get_embedding(kf_idx)[1]] * b, axis=0)
        timeit(
            f"match_symmetric b={b} ({2 * b} cascades)",
            lambda: runner.match_symmetric(feat_i, pos_i, feat_j, pos_j,
                                           (h, w)),
            lambda o: o[0],
        )

    # ---- cascade component scaling (why is the batched cascade
    # superlinear?) ----------------------------------------------------------
    from artdeco_tpu.ops import matching as M

    f0 = runner._dev(20)
    f1 = runner._dev(21)
    n_hw = h * w
    for b in (1, 2, 4, 8):
        X11 = jnp.stack([f0[0].reshape(h, w, 3)] * b)
        X21 = jnp.stack([runner._cross_dev(21, 20).reshape(h, w, 3)] * b)
        D11 = jnp.stack([f0[1].reshape(h, w, -1)] * b)
        D21f = jnp.stack([f1[1]] * b)
        rwg, ptn, pin = M.prep_for_iter_proj(X11, X21, None)
        rwg.block_until_ready()
        timeit(f"  iter_proj b={b}",
               lambda: M.iter_proj(rwg, ptn, pin, max_iter=10),
               lambda o: o[0], n=4)
        uu, vv = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
        p_dummy = jnp.tile(
            jnp.stack([uu, vv], -1).reshape(1, n_hw, 2), (b, 1, 1)
        ).astype(jnp.int32)
        timeit(f"  refine_dense b={b}",
               lambda: M.refine_matches(D11, D21f, p_dummy, radius=4,
                                        dilation_max=5,
                                        compute_dtype=jnp.bfloat16),
               lambda o: o, n=4)
        cfg_m = config["matching"]
        D21img = D21f.reshape(b, h, w, -1)
        timeit(f"  full cascade b={b}",
               lambda: M.match(cfg_m, X11, X21, D11, D21img, None),
               lambda o: o[0], n=4)

    timeit("GN solve (current graph: "
           f"{len(fg.ii)} pairs, {fg.n_directed} directed)",
           lambda: (fg.solve_GN_calib(), jnp.zeros(()))[1],
           lambda o: o, n=4)

    # ---- mapper ------------------------------------------------------------
    log(f"  [gaussians active: {sm.n_active_gaussians}, "
        f"slab capacity: {sm.slab.xyz.shape[0]}]")
    # optimization_step/loop return None on an empty scene — guard so the
    # probe times a no-op instead of raising TypeError
    timeit("mapper single iteration",
           lambda: (sm.optimization_step(is_important=True)
                    or {}).get("loss", jnp.zeros(())),
           lambda o: o, n=4)
    timeit("mapper 20-iteration burst",
           lambda: (sm.optimization_loop(20, is_important=True)
                    or {}).get("loss", jnp.zeros(())),
           lambda o: o, n=2)
    timeit("render_from_id (full res, fwd only)",
           lambda: sm.render_from_id(len(sm.keyframes) - 1),
           lambda o: o["render"], n=4)
    timeit("densify (add_new_gaussians)",
           lambda: (sm.add_new_gaussians(len(sm.keyframes) - 1),
                    sm.slab.opacity)[1],
           lambda o: o, n=2)


if __name__ == "__main__":
    main()
