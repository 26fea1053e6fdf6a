"""Driver benchmark: end-to-end mapper throughput on real TPU hardware.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures the mapper's online-reconstruction rate: full optimization steps
(render fwd+bwd at map resolution + all Adam updates) per second on a
realistic synthetic scene, converted to equivalent streaming FPS given the
reference schedule of record (20 key-iters per keyframe, ~1 keyframe per 10
frames -> 2 optimization iterations per streamed frame).  Baseline: the
driver north star of 30 FPS end-to-end (BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from artdeco_tpu.mapper.config import MapperConfig
    from artdeco_tpu.mapper.keyframe import make_host_keyframe
    from artdeco_tpu.mapper.scene_model import SceneModel

    W, H = 480, 270          # map resolution (960x540 / downsampling 2)
    F = 300.0
    K = [[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]]
    cfg = MapperConfig(
        capacity=1 << 17, initial_capacity=1 << 13, new_budget=1 << 13, pyr_levels=1,
        cluster_capacity=1 << 13, voxel_table_size=1 << 16,
        keyframe_capacity=256, gs_add_ratio=1.0,
    )
    sm = SceneModel(W, H, K, cfg, seed=0)

    rng = np.random.RandomState(0)
    u, v = np.meshgrid(np.arange(W), np.arange(H))

    def make_kf(i, tx):
        img = np.stack([
            0.5 + 0.4 * np.sin(u / 9.0 + tx),
            0.5 + 0.4 * np.cos(v / 7.0),
            0.5 + 0.3 * np.sin((u + v) / 11.0),
        ]).astype(np.float32).clip(0, 1)
        depth = (2.0 + 0.3 * np.sin(u / 20.0) * np.cos(v / 15.0)).astype(np.float32)
        pm = np.stack([(u - W / 2) / F * depth, (v - H / 2) / F * depth, depth],
                      axis=-1).astype(np.float32)
        kf = make_host_keyframe(
            index=i, global_frame_id=i * 10, image=img, point_map=pm,
            point_conf=np.ones((H, W), np.float32), is_test=False,
            is_slam_keyframe=True, pyr_levels=1,
        )
        Rt = np.eye(4, dtype=np.float32)
        Rt[0, 3] = tx
        return kf, Rt

    for i in range(3):
        kf, Rt = make_kf(i, 0.05 * i)
        sm.add_keyframe(kf, Rt)
        sm.add_new_gaussians(i)

    # warmup / compile
    sm.optimization_loop(3)
    n_gauss = sm.n_active_gaussians

    import jax

    jax.block_until_ready(sm.slab.xyz)
    iters = 40
    t0 = time.time()
    sm.optimization_loop(iters)
    jax.block_until_ready(sm.slab.xyz)   # honest timing: wait for the work
    dt = time.time() - t0
    iters_per_s = iters / dt
    # reference schedule: ~2 mapper iterations per streamed frame
    equiv_fps = iters_per_s / 2.0

    print(json.dumps({
        "metric": "mapper_equiv_fps",
        "value": round(equiv_fps, 2),
        "unit": f"frames/s (opt-iters/s={iters_per_s:.1f}, gaussians={n_gauss}, {W}x{H})",
        "vs_baseline": round(equiv_fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
