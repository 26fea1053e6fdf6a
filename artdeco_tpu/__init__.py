"""artdeco_tpu — TPU-native on-the-fly 3D reconstruction framework.

A from-scratch JAX/XLA/Pallas re-architecture of InternRobotics/ARTDECO
(see SURVEY.md at the repo root for the reference blueprint): a monocular RGB
stream is tracked by a MASt3R two-view pointmap VSLAM frontend with Sim(3)
pose optimization, globally corrected by a loop-closing backend (ASMK
retrieval + factor-graph Gauss-Newton), and simultaneously mapped into a
LOD 3D-Gaussian-Splatting scene optimized online.

Subpackages:
  geometry  — Sim3/SE3 Lie math, projection Jacobians, robust weights
  ops       — Pallas/XLA kernels: matching, rasterizer, SSIM, adam, knn, GN
  models    — MASt3R (ViT-L + cross decoder + DPT), Pi3, ASMK retrieval
  vslam     — tracker, frontend, backend, factor graph, keyframe store
  mapper    — LOD Gaussian scene model, per-keyframe params, optimizers
  parallel  — device mesh / shard_map sharding helpers
  dataio    — datasets, camera models, COLMAP/TUM IO, CLI args
  runtime   — streaming system loop, profiling
  eval      — PSNR/SSIM/LPIPS, trajectory ATE/RPE
"""

__version__ = "0.1.0"
