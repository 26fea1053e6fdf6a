"""Render turntable views of a trained run's gaussian scene to PNG frames.

Reference: ``Reconstruct/scripts/visualize_gs.py`` (an open3d point-cloud
window).  Headless TPU equivalent: loads a run directory produced by
``run_system.py`` / ``SceneModel.save`` and drives the repo's own
GaussianViewer orbit renderer — splat / depth / alpha modes — writing PNG
frames (and optionally an mp4 via scripts/img2vid.py).

Usage:
  python scripts/visualize_gs.py results/run1 --frames 60 --mode splat
"""

import argparse
import os
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run_dir", help="run output dir (contains pcd/, "
                                    "metadata)")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--mode", default="splat",
                    choices=["splat", "depth", "alpha"])
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--out", default=None,
                    help="output dir (default RUN_DIR/turntable)")
    args = ap.parse_args()

    from artdeco_tpu.mapper.scene_io import load_scene_for_viewing
    from artdeco_tpu.runtime.gaussianviewer import GaussianViewer

    scene = load_scene_for_viewing(args.run_dir)
    viewer = GaussianViewer(scene, width=args.width, height=args.height)
    out_dir = args.out or os.path.join(args.run_dir, "turntable")
    viewer.export_turntable(out_dir, n_frames=args.frames, mode=args.mode)
    print(f"wrote {args.frames} frames to {out_dir} "
          f"(make a video: python scripts/img2vid.py {out_dir})")


if __name__ == "__main__":
    main()
