"""Dataset evaluation matrix (reference Reconstruct/scripts/train_eval_all.py).

Per-scene test_hold pins of record: TUM fr1_desk/fr2_xyz/fr3_long_office (30);
MipNeRF360 garden/bonsai/counter (8); StaticHikes forest1/forest2/university2
(10).
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path

MATRIX = {
    "tum": {
        "scenes": ["rgbd_dataset_freiburg1_desk", "rgbd_dataset_freiburg2_xyz",
                   "rgbd_dataset_freiburg3_long_office_household"],
        "test_hold": 30,
        "dataset_name": "tum",
    },
    "mipnerf360": {
        "scenes": ["garden", "bonsai", "counter"],
        "test_hold": 8,
        "dataset_name": "selfCaptured",
    },
    "statichikes": {
        "scenes": ["forest1", "forest2", "university2"],
        "test_hold": 10,
        "dataset_name": "selfCaptured",
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--datasets", nargs="+", default=list(MATRIX),
                    choices=list(MATRIX))
    ap.add_argument("--save_root", default="results/train_eval_all")
    ap.add_argument("--downsampling", type=float, default=2.0)
    ap.add_argument("--extra", default="")
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args()

    for ds in args.datasets:
        spec = MATRIX[ds]
        for scene in spec["scenes"]:
            scene_path = Path(args.data_root) / ds / scene
            out = Path(args.save_root) / ds / scene
            out.mkdir(parents=True, exist_ok=True)
            cmd = [
                sys.executable, "run_system.py",
                "-s", str(scene_path),
                "-d", spec["dataset_name"],
                "--test_hold", str(spec["test_hold"]),
                "--downsampling", str(args.downsampling),
                "-m", str(out),
            ] + (args.extra.split() if args.extra else [])
            print("+", " ".join(cmd))
            if not args.dry_run:
                subprocess.run(cmd)


if __name__ == "__main__":
    main()
