"""Aggregate PSNR/time metrics from result trees (reference scripts/report.py).

Scrapes metadata.json files under --results_root, prints a per-scene table
and averages per setup.
"""

import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results_root", default="results")
    args = ap.parse_args()

    rows = []
    for meta_path in sorted(Path(args.results_root).rglob("metadata.json")):
        try:
            m = json.loads(meta_path.read_text())
        except Exception:
            continue
        rows.append({
            "run": str(meta_path.parent.relative_to(args.results_root)),
            "PSNR": m.get("PSNR", m.get("metrics", {}).get("PSNR")),
            "SSIM": m.get("SSIM", m.get("metrics", {}).get("SSIM")),
            "time": m.get("time"),
            "FPS": m.get("FPS"),
            "gaussians": m.get("num gaussians", m.get("n_gaussians")),
        })
    if not rows:
        print("no metadata.json found")
        return
    keys = ["run", "PSNR", "SSIM", "time", "FPS", "gaussians"]
    print(" | ".join(f"{k:>24}" for k in keys))
    for r in rows:
        print(" | ".join(
            f"{r.get(k):>24.3f}" if isinstance(r.get(k), float)
            else f"{str(r.get(k)):>24}" for k in keys
        ))
    # setup averages
    by_setup = {}
    for r in rows:
        setup = r["run"].split("/")[0]
        by_setup.setdefault(setup, []).append(r)
    print("\naverages:")
    for setup, rs in by_setup.items():
        psnrs = [r["PSNR"] for r in rs if isinstance(r["PSNR"], (int, float))]
        if psnrs:
            print(f"  {setup}: PSNR {sum(psnrs)/len(psnrs):.3f} (n={len(psnrs)})")


if __name__ == "__main__":
    main()
