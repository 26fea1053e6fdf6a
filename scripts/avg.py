"""Average a metric across JSON result files (reference scripts/avg.py)."""

import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--key", default="PSNR")
    args = ap.parse_args()
    vals = []
    for f in args.files:
        m = json.loads(Path(f).read_text())
        v = m.get(args.key, m.get("metrics", {}).get(args.key))
        if isinstance(v, (int, float)):
            vals.append(v)
    if vals:
        print(f"{args.key}: mean={sum(vals)/len(vals):.4f} n={len(vals)}")
    else:
        print("no values found")


if __name__ == "__main__":
    main()
