"""Fetch + unpack the evaluation datasets (TUM / MipNeRF360 / StaticHikes).

Reference: ``Reconstruct/scripts/download_datasets.py`` (the on-the-fly-nvs
dataset mirror).  Produces the directory layout ``scripts/train_eval_all.py``
expects: ``<out_dir>/<Dataset>/<scene>/images``.

In an air-gapped environment (no egress) this script reports the URLs it
would fetch and exits non-zero, so automation notices instead of silently
training on nothing.
"""

import argparse
import os
import sys
import urllib.error
import urllib.request
import zipfile

MIRROR = "https://repo-sam.inria.fr/nerphys/on-the-fly-nvs/datasets"
DATASETS = ("TUM", "MipNeRF360", "StaticHikes")


def fetch(url: str, dest_dir: str) -> str:
    os.makedirs(dest_dir, exist_ok=True)
    local = os.path.join(dest_dir, os.path.basename(url))
    print(f"downloading {url} -> {local}", flush=True)
    urllib.request.urlretrieve(url, local)
    return local


def unpack(zip_path: str, dest_dir: str):
    print(f"extracting {zip_path}", flush=True)
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(dest_dir)
    os.remove(zip_path)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--datasets", nargs="+", default=list(DATASETS),
                    choices=list(DATASETS))
    ap.add_argument("--out_dir", default="data")
    args = ap.parse_args()

    failures = []
    for name in args.datasets:
        url = f"{MIRROR}/{name}.zip"
        try:
            unpack(fetch(url, args.out_dir), args.out_dir)
        except (urllib.error.URLError, OSError) as e:
            print(f"FAILED {url}: {e}", file=sys.stderr)
            failures.append(url)
    if failures:
        print("no network access? fetch these manually and unzip into "
              f"{args.out_dir}:", file=sys.stderr)
        for u in failures:
            print(f"  {u}", file=sys.stderr)
        sys.exit(1)
    print("done")


if __name__ == "__main__":
    main()
