"""Batch-downsample an image folder (reference scripts/downsampleImage.py)."""

import argparse
import os


def main():
    import cv2

    ap = argparse.ArgumentParser()
    ap.add_argument("images_dir")
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--factor", type=float, default=2.0)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for n in sorted(os.listdir(args.images_dir)):
        if not n.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        img = cv2.imread(os.path.join(args.images_dir, n))
        out = cv2.resize(img, (0, 0), fx=1 / args.factor, fy=1 / args.factor,
                         interpolation=cv2.INTER_AREA)
        cv2.imwrite(os.path.join(args.out, n), out)
    print("done")


if __name__ == "__main__":
    main()
