"""Assemble images into a video (reference scripts/img2vid.py)."""

import argparse
import os


def main():
    import cv2

    ap = argparse.ArgumentParser()
    ap.add_argument("images_dir")
    ap.add_argument("-o", "--out", default="out.mp4")
    ap.add_argument("--fps", type=int, default=30)
    args = ap.parse_args()
    names = sorted(
        n for n in os.listdir(args.images_dir)
        if n.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if not names:
        raise SystemExit("no images found")
    first = cv2.imread(os.path.join(args.images_dir, names[0]))
    h, w = first.shape[:2]
    vw = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*"mp4v"),
                         args.fps, (w, h))
    for n in names:
        vw.write(cv2.imread(os.path.join(args.images_dir, n)))
    vw.release()
    print(f"wrote {args.out} ({len(names)} frames)")


if __name__ == "__main__":
    main()
