"""Extract frames from a video (reference scripts/video2images.py)."""

import argparse
import os


def main():
    import cv2

    ap = argparse.ArgumentParser()
    ap.add_argument("video")
    ap.add_argument("-o", "--out", default="images")
    ap.add_argument("--stride", type=int, default=1)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    cap = cv2.VideoCapture(args.video)
    i = n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % args.stride == 0:
            cv2.imwrite(os.path.join(args.out, f"{n:06d}.png"), frame)
            n += 1
        i += 1
    print(f"wrote {n} frames to {args.out}")


if __name__ == "__main__":
    main()
