"""Undistort TUM RGB-D sequences into the rectified layout the system trains on.

Reference: ``Reconstruct/scripts/rectify_tum.py`` — per-scene OpenCV
intrinsics of record (the TUM calibration constants), rectification to a
centred principal point with square pixels, plus validity masks.  Reads
``<scene>/rgb`` and writes ``<scene>/images`` (+ alpha) and ``<scene>/masks``.

The rectified intrinsics are also dumped to ``<scene>/calib.yaml`` so the
artdeco-tpu dataset layer can pick them up directly (--calib flag).
"""

import argparse
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# OpenCV ordering: fx, fy, cx, cy, k1, k2, p1, p2[, k3] — the published TUM
# freiburg calibrations
TUM_CALIB = {
    "TUM/rgbd_dataset_freiburg1_desk": [
        517.306408, 516.469215, 318.643040, 255.313989,
        0.262383, -0.953104, -0.005358, 0.002628, 1.163314],
    "TUM/rgbd_dataset_freiburg2_xyz": [
        520.908620, 521.007327, 325.141442, 249.701764,
        0.231222, -0.784899, -0.003257, -0.000105, 0.917205],
    "TUM/rgbd_dataset_freiburg3_long_office_household": [
        535.4, 539.2, 320.1, 247.6, 0.0, 0.0, 0.0, 0.0],
}


def rectified_K(params, h, w):
    """New camera matrix: keep all pixels (alpha=1), then square the focal."""
    K_in = np.array([[params[0], 0.0, params[2]],
                     [0.0, params[1], params[3]],
                     [0.0, 0.0, 1.0]])
    dist = np.asarray(params[4:], np.float64)
    K_out = cv2.getOptimalNewCameraMatrix(
        K_in, dist, (w, h), 1, (w, h), centerPrincipalPoint=True)[0]
    f = 0.5 * (K_out[0, 0] + K_out[1, 1])
    K_out[0, 0] = K_out[1, 1] = f
    return K_in, dist, K_out


def list_images(folder):
    exts = {".jpg", ".jpeg", ".png"}
    return sorted(
        n for n in os.listdir(folder)
        if os.path.splitext(n)[1].lower() in exts
    )


def rectify_scene(scene_dir: str, params):
    in_dir = os.path.join(scene_dir, "rgb")
    out_dir = os.path.join(scene_dir, "images")
    mask_dir = os.path.join(scene_dir, "masks")
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)

    names = list_images(in_dir)
    if not names:
        print(f"  {scene_dir}: no images under rgb/, skipped")
        return
    h, w = cv2.imread(os.path.join(in_dir, names[0])).shape[:2]
    K_in, dist, K_out = rectified_K(params, h, w)
    remap = cv2.initUndistortRectifyMap(
        K_in, dist, None, K_out, (w, h), cv2.CV_32FC2)[0]
    ones = np.full((h, w), 255, np.uint8)

    def one(name):
        img = cv2.imread(os.path.join(in_dir, name))
        rect = cv2.remap(img, remap, None, cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REFLECT)
        mask = cv2.remap(ones, remap, None, cv2.INTER_LINEAR)
        mask = np.where(mask == 0, 0, 255).astype(np.uint8)
        rect[mask == 0] = 0
        rgba = np.concatenate([rect, mask[..., None]], axis=-1)
        cv2.imwrite(os.path.join(out_dir, name), rgba)
        cv2.imwrite(
            os.path.join(mask_dir, os.path.splitext(name)[0] + ".png"), mask)

    with ThreadPoolExecutor() as ex:
        list(ex.map(one, names))

    with open(os.path.join(scene_dir, "calib.yaml"), "w") as f:
        f.write(f"fx: {K_out[0, 0]:.6f}\n"
                f"fy: {K_out[1, 1]:.6f}\n"
                f"cx: {K_out[0, 2]:.6f}\n"
                f"cy: {K_out[1, 2]:.6f}\n"
                f"width: {w}\nheight: {h}\ndistortion: []\n")
    print(f"  {scene_dir}: {len(names)} images rectified "
          f"(f={K_out[0, 0]:.1f})")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base_dir", default="data")
    ap.add_argument("--scenes", nargs="+", default=list(TUM_CALIB))
    args = ap.parse_args()
    if cv2 is None:
        raise SystemExit("opencv-python required for rectification")
    for scene in args.scenes:
        params = TUM_CALIB.get(scene)
        if params is None:
            print(f"  {scene}: no calibration of record, skipped")
            continue
        rectify_scene(os.path.join(args.base_dir, scene), params)


if __name__ == "__main__":
    main()
