"""Pinhole camera with dual SLAM/map resolutions and undistortion.

Reference: ``dataloaders/CameraModel.py:12-163`` (resize_img + PinholeCamera):
* optimal undistortion intrinsics via cv2.getOptimalNewCameraMatrix
* SLAM stream: long edge resized to ``max_size_slam`` (512), centre-cropped
  to multiples of 16, normalized to [-1, 1], with K_slam adjusted
* map stream: INTER_AREA downsample by ``downsampling`` with K_map adjusted

Outputs are numpy (C, H, W) float32; device placement happens downstream.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

try:
    import PIL.Image
except Exception:  # pragma: no cover
    PIL = None


def _resize_long_edge(img_u8: np.ndarray, long_edge: int) -> np.ndarray:
    h, w = img_u8.shape[:2]
    s = max(h, w)
    interp = cv2.INTER_AREA if s > long_edge else cv2.INTER_CUBIC
    nw = int(round(w * long_edge / s))
    nh = int(round(h * long_edge / s))
    return cv2.resize(img_u8, (nw, nh), interpolation=interp)


def resize_img_slam(img: np.ndarray, size: int = 512,
                    return_transformation: bool = False):
    """Long edge -> ``size``, centre-crop to multiples of 16, [-1,1] CHW.

    img: (H, W, 3) float in [0, 1] or uint8.
    """
    if img.dtype != np.uint8:
        img_u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    else:
        img_u8 = img
    H1, W1 = img_u8.shape[:2]
    r = _resize_long_edge(img_u8, size)
    H, W = r.shape[:2]
    cx, cy = W // 2, H // 2
    halfw, halfh = ((2 * cx) // 16) * 8, ((2 * cy) // 16) * 8
    out = r[cy - halfh : cy + halfh, cx - halfw : cx + halfw]
    chw = out.astype(np.float32).transpose(2, 0, 1) / 255.0
    chw = chw * 2.0 - 1.0
    if return_transformation:
        scale_w = W1 / W
        scale_h = H1 / H
        half_crop_w = (W - out.shape[1]) / 2
        half_crop_h = (H - out.shape[0]) / 2
        return chw, (scale_w, scale_h, half_crop_w, half_crop_h)
    return chw


class PinholeCamera:
    """Dual-resolution camera transform (CameraModel.py:66-163)."""

    def __init__(self, target_size_slam: int, downsample_map: float,
                 W_original: int, H_original: int, calib_parameter,
                 center_force: bool = True, optimize_focal: bool = False):
        self.target_size = target_size_slam
        self.W_original = W_original
        self.H_original = H_original
        fx, fy, cx, cy = calib_parameter[:4]
        K = np.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)

        if optimize_focal or cv2 is None:
            self.mapx = self.mapy = None
            self.K_best = K.astype(np.float32)
        else:
            distortion = np.zeros(4)
            if len(calib_parameter) > 4:
                distortion = np.asarray(calib_parameter[4:], np.float64)
            K_best, _ = cv2.getOptimalNewCameraMatrix(
                K, distortion, (W_original, H_original), 0,
                (W_original, H_original), centerPrincipalPoint=center_force,
            )
            self.mapx, self.mapy = cv2.initUndistortRectifyMap(
                K, distortion, None, K_best, (W_original, H_original),
                cv2.CV_32FC1,
            )
            if np.allclose(distortion, 0):
                # identity remap: skip the per-frame cost
                self.mapx = self.mapy = None
            self.K_best = K_best.astype(np.float32)

        # SLAM stream geometry
        probe, (sw, sh, hcw, hch) = resize_img_slam(
            np.zeros((H_original, W_original, 3), np.uint8),
            target_size_slam, return_transformation=True,
        )
        self.scale_slam_w, self.scale_slam_h = sw, sh
        self.half_crop_w, self.half_crop_h = hcw, hch
        K_slam = self.K_best.copy()
        K_slam[0, 0] /= sw
        K_slam[1, 1] /= sh
        K_slam[0, 2] = K_slam[0, 2] / sw - hcw
        K_slam[1, 2] = K_slam[1, 2] / sh - hch
        self.K_slam = K_slam.astype(np.float32)
        self.H_slam, self.W_slam = probe.shape[1], probe.shape[2]

        # map stream geometry
        K_map = self.K_best.copy()
        K_map[:2] /= downsample_map
        self.K_map = K_map.astype(np.float32)
        self.downsample_map = downsample_map
        self.H_map = int(round(H_original / downsample_map))
        self.W_map = int(round(W_original / downsample_map))

    def _undistort(self, img: np.ndarray) -> np.ndarray:
        if self.mapx is not None:
            return cv2.remap(img, self.mapx, self.mapy, cv2.INTER_LINEAR)
        return img

    def to_slam(self, img: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8/float -> (3, H_slam, W_slam) f32 in [-1, 1]."""
        img = self._undistort(img)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        return resize_img_slam(img, self.target_size)

    def to_map(self, img: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8/float -> (3, H_map, W_map) f32 in [0, 1]."""
        img = self._undistort(img)
        out = cv2.resize(
            img, (self.W_map, self.H_map), interpolation=cv2.INTER_AREA
        )
        if out.dtype == np.uint8:
            out = out.astype(np.float32) / 255.0
        return out.astype(np.float32).transpose(2, 0, 1)
