"""ctypes bindings for the native C++ data loader (native/artdeco_io.cpp).

Builds the shared library on demand (g++ is part of the image); falls back
to the Python/cv2 path when the toolchain or codec libraries are missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "artdeco_io.cpp")
_LIB = os.path.join(_REPO, "native", "libartdeco_io.so")


def build_native(force: bool = False) -> Optional[str]:
    if os.path.isfile(_LIB) and not force:
        if os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", _LIB, "-ljpeg", "-lpng", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB
    except Exception:
        return None


_lib = None


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    path = build_native()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.prefetcher_create.restype = ctypes.c_void_p
    lib.prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.prefetcher_get.restype = ctypes.c_int
    lib.prefetcher_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.prefetcher_destroy.argtypes = [ctypes.c_void_p]
    lib.decode_image.restype = ctypes.c_int
    lib.decode_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return get_lib() is not None


def decode_image(path: str, max_wh=(8192, 8192)) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty(max_wh[0] * max_wh[1] * 3, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    ok = lib.decode_image(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size, ctypes.byref(w), ctypes.byref(h),
    )
    if not ok:
        return None
    return buf[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


class NativePrefetcher:
    """Ordered frame stream: decode once, produce SLAM + map tensors.

    Mirrors the transform geometry of ``dataio.camera.PinholeCamera`` (long
    edge -> resize -> centre crop for SLAM; area downsample for map).
    Only valid when no undistortion remap is active.
    """

    def __init__(self, paths, camera, ring_size: int = 8, n_threads: int = 4):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self.lib = lib
        self.n = len(paths)
        # recompute the pre-crop resize dims the camera used
        H0, W0 = camera.H_original, camera.W_original
        s = max(H0, W0)
        rs_w = int(round(W0 * camera.target_size / s))
        rs_h = int(round(H0 * camera.target_size / s))
        self.slam_shape = (3, camera.H_slam, camera.W_slam)
        self.map_shape = (3, camera.H_map, camera.W_map)
        arr = (ctypes.c_char_p * self.n)(
            *[p.encode() for p in paths]
        )
        self.handle = lib.prefetcher_create(
            arr, self.n, camera.W_slam, camera.H_slam, rs_w, rs_h,
            camera.W_map, camera.H_map, ring_size, n_threads,
        )
        self._idx = 0

    def get(self):
        slam = np.empty(self.slam_shape, np.float32)
        mp = np.empty(self.map_shape, np.float32)
        ok = self.lib.prefetcher_get(
            self.handle, self._idx,
            slam.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        self._idx += 1
        if not ok:
            raise IOError(f"native decode failed at frame {self._idx - 1}")
        return slam, mp

    def close(self):
        if self.handle:
            self.lib.prefetcher_destroy(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
