"""Native C++ loader tests: decode parity with cv2, prefetcher stream."""

import os

import numpy as np
import pytest

from artdeco_tpu.runtime import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.native_available(), reason="native toolchain missing"
)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        u, v = np.meshgrid(np.arange(96), np.arange(64))
        img = np.stack([
            (127 + 100 * np.sin((u + 10 * i) / 9.0)),
            (127 + 100 * np.cos(v / 7.0)),
            rng.randint(0, 255, (64, 96)),
        ], axis=-1).astype(np.uint8)
        p = str(d / f"f_{i:03d}.png") if i % 2 == 0 else str(d / f"f_{i:03d}.jpg")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        paths.append(p)
    return paths


def test_decode_matches_cv2(image_dir):
    import cv2

    for p in image_dir:
        native = native_loader.decode_image(p)
        ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        assert native is not None
        assert native.shape == ref.shape
        if p.endswith(".png"):
            np.testing.assert_array_equal(native, ref)
        else:
            # JPEG decoders may differ by a few LSBs
            assert np.abs(native.astype(int) - ref.astype(int)).mean() < 3.0


def test_prefetcher_stream_parity(image_dir):
    from artdeco_tpu.dataio.camera import PinholeCamera

    cam = PinholeCamera(
        target_size_slam=64, downsample_map=2.0,
        W_original=96, H_original=64,
        calib_parameter=[80.0, 80.0, 48.0, 32.0],
    )
    pf = native_loader.NativePrefetcher(image_dir, cam, ring_size=3,
                                        n_threads=2)
    import cv2

    for p in image_dir:
        slam, mp = pf.get()
        assert slam.shape == (3, cam.H_slam, cam.W_slam)
        assert mp.shape == (3, cam.H_map, cam.W_map)
        # compare against the Python/cv2 transform path
        ref_img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        ref_slam = cam.to_slam(ref_img)
        ref_map = cam.to_map(ref_img)
        assert np.abs(slam - ref_slam).mean() < 0.05, p
        assert np.abs(mp - ref_map).mean() < 0.03, p
    pf.close()
