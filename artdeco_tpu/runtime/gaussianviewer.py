"""Gaussian scene viewer: headless turntable/orbit renderer + offline export.

Reference: ``Reconstruct/gaussianviewer.py:34-406`` — an imgui local/server
viewer over the vendored graphdecoviewer framework with splat/depth/ellipsoid
modes and an FPS camera.  No display stack ships in this image, so this
module provides the same inspection capability headlessly: orbit/turntable
render sequences (splat, depth, alpha modes) written to disk or returned as
arrays, plus the interactive path via runtime.webviewer (the browser client
takes the imgui window's role).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def _look_at(eye: np.ndarray, target: np.ndarray, up=(0, -1, 0)) -> np.ndarray:
    """world->cam 4x4 from eye/target (OpenCV convention, +z forward)."""
    f = target - eye
    f = f / np.linalg.norm(f)
    u = np.asarray(up, np.float64)
    r = np.cross(f, u)
    r /= np.linalg.norm(r)
    d = np.cross(f, r)
    R = np.stack([r, d, f])
    Rt = np.eye(4, dtype=np.float32)
    Rt[:3, :3] = R
    Rt[:3, 3] = -R @ eye
    return Rt


class GaussianViewer:
    """Headless viewer over a SceneModel (splat / depth / alpha modes)."""

    MODES = ("splat", "depth", "alpha")

    def __init__(self, scene_model, width: int = 480, height: int = 270):
        self.sm = scene_model
        self.width = width
        self.height = height

    def render_pose(self, Rt_w2c: np.ndarray, mode: str = "splat"
                    ) -> np.ndarray:
        import jax.numpy as jnp

        from artdeco_tpu.mapper.scene_model import render_core

        sm = self.sm
        f = sm.f * self.height / sm.height
        K = jnp.asarray([
            [f, 0, self.width / 2], [0, f, self.height / 2], [0, 0, 1.0]
        ])
        pkg = render_core(
            sm.slab, sm.gfeat.val, sm.mlp, jnp.asarray(Rt_w2c),
            jnp.eye(3, 4), K, self.width, self.height, jnp.zeros(3),
            sm.cfg.sh_degree, sm.cfg.low_pass_filter_eps,
            sm.cfg.cluster_capacity,
        )
        if mode == "splat":
            img = np.asarray(jnp.clip(pkg["render"], 0, 1))
        elif mode == "depth":
            inv = np.asarray(pkg["invdepth"][0])
            lo, hi = np.percentile(inv, 5), np.percentile(inv, 95)
            img = np.repeat(
                np.clip((inv - lo) / max(hi - lo, 1e-9), 0, 1)[None], 3, 0
            )
        elif mode == "alpha":
            img = np.repeat(np.asarray(pkg["alpha"]), 3, 0)
        else:
            raise ValueError(f"unknown mode {mode}")
        return (img.transpose(1, 2, 0) * 255).astype(np.uint8)

    def scene_centre_radius(self):
        slab = self.sm.slab
        sel = np.where(np.asarray(slab.active))[0]
        if sel.size == 0:
            return np.zeros(3), 1.0
        xyz = np.asarray(slab.xyz)[sel]
        c = np.median(xyz, axis=0)
        r = float(np.percentile(np.linalg.norm(xyz - c, axis=1), 90))
        return c, max(r, 1e-3)

    def turntable(self, n_frames: int = 60, mode: str = "splat",
                  elevation: float = 0.3, radius_scale: float = 1.5
                  ) -> List[np.ndarray]:
        centre, radius = self.scene_centre_radius()
        frames = []
        for i in range(n_frames):
            a = 2 * np.pi * i / n_frames
            eye = centre + radius_scale * radius * np.asarray(
                [np.sin(a), -elevation, -np.cos(a)]
            )
            frames.append(self.render_pose(_look_at(eye, centre), mode))
        return frames

    def export_turntable(self, out_dir: str, n_frames: int = 60,
                         mode: str = "splat") -> Optional[str]:
        os.makedirs(out_dir, exist_ok=True)
        frames = self.turntable(n_frames, mode)
        try:
            import cv2

            for i, fr in enumerate(frames):
                cv2.imwrite(
                    os.path.join(out_dir, f"{mode}_{i:04d}.png"),
                    cv2.cvtColor(fr, cv2.COLOR_RGB2BGR),
                )
            vid = os.path.join(out_dir, f"turntable_{mode}.mp4")
            h, w = frames[0].shape[:2]
            vw = cv2.VideoWriter(
                vid, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h)
            )
            for fr in frames:
                vw.write(cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
            vw.release()
            return vid
        except Exception:
            for i, fr in enumerate(frames):
                np.save(os.path.join(out_dir, f"{mode}_{i:04d}.npy"), fr)
            return None
