"""Keypoint-SfM pose bootstrap + incremental PnP initialization.

Reference: ``Reconstruct/poses/pose_initializer.py:59-396`` (bootstrap with
fundamental-matrix RANSAC + triangulation + mini bundle adjustment, then
incremental PnP against triangulated points).  This is the legacy
on-the-fly-nvs initialization path; the main ARTDECO pipeline uses the
MASt3R tracker instead (SURVEY.md §2 component 30).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from artdeco_tpu.poses.feature_detector import DescribedKeypoints, FeatureDetector
from artdeco_tpu.poses.matcher import match_described
from artdeco_tpu.poses.mini_ba import mini_ba
from artdeco_tpu.poses.pnp import opt_pnp
from artdeco_tpu.poses.ransac import RANSACEstimator
from artdeco_tpu.poses.triangulator import triangulate


class PoseInitializer:
    def __init__(self, f: float, centre, num_kpts: int = 1024,
                 ransac_samples: int = 512, match_max_error: float = 2e-3,
                 min_num_inliers: int = 50, ba_iters: int = 40):
        self.f = float(f)
        self.centre = jnp.asarray(centre, jnp.float32)
        self.K = jnp.asarray([
            [self.f, 0, float(centre[0])],
            [0, self.f, float(centre[1])],
            [0, 0, 1.0],
        ])
        self.detector = FeatureDetector(num_kpts=num_kpts)
        self.ransac = RANSACEstimator(ransac_samples, match_max_error)
        self.min_num_inliers = min_num_inliers
        self.ba_iters = ba_iters
        self.keyframes: List[DescribedKeypoints] = []
        self.Rts: List[np.ndarray] = []   # world->cam 4x4
        self.points3d: Optional[np.ndarray] = None

    def detect(self, img_chw) -> DescribedKeypoints:
        return self.detector(img_chw)

    def bootstrap(self, imgs: List[np.ndarray]) -> bool:
        """Two-view+ bootstrap (pose_initializer.py:59-250 condensed):
        match first<->last, RANSAC gate, triangulate, mini-BA refine."""
        dks = [self.detect(im) for im in imgs]
        d0, d1 = dks[0], dks[-1]
        m = match_described(d0, d1, min_sim=0.7)
        idx = np.asarray(m.idx)
        if idx.size < self.min_num_inliers:
            return False
        p0 = np.asarray(d0.kpts)[idx]
        p1 = np.asarray(m.kpts_other)
        _, inliers, count = self.ransac.estimate(p0, p1)
        if int(count) < self.min_num_inliers:
            return False
        inl = np.asarray(inliers)
        p0i, p1i = p0[inl], p1[inl]

        # initialize cam1 with a small forward guess, triangulate, refine
        Rt0 = np.eye(4, dtype=np.float32)
        Rt1 = np.eye(4, dtype=np.float32)
        Rt1[0, 3] = 0.1  # unit-free baseline guess; BA fixes the rest
        world, depth, dis, valid = triangulate(
            jnp.asarray(p0i, jnp.float32), jnp.asarray(p1i, jnp.float32)[None],
            jnp.asarray(Rt0), jnp.asarray(Rt1)[None],
            jnp.asarray(self.f), self.centre, max_error=5e-2, min_dis=1e-6,
        )
        v = np.asarray(valid)
        if v.sum() < self.min_num_inliers:
            return False
        X = np.asarray(world)[v]
        uv_obs = jnp.asarray(np.stack([p0i[v], p1i[v]]), jnp.float32)
        R6D0 = jnp.asarray(
            np.stack([Rt0[:3, :2], Rt1[:3, :2]]), jnp.float32
        )
        t0 = jnp.asarray(np.stack([Rt0[:3, 3], Rt1[:3, 3]]), jnp.float32)
        ok = jnp.ones((2, X.shape[0]), bool)
        R6D, t, f_out, xyz, cost = mini_ba(
            R6D0, t0, jnp.asarray(X, jnp.float32), uv_obs, ok,
            jnp.asarray(self.f), self.centre, iters=self.ba_iters,
            optimize_pts=True,
        )
        from artdeco_tpu.mapper.keyframe import sixd_to_mtx

        for c in range(2):
            Rt = np.eye(4, dtype=np.float32)
            Rt[:3, :3] = np.asarray(sixd_to_mtx(R6D[c]))
            Rt[:3, 3] = np.asarray(t)[c]
            self.Rts.append(Rt)
        self.points3d = np.asarray(xyz)
        self.keyframes = [d0, d1]
        self._kpt_idx = [np.where(inl)[0][v], np.where(inl)[0][v]]
        return True

    def register_incremental(self, img_chw) -> Optional[np.ndarray]:
        """PnP of a new frame against the bootstrap points
        (pose_initializer.py incremental path)."""
        if self.points3d is None:
            return None
        d = self.detect(img_chw)
        ref = self.keyframes[-1]
        m = match_described(ref, d, min_sim=0.7)
        idx = np.asarray(m.idx)
        # keep matches whose ref keypoints correspond to triangulated points
        ref_rows = {int(k): i for i, k in enumerate(self._kpt_idx[-1])}
        rows, uvs = [], []
        for j, k in enumerate(idx):
            if int(k) in ref_rows:
                rows.append(ref_rows[int(k)])
                uvs.append(np.asarray(m.kpts_other)[j])
        if len(rows) < 6:
            return None
        X = self.points3d[rows]
        uv = np.asarray(uvs, np.float32)
        T0 = np.zeros(7, np.float32)
        T0[3:7] = [0, 0, 0, 1]
        # init from last pose
        from artdeco_tpu.geometry import lie

        T_last = self.Rts[-1]
        T0[:3] = T_last[:3, 3]
        T0[3:7] = np.asarray(lie.matrix_to_quat(
            jnp.asarray(T_last[:3, :3], jnp.float32)))
        T_out, cost = opt_pnp(
            jnp.asarray(T0)[None], jnp.asarray(X, jnp.float32)[None],
            jnp.asarray(uv)[None], jnp.ones((1, len(rows)), bool), self.K,
        )
        from artdeco_tpu.geometry import lie as lie2

        Rt = np.asarray(lie2.se3_matrix(T_out[0]))
        self.Rts.append(Rt.astype(np.float32))
        return Rt
