"""Frontend: per-frame tracking driver.

Reference: ``VSLAM/Frontend.py:14-171`` + ``VSLAM/CameraTracker.py:19-157``
(the host-level orchestration around the jitted tracker core).  Single
process: instead of pushing to an IPC queue, ``process_frame`` returns the
keyframe message dict for the backend.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

import jax

from artdeco_tpu.geometry import lie
from artdeco_tpu.vslam import tracker as trk


@jax.jit
def _rel_pose_jit(T_WC_kf, T_WC_frame):
    """Keyframe-relative pose as ONE device dispatch (per-frame hot path)."""
    return lie.sim3_mul(lie.sim3_inv(T_WC_kf), T_WC_frame)
from artdeco_tpu.vslam.frame import Frame, KeyframeStyle
from artdeco_tpu.vslam.keyframes import KeyframeStore
from artdeco_tpu.vslam.tracker import TrackingConfig


class CameraTracker:
    """Two-view tracking against the last keyframe (CameraTracker.py)."""

    def __init__(self, config: dict, runner, keyframes: KeyframeStore,
                 H_slam: int, W_slam: int, K_slam,
                 min_displacement: float, thres_keyframe: float,
                 optimize_focal: bool = False, covariance_filter: bool = False,
                 point_fusion: bool = True):
        self.config = config
        self.cfg = TrackingConfig.from_dict(config["tracking"])
        self.runner = runner
        self.keyframes = keyframes
        self.H_slam, self.W_slam = H_slam, W_slam
        self.K_slam = jnp.asarray(K_slam)
        self.min_displacement = min_displacement
        self.thres_keyframe = thres_keyframe
        self.optimize_focal = optimize_focal
        self.covariance_filter = covariance_filter
        self.point_fusion = point_fusion
        # per-substage wall-clock accumulators [sum_s, n]
        self.timers: dict = {}
        self.idx_f2k = None
        self.last_embedding = None
        self._emb_kf_idx = -1   # keyframe index last_embedding belongs to
        self.last_dist = 0.0
        # pair-decode payload of the latest tracked frame, for the backend
        # to reuse when this frame becomes a keyframe (its global-opt step
        # would otherwise re-run the identical decode+matching cascade —
        # reference Backend.py:203-214 re-decodes; deterministic decode
        # means reuse fuses the same values, one full cascade cheaper)
        self._last_pair = None

    def track_init(self, frame: Frame):
        X, C, feat, pos = self.runner.inference_mono(frame.img)
        frame = frame.update_pointmap(X[0], C[0]).update_pointmap(X[1], C[1])
        self.last_embedding = (feat, pos)
        self._emb_kf_idx = 0
        self._last_pair = dict(kind="mono", X=X, C=C, feat=feat, pos=pos)
        return frame, False, True, True

    def take_last_pair(self):
        """Hand the latest frame's decode payload to the backend (one-shot)."""
        out = self._last_pair
        self._last_pair = None
        return out

    def track(self, frame: Frame):
        """Returns (frame, lost, is_keyframe, is_keyframe_map)."""
        if len(self.keyframes) == 0:
            return self.track_init(frame)

        kf_idx = self.keyframes.last_index()
        keyframe = self.keyframes[kf_idx]
        if kf_idx != self._emb_kf_idx:
            # the backend appended a keyframe the tracker did not create
            # (relocalization, Backend.py:269-325): the cached embedding and
            # match init belong to the OLD keyframe — refresh from the store
            # (the reloc path put_embedding'd the new one), and re-seed the
            # pose from the reloc'd keyframe (the reference frontend reads
            # states.T_WC, which the backend updates on reloc; continuing
            # from the stale pre-loss extrapolation makes the LM solve blow
            # up and tracking stays lost forever)
            stored = self.keyframes.get_embedding(kf_idx)
            if stored is not None:
                self.last_embedding = stored
            self.idx_f2k = None
            self._emb_kf_idx = kf_idx
            frame = dataclasses.replace(
                frame, T_WC=jnp.asarray(self.keyframes.T_WC[kf_idx])
            )
        import time as _time

        def _t(key, t0):
            acc = self.timers.setdefault(key, [0.0, 0])
            acc[0] += _time.perf_counter() - t0
            acc[1] += 1
            return _time.perf_counter()

        t0 = _time.perf_counter()
        (idx_f2k, valid_match_k, Xff, Cff, Qff, Xkf, Ckf, Qkf, featf, posf
         ) = self.runner.match_asymmetric(
            frame.img, keyframe.img, idx_i2j_init=self.idx_f2k,
            embeddings_j=self.last_embedding,
        )
        t0 = _t("trk.match_dispatch", t0)
        self.idx_f2k = idx_f2k
        # device references only — consumed by the backend if this frame
        # becomes a keyframe (avoids re-running the identical pair decode +
        # matching cascade in global_optimization)
        self._last_pair = dict(
            kind="pair", last_idx=kf_idx, idx=idx_f2k, valid=valid_match_k,
            Xkk=Xff, Ckk=Cff, Qkk=Qff, Xlk=Xkf, Clk=Ckf, Qlk=Qkf,
            feat=featf, pos=posf,
        )

        # everything after matching is ONE fused device step + ONE pull of
        # 5 scalars (tracker.track_step)
        (fX, fC, fN, T_WCf, T_CkCf, K_new, kX, kC, kN, flags) = (
            trk.track_step(
                Xff, Cff, frame.X_canon, frame.C, frame.N,
                Xkf, Ckf, keyframe.X_canon, keyframe.C, keyframe.N,
                idx_f2k, valid_match_k, Qff, Qkf,
                frame.T_WC, keyframe.T_WC, self.K_slam,
                jnp.asarray(self.last_dist, jnp.float32),
                float(self.min_displacement),
                (self.H_slam, self.W_slam), self.cfg,
                thres_keyframe=float(self.thres_keyframe),
                optimize_focal=self.optimize_focal,
                covariance_filter=self.covariance_filter,
            )
        )
        t0 = _t("trk.step_dispatch", t0)
        match_frac, ok, is_kf_f, is_km_f, dist = np.asarray(flags).tolist()
        _t("trk.flags_pull", t0)   # device wait: match + step execution
        frame = dataclasses.replace(frame, X_canon=fX, C=fC, N=fN)
        if match_frac < self.cfg.min_match_frac or ok < 0.5:
            return frame, True, False, False
        if self.optimize_focal:
            self.K_slam = K_new
        frame = dataclasses.replace(frame, T_WC=T_WCf)

        if self.point_fusion:
            # fused keyframe pointmap writeback (CameraTracker.py:136-141) —
            # payloads are device references, no copies
            self.keyframes.update_payload(kf_idx, kX, kC, kN)

        is_keyframe = is_kf_f > 0.5
        if is_keyframe:
            self.idx_f2k = None
            self.last_embedding = (featf, posf)
            self._emb_kf_idx = kf_idx + 1  # this frame appends next
            is_keyframe_map = True
            self.last_dist = 0.0
        else:
            is_keyframe_map = is_km_f > 0.5
            if is_keyframe_map:
                self.last_dist = float(dist)
        return frame, False, is_keyframe, is_keyframe_map


class Frontend:
    """Per-frame driver producing backend messages (Frontend.py:55-135)."""

    def __init__(self, args, config: dict, dataset, keyframes: KeyframeStore,
                 runner):
        self.args = args
        self.config = config
        self.dataset = dataset
        self.keyframes = keyframes
        self.runner = runner
        min_disp = max(
            getattr(args, "min_displacement", 0.03) * dataset.W_slam, 30
        )
        self.tracker = CameraTracker(
            config, runner, keyframes,
            dataset.H_slam, dataset.W_slam, dataset.K_slam,
            min_displacement=min_disp,
            thres_keyframe=getattr(args, "thres_keyframe", 0.8),
            optimize_focal=getattr(args, "optimize_focal", False),
            covariance_filter=getattr(args, "covariance_filter", False),
            point_fusion=getattr(args, "point_fusion_frontend", True),
        )
        self.frames_info: list = []
        self.frames_Twc_gt: list = []
        self.lost_number = 0
        self.last_T_WC = lie.sim3_identity()
        self.frame_id = 0

    def process_frame(self, original_image, info: dict) -> Optional[dict]:
        """Track one frame; returns the F2B message dict or None.

        original_image: (H, W, 3) raw frame, ("native", slam_chw) when the
        native loader already produced the SLAM-resolution tensor, or
        ("slam_dev", arr) when an upload-ahead thread already placed the
        SLAM tensor on device (runtime/system._UploadAhead)."""
        if isinstance(original_image, tuple) and original_image[0] == "slam_dev":
            img_slam = original_image[1]
        elif isinstance(original_image, tuple) and original_image[0] == "native":
            img_slam = jnp.asarray(original_image[1])
        else:
            img_slam = jnp.asarray(
                self.dataset.transform.to_slam(original_image)
            )
        is_test = info.get("is_test", False)
        timestamp = float(info.get("timestamp", self.frame_id))

        if "Twc_gt" in info and info["Twc_gt"] is not None \
                and np.all(np.isfinite(info["Twc_gt"])):
            g = np.asarray(info["Twc_gt"], np.float64)
            self.frames_Twc_gt.append([timestamp, *g.tolist()])

        T_init = self.last_T_WC if self.frame_id > 0 else lie.sim3_identity()
        frame = Frame.create(img_slam, frame_id=self.frame_id,
                             frame_time=timestamp, T_WC=T_init)

        frame, lost, is_kf, is_kf_map = self.tracker.track(frame)
        if getattr(self.args, "use_same_set_of_keyframes", False):
            is_kf = is_kf or is_kf_map

        style = None
        if lost:
            self.lost_number += 1
            style = KeyframeStyle.LOST
        elif is_kf:
            idx = self.keyframes.append(frame)
            style = KeyframeStyle.KEYFRAME
        elif is_kf_map or is_test or getattr(self.args, "use_all_frames", False):
            kf = self.keyframes.last_keyframe()
            self._store_rel(frame, self.keyframes.last_index(), kf)
            style = KeyframeStyle.MAPPER_FRAME
        else:
            kf = self.keyframes.last_keyframe()
            if kf is not None:
                self._store_rel(frame, self.keyframes.last_index(), kf)

        if not lost:
            self.last_T_WC = frame.T_WC

        self.frame_id += 1
        if style is None:
            return None
        return {
            "keyframe_style": int(style),
            "is_important": bool(is_kf_map or is_test),
            "is_test": bool(is_test),
            "keyframe_id": self.keyframes.last_index(),
            "frame_id": frame.frame_id,
            "T_WC": np.asarray(frame.T_WC),
            "timestamp": timestamp,
            "focal": float(self.tracker.K_slam[0, 0]),
            "frame": frame,   # in-process: pass the frame itself
            # keyframes hand their tracking-time decode to the backend
            "track_match": (
                self.tracker.take_last_pair()
                if style == KeyframeStyle.KEYFRAME else None
            ),
        }

    def _store_rel(self, frame: Frame, kf_index: int, kf: Frame):
        # keep T_rel as a DEVICE array: np.asarray here is a d2h pull that
        # waits (TPU executes enqueued programs in order) for EVERY queued
        # device program — including overlapped mapper bursts — turning a
        # 16-float copy into a per-frame full-queue drain on the tracking
        # thread.  The host copy happens once, in estimated_trajectory.
        T_rel = _rel_pose_jit(kf.T_WC, frame.T_WC)
        self.frames_info.append(
            [frame.frame_id, frame.frame_time, kf_index, T_rel]
        )

    # -- trajectories (Frontend.py:138-171) ------------------------------
    def estimated_trajectory(self) -> np.ndarray:
        """All tracked frames as [t, tx..qw] via keyframe-relative poses."""
        rows = []
        for fid, ts, kf_idx, T_rel in self.frames_info:
            T_kf = jnp.asarray(self.keyframes.T_WC[kf_idx])
            T = lie.sim3_mul(T_kf, jnp.asarray(T_rel))
            rows.append([ts, *np.asarray(T[:7]).tolist()])
        return np.asarray(rows) if rows else np.zeros((0, 8))

    def keyframe_trajectory(self) -> np.ndarray:
        rows = []
        for i in range(len(self.keyframes)):
            rows.append(
                [float(self.keyframes.timestamp[i]),
                 *self.keyframes.T_WC[i][:7].tolist()]
            )
        return np.asarray(rows) if rows else np.zeros((0, 8))
