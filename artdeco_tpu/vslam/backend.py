"""Backend: loop closure, global optimization, dense points for the mapper.

Reference: ``VSLAM/Backend.py:12-326``.  Single process: ``process`` consumes
a frontend message dict and returns the mapper message dict (the reference's
queue_B2M payload built at Backend.py:118-147).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from artdeco_tpu.geometry import lie, projection as proj
from artdeco_tpu.vslam.frame import Frame, KeyframeStyle
from artdeco_tpu.vslam.global_opt import FactorGraph
from artdeco_tpu.vslam.keyframes import KeyframeStore
from artdeco_tpu.vslam.retrieval import RetrievalDatabase


# ---------------------------------------------------------------------------
# Jitted hot-path kernels.  Every eager jnp op on the host path costs ~9 ms
# of blocking tunnel RPC on the target backend (measured, scripts/
# profile_refine.py round); the per-keyframe/mapper-frame math below is
# therefore fused into single jit dispatches (~0.02 ms each, async).
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("height", "width"))
def _dense_point_jit(idx, Xkk, Twk, Twl, K, height: int, width: int,
                     valid_pixel: float = 3.0):
    """compute_dense_point math as ONE device program (Backend.py:150-193).

    Returns (point (H, W, 3), conf (H, W)) — device arrays."""
    H, W = height, width
    Tlk = lie.sim3_mul(lie.sim3_inv(Twl), Twk)

    Xkk_calib = proj.constrain_points_to_ray((H, W), Xkk, K)
    Xkk_m = Xkk_calib[idx]
    Xkl = lie.sim3_act(Tlk, Xkk_m)

    z = jnp.maximum(Xkl[:, 2:3], 1e-9)
    u = K[0, 0] * Xkl[:, 0:1] / z + K[0, 2]
    v = K[1, 1] * Xkl[:, 1:2] / z + K[1, 2]
    uv = proj.get_pixel_coords((H, W))
    resi = jnp.linalg.norm(jnp.concatenate([u, v], -1) - uv, axis=-1)
    conf_valid = jnp.where(
        resi < valid_pixel, 1.0, 1.0 / (resi - valid_pixel + 1.0)
    )

    Xkw = lie.sim3_act(Twk, Xkk_m)
    T_kw_se3 = lie.se3_inv(Twk[:7])
    Xk_map_matched = lie.se3_act(T_kw_se3, Xkw)
    Xk_map_default = lie.se3_act(T_kw_se3, lie.sim3_act(Twk, Xkk_calib))

    point = jnp.asarray(Xk_map_default).at[idx].set(Xk_map_matched)
    conf = jnp.zeros((H * W,)).at[idx].set(conf_valid)
    return point.reshape(H, W, 3), conf.reshape(H, W)


@partial(jax.jit, static_argnames=("height", "width"))
def _keyframe_point_jit(Xkk, avg_conf, K, height: int, width: int):
    """First-keyframe mapper payload (no last keyframe / no matches):
    ray-constrained pointmap + thresholded confidence."""
    point = proj.constrain_points_to_ray((height, width), Xkk, K)
    conf = (avg_conf.reshape(-1) > 1.5).astype(jnp.float32)
    return point.reshape(height, width, 3), conf.reshape(height, width)


@jax.jit
def _rel_sim3_jit(T_WCl, T_WCk):
    return lie.sim3_mul(lie.sim3_inv(T_WCl), T_WCk)


@jax.jit
def _cross_writeback_jit(T_WCk, T_WCl, Xlk):
    """Last-keyframe pointmap refresh from the cross-prediction
    (Backend.py:234-243 tail) in one dispatch."""
    T_ClCk = lie.sim3_mul(lie.sim3_inv(T_WCl), T_WCk)
    return lie.sim3_act(T_ClCk, Xlk)


class Backend:
    def __init__(self, args, config: dict, dataset,
                 keyframes: KeyframeStore, runner,
                 retrieval: Optional[RetrievalDatabase] = None):
        self.args = args
        self.config = config
        self.dataset = dataset
        self.keyframes = keyframes
        self.runner = runner
        self.H_slam, self.W_slam = dataset.H_slam, dataset.W_slam
        self.K_slam = jnp.asarray(dataset.K_slam)
        self.num_GBA = getattr(args, "num_GBA", 1)
        self.factor_graph = FactorGraph(
            config, runner, keyframes, dataset.K_slam,
            (self.H_slam, self.W_slam),
        )
        self.retrieval = retrieval or RetrievalDatabase(config)
        self.lost_mode = False
        # per-stage wall-clock accumulators (reference --display_runtimes)
        self.timers: dict = {}

    def _t(self, key: str, t0: float):
        import time as _time

        acc = self.timers.setdefault(key, [0.0, 0])
        acc[0] += _time.perf_counter() - t0
        acc[1] += 1
        return _time.perf_counter()

    # -- message dispatch (Backend.py:48-115) -----------------------------
    #
    # Split into two phases for the overlapped runtime (SURVEY §7 step 8):
    #
    #   * ``process_sync`` — everything that mutates tracker-visible state
    #     (keyframe store, factor graph, retrieval DB) and must complete
    #     before the next frame is tracked: relocalization and the keyframe
    #     global optimization.  This is the reference's hard-sync barrier
    #     (``Frontend.py:119-124``, default ON via args.py:188 store_false).
    #     Returns a WORK item holding value snapshots (Frames are immutable
    #     views: jax arrays + a copied pose), or None.
    #   * ``process_async`` — the mapper-facing remainder (mapper-frame
    #     matching, dense-point computation, message assembly) which never
    #     feeds back into tracking; the overlapped System runs it on a
    #     worker thread, exactly like the reference's backend/mapper
    #     processes overlap the frontend (run_system.py:105-110).
    #
    # ``process`` composes both for the sequential path.
    def process(self, msg: dict) -> Optional[dict]:
        work = self.process_sync(msg)
        return self.process_async(work) if work is not None else None

    def process_sync(self, msg: dict) -> Optional[dict]:
        style = msg["keyframe_style"]
        if style == int(KeyframeStyle.LOST):
            frame = msg["frame"]
            X, C, feat, pos = self.runner.inference_mono(frame.img)
            frame = frame.update_pointmap(X[0], C[0]).update_pointmap(X[1], C[1])
            success, lc_inds = self.relocalization(frame, feat, pos)
            if not success:
                return None
            n_kf = len(self.keyframes)
            keyframe = self.keyframes[n_kf - 1]
            last_keyframe = self.keyframes[n_kf - 2] if n_kf > 1 else None
            embeddings = None
            if last_keyframe is not None:
                embeddings = (
                    self.keyframes.get_embedding(n_kf - 1),
                    self.keyframes.get_embedding(n_kf - 2),
                )
            return dict(
                kind="reloc", keyframe=keyframe, last_keyframe=last_keyframe,
                kf_index=n_kf - 1, embeddings=embeddings, lc_inds=lc_inds,
                is_test=msg["is_test"], is_important=msg["is_important"],
                focal=msg["focal"], timestamp=msg["timestamp"],
            )
        if style == int(KeyframeStyle.KEYFRAME):
            lc_inds, idx_k2l, keyframe, last_keyframe = (
                self.global_optimization(
                    msg["keyframe_id"], track_match=msg.get("track_match")
                )
            )
            return dict(
                kind="keyframe", keyframe=keyframe,
                last_keyframe=last_keyframe, kf_index=msg["keyframe_id"],
                idx_k2l=idx_k2l, lc_inds=lc_inds,
                is_test=msg["is_test"], is_important=msg["is_important"],
                focal=msg["focal"], timestamp=msg["timestamp"],
            )
        if style == int(KeyframeStyle.MAPPER_FRAME):
            kf_id = msg["keyframe_id"]
            return dict(
                kind="mapper_frame", frame=msg["frame"],
                last_keyframe=self.keyframes[kf_id], kf_index=kf_id,
                embedding_j=self.keyframes.get_embedding(kf_id),
                is_test=msg["is_test"], is_important=msg["is_important"],
                focal=msg["focal"], timestamp=msg["timestamp"],
            )
        return None

    def process_async(self, work: dict) -> Optional[dict]:
        kind = work["kind"]
        if kind == "reloc":
            keyframe = work["keyframe"]
            last_keyframe = work["last_keyframe"]
            idx_k2l = None
            if last_keyframe is not None:
                ei, ej = work["embeddings"]
                out = self.runner.match_asymmetric(
                    keyframe.img, last_keyframe.img,
                    embeddings_i=ei, embeddings_j=ej,
                )
                idx_k2l = out[0]
            return self.prepare_for_mapper(
                keyframe, last_keyframe, work["kf_index"], idx_k2l,
                is_test=work["is_test"], is_important=work["is_important"],
                loop_keyframe_index=work["lc_inds"], is_slam_keyframe=True,
                focal=work["focal"], timestamp=work["timestamp"],
                img_dev=keyframe.img,
            )
        if kind == "keyframe":
            return self.prepare_for_mapper(
                work["keyframe"], work["last_keyframe"], work["kf_index"],
                work["idx_k2l"],
                is_test=work["is_test"], is_important=work["is_important"],
                loop_keyframe_index=work["lc_inds"], is_slam_keyframe=True,
                focal=work["focal"], timestamp=work["timestamp"],
                img_dev=work["keyframe"].img,
            )
        if kind == "mapper_frame":
            frame: Frame = work["frame"]
            last_keyframe = work["last_keyframe"]
            (idx_k2l, vml, Xkk, Ckk, Qkk, Xlk, Clk, Qlk, _, _) = (
                self.runner.match_asymmetric(
                    frame.img, last_keyframe.img,
                    embeddings_j=work["embedding_j"],
                )
            )
            frame = frame.update_pointmap(Xkk, Ckk)
            return self.prepare_for_mapper(
                frame, last_keyframe, work["kf_index"], idx_k2l,
                is_test=work["is_test"], is_important=work["is_important"],
                focal=work["focal"], timestamp=work["timestamp"],
                img_dev=frame.img,
            )
        return None

    # -- global optimization (Backend.py:196-265) --------------------------
    def global_optimization(self, idx: int, n_consec: int = None,
                            track_match: dict = None):
        """``track_match``: the frontend's tracking-time pair decode for
        this keyframe (frontend.take_last_pair).  The reference re-runs the
        identical decode+match in the backend (Backend.py:203-214); the
        decode is deterministic, so reusing the frontend's fuses the same
        values one full cascade cheaper.  (Tiny deviation: the frontend
        seeds iter_proj with the previous frame's matches; the reference
        backend re-matches from identity init.)"""
        import time as _time

        t0 = _time.perf_counter()
        n_consec = n_consec if n_consec is not None else self.num_GBA
        keyframe = self.keyframes[idx]
        last_keyframe = self.keyframes[idx - 1] if idx > 0 else None
        idx_k2l = None
        Xlk = Clk = None
        tm = track_match
        if last_keyframe is not None:
            if tm is not None and tm.get("kind") == "pair" \
                    and tm.get("last_idx") == idx - 1:
                idx_k2l = tm["idx"]
                Xkk, Ckk = tm["Xkk"], tm["Ckk"]
                Xlk, Clk = tm["Xlk"], tm["Clk"]
                feat_k, pos_k = tm["feat"], tm["pos"]
            else:
                ej = self.keyframes.get_embedding(idx - 1)
                (idx_k2l, vml, Xkk, Ckk, Qkk, Xlk, Clk, Qlk, feat_k, pos_k
                 ) = self.runner.match_asymmetric(
                    keyframe.img, last_keyframe.img, embeddings_j=ej,
                )
        elif tm is not None and tm.get("kind") == "mono":
            Xkk, Ckk = tm["X"][0], tm["C"][0]
            feat_k, pos_k = tm["feat"], tm["pos"]
        else:
            Xm, Cm, feat_k, pos_k = self.runner.inference_mono(keyframe.img)
            Xkk, Ckk = Xm[0], Cm[0]
        t0 = self._t("bkd.match_asym", t0)
        self.keyframes.put_embedding(idx, feat_k, pos_k)
        keyframe = keyframe.update_pointmap(Xkk, Ckk)
        self.keyframes[idx] = keyframe
        t0 = self._t("bkd.pointmap_update", t0)

        # candidate edges: consecutive + retrieval (Backend.py:219-241)
        kf_idx = [idx - 1 - j for j in range(min(n_consec, idx))]
        retrieval_inds = self.retrieval.update(
            np.asarray(feat_k[0]), add_after_query=True,
            k=self.config["retrieval"]["k"],
            min_thresh=self.config["retrieval"]["min_thresh"],
        )
        t0 = self._t("bkd.retrieval", t0)
        kf_idx += retrieval_inds
        lc_inds = set(retrieval_inds)
        lc_inds.add(idx)

        kf_set = set(kf_idx)
        kf_set.discard(idx)
        kf_list = sorted(kf_set)
        if kf_list:
            self.factor_graph.add_factors(
                kf_list, [idx] * len(kf_list),
                self.config["local_opt"]["min_match_frac"],
            )
        t0 = self._t("bkd.add_factors", t0)
        self.factor_graph.solve_GN_calib()
        t0 = self._t("bkd.solve_GN", t0)

        # refresh last keyframe pointmap with cross-predicted points —
        # the sim3 chain + fusion ride in jitted dispatches (an eager chain
        # here measured 64 ms/keyframe on the tunneled backend)
        keyframe = self.keyframes[idx]
        last_keyframe = self.keyframes[idx - 1] if idx > 0 else None
        if last_keyframe is not None and Xlk is not None:
            T_WCk = jnp.asarray(self.keyframes.T_WC[idx])
            T_WCl = jnp.asarray(self.keyframes.T_WC[idx - 1])
            Xll = _cross_writeback_jit(T_WCk, T_WCl, Xlk)
            last_keyframe = last_keyframe.update_pointmap(Xll, Clk)
            self.keyframes[idx - 1] = last_keyframe
        self._t("bkd.writeback", t0)
        return lc_inds, idx_k2l, keyframe, last_keyframe

    # -- relocalization (Backend.py:269-325) --------------------------------
    def relocalization(self, frame: Frame, feat, pos):
        retrieval_inds = self.retrieval.update(
            np.asarray(feat[0]), add_after_query=False,
            k=self.config["retrieval"]["k"],
            min_thresh=self.config["retrieval"]["min_thresh"],
        )
        if not retrieval_inds:
            return False, set()
        idx = self.keyframes.append(frame)
        self.keyframes.put_embedding(idx, feat, pos)
        ok = self.factor_graph.add_factors(
            list(retrieval_inds), [idx] * len(retrieval_inds),
            self.config["reloc"]["min_match_frac"],
            is_reloc=self.config["reloc"]["strict"],
        )
        if not ok:
            self.keyframes.pop_last()
            return False, set()
        self.retrieval.update(
            np.asarray(feat[0]), add_after_query=True,
            k=self.config["retrieval"]["k"],
            min_thresh=self.config["retrieval"]["min_thresh"],
        )
        self.keyframes.T_WC[idx] = self.keyframes.T_WC[retrieval_inds[0]].copy()
        self.factor_graph.solve_GN_calib()
        return True, set(retrieval_inds)

    # -- dense points for the mapper (Backend.py:150-193) -------------------
    def compute_dense_point(self, keyframe: Frame, last_keyframe: Frame,
                            idx_k2l, valid_pixel: float = 3.0):
        """One jitted dispatch; returns DEVICE (H, W, 3) point + (H, W) conf
        (the mapper ingests device arrays — see mapper/keyframe.py)."""
        return _dense_point_jit(
            jnp.asarray(idx_k2l)[0], keyframe.X_canon, keyframe.T_WC,
            last_keyframe.T_WC, self.K_slam, self.H_slam, self.W_slam,
            valid_pixel,
        )

    # -- mapper message (Backend.py:118-147) ---------------------------------
    def prepare_for_mapper(self, keyframe: Frame, last_keyframe, kf_index,
                           idx_k2l, is_test=False, is_important=False,
                           loop_keyframe_index=None, is_slam_keyframe=False,
                           focal=None, timestamp=0.0, img_dev=None) -> dict:
        """point_map / point_conf / T_CkC in the message are DEVICE arrays
        (the reference marshals CPU tensors through queues, Backend.py:
        129-146 — here everything stays in HBM; only tiny scalars are host).
        ``img_dev``: the keyframe's SLAM-res device image, so the mapper can
        skip the map-res host decode + upload when resolutions match."""
        if last_keyframe is None or idx_k2l is None:
            point, conf = _keyframe_point_jit(
                keyframe.X_canon, keyframe.get_average_conf(),
                self.K_slam, self.H_slam, self.W_slam,
            )
            T_CkC = None
        else:
            point, conf = self.compute_dense_point(keyframe, last_keyframe, idx_k2l)
            T_CkC = _rel_sim3_jit(last_keyframe.T_WC, keyframe.T_WC)
        return {
            "is_test": is_test,
            "is_important": is_important,
            "T_WC": np.asarray(keyframe.T_WC),
            "frame_id": keyframe.frame_id,
            "timestamp": timestamp,
            "point_map": point,
            "point_conf": conf,
            "is_slam_keyframe": is_slam_keyframe,
            "loop_keyframe_index": loop_keyframe_index or set(),
            "T_CkC": T_CkC,
            "last_keyframe_index": kf_index,
            "focal": focal,
            "img_dev": img_dev,
        }
