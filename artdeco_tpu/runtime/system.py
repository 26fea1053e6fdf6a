"""End-to-end on-the-fly reconstruction system.

Reference: ``run_system.py:70-343`` — there, three OS processes (frontend /
backend / mapper) communicate through shared-memory queues with an optional
hard-sync barrier (default ON via the store_false --sync_hard flag, making
the pipeline effectively sequential per frame).  The TPU-native runtime is a
single host process driving jitted stages in that same deterministic order,
with a background image-prefetch thread replacing the duplicated per-process
dataset decode (SURVEY.md §5 'process crossings').
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
from typing import Optional

import numpy as np

from artdeco_tpu.geometry import lie
from artdeco_tpu.mapper.config import MapperConfig
from artdeco_tpu.mapper.keyframe import make_device_keyframe


def _se3_w2c_matrix_np(T_wc7: np.ndarray) -> np.ndarray:
    """4x4 world->cam from a 7-vector [t, q_xyzw] cam->world pose, pure
    numpy (the jnp lie chain here was ~2 eager dispatches of ~9 ms each on
    the per-mapper-frame path)."""
    t = np.asarray(T_wc7[:3], np.float32)
    x, y, z, w = np.asarray(T_wc7[3:7], np.float64)
    R = np.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = R.T                 # inverse rotation
    out[:3, 3] = -R.T @ t             # inverse translation
    return out
from artdeco_tpu.mapper.scene_model import SceneModel
from artdeco_tpu.vslam.backend import Backend
from artdeco_tpu.vslam.frontend import Frontend
from artdeco_tpu.vslam.keyframes import KeyframeStore


_rigid_fns: dict = {}


def _rigid_fn_for(key: int):
    """The jitted loop-closure pose recomputation for a keyframe capacity
    (cached per capacity; exposed so runtime/prewarm can AOT-compile it)."""
    import jax
    import jax.numpy as jnp

    from artdeco_tpu.mapper import keyframe as KFmod

    fn = _rigid_fns.get(key)
    if fn is None:
        def impl(pool, slam_T, TCkC, is_kf, mask):
            def one(sT, tc, k):
                T_full = lie.sim3_mul(sT, tc)
                T7 = jnp.where(k, sT[:7], T_full[:7])
                return lie.se3_matrix(lie.se3_inv(T7))

            new_Rt = jax.vmap(one)(slam_T, TCkC, is_kf)
            eye = jnp.eye(4)
            Rts = KFmod.get_all_Rt(pool)[:key]
            Rts = jnp.where(mask[:, None, None], Rts, eye)
            new_safe = jnp.where(mask[:, None, None], new_Rt, eye)
            return new_Rt, jnp.linalg.inv(new_safe), jnp.linalg.inv(Rts)

        fn = jax.jit(impl)
        _rigid_fns[key] = fn
    return fn


def _rigid_transform_poses(pool, slam_T, TCkC, is_kf, mask):
    """Batched (jitted) loop-closure pose recomputation: new mapper
    world->cam 4x4s from SLAM keyframe poses (+ relative T_CkC for common
    frames), plus old/new cam->world for the gaussian rigid transform."""
    return _rigid_fn_for(slam_T.shape[0])(pool, slam_T, TCkC, is_kf, mask)


class Runtimes:
    """Wall-clock stage counters (run_system.py:135-136, utils.py:112-115)."""

    def __init__(self):
        self.data: dict = {}

    def add(self, key: str, dt: float):
        acc = self.data.setdefault(key, [0.0, 0])
        acc[0] += dt
        acc[1] += 1

    def summary(self) -> dict:
        return {
            k: 1000.0 * v[0] / max(v[1], 1) for k, v in self.data.items()
        }


class _Prefetcher:
    """Background image decode thread (double-buffered getnext)."""

    def __init__(self, dataset, depth: int = 4):
        self.dataset = dataset
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.t = threading.Thread(target=self._run, daemon=True)
        self.t.start()

    def _run(self):
        for i in range(len(self.dataset)):
            self.q.put(self.dataset[i])
        self.q.put(None)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            yield item


class _UploadAhead:
    """Ahead-of-consumption SLAM-tensor device upload (runs up to
    ``depth`` + in-flight frames ahead).

    The per-frame image h2d through the tunneled TPU backend costs
    ~100-200 ms when paid synchronously inside ``process_frame``; issued a
    frame ahead on this thread it overlaps the previous frame's device
    compute (transfers ride the DMA path).  Wraps any frame iterator and
    yields (("slam_dev", device_array), info).  Call :meth:`close` when the
    consumer stops early, else the thread keeps decoding + uploading until
    its queue fills and then holds those buffers forever."""

    def __init__(self, it, transform, depth: int = 3):
        self.it = it
        self.transform = transform
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = False
        self.t = threading.Thread(target=self._run, daemon=True)
        self.t.start()

    def close(self):
        """Stop the producer and drain queued items so it can exit."""
        self._stop = True
        while True:
            try:
                self.q.get_nowait()
            except queue.Empty:
                break

    def _upload(self, original_image):
        import jax.numpy as jnp

        if isinstance(original_image, tuple) and original_image[0] == "native":
            return jnp.asarray(original_image[1])
        return jnp.asarray(self.transform.to_slam(original_image))

    def _run(self):
        try:
            for original_image, info in self.it:
                if self._stop:
                    return
                dev = self._upload(original_image)
                # block in THIS thread until the transfer lands so the
                # consumer never waits on it
                dev.block_until_ready()
                while not self._stop:
                    try:
                        self.q.put((("slam_dev", dev), info), timeout=0.25)
                        break
                    except queue.Full:
                        continue
                if self._stop:
                    return
        except Exception as e:  # surfaced to the consumer
            self.q.put(e)
            return
        self.q.put(None)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item


class _MapperWorker:
    """Background consumer of backend work items (the overlapped runtime,
    SURVEY §7 step 8).

    Replaces the reference's backend/mapper OS processes overlapping the
    frontend (``run_system.py:105-110``): the main thread keeps tracking
    while mapper-frame matching, dense-point readbacks, host pyramid
    construction, and scene optimization drain here in message order (FIFO
    = the reference's queue_B2M ordering).  Work items carry value
    snapshots (Frames are immutable jax-array views with copied poses)
    taken at the same logical point as the sequential schedule, and
    nothing here writes tracker-visible state — so the trajectory is
    bit-identical to the sequential schedule (tested).  The bounded queue
    is the reference's maxsize backpressure (SharedStates.py:18-19)."""

    def __init__(self, system, depth: int = 4):
        self.system = system
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.error = None
        self.t = threading.Thread(target=self._run, daemon=True)
        self.t.start()

    def submit(self, work: dict, img_map=None):
        if self.error is not None:
            err, self.error = self.error, None
            raise err
        self.q.put((work, img_map))

    def _run(self):
        while True:
            item = self.q.get()
            try:
                if item is None:
                    return
                work, img_map = item
                mm = self.system.backend.process_async(work)
                if mm is not None:
                    self.system._handle_mapper_msg(mm, img_map=img_map)
            except Exception as e:  # surfaced on the next submit/close
                self.error = e
            finally:
                self.q.task_done()

    def close(self):
        self.q.put(None)
        self.t.join()
        if self.error is not None:
            err, self.error = self.error, None
            raise err


def make_native_prefetcher(dataset, ring_size: int = 8, n_threads: int = 4):
    """Native C++ decode+resize pipeline when applicable (on-disk images,
    no undistortion remap); returns None to fall back to the Python path."""
    try:
        from artdeco_tpu.runtime import native_loader

        cam = dataset.transform
        paths = getattr(dataset, "image_paths", None)
        if (
            not native_loader.native_available()
            or cam.mapx is not None
            or not paths
            or not os.path.isfile(paths[0])
        ):
            return None
        return native_loader.NativePrefetcher(
            dataset.image_paths, cam, ring_size=ring_size,
            n_threads=n_threads,
        )
    except Exception:
        return None


class System:
    """Single-host pipeline: track -> backend -> map, per frame."""

    def __init__(self, args, config: dict, dataset, runner,
                 mapper_cfg: Optional[MapperConfig] = None,
                 retrieval=None):
        self.args = args
        self.config = config
        self.dataset = dataset
        self._maybe_auto_calibrate(args, dataset, runner)
        self.keyframes = KeyframeStore(
            dataset.H_slam, dataset.W_slam, K_slam=dataset.K_slam,
        )
        self.frontend = Frontend(args, config, dataset, self.keyframes, runner)
        if retrieval is None:
            from artdeco_tpu.vslam.retrieval import build_retrieval_database

            retrieval = build_retrieval_database(args, config, self.keyframes)
        self.backend = Backend(args, config, dataset, self.keyframes, runner,
                               retrieval=retrieval)
        mcfg = mapper_cfg or MapperConfig(
            sh_degree=getattr(args, "sh_degree", 3),
            local_feat_dim=getattr(args, "local_feat_dim", 32),
            global_feat_dim=getattr(args, "global_feat_dim", 32),
            pyr_levels=getattr(args, "pyr_levels", 2),
        )
        self.scene_model = SceneModel(
            dataset.W_map, dataset.H_map, dataset.K_map, mcfg,
        )
        n_dev = int(getattr(args, "n_devices", 1) or 1)
        if n_dev > 1:
            import jax
            from jax.sharding import Mesh

            avail = jax.devices()
            if len(avail) < n_dev:
                raise ValueError(
                    f"--n_devices {n_dev} but only {len(avail)} devices"
                )
            mesh = Mesh(np.array(avail[:n_dev]), ("dp",))
            self.scene_model.enable_mesh(mesh)
            # backend pose-graph GN shards its edges over the same axis
            self.backend.factor_graph.enable_mesh(mesh, "dp")
        self.mapper_cfg = mcfg
        # AOT-compile the whole stage set on background threads (runtime/
        # prewarm.py): with a warm persistent cache every stage dispatch
        # hits; with a cold one the compiles overlap the first frames
        # instead of serializing with them.  Default on for TPU (where a
        # compile is 30-260 s); off on CPU test meshes.
        import jax

        want_prewarm = getattr(args, "prewarm", None)
        if want_prewarm is None:
            want_prewarm = jax.default_backend() == "tpu"
        if want_prewarm:
            from artdeco_tpu.runtime.prewarm import (
                make_growth_hook, prewarm_system,
            )

            prewarm_system(self)
            # growth prediction: the scene model hands upcoming (capacity,
            # train_len, compact_budget) buckets here for background
            # compilation before the growth event needs them
            self.scene_model.growth_hook = make_growth_hook(self)
        self.mapper_index = 0
        self.related_frames: dict = {}   # slam kf index -> [mapper ids]
        self.mapper_meta: list = []      # per mapper frame bookkeeping
        self.runtimes = Runtimes()
        self.start_time = None
        self.n_frames = 0
        self._map_cache: dict = {}   # frame_id -> map-res image (native path)

    @staticmethod
    def _maybe_auto_calibrate(args, dataset, runner):
        """Model-based self-calibration when no intrinsics were given.

        The reference shells out to GeoCalib / COLMAP
        (``DatasetBasic.py:112-273``); the TPU-native system estimates the
        focal from the pointmap network's own first-frame prediction
        (Weiszfeld fit — DUSt3R's focal recovery), which costs one mono
        inference instead of a second calibration network."""
        if not getattr(dataset, "calib_is_guess", False):
            return
        if not getattr(args, "auto_calib", True):
            return
        if not hasattr(runner, "inference_mono"):
            return
        import jax.numpy as jnp

        from artdeco_tpu.geometry.calibration import estimate_focal_weiszfeld

        try:
            img, _ = dataset[0]
            img_slam = jnp.asarray(dataset.transform.to_slam(img))
            X, C, _, _ = runner.inference_mono(img_slam)
            h, w = dataset.H_slam, dataset.W_slam
            conf = np.asarray(C[0][:, 0])
            # keep the most-confident 70% (>= so a constant confidence map
            # keeps everything)
            valid = jnp.asarray(conf >= np.quantile(conf, 0.3))
            f_slam = float(estimate_focal_weiszfeld(X[0], valid, h, w))
            if not np.isfinite(f_slam) or f_slam <= 1.0:
                raise ValueError(f"degenerate focal estimate {f_slam}")
            # convert SLAM-res focal back to original-image pixels
            # (scale_slam_w is original/slam, CameraModel.py convention)
            f_orig = f_slam * dataset.transform.scale_slam_w
            dataset.recalibrate_focal(f_orig)
        except Exception as e:  # pragma: no cover - calibration is advisory
            import warnings

            warnings.warn(f"auto-calibration failed, keeping guess: {e}")

    # -- mapper message handling (run_system.py:143-271) -------------------
    def _handle_mapper_msg(self, m: dict, img_map=None):
        frame_id = m["frame_id"]
        last_kf_index = m["last_keyframe_index"]
        self.related_frames.setdefault(last_kf_index, []).append(
            self.mapper_index
        )
        # image source priority: the frame's device-resident SLAM tensor
        # (zero-copy, when map res == slam res), then the native loader's
        # host cache, then a dataset re-decode (the reference re-decodes
        # every image at map res, run_system.py:163)
        same_res = (self.dataset.H_map == self.dataset.H_slam
                    and self.dataset.W_map == self.dataset.W_slam)
        if same_res and m.get("img_dev") is not None:
            img_map = m["img_dev"]
            info = dict(self.dataset.infos[
                self.dataset.image_name_list[frame_id]])
        elif img_map is not None:
            info = dict(self.dataset.infos[
                self.dataset.image_name_list[frame_id]])
        elif (cached := self._map_cache.pop(frame_id, None)) is not None:
            img_map = cached
            info = dict(self.dataset.infos[
                self.dataset.image_name_list[frame_id]])
        else:
            original_img, info = self.dataset[frame_id]
            img_map = self.dataset.transform.to_map(original_img)

        T_WC = np.asarray(m["T_WC"], np.float32)
        Rt_w2c = _se3_w2c_matrix_np(T_WC[:7])

        kf = make_device_keyframe(
            index=self.mapper_index,
            global_frame_id=frame_id,
            image=img_map,
            point_map=m["point_map"],
            point_conf=m["point_conf"],
            is_test=m["is_test"],
            is_slam_keyframe=m["is_slam_keyframe"],
            pyr_levels=self.mapper_cfg.pyr_levels,
            image_name=info.get("name", f"frame_{frame_id:06d}"),
            timestamp=m["timestamp"],
        )
        self.mapper_meta.append(dict(
            last_keyframe_index=last_kf_index,
            is_slam_keyframe=m["is_slam_keyframe"],
            T_CkC=None if m["T_CkC"] is None else np.asarray(m["T_CkC"]),
        ))

        if m["is_slam_keyframe"] and frame_id > 0:
            self._rigid_transform_scene()

        self.scene_model.add_keyframe(kf, Rt_w2c)
        if m["is_important"]:
            self.scene_model.add_new_gaussians()
        n_iters = (
            getattr(self.args, "num_key_iterations", 30)
            if m["is_important"]
            else getattr(self.args, "num_common_iterations", 0)
        )
        if n_iters:
            self.scene_model.optimization_loop(n_iters, m["is_important"])
        self.mapper_index += 1

    def _rigid_transform_scene(self):
        """Propagate pose-graph updates into mapper poses + gaussians
        (run_system.py:194-227).  One batched device call at keyframe
        capacity — a per-keyframe python loop would cost O(n) host<->device
        round-trips per loop-closure event (O(n^2) over a run)."""
        import jax.numpy as jnp

        n = len(self.scene_model.keyframes)
        if n == 0:
            return
        cap = self.scene_model.cfg.keyframe_capacity
        ident8 = np.asarray([0, 0, 0, 0, 0, 0, 1, 1], np.float32)
        slam_T = np.tile(ident8, (cap, 1))
        TCkC = np.tile(ident8, (cap, 1))
        is_kf = np.zeros(cap, bool)
        mask = np.zeros(cap, bool)
        for mapper_id in range(n):
            meta = self.mapper_meta[mapper_id]
            slam_T[mapper_id] = self.keyframes.T_WC[meta["last_keyframe_index"]]
            is_kf[mapper_id] = meta["is_slam_keyframe"]
            if meta["T_CkC"] is not None:
                TCkC[mapper_id] = np.asarray(meta["T_CkC"], np.float32)
            mask[mapper_id] = True

        new_Rt, new_c2ws, old_c2ws = _rigid_transform_poses(
            self.scene_model.pool, jnp.asarray(slam_T), jnp.asarray(TCkC),
            jnp.asarray(is_kf), jnp.asarray(mask),
        )
        self.scene_model.set_keyframe_poses_masked(new_Rt, mask)
        if getattr(self.args, "rigid_transform_gaussians", True):
            # capacity-shaped device arrays pass straight through (unused
            # rows are identity) — no d2h pull + re-upload per loop closure
            self.scene_model.rigid_transform_gs(old_c2ws, new_c2ws)

    # -- main loop ----------------------------------------------------------
    def run(self, max_frames: Optional[int] = None, progress: bool = True,
            use_native_loader: bool = True, overlap: Optional[bool] = None):
        """Stream the dataset through track -> backend -> map.

        ``overlap`` (default: args.async_pipeline, else True) runs the
        mapper-facing half of the pipeline on a worker thread, overlapping
        it with tracking — the reference's 3-process concurrency with the
        hard-sync keyframe barrier kept (Frontend.py:119-124).  The
        trajectory is identical either way; only wall-clock differs."""
        if overlap is None:
            overlap = bool(getattr(self.args, "async_pipeline", True))
        self.start_time = time.time()
        native = make_native_prefetcher(self.dataset) if use_native_loader else None
        if native is not None:
            def native_iter():
                for i in range(len(self.dataset)):
                    slam, mp = native.get()
                    info = dict(self.dataset.infos[
                        self.dataset.image_name_list[i]])
                    if self.dataset.Twc_gt is not None:
                        info["Twc_gt"] = self.dataset.Twc_gt[i]
                    # keep only a small window of map-res tensors: mapper
                    # messages refer to recent frames (the upload-ahead
                    # thread runs a few frames ahead of consumption), and a
                    # dict keyed by frame id would grow ~3.7 MB/frame
                    # without bound
                    # pop with default: the main thread evicts concurrently
                    # (consumer pops at _handle_mapper_msg / _stream_loop), so
                    # a key seen by next(iter()) may be gone by pop time
                    self._map_cache[i] = mp
                    while len(self._map_cache) > 8:
                        try:
                            k = next(iter(self._map_cache))
                        except StopIteration:
                            break
                        self._map_cache.pop(k, None)
                    # frontend consumes the pre-transformed SLAM tensor
                    yield ("native", slam), info
            it = native_iter()
        else:
            it = _Prefetcher(self.dataset)
        # upload the SLAM tensor one frame ahead, off the tracking thread
        it = _UploadAhead(it, self.dataset.transform)
        bar = None
        if progress:
            try:
                from tqdm import tqdm

                bar = tqdm(total=len(self.dataset), desc="artdeco-tpu")
            except Exception:
                bar = None
        # optional jax.profiler trace (SURVEY §5: tracing/profiling hooks —
        # the reference only has wall-clock tqdm counters; here each stage is
        # additionally annotated in the device trace for xprof/tensorboard)
        profile_dir = getattr(self.args, "profile_dir", "") or ""
        if profile_dir:
            import jax

            jax.profiler.start_trace(profile_dir)
            annotate = jax.profiler.TraceAnnotation
        else:
            import contextlib

            annotate = lambda name: contextlib.nullcontext()
        worker = _MapperWorker(self) if overlap else None
        try:
            self._stream_loop(it, bar, max_frames, annotate, worker)
        finally:
            it.close()   # stop the upload thread on early exit / exception
            if worker is not None:
                worker.close()
            if profile_dir:
                import jax

                jax.profiler.stop_trace()
        if bar is not None:
            bar.close()
        return self

    def _stream_loop(self, it, bar, max_frames, annotate, worker=None):
        for original_image, info in it:
            t0 = time.time()
            with annotate("frontend.track"):
                msg = self.frontend.process_frame(original_image, info)
            self.runtimes.add("track", time.time() - t0)
            if msg is not None:
                t0 = time.time()
                with annotate("backend.sync"):
                    work = self.backend.process_sync(msg)
                self.runtimes.add("backend", time.time() - t0)
                if work is not None:
                    if worker is not None:
                        # map-res tensor is keyed by the CURRENT frame only
                        # (native loader); grab it before the next frame
                        # overwrites the cache
                        img_map = self._map_cache.pop(msg["frame_id"], None)
                        worker.submit(work, img_map)
                    else:
                        t0 = time.time()
                        with annotate("mapper.step"):
                            mapper_msg = self.backend.process_async(work)
                            if mapper_msg is not None:
                                self._handle_mapper_msg(mapper_msg)
                        self.runtimes.add("map", time.time() - t0)
            self.n_frames += 1
            if bar is not None:
                bar.update(1)
                # n_active_gaussians is a device readback — in overlap mode
                # it would block the tracking thread on the mapper's queued
                # device work, defeating the overlap
                gs = ("?" if worker is not None
                      else self.scene_model.n_active_gaussians)
                bar.set_postfix_str(
                    f"kf={len(self.keyframes)} gs={gs} "
                    f"lost={self.frontend.lost_number}",
                    refresh=False,
                )
            if max_frames is not None and self.n_frames >= max_frames:
                break

    # -- outputs (Frontend.sav_results + h3dgsv3 metadata) -------------------
    def save(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        slam_dir = os.path.join(out_dir, "slam")
        os.makedirs(slam_dir, exist_ok=True)
        from artdeco_tpu.dataio.tum_io import save_tum_trajectory

        est = self.frontend.estimated_trajectory()
        kf_traj = self.frontend.keyframe_trajectory()
        if len(est):
            save_tum_trajectory(
                os.path.join(slam_dir, "frames.txt"), est[:, 0], est[:, 1:8]
            )
        if len(kf_traj):
            save_tum_trajectory(
                os.path.join(slam_dir, "keyframes.txt"),
                kf_traj[:, 0], kf_traj[:, 1:8],
            )
        lost_pct = self.frontend.lost_number / max(len(self.dataset), 1)
        with open(os.path.join(slam_dir, "lost_percentage.txt"), "w") as f:
            f.write(str(lost_pct))
        with open(os.path.join(slam_dir, "config.json"), "w") as f:
            json.dump(self.config, f, indent=4, default=str)

        gt = np.asarray(self.frontend.frames_Twc_gt)
        eval_out = {}
        if len(gt) > 2 and len(est) > 2:
            from artdeco_tpu.eval.trajectory import evaluate_trajectory

            eval_out = evaluate_trajectory(
                slam_dir, "evaluate_frames.json", est, gt, max_dt=0.05
            )

        dt = time.time() - self.start_time if self.start_time else 0.0
        # full scene export: gaussian PLY, xyz+RGB PLY, COLMAP model, TUM
        # keyframe poses, pose frusta, test renders (h3dgsv3.save surface)
        scene_metrics = self.scene_model.save(
            out_dir, reconstruction_time=dt, n_frames=self.n_frames
        )
        metrics = {k: v for k, v in scene_metrics.items()
                   if k in ("PSNR", "SSIM", "LPIPS", "Render", "GS",
                            "n_test_frames")}
        metadata = {
            "time": dt,
            "FPS": self.n_frames / max(dt, 1e-9),
            "n_frames": self.n_frames,
            "n_keyframes": len(self.keyframes),
            "n_gaussians": int(self.scene_model.n_active_gaussians),
            "runtimes_ms": self.runtimes.summary(),
            "metrics": metrics,
            "trajectory": eval_out,
        }
        with open(os.path.join(out_dir, "run_metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2, default=str)
        return metadata

    def finetune(self, n_epochs: int):
        """Post-stream finetuning epochs (run_system.py:286-316)."""
        self.scene_model.enable_inference_mode()
        for _ in range(n_epochs):
            self.scene_model.finetune_epoch()
