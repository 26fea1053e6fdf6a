"""Web viewer: websocket JPEG render streaming + static HTTP page.

Reference: ``Reconstruct/webviewer/webviewer.py:23-111`` + ``index.html`` and
the HTTP wiring in ``run_system.py:121-129``.  Protocol parity: the server
pushes a JSON state header (trainer_state, scene bounds, mean pose), receives
the client's camera state, renders at half the requested resolution and
replies with a JPEG frame.
"""

from __future__ import annotations

import http.server
import json
import os
import threading
import time
from functools import partial

import numpy as np


class WebViewer:
    def __init__(self, scene_model, ip: str = "0.0.0.0", port: int = 6009):
        self.ip = ip
        self.port = port
        self.num_clients = 0
        self.scene_model = scene_model
        self.state = "stop"
        self.trainer_state = "training"

    # -- render one client request -----------------------------------------
    def _render_reply(self, data: dict) -> bytes:
        """Render modes mirror the reference GaussianViewer's
        ["Splats", "Depth", "Ellipsoids"] picker (gaussianviewer.py:96):
        depth is the normalized inverse-depth channel; ellipsoid mode
        renders opaque DC-colored gaussians (extent view) — the GL ellipsoid
        widget's role without a GL context."""
        import dataclasses as _dc

        import cv2
        import jax.numpy as jnp

        from artdeco_tpu.mapper import keyframe as KFmod
        from artdeco_tpu.mapper.scene_model import render_core_jit

        sm = self.scene_model
        res_x = max(int(data["res_x"]) // 2, 16)
        res_y = max(int(data["res_y"]) // 2, 16)
        f = sm.f * res_y / sm.height
        K = jnp.asarray([[f, 0, res_x / 2], [0, f, res_y / 2], [0, 0, 1.0]])

        if data.get("snapToLast") and sm.keyframes:
            viewmat = KFmod.get_Rt(sm.pool, len(sm.keyframes) - 1)
        else:
            pose = np.asarray(data["pose"], np.float32).reshape(4, 4).T
            pose[:3, 1] *= -1
            pose[:3, 2] *= -1
            viewmat = jnp.asarray(np.linalg.inv(pose))

        mode = data.get("mode", "splat")
        slab = sm.slab
        if mode == "ellipsoid":
            slab = _dc.replace(
                slab,
                opacity=jnp.full_like(slab.opacity, 6.0),  # sigmoid -> ~1
                f_rest=jnp.zeros_like(slab.f_rest),        # flat DC color
            )
        pkg = render_core_jit(
            slab, sm.gfeat.val, sm.mlp, viewmat, jnp.eye(3, 4), K,
            res_x, res_y, jnp.zeros(3), sm.cfg.sh_degree,
            sm.cfg.low_pass_filter_eps, sm.cfg.cluster_capacity,
        )
        if mode == "depth":
            inv = np.asarray(pkg["invdepth"][0])
            hi = max(float(np.percentile(inv, 99.0)), 1e-6)
            img = np.clip(inv / hi, 0.0, 1.0)
            arr = (np.stack([img] * 3, axis=-1) * 255).astype(np.uint8)
        else:
            img = np.asarray(jnp.clip(pkg["render"], 0, 1))
            arr = (img.transpose(1, 2, 0) * 255).astype(np.uint8)
        ok, buf = cv2.imencode(
            ".jpg", cv2.cvtColor(arr, cv2.COLOR_RGB2BGR),
            [cv2.IMWRITE_JPEG_QUALITY, 50],
        )
        return buf.tobytes()

    def _state_header(self) -> str:
        sm = self.scene_model
        try:
            from artdeco_tpu.mapper import keyframe as KFmod

            Rts = np.asarray(KFmod.get_all_Rt(sm.pool))
            n = len(sm.keyframes)
            centres = np.stack([
                -Rts[i, :3, :3].T @ Rts[i, :3, 3] for i in range(n)
            ])
            centres[:, 1] *= -1
            centres[:, 2] *= -1
            mean_pose = np.linalg.inv(Rts[n // 2])
            mean_pose[:3, 1] *= -1
            mean_pose[:3, 2] *= -1
            header = {
                "trainer_state": self.trainer_state,
                "max_pos": centres.max(0).tolist(),
                "min_pos": centres.min(0).tolist(),
                "mean_pose": mean_pose.flatten().tolist(),
                "n_keyframes": n,
            }
        except Exception:
            header = {
                "trainer_state": self.trainer_state,
                "max_pos": [0.0] * 3,
                "min_pos": [0.0] * 3,
                "mean_pose": np.eye(4).flatten().tolist(),
            }
        return json.dumps(header)

    # -- websocket main loop (webviewer.py:43-111) ---------------------------
    def _client_loop(self, websocket):
        from websockets.exceptions import ConnectionClosed

        if self.num_clients >= 1:
            while self.num_clients >= 1:
                time.sleep(1)
        self.num_clients += 1
        while True:
            try:
                websocket.send(self._state_header())
                data = json.loads(websocket.recv())
                self.state = data.get("state", "stop")
                websocket.send(self._render_reply(data))
            except ConnectionClosed:
                self.num_clients -= 1
                break
            except Exception:
                self.num_clients -= 1
                break

    def run(self):
        from websockets.sync.server import serve

        with serve(self._client_loop, self.ip, self.port, max_size=None,
                   compression=None) as server:
            server.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self.run, daemon=True)
        t.start()
        return t


def serve_static_page(ip: str, port: int, directory: str):
    """HTTP server for the viewer page (run_system.py:121-129)."""
    handler = partial(
        http.server.SimpleHTTPRequestHandler, directory=directory
    )
    httpd = http.server.ThreadingHTTPServer((ip, port), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd
