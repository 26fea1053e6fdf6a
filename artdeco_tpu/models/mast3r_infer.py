"""MASt3R inference glue: mono/asymmetric/symmetric decode + matching.

Reference: ``VSLAM/utils_mast3r.py:10-202``.  The reference decodes symmetric
edges in a Python loop, one pair at a time (utils_mast3r.py:44-63 — flagged
as a hot spot in SURVEY.md §7); here edge batches decode in one jitted batched
call.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from artdeco_tpu.models.mast3r import MASt3R, MASt3RConfig
from artdeco_tpu.ops import matching


class Mast3rRunner:
    """Holds params and per-resolution jitted apply functions."""

    def __init__(self, cfg: MASt3RConfig, params, match_cfg: dict):
        self.cfg = cfg
        self.params = params
        self.match_cfg = dict(match_cfg)
        self.model = MASt3R(cfg)

        self._encode = jax.jit(
            lambda p, img: self.model.apply(p, img, method=MASt3R.encode)
        )

        def _decode_heads(p, f1, pos1, f2, pos2, nh, nw):
            def run(mdl):
                d1, d2 = mdl.decode(f1, pos1, f2, pos2)
                r1 = mdl.head(1, d1, nh, nw)
                r2 = mdl.head(2, d2, nh, nw)
                return r1, r2
            return self.model.apply(p, method=lambda mdl: run(mdl))

        self._decode = jax.jit(_decode_heads, static_argnames=("nh", "nw"))

    @classmethod
    def create(cls, cfg: MASt3RConfig = MASt3RConfig(), match_cfg: dict = None,
               params=None, seed: int = 0, init_hw=(64, 64)):
        if params is None:
            model = MASt3R(cfg)
            img = jnp.zeros((1, 3, *init_hw))
            params = model.init(jax.random.PRNGKey(seed), img, img)
        return cls(cfg, params, match_cfg or dict(
            max_iter=10, lambda_init=1e-8, convergence_thresh=1e-6,
            dist_thresh=0.1, radius=4, dilation_max=5,
        ))

    # -- primitives -------------------------------------------------------
    def encode_image(self, img: jax.Array):
        """img (B, 3, H, W) in [-1, 1] -> (feat (B,N,C), pos (B,N,2))."""
        return self._encode(self.params, img)

    def decode(self, feat1, pos1, feat2, pos2, hw):
        nh, nw = hw[0] // self.cfg.patch_size, hw[1] // self.cfg.patch_size
        return self._decode(self.params, feat1, pos1, feat2, pos2, nh, nw)

    # -- reference surface -------------------------------------------------
    def inference_mono(self, img: jax.Array):
        """(3, H, W) -> (X (2,HW,3), C (2,HW,1), feat, pos)
        (utils_mast3r.py:175-191: self-pair decode)."""
        h, w = img.shape[-2:]
        feat, pos = self.encode_image(img[None])
        r1, r2 = self.decode(feat, pos, feat, pos, (h, w))
        X = jnp.stack([r1["pts3d"][0], r2["pts3d"][0]]).reshape(2, h * w, 3)
        C = jnp.stack([r1["conf"][0], r2["conf"][0]]).reshape(2, h * w, 1)
        return X, C, feat, pos

    def match_asymmetric(self, img_i, img_j, idx_i2j_init=None,
                         embeddings_i=None, embeddings_j=None):
        """Track-time pair inference + matching (utils_mast3r.py:144-170).

        Returns (idx_i2j, valid_match_j, Xii, Cii, Qii, Xji, Cji, Qji,
        feat_i, pos_i) with flattened (HW, ...) per-pixel arrays.
        """
        h, w = img_i.shape[-2:]
        if embeddings_i is not None:
            feat1, pos1 = embeddings_i
        else:
            feat1, pos1 = self.encode_image(img_i[None])
        if embeddings_j is not None:
            feat2, pos2 = embeddings_j
        else:
            feat2, pos2 = self.encode_image(img_j[None])
        r11, r21 = self.decode(feat1, pos1, feat2, pos2, (h, w))

        Xii, Xji = r11["pts3d"], r21["pts3d"]         # (1,H,W,3) each
        Dii, Dji = r11["desc"], r21["desc"]
        idx_i2j, valid_match_j = matching.match(
            self.match_cfg, Xii, Xji, Dii, Dji, idx_1_to_2_init=idx_i2j_init
        )
        hw = h * w
        out = (
            idx_i2j,
            valid_match_j,
            Xii.reshape(hw, 3),
            r11["conf"].reshape(hw, 1),
            r11["desc_conf"].reshape(hw, 1),
            Xji.reshape(hw, 3),
            r21["conf"].reshape(hw, 1),
            r21["desc_conf"].reshape(hw, 1),
            feat1,
            pos1,
        )
        return out

    def match_symmetric(self, feat_i, pos_i, feat_j, pos_j, hw):
        """Backend edge matching, batched over edges
        (utils_mast3r.py:42-110).  feat_* (B,N,C) stacked per edge.

        Returns (idx_i2j, idx_j2i, valid_match_j, valid_match_i,
        Qii, Qjj, Qji, Qij) with Q* (B, HW, 1).
        """
        h, w = hw
        # both directions in ONE batched decode: [i->j, j->i]
        f1 = jnp.concatenate([feat_i, feat_j], axis=0)
        p1 = jnp.concatenate([pos_i, pos_j], axis=0)
        f2 = jnp.concatenate([feat_j, feat_i], axis=0)
        p2 = jnp.concatenate([pos_j, pos_i], axis=0)
        rA, rB = self.decode(f1, p1, f2, p2, (h, w))
        b = feat_i.shape[0]
        # rA: [res11 | res22]; rB: [res21 | res12]
        Xii, Xjj = rA["pts3d"][:b], rA["pts3d"][b:]
        Xji, Xij = rB["pts3d"][:b], rB["pts3d"][b:]
        Dii, Djj = rA["desc"][:b], rA["desc"][b:]
        Dji, Dij = rB["desc"][:b], rB["desc"][b:]
        Qii, Qjj = rA["desc_conf"][:b], rA["desc_conf"][b:]
        Qji, Qij = rB["desc_conf"][:b], rB["desc_conf"][b:]

        X11 = jnp.concatenate([Xii, Xjj], axis=0)
        X21 = jnp.concatenate([Xji, Xij], axis=0)
        D11 = jnp.concatenate([Dii, Djj], axis=0)
        D21 = jnp.concatenate([Dji, Dij], axis=0)
        idx, valid = matching.match(self.match_cfg, X11, X21, D11, D21)
        hw_n = h * w
        return (
            idx[:b], idx[b:], valid[:b], valid[b:],
            Qii.reshape(b, hw_n, 1), Qjj.reshape(b, hw_n, 1),
            Qji.reshape(b, hw_n, 1), Qij.reshape(b, hw_n, 1),
        )
