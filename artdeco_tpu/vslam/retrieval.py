"""ASMK-style loop-closure retrieval database.

Reference: ``VSLAM/mast3r_slam/retrieval_database.py:143-436`` (+ the vendored
``mast3r/retrieval`` head and ``asmk`` package): a retrieval head whitens and
projects MASt3R encoder features and selects top-N local features by
attention (= feature norm); features quantize to their top-k nearest codebook
centroids; per-centroid aggregated residuals are binarized and stored in an
inverted file; queries score images via a thresholded-polynomial similarity
on binary signatures (the ASMK* kernel), normalized by image signature
counts.  The similarity graph + windowing logic around ``update`` is
reproduced; the Pi3 "accurate loop closure" verification plugs in through an
optional callback.

The head's whitening/projection parameters load from the released retrieval
checkpoint via ``load_retrieval_head``; without weights it degrades to
identity whitening over raw encoder features (still a functional ivf).
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Callable, Optional

import numpy as np


@dataclasses.dataclass
class RetrievalHead:
    """prewhiten -> projector -> attention(norm) -> postwhiten -> top-N."""

    nfeat: int = 300
    prewhiten_mean: Optional[np.ndarray] = None   # (C,)
    prewhiten_p: Optional[np.ndarray] = None      # (C, C) or None
    projector_w: Optional[np.ndarray] = None      # (C, D)
    projector_b: Optional[np.ndarray] = None      # (D,)
    postwhiten_mean: Optional[np.ndarray] = None
    postwhiten_p: Optional[np.ndarray] = None
    residual: bool = False

    def __call__(self, feat: np.ndarray) -> np.ndarray:
        """(N, C) encoder tokens -> (nfeat, D) selected local features."""
        x = np.asarray(feat, np.float32)
        if self.prewhiten_mean is not None:
            x = x - self.prewhiten_mean
        if self.prewhiten_p is not None:
            x = x @ self.prewhiten_p
        if self.projector_w is not None:
            p = x @ self.projector_w + (self.projector_b if self.projector_b
                                        is not None else 0.0)
            if self.residual:
                p = p + x
        else:
            p = x
        attention = np.linalg.norm(p, axis=-1)
        if self.postwhiten_mean is not None:
            p = p - self.postwhiten_mean
        if self.postwhiten_p is not None:
            p = p @ self.postwhiten_p
        k = min(self.nfeat, p.shape[0])
        top = np.argsort(-attention)[:k]
        return p[top]


class SimilarityGraph:
    """Pairwise keyframe similarity accumulator
    (retrieval_database.py:43-141)."""

    def __init__(self):
        self.sim: dict = defaultdict(dict)

    def add_similarity(self, i: int, j: int, score: float):
        self.sim[i][j] = score
        self.sim[j][i] = score

    def remove_frame(self, i: int):
        self.sim.pop(i, None)
        for d in self.sim.values():
            d.pop(i, None)

    def get_similar_frames_sorted(self, i: int) -> list:
        entries = self.sim.get(i, {})
        return [k for k, _ in sorted(entries.items(), key=lambda kv: -kv[1])]


class RetrievalDatabase:
    """Inverted-file retrieval with binarized aggregated residuals (ASMK*)."""

    def __init__(
        self,
        cfg: dict,
        head: Optional[RetrievalHead] = None,
        centroids: Optional[np.ndarray] = None,
        num_centroids: int = 1024,
        feat_dim: int = 64,
        multiple_assignment: int = 5,
        alpha: float = 3.0,
        similarity_threshold: float = 0.0,
        accurate_matcher: Optional[Callable] = None,
        seed: int = 0,
    ):
        self.cfg = cfg["retrieval"]
        self.head = head or RetrievalHead()
        self._seed = seed
        self._num_centroids = num_centroids
        # centroids lazily sized from the first features seen when not given
        self.centroids = (
            np.asarray(centroids, np.float32) if centroids is not None else None
        )
        self.ma = multiple_assignment
        self.alpha = alpha
        self.sim_thresh = similarity_threshold
        # ivf: centroid -> (list of image ids, list of binary signatures)
        self.ivf: dict = defaultdict(list)
        self.image_norms: dict = {}
        self.kf_counter = 0
        self.sim_graph = SimilarityGraph()
        self.accurate_matcher = accurate_matcher  # Pi3 verification hook
        self.min_window_number = 12
        self.max_window_number = 24
        self.accurate_loop_closure_number = 12

    def _ensure_centroids(self, dim: int):
        if self.centroids is None:
            rng = np.random.RandomState(self._seed)
            c = rng.randn(self._num_centroids, dim).astype(np.float32)
            self.centroids = c / np.linalg.norm(c, axis=1, keepdims=True)

    # -- core ASMK math ----------------------------------------------------
    def _quantize(self, vecs: np.ndarray, k: int) -> np.ndarray:
        self._ensure_centroids(vecs.shape[-1])
        d2 = (
            (vecs ** 2).sum(1)[:, None]
            + (self.centroids ** 2).sum(1)[None, :]
            - 2.0 * vecs @ self.centroids.T
        )
        return np.argsort(d2, axis=1)[:, :k]

    def _aggregate(self, vecs: np.ndarray, assign: np.ndarray):
        """Aggregate residuals per centroid, binarize (ASMK aggregation).

        Returns dict centroid -> signature (D,) float in {-1, +1}.
        """
        agg: dict = {}
        for f in range(vecs.shape[0]):
            for c in assign[f]:
                agg.setdefault(int(c), []).append(
                    vecs[f] - self.centroids[int(c)]
                )
        out = {}
        for c, residuals in agg.items():
            r = np.mean(residuals, axis=0)
            n = np.linalg.norm(r)
            if n > 1e-12:
                r = r / n
            out[c] = np.where(r >= 0, 1.0, -1.0).astype(np.float32)
        return out

    def _similarity(self, b_q: np.ndarray, b_db: np.ndarray) -> float:
        """ASMK* kernel: thresholded signed-power of binary cosine."""
        d = b_q.shape[0]
        cos = float(b_q @ b_db) / d
        if cos < self.sim_thresh:
            return 0.0
        return cos ** self.alpha

    # -- public surface (reference update semantics) ------------------------
    def add(self, feat: np.ndarray):
        sigs = self._aggregate(feat, self._quantize(feat, 1))
        imid = self.kf_counter
        for c, sig in sigs.items():
            self.ivf[c].append((imid, sig))
        self.image_norms[imid] = max(np.sqrt(len(sigs)), 1e-12)
        self.kf_counter += 1

    def _query_scores(self, feat: np.ndarray) -> np.ndarray:
        scores = np.zeros(self.kf_counter, np.float32)
        sigs = self._aggregate(feat, self._quantize(feat, self.ma))
        for c, sig in sigs.items():
            for imid, db_sig in self.ivf.get(c, []):
                scores[imid] += self._similarity(sig, db_sig)
        q_norm = max(np.sqrt(len(sigs)), 1e-12)
        for i in range(self.kf_counter):
            scores[i] /= q_norm * self.image_norms.get(i, 1.0)
        return scores

    def update(self, backbone_feat: np.ndarray, add_after_query: bool,
               k: int, min_thresh: float = 0.0) -> list:
        """Query + (optionally) insert; returns related keyframe local ids
        (retrieval_database.py:200-261, incl. accurate-LC dispatch)."""
        feat = self.head(np.asarray(backbone_feat).reshape(
            -1, np.asarray(backbone_feat).shape[-1]))
        database_size = self.kf_counter

        topk_inds: list = []
        if self.kf_counter > 0:
            scores = self._query_scores(feat)
            for i in range(database_size):
                self.sim_graph.add_similarity(
                    database_size, i, float(scores[i]) * 100.0
                )
            order = np.argsort(-scores)[: min(k, database_size)]
            cand = [int(i) for i in order if scores[i] > min_thresh]

            use_plain = (
                (database_size < self.min_window_number and add_after_query)
                or self.accurate_matcher is None
            )
            if use_plain:
                topk_inds = cand
            else:
                need_accurate = (
                    not cand
                    or (database_size - min(cand)) > self.accurate_loop_closure_number
                    or not add_after_query
                )
                if need_accurate:
                    topk_inds = self._accurate_loop_closure(database_size)
                else:
                    topk_inds = cand
            if not add_after_query:
                self.sim_graph.remove_frame(database_size)

        if add_after_query:
            self.add(feat)
        return topk_inds

    def _accurate_loop_closure(self, keyframe_id: int) -> list:
        """Pi3 joint verification over <=24 similar frames
        (retrieval_database.py:263-300); requires accurate_matcher set to
        a callable (candidate_ids, query_id) -> list of match fractions."""
        related = self.sim_graph.get_similar_frames_sorted(keyframe_id)
        selected = related[: self.max_window_number - 1]
        if not selected or self.accurate_matcher is None:
            return []
        fracs = self.accurate_matcher(selected, keyframe_id)
        order = np.argsort(-np.asarray(fracs))
        out = [selected[i] for i in order
               if fracs[i] > self.cfg["accurate_min"]]
        return out[: self.cfg["k"]]
