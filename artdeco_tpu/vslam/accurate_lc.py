"""Accurate loop closure: Pi3 joint multi-view verification.

Reference: ``retrieval_database.py:263-324`` (accurate_loop_closure +
process_pairs_in_chunks): stack <=24 candidate keyframes + the query, run Pi3
jointly at 392x518, then pairwise ``match_pi3`` between each candidate's
points and the query's points (both in Pi3's common frame); rank candidates
by valid-match fraction.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from artdeco_tpu.ops.matching import match_pi3


def make_pi3_accurate_matcher(
    pi3_apply: Callable,       # (imgs (1, N, 3, H, W)) -> dict with "points"
    keyframes,                 # KeyframeStore (img in [-1, 1] CHW)
    match_cfg: dict,
    resize_hw=(392, 518),
    chunk_size: int = 32,
    pad_to: int = 24,          # max_window_number: one static jit shape
):
    """Returns accurate_matcher(candidate_ids, query_id) -> match fractions,
    pluggable into RetrievalDatabase."""

    def resize(img_chw: np.ndarray) -> np.ndarray:
        import cv2

        rgb = np.clip((img_chw.transpose(1, 2, 0) + 1.0) / 2.0, 0, 1)
        out = cv2.resize(rgb, (resize_hw[1], resize_hw[0]),
                         interpolation=cv2.INTER_AREA)
        return out.transpose(2, 0, 1)

    def matcher(candidate_ids, query_id):
        # the database guarantees <= max_window_number-1 candidates
        # (retrieval.py:323); guard the invariant rather than silently
        # truncating the score list if the two constants ever diverge
        assert len(candidate_ids) + 1 <= pad_to, (
            f"{len(candidate_ids)} candidates exceed pad_to={pad_to}"
        )
        idxs_all = list(candidate_ids) + [query_id]
        imgs = np.stack(
            [resize(np.asarray(keyframes.img_dev(i))) for i in idxs_all]
        )
        # pad the frame axis to a static shape (jit compiles once); padded
        # slots repeat the query image and their outputs are ignored
        n_real = imgs.shape[0]
        if n_real < pad_to:
            pad = np.broadcast_to(
                imgs[-1], (pad_to - n_real,) + imgs.shape[1:]
            )
            imgs = np.concatenate([imgs, pad], axis=0)
        res = pi3_apply(jnp.asarray(imgs[None]))
        points = np.asarray(res["points"][0])  # (pad_to, H, W, 3)

        q = points[n_real - 1]
        n_cand = len(candidate_ids)
        fracs = []
        # chunks stay at static width (padded rows are query copies whose
        # fractions are discarded) so match_pi3 also compiles once
        for s in range(0, pad_to - 1, chunk_size):
            cand = points[s : min(s + chunk_size, pad_to - 1)]
            qb = np.broadcast_to(q, cand.shape)
            _, valid = match_pi3(
                match_cfg, jnp.asarray(cand), jnp.asarray(qb)
            )
            fracs.extend(np.asarray(valid).mean(axis=1).tolist())
        return fracs[:n_cand]

    return matcher
