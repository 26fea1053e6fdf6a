"""Retrieval database tests: self-similarity, discrimination, windowing."""

import numpy as np

from artdeco_tpu.vslam.retrieval import (
    RetrievalDatabase, RetrievalHead, SimilarityGraph,
)

CFG = {"retrieval": {"k": 3, "min_thresh": 5e-3, "accurate_min": 0.15}}


def _feats(rng, n=60, c=64, base=None, noise=0.0):
    if base is None:
        f = rng.randn(n, c).astype(np.float32)
    else:
        f = base + noise * rng.randn(*base.shape).astype(np.float32)
    return f


def test_head_selects_topk_by_norm():
    head = RetrievalHead(nfeat=5)
    f = np.zeros((10, 8), np.float32)
    f[np.arange(10), 0] = np.arange(10)
    out = head(f)
    assert out.shape == (5, 8)
    np.testing.assert_array_equal(sorted(out[:, 0]), [5, 6, 7, 8, 9])


def test_retrieval_ranks_similar_scene_first():
    rng = np.random.RandomState(0)
    db = RetrievalDatabase(CFG, num_centroids=128, feat_dim=64, seed=1)
    scenes = [_feats(rng) for _ in range(4)]
    for s in scenes:
        assert db.update(s, add_after_query=True, k=3) is not None
    assert db.kf_counter == 4

    # query with a noisy revisit of scene 1
    q = _feats(rng, base=scenes[1], noise=0.05)
    inds = db.update(q, add_after_query=False, k=3, min_thresh=0.0)
    assert len(inds) >= 1
    assert inds[0] == 1, inds
    # database size unchanged by query-only
    assert db.kf_counter == 4

    # scores discriminate: revisit of scene 3
    q3 = _feats(rng, base=scenes[3], noise=0.05)
    inds3 = db.update(q3, add_after_query=False, k=3)
    assert inds3[0] == 3


def test_min_thresh_filters():
    rng = np.random.RandomState(2)
    db = RetrievalDatabase(CFG, num_centroids=128, feat_dim=64)
    db.update(_feats(rng), add_after_query=True, k=3)
    # unrelated query with an impossible threshold
    inds = db.update(_feats(rng), add_after_query=False, k=3, min_thresh=10.0)
    assert inds == []


def test_similarity_graph():
    g = SimilarityGraph()
    g.add_similarity(3, 0, 1.0)
    g.add_similarity(3, 1, 5.0)
    g.add_similarity(3, 2, 3.0)
    assert g.get_similar_frames_sorted(3) == [1, 2, 0]
    g.remove_frame(3)
    assert g.get_similar_frames_sorted(3) == []
    assert 3 not in g.sim.get(1, {})


def test_accurate_loop_closure_hook():
    rng = np.random.RandomState(3)
    calls = {}

    def matcher(cands, qid):
        calls["args"] = (list(cands), qid)
        return [0.5 if c == 0 else 0.01 for c in cands]

    db = RetrievalDatabase(CFG, num_centroids=128, feat_dim=64,
                           accurate_matcher=matcher)
    db.min_window_number = 0  # force the accurate path immediately
    db.accurate_loop_closure_number = -10**9
    base = _feats(rng)
    db.update(base, add_after_query=True, k=3)
    db.update(_feats(rng), add_after_query=True, k=3)
    inds = db.update(_feats(rng, base=base, noise=0.05),
                     add_after_query=False, k=3)
    assert "args" in calls
    assert inds == [0]  # only candidate 0 passes accurate_min
