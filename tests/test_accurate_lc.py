"""Pi3 accurate loop closure: converter, head/codebook loading, wiring.

Covers VERDICT r1 items 3 (wire Pi3 accurate LC end-to-end) and 4
(retrieval head/codebook loading + vectorized DB).
"""

import pickle
import types

import jax.numpy as jnp
import numpy as np
import pytest

from artdeco_tpu.models.convert_pi3 import (
    convert_pi3_state_dict, synth_pi3_state_dict,
)
from artdeco_tpu.models.pi3 import Pi3, load_pi3_apply, tiny_pi3_config
from artdeco_tpu.vslam.retrieval import (
    RetrievalDatabase, build_retrieval_database, load_codebook,
    load_retrieval_head,
)

CFG = {
    "retrieval": {"k": 3, "min_thresh": 5e-3, "accurate_min": 0.15},
    "matching": {
        "max_iter": 10, "lambda_init": 1e-8, "convergence_thresh": 1e-6,
        "dist_thresh": 0.1, "radius": 3, "dilation_max": 5,
    },
}


# -- converter ---------------------------------------------------------------

def test_convert_pi3_roundtrip_tiny():
    cfg = tiny_pi3_config(compute_dtype=jnp.float32)
    sd = synth_pi3_state_dict(cfg)
    params = convert_pi3_state_dict(sd, cfg)
    model = Pi3(cfg)
    imgs = np.random.RandomState(0).rand(1, 2, 3, 28, 28).astype(np.float32)
    out = model.apply(params, jnp.asarray(imgs))
    assert out["points"].shape == (1, 2, 28, 28, 3)
    assert out["camera_poses"].shape == (1, 2, 4, 4)
    assert all(bool(jnp.isfinite(v).all()) for v in out.values())
    # structural equality with a freshly-initialized tree
    import jax

    ref = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs))
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, params)
    assert ref_shapes == got_shapes


def test_convert_pi3_folds_cls_pos_embed():
    cfg = tiny_pi3_config(compute_dtype=jnp.float32)
    sd = synth_pi3_state_dict(cfg)
    params = convert_pi3_state_dict(sd, cfg)
    enc = params["params"]["encoder"]
    np.testing.assert_allclose(
        enc["cls_token"],
        sd["encoder.cls_token"] + sd["encoder.pos_embed"][:, :1],
        rtol=1e-6,
    )
    assert enc["pos_embed"].shape[1] == 37 * 37


# -- retrieval head / codebook loading ---------------------------------------

def test_load_retrieval_head_pth(tmp_path):
    torch = pytest.importorskip("torch")
    C = 16
    rng = np.random.RandomState(0)
    m = rng.randn(1, C).astype(np.float64)
    p = rng.randn(C, C).astype(np.float64)
    ckpt = {
        "args": types.SimpleNamespace(nfeat=7, residual=False, hdims=""),
        "model": {"prewhiten.m": torch.tensor(m),
                  "prewhiten.p": torch.tensor(p)},
    }
    path = tmp_path / "retr.pth"
    torch.save(ckpt, path)
    head = load_retrieval_head(str(path))
    assert head.nfeat == 7
    feats = rng.randn(30, C).astype(np.float32)
    out = head(feats)
    assert out.shape == (7, C)
    # manual math: whiten, select top-7 by norm
    w = (feats - m.reshape(-1)) @ p
    attn = np.linalg.norm(w, axis=-1)
    expect = w[np.argsort(-attn)[:7]]
    np.testing.assert_allclose(out, expect.astype(np.float32), rtol=1e-4)


def test_load_retrieval_head_with_projector(tmp_path):
    torch = pytest.importorskip("torch")
    C, D = 12, 8
    rng = np.random.RandomState(1)
    W = rng.randn(D, C).astype(np.float64)
    b = rng.randn(D).astype(np.float64)
    ckpt = {
        "args": types.SimpleNamespace(nfeat=5, residual=False),
        "model": {"projector.0.weight": torch.tensor(W),
                  "projector.0.bias": torch.tensor(b)},
    }
    path = tmp_path / "retr_proj.pth"
    torch.save(ckpt, path)
    head = load_retrieval_head(str(path))
    feats = rng.randn(20, C).astype(np.float32)
    out = head(feats)
    assert out.shape == (5, D)
    proj = feats @ W.T + b
    attn = np.linalg.norm(proj, axis=-1)
    expect = proj[np.argsort(-attn)[:5]]
    np.testing.assert_allclose(out, expect.astype(np.float32), rtol=1e-4)


def test_load_codebook_formats(tmp_path):
    cents = np.random.RandomState(0).randn(32, 16).astype(np.float32)
    # asmk state-dict pickle (codebook.py:65-77)
    pkl = tmp_path / "x_codebook.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"type": "Codebook", "params": {},
                     "state": {"centroids": cents}}, f)
    np.testing.assert_array_equal(load_codebook(str(pkl)), cents)
    npy = tmp_path / "cb.npy"
    np.save(npy, cents)
    np.testing.assert_array_equal(load_codebook(str(npy)), cents)


# -- vectorized ASMK math vs naive reference ---------------------------------

def _naive_scores(db, feat):
    """Transcription of the round-1 per-feature/per-image loops."""
    assign = db._quantize(feat, db.ma)
    agg = {}
    for f in range(feat.shape[0]):
        for c in assign[f]:
            agg.setdefault(int(c), []).append(feat[f] - db.centroids[int(c)])
    sigs = {c: np.where(np.mean(r, axis=0) >= 0, 1.0, -1.0).astype(np.float32)
            for c, r in agg.items()}
    scores = np.zeros(db.kf_counter, np.float32)
    for c, sig in sigs.items():
        entry = db.ivf.get(c)
        if not entry:
            continue
        for imid, db_sig in zip(entry[0], entry[1]):
            cos = float(sig @ db_sig) / sig.shape[0]
            if cos >= db.sim_thresh:
                scores[imid] += cos ** db.alpha
    q_norm = max(np.sqrt(len(sigs)), 1e-12)
    for i in range(db.kf_counter):
        scores[i] /= q_norm * db.image_norms[i]
    return scores


def test_query_scores_match_naive():
    rng = np.random.RandomState(3)
    db = RetrievalDatabase(CFG, num_centroids=64, feat_dim=32, seed=0)
    for _ in range(6):
        db.add(rng.randn(40, 32).astype(np.float32))
    q = rng.randn(40, 32).astype(np.float32)
    fast = db._query_scores(q)
    slow = _naive_scores(db, q)
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)


# -- accurate-LC dispatch + end-to-end wiring ---------------------------------

def test_accurate_lc_dispatch_called_for_far_candidates():
    """A far-away retrieval candidate must route through the Pi3 matcher
    (retrieval_database.py:231-249 dispatch semantics)."""
    rng = np.random.RandomState(0)
    calls = []

    def fake_matcher(candidate_ids, query_id):
        calls.append((list(candidate_ids), query_id))
        return [0.9] * len(candidate_ids)

    db = RetrievalDatabase(CFG, num_centroids=64, feat_dim=32, seed=0,
                           accurate_matcher=fake_matcher)
    db.min_window_number = 2   # shrink windows for the test
    db.accurate_loop_closure_number = 2
    scenes = [rng.randn(40, 32).astype(np.float32) for _ in range(6)]
    for s in scenes:
        db.update(s, add_after_query=True, k=3)
    # revisit scene 0: candidate (0) is > accurate_loop_closure_number away
    q = scenes[0] + 0.01 * rng.randn(40, 32).astype(np.float32)
    inds = db.update(q, add_after_query=True, k=3, min_thresh=0.0)
    assert calls, "accurate matcher was never invoked"
    assert inds, "accurate LC returned no edges despite high fractions"


def test_build_retrieval_database_wires_pi3(monkeypatch):
    """--accurate_loop_closure constructs a live Pi3 matcher end-to-end."""
    from artdeco_tpu.vslam.keyframes import KeyframeStore

    args = types.SimpleNamespace(
        accurate_loop_closure=True, model_size="tiny",
        retrieval_checkpoint_path="", pi3_checkpoint_path="",
    )
    kfs = KeyframeStore(24, 32, buffer=8)
    db = build_retrieval_database(args, CFG, kfs)
    assert db.accurate_matcher is not None

    # two keyframes with distinct images
    from artdeco_tpu.vslam.frame import Frame

    rng = np.random.RandomState(0)
    for i in range(3):
        img = jnp.asarray(rng.rand(3, 24, 32).astype(np.float32) * 2 - 1)
        kfs.append(Frame(
            img=img, T_WC=jnp.asarray(np.r_[0, 0, 0, 0, 0, 0, 1, 1]
                                      .astype(np.float32)),
            X_canon=jnp.zeros((24 * 32, 3)), C=jnp.ones((24 * 32, 1)),
            N=jnp.asarray(1), frame_id=i, frame_time=float(i),
        ))
    fracs = db.accurate_matcher([0, 1], 2)
    assert len(fracs) == 2
    assert all(np.isfinite(f) for f in fracs)


def test_system_accurate_lc_executes():
    """Oracle-driven run on a synthetic clip with accurate LC on: the Pi3
    matcher must actually execute inside the pipeline (eval setup
    "accurate-lc" has to change behavior, not just parse)."""
    import os

    from artdeco_tpu.dataio.dataset import SyntheticDataset
    from artdeco_tpu.mapper.config import MapperConfig
    from artdeco_tpu.models.oracle import OracleRunner
    from artdeco_tpu.runtime.system import System
    from artdeco_tpu.utils.config import load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = types.SimpleNamespace(
        source_path="", images_dir="images", downsampling=2.0,
        max_size_slam=128, start_at=0, end_at=0, seq_length=0,
        image_sampling=0, dataset_name="synthetic", test_hold=-1,
        calib=None, init_focal=-1.0, init_fov=-1.0, optimize_focal=False,
        covariance_filter=False, point_fusion_frontend=True,
        use_all_frames=False, use_same_set_of_keyframes=False,
        min_displacement=0.005, thres_keyframe=0.8, num_GBA=1,
        num_key_iterations=1, num_common_iterations=0,
        sh_degree=1, local_feat_dim=8, global_feat_dim=8, pyr_levels=1,
        accurate_loop_closure=True, model_size="tiny",
        retrieval_checkpoint_path="", pi3_checkpoint_path="",
    )
    dataset = SyntheticDataset(args, n_frames=10, width=128, height=96)
    config = load_config(os.path.join(repo, "config/base.yaml"))
    config["matching"]["radius"] = 1
    config["matching"]["dilation_max"] = 1
    # force nearly every frame to become a SLAM keyframe so the retrieval
    # database fills up within a 10-frame clip
    config["tracking"]["match_frac_thresh"] = 0.999

    runner = OracleRunner((dataset.H_slam, dataset.W_slam), dataset.K_slam,
                          config["matching"])
    for i in range(len(dataset)):
        img, info = dataset[i]
        T = np.zeros(8, np.float32)
        T[:7] = info["Twc_gt"]
        T[7] = 1.0
        runner.register(dataset.transform.to_slam(img), i, T)

    mcfg = MapperConfig(
        capacity=2048, cluster_capacity=512, voxel_table_size=4096,
        new_budget=512, keyframe_capacity=64, sh_degree=1,
        local_feat_dim=8, global_feat_dim=8, pyr_levels=1,
        gs_add_ratio=1.0, init_proba_scaler=4.0,
    )
    system = System(args, config, dataset, runner, mapper_cfg=mcfg)
    db = system.backend.retrieval
    assert db.accurate_matcher is not None
    calls = []
    inner = db.accurate_matcher

    def counting(cand, q):
        calls.append(len(cand))
        return inner(cand, q)

    db.accurate_matcher = counting
    # force the accurate path to fire early in a short run
    db.min_window_number = 2
    db.accurate_loop_closure_number = 0
    system.run(progress=False, use_native_loader=False)
    assert calls, "Pi3 accurate loop closure never executed in the pipeline"
