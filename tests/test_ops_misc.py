import jax
import jax.numpy as jnp
import numpy as np

from artdeco_tpu.ops import adam, knn
from artdeco_tpu.mapper import clustering as voxel


def test_adam_basic_matches_formula():
    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.randn(10, 3), jnp.float32)
    g = jnp.asarray(rng.randn(10, 3), jnp.float32)
    st = adam.init_state(p)
    p1, st1 = adam.adam_update_basic(p, g, st, lr=0.1)
    m = 0.1 * np.asarray(g)
    v = 0.001 * np.asarray(g) ** 2
    expect = np.asarray(p) - 0.1 * m / (np.sqrt(v) + 1e-15)
    np.testing.assert_allclose(np.asarray(p1), expect, rtol=1e-5)


def test_adam_masked_only_touches_visible():
    rng = np.random.RandomState(1)
    p = jnp.asarray(rng.randn(8, 4), jnp.float32)
    g = jnp.asarray(rng.randn(8, 4), jnp.float32)
    vis = jnp.asarray([True, False] * 4)
    st = adam.init_state(p)
    p1, st1 = adam.adam_update_masked(p, g, st, 0.1, vis)
    np.testing.assert_array_equal(np.asarray(p1[1::2]), np.asarray(p[1::2]))
    np.testing.assert_array_equal(np.asarray(st1.exp_avg[1::2]), 0.0)
    assert not np.allclose(np.asarray(p1[0::2]), np.asarray(p[0::2]))
    # per-gaussian lr vector
    lr_vec = jnp.full((8,), 0.1)
    p2, _ = adam.adam_update_masked(p, g, st, lr_vec, vis)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=1e-6)


def test_adam_lr_decay():
    lr = jnp.full((6,), 1.0)
    vis = jnp.asarray([True, True, False, False, True, False])
    lr2 = adam.decay_lr_masked(lr, vis, 0.5, 0.6)
    np.testing.assert_allclose(np.asarray(lr2), [0.6, 0.6, 1.0, 1.0, 0.6, 1.0])


def test_segment_majority_vote():
    seg = jnp.asarray([0, 0, 0, 1, 1, 2], jnp.int32)
    lab = jnp.asarray([2, 2, 1, 0, 0, 3], jnp.int32)
    w = jnp.ones(6)
    winner, total = voxel.segment_majority_vote(seg, lab, w, 4, 5)
    assert winner[0] == 2 and winner[1] == 0 and winner[2] == 3
    np.testing.assert_allclose(np.asarray(total[:3]), [3, 2, 1])
    assert total[3] == 0
    # weighted vote flips the winner
    w2 = jnp.asarray([1.0, 1.0, 5.0, 1, 1, 1])
    winner2, _ = voxel.segment_majority_vote(seg, lab, w2, 4, 5)
    assert winner2[0] == 1


def test_voxel_hash_consistency():
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (100, 3))
    h1 = voxel.voxel_hash(xyz, 0.1, 1 << 16)
    h2 = voxel.voxel_hash(xyz + 1e-9, 0.1, 1 << 16)
    assert (np.asarray(h1) == np.asarray(h2)).mean() > 0.99
    assert int(h1.min()) >= 0 and int(h1.max()) < (1 << 16)


def test_knn_mean_dist_vs_bruteforce():
    rng = np.random.RandomState(3)
    xyz = rng.randn(300, 3).astype(np.float32)
    got = np.asarray(knn.knn_mean_sq_dist(jnp.asarray(xyz), k=3, window=32))
    d2 = ((xyz[:, None] - xyz[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    ref = np.sort(d2, axis=1)[:, :3].mean(1)
    # approximate: demand close agreement for the bulk of points
    rel = np.abs(got - ref) / np.maximum(ref, 1e-9)
    assert np.median(rel) < 0.05, np.median(rel)
    assert (rel < 0.5).mean() > 0.85
