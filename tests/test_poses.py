"""Pose-bootstrap suite tests: RANSAC, triangulation, PnP, mini-BA, MVS,
detection/matching on synthetic geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from artdeco_tpu.geometry import lie
from artdeco_tpu.poses import guided_mvs, matcher, mini_ba, pnp, ransac, triangulator
from artdeco_tpu.poses.feature_detector import FeatureDetector

F = 100.0
CENTRE = jnp.asarray([64.0, 48.0])
K = jnp.asarray([[F, 0, 64.0], [0, F, 48.0], [0, 0, 1.0]])


def _two_view_scene(n=200, seed=0, outliers=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, 3) * np.array([1.0, 0.8, 0.5]) + np.array([0, 0, 4.0])
    R6 = np.eye(3)[:, :2]
    t1 = np.zeros(3)
    # second camera: small rotation + baseline
    xi = jnp.asarray([0.3, 0.05, 0.02, 0.03, -0.04, 0.02, 0.0], jnp.float32)
    T2 = np.asarray(lie.sim3_exp(xi))
    R2 = np.asarray(lie.quat_to_matrix(jnp.asarray(T2[3:7])))
    t2 = T2[:3]

    def proj(Xc):
        return np.asarray(F * Xc[:, :2] / Xc[:, 2:3] + np.asarray(CENTRE))

    uv1 = proj(X)
    uv2 = proj(X @ R2.T + t2)
    if outliers:
        idx = rng.choice(n, outliers, replace=False)
        uv2[idx] += rng.randn(outliers, 2) * 50
    return X, uv1, uv2, R2, t2


def test_ransac_fundamental():
    X, uv1, uv2, R2, t2 = _two_view_scene(outliers=40)
    est = ransac.RANSACEstimator(N=256, max_error=1e-2)
    Fm, inliers, count = est.estimate(uv1, uv2)
    assert int(count) > 140, int(count)
    # epipolar constraint holds for inliers
    errs = np.asarray(ransac.sampson_error(Fm, jnp.asarray(uv1), jnp.asarray(uv2)))
    assert np.median(errs[np.asarray(inliers)]) < 1e-3


def test_triangulation_recovers_points():
    X, uv1, uv2, R2, t2 = _two_view_scene()
    Rt1 = np.eye(4, dtype=np.float32)
    Rt2 = np.eye(4, dtype=np.float32)
    Rt2[:3, :3] = R2
    Rt2[:3, 3] = t2
    world, depth, dis, valid = triangulator.triangulate(
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32)[None],
        jnp.asarray(Rt1), jnp.asarray(Rt2)[None],
        jnp.asarray(F), CENTRE, max_error=1e-2, min_dis=1e-5,
    )
    v = np.asarray(valid)
    assert v.mean() > 0.9
    err = np.linalg.norm(np.asarray(world)[v] - X[v], axis=1)
    assert np.median(err) < 0.02, np.median(err)


def test_pnp_recovers_pose():
    X, uv1, uv2, R2, t2 = _two_view_scene()
    T_gt = np.zeros(7, np.float32)
    T_gt[:3] = t2
    q = np.asarray(lie.matrix_to_quat(jnp.asarray(R2, jnp.float32)))
    T_gt[3:7] = q
    # perturbed init
    xi = jnp.asarray([0.1, -0.05, 0.08, 0.05, -0.03, 0.06, 0.0])
    T08 = lie.sim3_mul(lie.sim3_exp(xi),
                       jnp.concatenate([jnp.asarray(T_gt), jnp.ones(1)]))
    T_out, cost = pnp.opt_pnp(
        T08[None, :7], jnp.asarray(X, jnp.float32)[None],
        jnp.asarray(uv2, jnp.float32)[None],
        jnp.ones((1, X.shape[0]), bool), K, iters=25,
    )
    rel = lie.sim3_mul(
        lie.sim3_inv(jnp.concatenate([T_out[0], jnp.ones(1)])),
        jnp.concatenate([jnp.asarray(T_gt), jnp.ones(1)]),
    )
    err = float(jnp.linalg.norm(lie.sim3_log(rel)[:6]))
    assert err < 1e-3, err
    assert float(cost[0]) < 1e-2


def test_mini_ba_refines_poses():
    X, uv1, uv2, R2, t2 = _two_view_scene(n=100)
    R6D0 = jnp.stack([
        jnp.asarray(np.eye(3)[:, :2], jnp.float32),
        jnp.asarray(R2[:, :2] + 0.02 * np.random.RandomState(1).randn(3, 2),
                    jnp.float32),
    ])
    t0 = jnp.asarray(np.stack([np.zeros(3), t2 + [0.05, -0.03, 0.04]]),
                     jnp.float32)
    uv_obs = jnp.asarray(np.stack([uv1, uv2]), jnp.float32)
    valid = jnp.ones((2, 100), bool)
    R6D, t, f_out, xyz, cost = mini_ba.mini_ba(
        R6D0, t0, jnp.asarray(X, jnp.float32), uv_obs, valid,
        jnp.asarray(F), CENTRE, iters=40,
    )
    # reprojection cost collapses
    assert float(cost) < 1.0, float(cost)
    # gauge-invariant check: relative pose cam2 <- cam1 matches ground truth
    from artdeco_tpu.mapper.keyframe import sixd_to_mtx

    R1o = np.asarray(sixd_to_mtx(R6D[0]))
    R2o = np.asarray(sixd_to_mtx(R6D[1]))
    t1o, t2o = np.asarray(t)
    R_rel = R2o @ R1o.T
    t_rel = t2o - R_rel @ t1o
    np.testing.assert_allclose(R_rel, R2, atol=5e-3)
    np.testing.assert_allclose(t_rel, t2, atol=1e-2)


def test_guided_mvs_depth():
    X, uv1, uv2, R2, t2 = _two_view_scene(n=150)
    Rt1 = np.eye(4, dtype=np.float32)
    Rt2 = np.eye(4, dtype=np.float32)
    Rt2[:3, :3] = R2
    Rt2[:3, 3] = t2
    depth, valid = guided_mvs.guided_depth(
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32)[None],
        jnp.asarray(Rt1), jnp.asarray(Rt2)[None], jnp.asarray(F), CENTRE,
    )
    v = np.asarray(valid)
    assert v.mean() > 0.9
    err = np.abs(np.asarray(depth)[v] - X[v, 2]) / X[v, 2]
    assert np.median(err) < 0.01


def test_detector_and_matcher():
    rng = np.random.RandomState(0)
    img = rng.rand(48, 64).astype(np.float32)
    det = FeatureDetector(num_kpts=64)
    d1 = det(np.stack([img] * 3))
    assert d1.kpts.shape == (64, 2)
    # same image matches itself perfectly
    d2 = det(np.stack([img] * 3))
    m = matcher.match_described(d1, d2, min_sim=0.9)
    assert len(np.asarray(m.idx)) > 50
    sel = np.asarray(m.idx)
    np.testing.assert_allclose(
        np.asarray(m.kpts_other), np.asarray(d1.kpts)[sel], atol=1e-5
    )
