import jax
import jax.numpy as jnp
import numpy as np

from artdeco_tpu.geometry import lie, projection as proj
from artdeco_tpu.vslam import tracker
from artdeco_tpu.vslam.tracker import TrackingConfig
from artdeco_tpu.vslam.frame import Frame
from artdeco_tpu.vslam.keyframes import KeyframeStore


K = jnp.asarray([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1.0]])
H, W = 48, 64


def _scene(key):
    uv = proj.get_pixel_coords((H, W))
    z = 2.0 + 0.4 * jnp.sin(uv[:, 0] / 9.0) + 0.3 * jnp.cos(uv[:, 1] / 7.0)
    return proj.backproject(uv, z[:, None], K)


def test_masked_quantile_matches_torch_semantics():
    rng = np.random.RandomState(0)
    x = rng.randn(100).astype(np.float32)
    mask = rng.rand(100) > 0.3
    got = float(tracker.masked_quantile(jnp.asarray(x), jnp.asarray(mask), 0.9))
    import torch

    ref = float(torch.quantile(torch.from_numpy(x[mask]), 0.9))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_opt_pose_ray_dist_recovers_pose():
    Xk = _scene(jax.random.PRNGKey(0))
    xi = jnp.asarray([0.05, -0.02, 0.03, 0.01, -0.02, 0.015, 0.02])
    T_CkCf_true = lie.sim3_exp(xi)
    # frame points = keyframe points moved into frame f: Xf = T_fk * Xk
    Xf = lie.sim3_act(lie.sim3_inv(T_CkCf_true), Xk)
    T_WCk = lie.sim3_identity()
    T_WCf_init = T_WCk  # start at keyframe pose
    Q = jnp.full((H * W, 1), 4.0)
    valid = jnp.ones((H * W, 1), bool)
    cfg = TrackingConfig(max_iters=50, rel_error=0.0, delta_norm=1e-7)
    T_WCf, T_CkCf, ok = tracker.opt_pose_ray_dist_sim3(
        Xf, Xk, T_WCf_init, T_WCk, Q, valid, cfg
    )
    assert bool(ok)
    err = lie.sim3_log(lie.sim3_mul(lie.sim3_inv(T_CkCf), T_CkCf_true))
    assert float(jnp.linalg.norm(err)) < 1e-4


def test_opt_pose_calib_recovers_pose():
    Xk = _scene(jax.random.PRNGKey(1))
    xi = jnp.asarray([0.04, -0.03, 0.05, 0.015, -0.01, 0.02, -0.02])
    T_true = lie.sim3_exp(xi)
    Xf = lie.sim3_act(lie.sim3_inv(T_true), Xk)
    idx = jnp.arange(H * W)
    Cf = jnp.full((H * W, 1), 2.0)
    Ck = jnp.full((H * W, 1), 2.0)
    (Xf_m, Xf_cov, Xk_c, Xk_cov, Cf_m, Ck_m, meas_k, valid_meas) = (
        tracker.prep_track_measurements(Xf, Xk, Cf, Ck, idx, K, (H, W))
    )
    Q = jnp.full((H * W, 1), 4.0)
    valid = jnp.ones((H * W, 1), bool)
    cfg = TrackingConfig(max_iters=50, rel_error=0.0, delta_norm=1e-8)
    # NOTE: Xf passed through constrain_points_to_ray changes x/y; for exact
    # recovery pass the raw matched points instead.
    T_WCf, T_CkCf, K_out, ok = tracker.opt_pose_calib_sim3(
        lie.sim3_act(lie.sim3_inv(T_true), Xk_c), Xf_cov, Xk_c,
        lie.sim3_identity(), lie.sim3_identity(),
        Q, valid, meas_k, valid_meas, idx, K, (H, W), cfg,
    )
    assert bool(ok)
    err = lie.sim3_log(lie.sim3_mul(lie.sim3_inv(T_CkCf), T_true))
    assert float(jnp.linalg.norm(err)) < 1e-3, float(jnp.linalg.norm(err))
    np.testing.assert_allclose(np.asarray(K_out), np.asarray(K))


def test_opt_pose_calib_with_covariance_filter_and_focal():
    Xk = _scene(jax.random.PRNGKey(2))
    xi = 0.5 * jnp.asarray([0.04, -0.03, 0.05, 0.015, -0.01, 0.02, -0.02])
    T_true = lie.sim3_exp(xi)
    idx = jnp.arange(H * W)
    Cf = jnp.full((H * W, 1), 2.0)
    (Xf_m, Xf_cov, Xk_c, _, _, _, meas_k, valid_meas) = (
        tracker.prep_track_measurements(
            lie.sim3_act(lie.sim3_inv(T_true), Xk), Xk, Cf, Cf, idx, K, (H, W)
        )
    )
    Q = jnp.full((H * W, 1), 4.0)
    valid = jnp.ones((H * W, 1), bool)
    cfg = TrackingConfig(max_iters=30)
    T_WCf, T_CkCf, K_out, ok = tracker.opt_pose_calib_sim3(
        lie.sim3_act(lie.sim3_inv(T_true), Xk_c), Xf_cov, Xk_c,
        lie.sim3_identity(), lie.sim3_identity(),
        Q, valid, meas_k, valid_meas, idx, K, (H, W), cfg,
        optimize_focal=True, covariance_filter=True,
    )
    assert bool(ok)
    err = lie.sim3_log(lie.sim3_mul(lie.sim3_inv(T_CkCf), T_true))
    # focal free + covariance gating: looser tolerance
    assert float(jnp.linalg.norm(err)) < 5e-2
    assert abs(float(K_out[0, 0]) - 60.0) < 3.0


def test_tracking_failure_detected():
    """Degenerate (all-zero) inputs must set ok=False, not crash/NaN."""
    N = H * W
    zeros = jnp.zeros((N, 3))
    Q = jnp.zeros((N, 1))
    valid = jnp.zeros((N, 1), bool)
    cfg = TrackingConfig(max_iters=5)
    _, _, ok = tracker.opt_pose_ray_dist_sim3(
        zeros, zeros, lie.sim3_identity(), lie.sim3_identity(), Q, valid, cfg
    )
    assert not bool(ok)


def test_check_keyframe():
    n = H * W
    idx = jnp.arange(n)
    all_valid = jnp.ones((n, 1), bool)
    # perfect match: fraction 1 -> not a new keyframe
    assert not bool(tracker.check_keyframe(idx, all_valid[:, 0], all_valid, 0.333))
    # everything maps to one pixel: unique frac ~ 0 -> keyframe
    idx_bad = jnp.zeros(n, jnp.int32)
    assert bool(tracker.check_keyframe(idx_bad, all_valid[:, 0], all_valid, 0.333))
    # low valid fraction -> keyframe
    few = jnp.zeros((n, 1), bool).at[: n // 10].set(True)
    assert bool(tracker.check_keyframe(idx, few[:, 0], few, 0.333))


def test_check_keyframe_map():
    n = H * W
    idx = jnp.arange(n)  # identity: zero displacement
    valid = jnp.ones((n, 1), bool)
    is_kf, dq = tracker.check_keyframe_map(idx, valid, W, H, 0.5, jnp.asarray(0.0), 30.0)
    assert not bool(is_kf) and float(dq) == 0.0
    # shift all matches by 40 px in u (clip to grid)
    uv = proj.get_pixel_coords((H, W)).astype(jnp.int32)
    idx_shift = jnp.clip(uv[:, 0] + 40, 0, W - 1) + W * uv[:, 1]
    is_kf2, dq2 = tracker.check_keyframe_map(
        idx_shift, valid, W, H, 0.5, jnp.asarray(0.0), 30.0
    )
    assert bool(is_kf2) and float(dq2) > 30.0


def test_frame_pointmap_fusion():
    img = jnp.zeros((3, 4, 4))
    f = Frame.create(img)
    X1 = jnp.ones((16, 3))
    C1 = jnp.full((16, 1), 2.0)
    f = f.update_pointmap(X1, C1)
    np.testing.assert_allclose(f.X_canon, X1)
    assert int(f.N) == 1
    X2 = jnp.full((16, 3), 4.0)
    C2 = jnp.full((16, 1), 6.0)
    f = f.update_pointmap(X2, C2)
    # weighted: (2*1 + 6*4)/8 = 3.25
    np.testing.assert_allclose(f.X_canon, jnp.full((16, 3), 3.25))
    np.testing.assert_allclose(f.get_average_conf(), jnp.full((16, 1), 4.0))


def test_keyframe_store_roundtrip():
    store = KeyframeStore(4, 4, K_slam=np.eye(3), buffer=8)
    img = jnp.arange(48, dtype=jnp.float32).reshape(3, 4, 4)
    f = Frame.create(img, frame_id=7, frame_time=1.25)
    f = f.update_pointmap(jnp.ones((16, 3)), jnp.full((16, 1), 2.0))
    idx = store.append(f)
    assert len(store) == 1
    g = store[idx]
    np.testing.assert_allclose(g.img, img)
    assert g.frame_id == 7 and g.frame_time == 1.25
    np.testing.assert_allclose(g.X_canon, f.X_canon)
    # pose update
    store.update_T_WCs(np.tile([1, 2, 3, 0, 0, 0, 1, 1], (1, 1)), [0])
    np.testing.assert_allclose(store[0].T_WC[:3], [1, 2, 3])
    assert store.get_dirty_idx().tolist() == [0]
    assert store.get_dirty_idx().tolist() == []
