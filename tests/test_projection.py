import jax
import jax.numpy as jnp
import numpy as np

from artdeco_tpu.geometry import projection as proj
from artdeco_tpu.geometry import robust, uncertainty


K = jnp.asarray([[300.0, 0.0, 128.0], [0.0, 300.0, 96.0], [0.0, 0.0, 1.0]])


def test_point_to_ray_dist_jacobian():
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (8, 3)) + jnp.asarray([0.0, 0.0, 3.0])
    rd, J = proj.point_to_ray_dist(X, jacobian=True)
    np.testing.assert_allclose(
        jnp.linalg.norm(rd[:, :3], axis=-1), jnp.ones(8), atol=1e-5
    )
    J_auto = jax.vmap(jax.jacfwd(lambda x: proj.point_to_ray_dist(x)))(X)
    np.testing.assert_allclose(J, J_auto, atol=1e-4)


def test_backproject_project_roundtrip():
    key = jax.random.PRNGKey(1)
    uv = jax.random.uniform(key, (64, 2), minval=5.0, maxval=180.0)
    z = jax.random.uniform(jax.random.PRNGKey(2), (64, 1), minval=0.5, maxval=5.0)
    P = proj.backproject(uv, z, K)
    pz, valid = proj.project_calib(P, K, (192, 256))
    np.testing.assert_allclose(pz[:, :2], uv, atol=1e-3)
    np.testing.assert_allclose(pz[:, 2:3], jnp.log(z), atol=1e-5)
    assert bool(valid.all())


def test_project_calib_jacobian():
    key = jax.random.PRNGKey(3)
    P = jax.random.normal(key, (16, 3)) * 0.3 + jnp.asarray([0.0, 0.0, 2.0])
    pz, J, valid = proj.project_calib(P, K, (192, 256), jacobian=True)
    J_auto = jax.vmap(jax.jacfwd(lambda p: proj.project_calib(p, K, (192, 256))[0]))(P)
    np.testing.assert_allclose(J[..., :3], J_auto, atol=1e-3, rtol=1e-3)


def test_project_calib_gating():
    P = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 2.0], [100.0, 0.0, 0.1]])
    pz, valid = proj.project_calib(P, K, (192, 256), z_eps=0.0)
    assert not bool(valid[0, 0])  # behind camera
    assert bool(valid[1, 0])
    assert not bool(valid[2, 0])  # out of bounds
    assert bool(jnp.isfinite(pz).all())  # NaN guard on log z


def test_constrain_points_to_ray():
    key = jax.random.PRNGKey(4)
    h, w = 12, 16
    X = jax.random.normal(key, (h * w, 3)) * 0.1 + jnp.asarray([0.0, 0.0, 2.0])
    Xc = proj.constrain_points_to_ray((h, w), X, K)
    # z preserved
    np.testing.assert_allclose(Xc[:, 2], X[:, 2], atol=1e-6)
    # projects exactly onto the pixel grid
    pz, _ = proj.project_calib(Xc, K, (h, w), border=-10**9)
    uv = proj.get_pixel_coords((h, w))
    np.testing.assert_allclose(pz[:, :2], uv, atol=1e-3)


def test_huber_tukey():
    r = jnp.asarray([0.0, 1.0, 2.0, -5.0])
    w = robust.huber(r, k=1.345)
    np.testing.assert_allclose(w[:2], [1.0, 1.0])
    np.testing.assert_allclose(w[2], 1.345 / 2.0, rtol=1e-6)
    np.testing.assert_allclose(w[3], 1.345 / 5.0, rtol=1e-6)
    wt = robust.tukey(r, t=4.6851)
    assert wt[0] == 1.0 and wt[3] == 0.0


def test_local_diag_cov_matches_numpy():
    rng = np.random.RandomState(0)
    H, W, win = 10, 14, 5
    X = rng.randn(H * W, 3).astype(np.float32) + np.array([0, 0, 5], np.float32)
    var = np.asarray(uncertainty.local_diag_cov(jnp.asarray(X), H, W, win=win))

    # numpy reference with reflect padding
    pad = win // 2
    Xv = X.reshape(H, W, 3)
    Xp = np.pad(Xv, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
    ref = np.zeros((H, W, 3), np.float32)
    for i in range(H):
        for j in range(W):
            patch = Xp[i : i + win, j : j + win].reshape(-1, 3)
            ref[i, j] = patch.var(axis=0)
    np.testing.assert_allclose(var.reshape(H, W, 3), ref, rtol=1e-3, atol=1e-4)
