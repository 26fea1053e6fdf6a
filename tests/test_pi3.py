import jax
import jax.numpy as jnp
import numpy as np

from artdeco_tpu.models.pi3 import Pi3, tiny_pi3_config


def test_pi3_forward_shapes():
    cfg = tiny_pi3_config(compute_dtype=jnp.float32)
    model = Pi3(cfg)
    B, N, H, W = 1, 3, 28, 42  # multiples of patch 14
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3, H, W))
    params = model.init(jax.random.PRNGKey(1), imgs)
    out = model.apply(params, imgs)
    assert out["points"].shape == (B, N, H, W, 3)
    assert out["local_points"].shape == (B, N, H, W, 3)
    assert out["conf"].shape == (B, N, H, W, 1)
    assert out["camera_poses"].shape == (B, N, 4, 4)
    # depths positive (z = exp)
    assert float(out["local_points"][..., 2].min()) > 0
    # poses are valid SE(3): R orthonormal, det +1, bottom row [0,0,0,1]
    P = np.asarray(out["camera_poses"]).reshape(-1, 4, 4)
    for p in P:
        R = p[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
        assert np.linalg.det(R) > 0.99
        np.testing.assert_allclose(p[3], [0, 0, 0, 1], atol=1e-6)
    # unprojection consistency: points == R @ local + t
    lp = np.asarray(out["local_points"])[0, 0]
    wp = np.asarray(out["points"])[0, 0]
    R0 = P[0][:3, :3]
    t0 = P[0][:3, 3]
    np.testing.assert_allclose(
        wp, lp @ R0.T + t0, atol=1e-4, rtol=1e-4
    )
    assert all(bool(jnp.isfinite(v).all()) for v in out.values())
