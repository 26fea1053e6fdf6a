import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artdeco_tpu.geometry import lie


def rand_sim3(key, batch=()):
    k1, k2, k3 = jax.random.split(key, 3)
    t = jax.random.normal(k1, batch + (3,))
    q = lie.quat_normalize(jax.random.normal(k2, batch + (4,)))
    s = jnp.exp(0.3 * jax.random.normal(k3, batch + (1,)))
    return jnp.concatenate([t, q, s], axis=-1)


def test_quat_mul_matrix_consistency():
    key = jax.random.PRNGKey(0)
    q1 = lie.quat_normalize(jax.random.normal(key, (5, 4)))
    q2 = lie.quat_normalize(jax.random.normal(jax.random.PRNGKey(1), (5, 4)))
    R1 = lie.quat_to_matrix(q1)
    R2 = lie.quat_to_matrix(q2)
    R12 = lie.quat_to_matrix(lie.quat_mul(q1, q2))
    np.testing.assert_allclose(R12, R1 @ R2, atol=1e-5)


def test_quat_act_matches_matrix():
    key = jax.random.PRNGKey(2)
    q = lie.quat_normalize(jax.random.normal(key, (7, 4)))
    x = jax.random.normal(jax.random.PRNGKey(3), (7, 3))
    y1 = lie.quat_act(q, x)
    y2 = (lie.quat_to_matrix(q) @ x[..., None])[..., 0]
    np.testing.assert_allclose(y1, y2, atol=1e-5)


def test_matrix_quat_roundtrip():
    key = jax.random.PRNGKey(4)
    q = lie.quat_normalize(jax.random.normal(key, (32, 4)))
    q2 = lie.matrix_to_quat(lie.quat_to_matrix(q))
    # quaternion double cover: compare rotations
    np.testing.assert_allclose(
        lie.quat_to_matrix(q2), lie.quat_to_matrix(q), atol=1e-4
    )


def test_so3_exp_log_roundtrip():
    key = jax.random.PRNGKey(5)
    # stay within the injectivity radius |phi| < pi
    phi = 0.9 * jax.random.normal(key, (16, 3))
    phi2 = lie.so3_log(lie.so3_exp(phi))
    np.testing.assert_allclose(phi, phi2, atol=1e-4)
    # tiny angles
    phi_small = 1e-8 * jax.random.normal(key, (4, 3))
    q = lie.so3_exp(phi_small)
    assert jnp.all(jnp.isfinite(q))
    np.testing.assert_allclose(lie.so3_log(q), phi_small, atol=1e-10)


def test_sim3_exp_log_roundtrip():
    key = jax.random.PRNGKey(6)
    xi = 0.7 * jax.random.normal(key, (16, 7))
    T = lie.sim3_exp(xi)
    xi2 = lie.sim3_log(T)
    np.testing.assert_allclose(xi, xi2, rtol=1e-4, atol=1e-4)


def test_sim3_exp_small():
    xi = jnp.zeros((3, 7))
    T = lie.sim3_exp(xi)
    np.testing.assert_allclose(T, lie.sim3_identity((3,)), atol=1e-7)
    xi = 1e-9 * jnp.ones((1, 7))
    assert jnp.all(jnp.isfinite(lie.sim3_exp(xi)))


def test_sim3_mul_inv():
    key = jax.random.PRNGKey(7)
    T1 = rand_sim3(key, (8,))
    T2 = rand_sim3(jax.random.PRNGKey(8), (8,))
    X = jax.random.normal(jax.random.PRNGKey(9), (8, 3))
    # (T1*T2) X == T1 (T2 X)
    np.testing.assert_allclose(
        lie.sim3_act(lie.sim3_mul(T1, T2), X),
        lie.sim3_act(T1, lie.sim3_act(T2, X)),
        atol=1e-4,
    )
    # T^-1 T == I
    TI = lie.sim3_mul(lie.sim3_inv(T1), T1)
    np.testing.assert_allclose(lie.sim3_act(TI, X), X, atol=1e-4)


def test_sim3_matrix_consistency():
    key = jax.random.PRNGKey(10)
    T = rand_sim3(key, (5,))
    X = jax.random.normal(jax.random.PRNGKey(11), (5, 3))
    M = lie.sim3_matrix(T)
    Xh = jnp.concatenate([X, jnp.ones((5, 1))], axis=-1)
    y1 = (M @ Xh[..., None])[..., :3, 0]
    y2 = lie.sim3_act(T, X)
    np.testing.assert_allclose(y1, y2, atol=1e-4)
    # roundtrip from matrix
    T2 = lie.sim3_from_matrix(M)
    np.testing.assert_allclose(
        lie.sim3_act(T2, X), lie.sim3_act(T, X), atol=1e-4
    )


def test_sim3_act_jacobian_finite_diff():
    """J should be d(Exp(eps) T X)/d eps at eps=0 (left perturbation)."""
    key = jax.random.PRNGKey(12)
    T = rand_sim3(key)
    X = jax.random.normal(jax.random.PRNGKey(13), (3,))
    Y, J = lie.sim3_act_jac(T, X)

    def f(eps):
        return lie.sim3_act(lie.sim3_mul(lie.sim3_exp(eps), T), X)

    J_auto = jax.jacfwd(f)(jnp.zeros(7))
    np.testing.assert_allclose(J, J_auto, atol=1e-4)


def test_sim3_retr_matches_reference_convention():
    key = jax.random.PRNGKey(14)
    T = rand_sim3(key)
    xi = 0.1 * jax.random.normal(jax.random.PRNGKey(15), (7,))
    T2 = lie.sim3_retr(T, xi)
    T2_ref = lie.sim3_mul(lie.sim3_exp(xi), T)
    np.testing.assert_allclose(T2, T2_ref, atol=1e-6)


def test_sim3_adj_inv():
    """apply_Sim3_adj_inv: Y = Adj(T)^{-T} X, check against autodiff adjoint.

    Adj property: Exp(Adj(T) xi) T == T Exp(xi). So Adj(T) = d/dxi of
    Log(T Exp(xi) T^-1). We verify our closed form against jacfwd.
    """
    key = jax.random.PRNGKey(16)
    T = rand_sim3(key)

    def conj(xi):
        return lie.sim3_log(lie.sim3_mul(lie.sim3_mul(T, lie.sim3_exp(xi)), lie.sim3_inv(T)))

    Adj = jax.jacfwd(conj)(jnp.zeros(7))
    X = jax.random.normal(jax.random.PRNGKey(17), (7,))
    Y_ref = jnp.linalg.solve(Adj.T, X)
    Y = lie.sim3_adj_inv_transpose_apply(T, X)
    np.testing.assert_allclose(Y, Y_ref, rtol=1e-3, atol=1e-3)


def test_se3_ops():
    key = jax.random.PRNGKey(18)
    t = jax.random.normal(key, (4, 3))
    q = lie.quat_normalize(jax.random.normal(jax.random.PRNGKey(19), (4, 4)))
    T = jnp.concatenate([t, q], axis=-1)
    X = jax.random.normal(jax.random.PRNGKey(20), (4, 3))
    M = lie.se3_matrix(T)
    Xh = jnp.concatenate([X, jnp.ones((4, 1))], axis=-1)
    np.testing.assert_allclose(
        (M @ Xh[..., None])[..., :3, 0], lie.se3_act(T, X), atol=1e-5
    )
    TI = lie.se3_mul(lie.se3_inv(T), T)
    np.testing.assert_allclose(lie.se3_act(TI, X), X, atol=1e-5)
    np.testing.assert_allclose(
        lie.se3_matrix(lie.se3_from_matrix(M)), M, atol=1e-4
    )
