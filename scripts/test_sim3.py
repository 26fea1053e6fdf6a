"""Numerical sanity: Sim3 action consistency (reference scripts/test.py
cross-checked pypose vs lietorch; here closed-form vs autodiff)."""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from artdeco_tpu.geometry import lie

    key = jax.random.PRNGKey(0)
    xi = 0.3 * jax.random.normal(key, (7,))
    T = lie.sim3_exp(xi)
    X = jax.random.normal(jax.random.PRNGKey(1), (100, 3))
    Y1 = lie.sim3_act(T, X)
    M = lie.sim3_matrix(T)
    Xh = jnp.concatenate([X, jnp.ones((100, 1))], -1)
    Y2 = (M @ Xh.T).T[:, :3]
    err = float(jnp.abs(Y1 - Y2).max())
    print("act vs matrix:", err)
    assert err < 1e-4
    print("OK")


if __name__ == "__main__":
    main()
