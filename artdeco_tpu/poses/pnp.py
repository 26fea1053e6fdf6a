"""Batched differentiable PnP Gauss-Newton.

Reference: ``VSLAM/PNP_Optimizer.py:6-422`` (CholeskySolver,
BlockDiagonalInverse, opt_single_pnp): batched SE(3) PnP with Huber
reprojection weights.  The TPU version is a jitted ``lax.fori_loop``
Levenberg-Marquardt over se(3) tangents with a batched 6x6 Cholesky —
``vmap`` replaces the block-diagonal machinery entirely.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from artdeco_tpu.geometry import lie


def _pnp_residual_jac(T_cw: jax.Array, X: jax.Array, uv: jax.Array,
                      K: jax.Array):
    """Reprojection residuals + Jacobian wrt LEFT se(3) perturbation.

    T_cw (7,) [t, q xyzw]; X (P, 3) world; uv (P, 2). Returns r (P,2),
    J (P,2,6).
    """
    Xc = lie.se3_act(T_cw, X)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    z = jnp.maximum(Xc[:, 2], 1e-9)
    z_inv = 1.0 / z
    u = fx * Xc[:, 0] * z_inv + cx
    v = fy * Xc[:, 1] * z_inv + cy
    r = jnp.stack([u, v], axis=1) - uv

    x, y = Xc[:, 0], Xc[:, 1]
    zeros = jnp.zeros_like(z)
    # d(uv)/dXc then chain with left-perturbation d Xc/d xi = [I, -skew(Xc)]
    du = jnp.stack([fx * z_inv, zeros, -fx * x * z_inv * z_inv], axis=1)
    dv = jnp.stack([zeros, fy * z_inv, -fy * y * z_inv * z_inv], axis=1)
    dP = jnp.stack([du, dv], axis=1)  # (P, 2, 3)
    sk = jnp.stack([
        jnp.stack([zeros, Xc[:, 2], -Xc[:, 1]], 1),
        jnp.stack([-Xc[:, 2], zeros, Xc[:, 0]], 1),
        jnp.stack([Xc[:, 1], -Xc[:, 0], zeros], 1),
    ], axis=1)  # (P, 3, 3) == -skew(Xc)
    J = jnp.concatenate([dP, dP @ sk], axis=-1)  # (P, 2, 6)
    return r, J


@partial(jax.jit, static_argnames=("iters", "huber_k"))
def opt_pnp(
    T0_cw: jax.Array,   # (B, 7) initial world->cam SE(3)
    X: jax.Array,       # (B, P, 3) world points
    uv: jax.Array,      # (B, P, 2) observations
    valid: jax.Array,   # (B, P) bool
    K: jax.Array,       # (3, 3)
    iters: int = 20,
    lm: float = 1e-4,
    huber_k: float = 3.0,
):
    """Batched PnP. Returns (T_cw (B,7), final cost (B,))."""

    def single(T0, Xb, uvb, vb):
        def step(_, T):
            r, J = _pnp_residual_jac(T, Xb, uvb, K)
            w = jnp.where(
                jnp.abs(r) < huber_k, 1.0,
                huber_k / jnp.maximum(jnp.abs(r), 1e-12),
            ) * vb[:, None]
            Jw = w[..., None] * J
            H = jnp.einsum("prc,prd->cd", Jw, J) + lm * jnp.eye(6)
            g = jnp.einsum("prc,pr->c", Jw, r)
            dx = -jnp.linalg.solve(H, g)
            # left-multiplicative SE(3) retraction via Sim3 with unit scale
            T8 = jnp.concatenate([T, jnp.ones(1)])
            xi = jnp.concatenate([dx, jnp.zeros(1)])
            return lie.sim3_normalize(lie.sim3_retr(T8, xi))[:7]

        T = jax.lax.fori_loop(0, iters, step, T0)
        r, _ = _pnp_residual_jac(T, Xb, uvb, K)
        cost = jnp.sum((r * vb[:, None]) ** 2)
        return T, cost

    return jax.vmap(single)(T0_cw, X, uv, valid)
