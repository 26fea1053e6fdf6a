"""Visibility-masked (sparse) Adam updates, functional JAX.

Reference: the ``adamUpdate`` / ``adamUpdateBasic`` CUDA kernels consumed by
``Reconstruct/scene/optimizers.py:38-161`` (BaseAdam / SparseGaussianAdam):
3DGS-style Adam WITHOUT bias correction, eps=1e-15, where sparse updates
touch only visible gaussians' params+moments and per-gaussian learning-rate
tensors decay multiplicatively for visible rows.

TPU-native design note: these are memory-bound elementwise updates; XLA fuses
the whole masked update into a single pass over the slabs, which is already
speed-of-light — a Pallas kernel would add nothing.  The CUDA kernel exists
in the reference only because torch's optimizer loop couldn't fuse.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    exp_avg: jax.Array
    exp_avg_sq: jax.Array


def init_state(param: jax.Array) -> AdamState:
    return AdamState(jnp.zeros_like(param), jnp.zeros_like(param))


def adam_update_basic(
    param: jax.Array,
    grad: jax.Array,
    state: AdamState,
    lr,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """Dense Adam without bias correction (adamUpdateBasic)."""
    m = b1 * state.exp_avg + (1.0 - b1) * grad
    v = b2 * state.exp_avg_sq + (1.0 - b2) * grad * grad
    new_param = param - lr * m / (jnp.sqrt(v) + eps)
    return new_param, AdamState(m, v)


def adam_update_masked(
    param: jax.Array,
    grad: jax.Array,
    state: AdamState,
    lr,
    visibility: jax.Array,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """Visibility-masked Adam (adamUpdate): rows where ``visibility`` is
    False keep param and moments untouched.

    param: (N, ...) with leading gaussian axis; visibility: (N,) bool;
    lr: scalar or (N,) per-gaussian.
    """
    vis = visibility.reshape((-1,) + (1,) * (param.ndim - 1))
    m = jnp.where(vis, b1 * state.exp_avg + (1.0 - b1) * grad, state.exp_avg)
    v = jnp.where(
        vis, b2 * state.exp_avg_sq + (1.0 - b2) * grad * grad, state.exp_avg_sq
    )
    lr_arr = jnp.asarray(lr)
    if lr_arr.ndim >= 1:
        lr_b = lr_arr.reshape((-1,) + (1,) * (param.ndim - 1))
    else:
        lr_b = lr_arr
    new_param = jnp.where(vis, param - lr_b * m / (jnp.sqrt(v) + eps), param)
    return new_param, AdamState(m, v)


def decay_lr_masked(
    lr: jax.Array, visibility: jax.Array, decay: float, lr_min: float
) -> jax.Array:
    """Per-gaussian lr decay for visible rows, clamped from below
    (optimizers.py:158-161)."""
    return jnp.maximum(jnp.where(visibility, lr * decay, lr), lr_min)
