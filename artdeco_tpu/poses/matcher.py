"""Mutual nearest-neighbor descriptor matching.

Reference: ``Reconstruct/poses/matcher.py:17-117``: cosine-similarity mutual
NN with a minimum-similarity gate.  One batched matmul on the MXU.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Matches:
    idx: jax.Array         # (M,) indices into the current keypoints
    kpts_other: jax.Array  # (M, 2) matched pixels in the other frame
    sim: jax.Array         # (M,) cosine similarities


@partial(jax.jit, static_argnames=())
def mutual_nn(desc1: jax.Array, desc2: jax.Array, min_sim: float = 0.8):
    """Returns (idx2_of_1 (N1,), mutual (N1,) bool, sim (N1,))."""
    sim = desc1 @ desc2.T  # (N1, N2) cosine (descs are unit)
    nn12 = jnp.argmax(sim, axis=1)
    nn21 = jnp.argmax(sim, axis=0)
    best = jnp.take_along_axis(sim, nn12[:, None], axis=1)[:, 0]
    mutual = (nn21[nn12] == jnp.arange(desc1.shape[0])) & (best > min_sim)
    return nn12, mutual, best


def match_described(d1, d2, min_sim: float = 0.8) -> Matches:
    """DescribedKeypoints x2 -> Matches (matcher.py surface)."""
    import numpy as np

    nn12, mutual, sim = mutual_nn(d1.desc, d2.desc, min_sim)
    sel = np.where(np.asarray(mutual))[0]
    return Matches(
        idx=jnp.asarray(sel),
        kpts_other=jnp.asarray(np.asarray(d2.kpts)[np.asarray(nn12)[sel]]),
        sim=jnp.asarray(np.asarray(sim)[sel]),
    )
