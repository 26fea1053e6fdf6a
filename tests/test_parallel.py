"""Multi-chip tests on the 8-device virtual CPU mesh: row-sharded splats
match single-chip rendering; DP train step runs (also covered by the
driver's dryrun_multichip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from artdeco_tpu.ops.splat import api as splat_api
from artdeco_tpu.parallel.splats import make_row_sharded_render


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_row_sharded_render_matches_single_chip():
    n = 120
    key = jax.random.PRNGKey(0)
    means = jax.random.normal(key, (n, 3)) * jnp.asarray([0.8, 0.6, 0.3]) \
        + jnp.asarray([0.0, 0.0, 3.0])
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    scales = jnp.full((n, 3), 0.15)
    opac = jnp.full((n,), 0.8)
    colors = jax.random.uniform(jax.random.PRNGKey(1), (n, 1, 3))
    viewmat = jnp.eye(4)
    W, H = 64, 128  # 8 devices x 16-row strips
    K = jnp.asarray([[60.0, 0, 32.0], [0, 60.0, 64.0], [0, 0, 1.0]])
    valid = jnp.ones((n,), bool)

    ref_render, ref_alpha, _ = splat_api.rasterization(
        means, quats, scales, opac, colors, viewmat, K, W, H,
        sh_degree=0, eps2d=0.3, valid_mask=valid,
    )

    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    fn = make_row_sharded_render(mesh, W, H, sh_degree=0, eps2d=0.3)
    render, alpha = fn(means, quats, scales, opac, colors, viewmat, K, valid)

    np.testing.assert_allclose(
        np.asarray(render), np.asarray(ref_render), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(ref_alpha), atol=2e-5
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip_entry():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as g

    g.dryrun_multichip(8)
