"""Golden tests for the Pallas splat rasterizer vs the pure-JAX reference
compositor and autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artdeco_tpu.ops.splat import api, binning, composite, project, sh


def _small_scene(key, n=60, width=48, height=32):
    """Random small gaussians fully inside the image."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means2d = jnp.stack(
        [
            jax.random.uniform(k1, (n,), minval=6.0, maxval=width - 6.0),
            jax.random.uniform(k2, (n,), minval=6.0, maxval=height - 6.0),
        ],
        axis=-1,
    )
    # small isotropic-ish covariances => conics
    sx = jax.random.uniform(k3, (n,), minval=1.0, maxval=2.5)
    sy = jax.random.uniform(k3, (n,), minval=1.0, maxval=2.5)
    rho = jax.random.uniform(k4, (n,), minval=-0.3, maxval=0.3)
    cov = jnp.stack(
        [sx * sx, rho * sx * sy, rho * sx * sy, sy * sy], -1
    ).reshape(n, 2, 2)
    det = cov[:, 0, 0] * cov[:, 1, 1] - cov[:, 0, 1] * cov[:, 1, 0]
    conics = jnp.stack(
        [cov[:, 1, 1] / det, -cov[:, 0, 1] / det, cov[:, 0, 0] / det], -1
    )
    radii = jnp.ceil(3.0 * jnp.sqrt(jnp.stack([cov[:, 0, 0], cov[:, 1, 1]], -1)))
    opac = jax.random.uniform(k5, (n,), minval=0.3, maxval=0.95)
    channels = jax.random.uniform(jax.random.PRNGKey(99), (n, 4))
    return means2d, conics, radii, opac, channels


def _run_tile_pipeline(means2d, conics, radii, opac, channels, width, height):
    n = means2d.shape[0]
    tiles_x = -(-width // binning.TILE)
    tiles_y = -(-height // binning.TILE)
    bins = binning.build_tile_bins(means2d, radii, tiles_x, tiles_y, kx=4, ky=4)
    n_ch = channels.shape[-1]
    packed = jnp.concatenate(
        [means2d, conics, opac[:, None], jnp.zeros((n, 2)), channels,
         jnp.zeros((n, composite.C_MAX - n_ch))],
        axis=-1,
    )
    slot_data = jnp.where(
        bins.slot_valid[None, :], packed.T[:, bins.slot_gauss], 0.0
    )
    out = composite.tile_composite(
        slot_data, bins.pad_starts, bins.pad_counts, tiles_x, tiles_y
    )
    img = (
        out.reshape(tiles_y, tiles_x, 16, 16, composite.C_MAX)
        .transpose(0, 2, 1, 3, 4)
        .reshape(tiles_y * 16, tiles_x * 16, composite.C_MAX)
    )[:height, :width]
    return img


def test_binning_covers_gaussians():
    means2d, conics, radii, opac, channels = _small_scene(jax.random.PRNGKey(0))
    tiles_x, tiles_y = 3, 2
    bins = binning.build_tile_bins(means2d, radii, tiles_x, tiles_y)
    n_tiles = tiles_x * tiles_y
    assert int(bins.num_pairs) > 0
    assert int(jnp.sum(bins.tile_counts)) == int(bins.num_pairs)
    starts = np.asarray(bins.pad_starts)
    pcounts = np.asarray(bins.pad_counts)
    counts = np.asarray(bins.tile_counts)
    assert starts[0] == 0
    assert (pcounts % binning.CHUNK == 0).all()
    assert (pcounts >= counts).all()
    for t in range(1, n_tiles):
        assert starts[t] == starts[t - 1] + pcounts[t - 1]
    # within each tile run: first `count` slots valid (ascending gaussians,
    # depth-sorted), rest padding
    sg = np.asarray(bins.slot_gauss)
    sv = np.asarray(bins.slot_valid)
    for t in range(n_tiles):
        run_v = sv[starts[t] : starts[t] + pcounts[t]]
        assert run_v[: counts[t]].all()
        assert not run_v[counts[t] :].any()
        run = sg[starts[t] : starts[t] + counts[t]]
        if len(run) > 1:
            assert (np.diff(run) > 0).all()  # each gaussian pairs once/tile


def test_composite_matches_reference():
    width, height = 48, 32
    means2d, conics, radii, opac, channels = _small_scene(
        jax.random.PRNGKey(1), n=60, width=width, height=height
    )
    img = _run_tile_pipeline(means2d, conics, radii, opac, channels, width, height)
    ref_img, ref_alpha = composite.composite_reference(
        means2d, conics, opac, channels, width, height
    )
    np.testing.assert_allclose(
        np.asarray(img[..., :4]), np.asarray(ref_img), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(img[..., composite.C_MAX - 1]), np.asarray(ref_alpha), atol=2e-5
    )


def test_composite_gradients_match_reference():
    width, height = 32, 32
    means2d, conics, radii, opac, channels = _small_scene(
        jax.random.PRNGKey(2), n=25, width=width, height=height
    )
    gkey = jax.random.PRNGKey(3)
    g_img = jax.random.normal(gkey, (height, width, 4))
    g_alpha = jax.random.normal(jax.random.PRNGKey(4), (height, width))

    def loss_tile(means2d, conics, opac, channels):
        img = _run_tile_pipeline(means2d, conics, radii, opac, channels, width, height)
        return jnp.sum(img[..., :4] * g_img) + jnp.sum(
            img[..., composite.C_MAX - 1] * g_alpha
        )

    def loss_ref(means2d, conics, opac, channels):
        img, alpha = composite.composite_reference(
            means2d, conics, opac, channels, width, height
        )
        return jnp.sum(img * g_img) + jnp.sum(alpha * g_alpha)

    g_tile = jax.grad(loss_tile, argnums=(0, 1, 2, 3))(means2d, conics, opac, channels)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(means2d, conics, opac, channels)
    for gt, gr, name in zip(g_tile, g_ref, ["means2d", "conics", "opac", "channels"]):
        np.testing.assert_allclose(
            np.asarray(gt), np.asarray(gr), atol=5e-4, rtol=5e-3,
            err_msg=f"grad mismatch: {name}",
        )


def test_rasterization_end_to_end():
    key = jax.random.PRNGKey(5)
    n = 80
    means = jax.random.normal(key, (n, 3)) * jnp.asarray([0.5, 0.4, 0.2]) + jnp.asarray(
        [0.0, 0.0, 3.0]
    )
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    scales = jnp.full((n, 3), 0.05)
    opac = jnp.full((n,), 0.8)
    colors = jax.random.uniform(jax.random.PRNGKey(6), (n, 1, 3))
    viewmat = jnp.eye(4)
    width, height = 64, 48
    K = jnp.asarray([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1.0]])
    render, alpha, meta = api.rasterization(
        means, quats, scales, opac, colors, viewmat, K, width, height,
        sh_degree=0, eps2d=0.3,
    )
    assert render.shape == (height, width, 4)
    assert alpha.shape == (height, width, 1)
    assert float(alpha.max()) > 0.5
    # depth channel ~ camera depths in covered pixels
    covered = np.asarray(alpha[..., 0]) > 0.9
    d = np.asarray(render[..., 3])[covered] / np.asarray(alpha[..., 0])[covered]
    assert (d > 2.0).all() and (d < 4.5).all()
    # radii meta marks visible gaussians
    assert int((meta.radii.max(-1) > 0).sum()) > n // 2


def test_rasterization_optimization_smoke():
    """Gradient descent on colors+means converges toward a target render."""
    key = jax.random.PRNGKey(7)
    n = 40
    means = jax.random.normal(key, (n, 3)) * 0.4 + jnp.asarray([0.0, 0.0, 2.0])
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    scales = jnp.full((n, 3), 0.25)
    opac = jnp.full((n,), 0.7)
    colors_gt = jax.random.uniform(jax.random.PRNGKey(8), (n, 1, 3))
    viewmat = jnp.eye(4)
    width, height = 32, 32
    K = jnp.asarray([[40.0, 0, 16.0], [0, 40.0, 16.0], [0, 0, 1.0]])

    def render_fn(colors):
        r, a, _ = api.rasterization(
            means, quats, scales, opac, colors, viewmat, K, width, height,
            sh_degree=0, render_mode="RGB",
        )
        return r

    target = render_fn(colors_gt)
    colors = jnp.full((n, 1, 3), 0.5)

    def loss(c):
        return jnp.mean((render_fn(c) - target) ** 2)

    l0 = float(loss(colors))
    g = jax.jit(jax.grad(loss))
    for _ in range(40):
        colors = colors - 50.0 * g(colors)
    l1 = float(loss(colors))
    assert l1 < 0.3 * l0, (l0, l1)


def test_rasterization_compact_budget_parity():
    """compact_budget covering the visible count is exact: same image,
    alpha, and gradients as the full path (compaction preserves index
    order and the depth sort is stable); a too-small budget drops the
    highest-index visibles and counts them in meta.n_comp_dropped."""
    key = jax.random.PRNGKey(11)
    n = 96
    means = jax.random.normal(key, (n, 3)) * jnp.asarray([0.5, 0.4, 0.6]) + jnp.asarray(
        [0.0, 0.0, 3.0]
    )
    # put a scattered half behind the camera: the compacted visible set is
    # then a strict, non-contiguous subset of the slab
    means = means.at[:, 2].set(
        jnp.where(jnp.arange(n) % 3 == 1, -1.0, means[:, 2])
    )
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    scales = jnp.full((n, 3), 0.05)
    opac = jnp.full((n,), 0.8)
    colors = jax.random.uniform(jax.random.PRNGKey(12), (n, 1, 3))
    viewmat = jnp.eye(4)
    width, height = 64, 48
    K = jnp.asarray([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1.0]])
    # mask a few rows so the compaction interacts with valid_mask too
    valid = jnp.arange(n) % 7 != 3

    def run(budget, c):
        return api.rasterization(
            means, quats, scales, opac, c, viewmat, K, width, height,
            sh_degree=0, eps2d=0.3, valid_mask=valid, compact_budget=budget,
        )

    r_full, a_full, m_full = run(None, colors)
    n_vis = int((m_full.radii.max(-1) > 0).sum())
    assert n_vis > 8
    budget = 1 << (n_vis - 1).bit_length()  # next pow2 >= n_vis, < n
    assert budget < n
    r_c, a_c, m_c = run(budget, colors)
    assert int(m_c.n_comp_dropped) == 0
    np.testing.assert_allclose(np.asarray(r_c), np.asarray(r_full),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_c), np.asarray(a_full),
                               rtol=0, atol=1e-6)

    def loss(c, budget):
        r, a, _ = run(budget, c)
        return jnp.sum(r ** 2) + jnp.sum(a * a)

    g_full = jax.grad(loss)(colors, None)
    g_c = jax.grad(loss)(colors, budget)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_full),
                               rtol=1e-5, atol=1e-5)

    # too-small budget: drops counted, image still finite
    r_s, a_s, m_s = run(8, colors)
    assert int(m_s.n_comp_dropped) == n_vis - 8
    assert bool(jnp.isfinite(r_s).all())
