"""Stage-level breakdown of the splat rasterizer at production scale.

The r5 bench reached 154k gaussians (exact refine coverage -> denser conf
maps -> more densify candidates) and the overlapped mapper rose to ~6.6 s
per frame.  One training iteration = render fwd + bwd; this script times
the forward stages in isolation at several slab sizes so the optimization
target is measured, not guessed:

  project  -> SH eval -> depth argsort -> gather-reorder -> tile binning
  -> packed scatter -> compositor

plus full fwd and fwd+bwd of render_core, on the live backend.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(name, fn, n=6):
    o = fn()
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn()
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    log(f"  {name}: {1000 * dt:.2f} ms")
    return dt


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    from functools import partial

    from artdeco_tpu.utils.cache import setup_compilation_cache
    from artdeco_tpu.ops.splat import api as splat_api
    from artdeco_tpu.ops.splat import binning, composite, project, sh

    setup_compilation_cache()

    width, height = 512, 288
    tiles_x = -(-width // binning.TILE)
    tiles_y = -(-height // binning.TILE)
    K = jnp.asarray([[300.0, 0, width / 2], [0, 300.0, height / 2], [0, 0, 1]])
    viewmat = jnp.eye(4)
    sh_degree = 3
    k_sh = (sh_degree + 1) ** 2

    for N in (1 << 16, 1 << 18):
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 8)
        # plausible scene: points in a 0.5-6m frustum wedge
        z = jax.random.uniform(ks[0], (N,), minval=0.5, maxval=6.0)
        x = jax.random.uniform(ks[1], (N,), minval=-1.0, maxval=1.0) * z
        y = jax.random.uniform(ks[2], (N,), minval=-0.6, maxval=0.6) * z
        means = jnp.stack([x, y, z], -1)
        quats = jax.random.normal(ks[3], (N, 4))
        quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
        scales = jnp.exp(jax.random.uniform(ks[4], (N, 3), minval=-5.5, maxval=-3.5))
        opac = jax.random.uniform(ks[5], (N,), minval=0.1, maxval=0.9)
        colors = 0.1 * jax.random.normal(ks[6], (N, k_sh, 3))

        log(f"N = {N} ({width}x{height}, sh{sh_degree})")

        projf = jax.jit(lambda m, q, s: project.project_gaussians(
            m, q, s, viewmat, K, width, height, eps2d=0.3,
            near_plane=0.01, far_plane=1e10))
        timeit("project", lambda: projf(means, quats, scales))
        proj = projf(means, quats, scales)

        shf = jax.jit(lambda m, c: sh.sh_to_color(sh_degree, m, c))
        timeit("sh_to_color", lambda: shf(means, colors))
        rgb = shf(means, colors)

        sortf = jax.jit(lambda d: jnp.argsort(d))
        timeit("depth argsort", lambda: sortf(proj.depths))
        order = sortf(proj.depths)

        @jax.jit
        def reorder(order, m2d, con, rad, op, ch):
            return (m2d[order], con[order], rad[order], op[order], ch[order])
        channels = jnp.concatenate([rgb, proj.depths[:, None]], -1)
        timeit("gather-reorder x5", lambda: reorder(
            order, proj.means2d, proj.conics, proj.radii, opac, channels))
        m2d_s, con_s, rad_s, op_s, ch_s = reorder(
            order, proj.means2d, proj.conics, proj.radii, opac, channels)

        binf = jax.jit(partial(binning.build_tile_bins, tiles_x=tiles_x,
                               tiles_y=tiles_y, kx=4, ky=4))
        timeit("build_tile_bins (16N-pair sort)",
               lambda: binf(m2d_s, rad_s))
        bins = binf(m2d_s, rad_s)

        n_ch = ch_s.shape[-1]

        @jax.jit
        def pack_and_composite(m2d, con, op, ch, bins):
            packed = jnp.concatenate(
                [m2d, con, op[:, None], jnp.zeros((N, 2)), ch,
                 jnp.zeros((N, composite.C_MAX - n_ch))], -1)
            slot_data = jnp.where(
                bins.slot_valid[None, :], packed.T[:, bins.slot_gauss], 0.0)
            return composite.tile_composite(
                slot_data, bins.pad_starts, bins.pad_counts,
                tiles_x, tiles_y)
        timeit("pack+scatter+composite",
               lambda: pack_and_composite(m2d_s, con_s, op_s, ch_s, bins))

        full = jax.jit(lambda m, q, s, o, c: splat_api.rasterization(
            m, q, s, o, c, viewmat, K, width, height, sh_degree=sh_degree,
            render_mode="RGB+D", eps2d=0.3)[0])
        timeit("FULL rasterization fwd",
               lambda: full(means, quats, scales, opac, colors))

        @jax.jit
        def loss_fn(m, q, s, o, c):
            r, a, _ = splat_api.rasterization(
                m, q, s, o, c, viewmat, K, width, height,
                sh_degree=sh_degree, render_mode="RGB+D", eps2d=0.3)
            return jnp.mean(jnp.abs(r)) + jnp.mean(a)
        gradf = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
        timeit("FULL rasterization fwd+bwd",
               lambda: gradf(means, quats, scales, opac, colors))
        nv = int(jnp.sum((jnp.max(proj.radii, -1) > 0)))
        log(f"  [visible gaussians: {nv}/{N}, pairs={int(bins.num_pairs)}]")
