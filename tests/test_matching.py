"""Golden tests: JAX matching ops vs literal numpy transcriptions of the
reference CUDA kernels (matching_kernels.cu)."""

import jax
import jax.numpy as jnp
import numpy as np

from artdeco_tpu.ops import matching


# ----------------------------------------------------------------------------
# numpy references (direct transcription of the CUDA kernels)
# ----------------------------------------------------------------------------

def np_iter_proj(rays_img, pts_norm, p_init, max_iter, lambda_init, cost_thresh):
    b, h, w, _ = rays_img.shape
    n = p_init.shape[1]
    p_new = np.zeros((b, n, 2), np.float32)
    converged = np.zeros((b, n), bool)

    def bilinear(img, u, v, c0, c1):
        u11, v11 = int(np.floor(u)), int(np.floor(v))
        du, dv = u - u11, v - v11
        w11, w12 = du * dv, (1 - du) * dv
        w21, w22 = du * (1 - dv), (1 - du) * (1 - dv)
        return (
            w11 * img[v11 + 1, u11 + 1, c0:c1]
            + w12 * img[v11 + 1, u11, c0:c1]
            + w21 * img[v11, u11 + 1, c0:c1]
            + w22 * img[v11, u11, c0:c1]
        )

    for bi in range(b):
        img = rays_img[bi]
        for ni in range(n):
            u = min(max(p_init[bi, ni, 0], 1.0), w - 2.0)
            v = min(max(p_init[bi, ni, 1], 1.0), h - 2.0)
            lam = lambda_init
            conv = False
            for _ in range(max_iter):
                smp = bilinear(img, u, v, 0, 9)
                r, gx, gy = smp[0:3], smp[3:6], smp[6:9]
                r = r / np.linalg.norm(r)
                err = r - pts_norm[bi, ni]
                cost = float(err @ err)
                A00 = gx @ gx + lam
                A01 = gx @ gy
                A11 = gy @ gy + lam
                b0 = -(err @ gx)
                b1 = -(err @ gy)
                det_inv = 1.0 / (A00 * A11 - A01 * A01)
                du_ = det_inv * (A11 * b0 - A01 * b1)
                dv_ = det_inv * (-A01 * b0 + A00 * b1)
                u_new = min(max(u + du_, 1.0), w - 2.0)
                v_new = min(max(v + dv_, 1.0), h - 2.0)
                r2 = bilinear(img, u_new, v_new, 0, 3)
                r2 = r2 / np.linalg.norm(r2)
                err2 = r2 - pts_norm[bi, ni]
                new_cost = float(err2 @ err2)
                if new_cost < cost:
                    u, v = u_new, v_new
                    lam *= 0.1
                    conv = new_cost < cost_thresh
                else:
                    lam *= 10.0
                    conv = cost < cost_thresh
            p_new[bi, ni] = (u, v)
            converged[bi, ni] = conv
    return p_new, converged


def np_refine_matches(D11, D21, p1, radius, dilation_max):
    b, h, w, f = D11.shape
    n = p1.shape[1]
    out = np.zeros_like(p1)
    flt_min = np.finfo(np.float32).tiny
    for bi in range(b):
        for ni in range(n):
            u0, v0 = int(p1[bi, ni, 0]), int(p1[bi, ni, 1])
            max_score = flt_min
            u_new, v_new = u0, v0
            for d in range(dilation_max, 0, -1):
                rd = radius * d
                diam = 2 * rd + 1
                for i in range(0, diam, d):
                    for j in range(0, diam, d):
                        u = u0 - rd + i
                        v = v0 - rd + j
                        if 0 <= u < w and 0 <= v < h:
                            score = float(D21[bi, ni] @ D11[bi, v, u])
                            if score > max_score:
                                max_score = score
                                u_new, v_new = u, v
                u0, v0 = u_new, v_new
            out[bi, ni] = (u_new, v_new)
    return out


# ----------------------------------------------------------------------------

def _synthetic_pair(key, h=24, w=32):
    """Two pointmaps of the same smooth surface from slightly offset cameras."""
    k1, k2 = jax.random.split(key)
    u, v = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                        jnp.arange(h, dtype=jnp.float32), indexing="xy")
    z = 2.0 + 0.3 * jnp.sin(u / 7.0) + 0.2 * jnp.cos(v / 5.0)
    x = (u - w / 2) / 40.0 * z
    y = (v - h / 2) / 40.0 * z
    X11 = jnp.stack([x, y, z], -1)[None]
    # second view: small translation
    X21 = X11 + jnp.asarray([0.05, -0.03, 0.0])
    return X11, X21


def test_img_gradient_matches_conv():
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (2, 3, 16, 20))
    gx, gy = matching.img_gradient(img)
    # explicit conv reference
    kx = np.array([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]], np.float32) / 32
    ky = kx.T
    imgn = np.asarray(img)
    pad = np.pad(imgn, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")
    ref_gx = np.zeros_like(imgn)
    ref_gy = np.zeros_like(imgn)
    for i in range(16):
        for j in range(20):
            patch = pad[:, :, i : i + 3, j : j + 3]
            ref_gx[:, :, i, j] = (patch * kx).sum((-1, -2))
            ref_gy[:, :, i, j] = (patch * ky).sum((-1, -2))
    np.testing.assert_allclose(gx, ref_gx, atol=1e-5)
    np.testing.assert_allclose(gy, ref_gy, atol=1e-5)


def test_iter_proj_matches_cuda_reference():
    h, w = 24, 32
    X11, X21 = _synthetic_pair(jax.random.PRNGKey(1), h, w)
    rays, pts, p_init = matching.prep_for_iter_proj(X11, X21, None)
    max_iter, lam0, cth = 8, 1e-8, 1e-8

    p_jax, conv_jax = matching.iter_proj(rays, pts, p_init, max_iter, lam0, cth)
    p_ref, conv_ref = np_iter_proj(
        np.asarray(rays), np.asarray(pts), np.asarray(p_init), max_iter, lam0, cth
    )
    np.testing.assert_allclose(np.asarray(p_jax), p_ref, atol=2e-2)
    agree = (np.asarray(conv_jax) == conv_ref).mean()
    assert agree > 0.97, f"convergence flags agree only {agree:.3f}"


def test_iter_proj_finds_true_offset():
    """Points shifted by a known pixel offset should be matched to it."""
    h, w = 32, 40
    u, v = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                        jnp.arange(h, dtype=jnp.float32), indexing="xy")
    z = 3.0 + 0.5 * jnp.sin(u / 5.0) * jnp.cos(v / 4.0)
    K_inv_scale = 30.0
    x = (u - w / 2) / K_inv_scale * z
    y = (v - h / 2) / K_inv_scale * z
    X11 = jnp.stack([x, y, z], -1)[None]
    # X21 = X11 shifted by 3 pixels in u: point at pixel p in 2 equals the
    # point at pixel p+3 in 1
    X21 = jnp.roll(X11, shift=-3, axis=2)
    rays, pts, p_init = matching.prep_for_iter_proj(X11, X21, None)
    p1, conv = matching.iter_proj(rays, pts, p_init, 20, 1e-8, 1e-6)
    p1 = np.asarray(p1).reshape(h, w, 2)
    # interior pixels away from the wrap column
    interior = p1[8:-8, 8 : w - 12]
    uu, vv = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    expect_u = (uu + 3)[8:-8, 8 : w - 12]
    expect_v = vv[8:-8, 8 : w - 12]
    err_u = np.abs(interior[..., 0] - expect_u)
    err_v = np.abs(interior[..., 1] - expect_v)
    assert np.median(err_u) < 0.5, f"median u err {np.median(err_u)}"
    assert np.median(err_v) < 0.5


def test_refine_matches_golden():
    rng = np.random.RandomState(0)
    b, h, w, f, n = 1, 20, 24, 8, 50
    D11 = rng.randn(b, h, w, f).astype(np.float32)
    D21 = rng.randn(b, n, f).astype(np.float32)
    p1 = np.stack(
        [rng.randint(0, w, (b, n)), rng.randint(0, h, (b, n))], axis=-1
    ).astype(np.int64)

    for radius, dil in [(1, 1), (2, 2), (3, 3)]:
        ref = np_refine_matches(D11, D21, p1, radius, dil)
        got = matching.refine_matches(
            jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p1), radius, dil
        )
        np.testing.assert_array_equal(np.asarray(got), ref)


def test_refine_dense_matches_stack():
    """The dense-stencil Pallas cascade (interpret mode on CPU) must agree
    with the wide-row-gather stack implementation, including collision-heavy
    matches that exercise the sparse loser path."""
    rng = np.random.RandomState(1)
    b, h, w, f = 1, 20, 24, 8
    n = h * w
    D11 = rng.randn(b, h, w, f).astype(np.float32)
    D21 = rng.randn(b, n, f).astype(np.float32)

    # mix: identity-ish positions + heavy collisions (many pixels -> (5, 7))
    uu, vv = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    p1 = np.stack([uu.reshape(-1), vv.reshape(-1)], -1)[None].astype(np.int64)
    p1[0, 100:300] = (5, 7)
    p1[0, 350:420] = (20, 3)

    for radius, dil in [(2, 2), (4, 3)]:
        ref = matching.refine_matches(
            jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p1),
            radius, dil, compute_dtype=jnp.bfloat16,
        )
        got = matching.refine_matches(
            jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p1),
            radius, dil, compute_dtype=jnp.bfloat16, force_dense=True,
        )
        agree = (np.asarray(got) == np.asarray(ref)).all(-1).mean()
        assert agree == 1.0, f"r={radius} d={dil}: agreement {agree}"


def test_match_iterative_proj_end_to_end():
    cfg = dict(
        max_iter=10, lambda_init=1e-8, convergence_thresh=1e-6,
        dist_thresh=0.1, radius=2, dilation_max=2,
    )
    h, w = 24, 32
    X11, X21 = _synthetic_pair(jax.random.PRNGKey(2), h, w)
    key = jax.random.PRNGKey(3)
    D = jax.random.normal(key, (1, h, w, 8))
    idx, valid = matching.match(cfg, X11, X21, D, D)
    assert idx.shape == (1, h * w)
    assert valid.shape == (1, h * w, 1)
    assert bool((idx >= 0).all()) and bool((idx < h * w).all())


def test_cascade_batch_alternation_regression():
    """Regression for the r3/r4 pipeline crash: alternating batch-1 and
    batch-8 cascade calls corrupted the pjit dispatch cache because a
    module-level concrete jnp scalar (_FLT_MIN) was lifted into an
    executable parameter on re-trace and then dropped by the dispatcher
    ('Execution supplied N buffers but compiled program expected N+1' on
    CPU; 'INVALID_ARGUMENT: TPU backend error' in the streaming pipeline).
    Module constants must stay numpy scalars; this test locks the exact
    failing call sequence (b1, b8, b1, b8) in."""
    rng = np.random.RandomState(7)
    h, w, f = 24, 32, 8
    n = h * w

    def mk(b):
        D11 = jnp.asarray(rng.randn(b, h, w, f).astype(np.float32))
        D21 = jnp.asarray(rng.randn(b, n, f).astype(np.float32))
        p1 = jnp.asarray(np.stack(
            [rng.randint(1, w - 1, (b, n)), rng.randint(1, h - 1, (b, n))],
            -1).astype(np.int32))
        return D11, D21, p1

    a1, a8 = mk(1), mk(8)
    outs = []
    for _ in range(3):
        outs.append(matching.refine_matches(
            *a1, 2, 2, compute_dtype=jnp.bfloat16))
        outs.append(matching.refine_matches(
            *a8, 2, 2, compute_dtype=jnp.bfloat16))
    # determinism across alternation: repeated identical calls agree
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[2]))
    np.testing.assert_array_equal(np.asarray(outs[1]), np.asarray(outs[3]))


def test_refine_dense_losers_fully_drained():
    """Collision losers beyond one chunk budget must be PROCESSED, not
    dropped (VERDICT r4 task 3: the budget overflow counter must read 0):
    the sparse pass drains losers in as many fixed-size passes as needed,
    and the result matches a run whose single chunk covers everything."""
    from artdeco_tpu.ops import refine_dense

    rng = np.random.RandomState(3)
    h, w, f = 20, 24, 8
    n = h * w  # 480 queries
    D11 = jnp.asarray(rng.randn(h, w, f).astype(np.float32)).astype(jnp.bfloat16)
    D21 = jnp.asarray(rng.randn(n, f).astype(np.float32)).astype(jnp.bfloat16)
    # all queries collide on ONE center: 479 losers >> a 32-slot chunk
    p1 = jnp.asarray(np.full((n, 2), 7, np.int32))

    old_chunk = refine_dense._SPARSE_CHUNK
    matching.reset_refine_telemetry()
    try:
        refine_dense._SPARSE_CHUNK = 32   # force multi-pass draining
        out_small, dropped_small = refine_dense.refine_matches_dense_single(
            D11, D21, p1, radius=2, dilation_max=2)
        refine_dense._SPARSE_CHUNK = 4096  # everything in one pass
        out_big, dropped_big = refine_dense.refine_matches_dense_single(
            D11, D21, p1, radius=2, dilation_max=2)
        assert int(dropped_small) == 0 and int(dropped_big) == 0
        np.testing.assert_array_equal(np.asarray(out_small),
                                      np.asarray(out_big))
        out = np.asarray(out_small)
        assert (out[:, 0] >= 0).all() and (out[:, 0] < w).all()
        assert (out[:, 1] >= 0).all() and (out[:, 1] < h).all()

        # end-to-end: the cascade reports 0 through the host telemetry
        refine_dense._SPARSE_CHUNK = 32
        cfg = dict(max_iter=4, lambda_init=1e-8, convergence_thresh=1e-6,
                   dist_thresh=10.0, radius=2, dilation_max=2)
        X = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32) + 1)
        matching.match(cfg, X, X, np.asarray(D11, np.float32)[None],
                       np.asarray(D11, np.float32)[None],
                       idx_1_to_2_init=jnp.zeros((1, n), jnp.int32))
        assert matching.refine_overflow_total() == 0
    finally:
        refine_dense._SPARSE_CHUNK = old_chunk
        matching.reset_refine_telemetry()


def test_refine_dense_valid_gating():
    """valid=False queries keep their positions untouched; valid=True
    queries get the same result as an ungated run restricted to them when
    the gated-out queries were not competing for the same centers."""
    from artdeco_tpu.ops import refine_dense

    rng = np.random.RandomState(5)
    h, w, f = 16, 20, 8
    n = h * w
    D11 = jnp.asarray(rng.randn(h, w, f).astype(np.float32)).astype(jnp.bfloat16)
    D21 = jnp.asarray(rng.randn(n, f).astype(np.float32)).astype(jnp.bfloat16)
    uu, vv = np.meshgrid(np.arange(w), np.arange(h))
    p1 = jnp.asarray(np.stack([
        np.clip(uu.reshape(-1), 1, w - 2),
        np.clip(vv.reshape(-1), 1, h - 2)], -1).astype(np.int32))
    valid = jnp.asarray(rng.rand(n) > 0.5)

    out_gated, d1 = refine_dense.refine_matches_dense_single(
        D11, D21, p1, radius=2, dilation_max=2, valid=valid)
    out_all, d2 = refine_dense.refine_matches_dense_single(
        D11, D21, p1, radius=2, dilation_max=2)
    assert int(d1) == 0 and int(d2) == 0
    vm = np.asarray(valid)
    og, oa, p = np.asarray(out_gated), np.asarray(out_all), np.asarray(p1)
    # invalid queries: untouched
    np.testing.assert_array_equal(og[~vm], p[~vm])
    # here every query claims a unique center (identity-ish grid), so the
    # gated run matches the ungated one on the valid set exactly
    np.testing.assert_array_equal(og[vm], oa[vm])
