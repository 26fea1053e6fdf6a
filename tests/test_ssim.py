"""SSIM golden test vs a literal numpy/scipy implementation of the
reference's zero-padded Gaussian-window SSIM (fused-ssim semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from artdeco_tpu.ops import ssim


def np_ssim_map(img1, img2):
    """Direct 2D convolution reference, zero padding, 11x11 sigma=1.5."""
    x = np.arange(11) - 5.0
    g = np.exp(-(x ** 2) / (2 * 1.5 ** 2))
    g /= g.sum()
    k = np.outer(g, g)

    def conv(im):
        H, W = im.shape[-2:]
        p = np.zeros(im.shape[:-2] + (H + 10, W + 10), im.dtype)
        p[..., 5 : 5 + H, 5 : 5 + W] = im
        out = np.zeros_like(im)
        for i in range(11):
            for j in range(11):
                out += k[i, j] * p[..., i : i + H, j : j + W]
        return out

    C1, C2 = 0.01 ** 2, 0.03 ** 2
    mu1, mu2 = conv(img1), conv(img2)
    s1 = conv(img1 * img1) - mu1 ** 2
    s2 = conv(img2 * img2) - mu2 ** 2
    s12 = conv(img1 * img2) - mu1 * mu2
    return ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2)
    )


def test_ssim_matches_reference():
    rng = np.random.RandomState(0)
    a = rng.rand(3, 24, 32).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(3, 24, 32).astype(np.float32), 0, 1)
    ref = np_ssim_map(a, b)
    got = np.asarray(ssim.ssim_map(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, atol=2e-5)
    # identical images -> ssim ~ 1 in the interior
    m_same = np.asarray(ssim.ssim_map(jnp.asarray(a), jnp.asarray(a), "valid"))
    assert m_same.min() > 0.99


def test_fused_ssim_scalar_and_grad():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(3, 32, 32), jnp.float32)
    b = jnp.asarray(np.clip(np.asarray(a) + 0.2 * rng.randn(3, 32, 32), 0, 1), jnp.float32)
    s = float(ssim.fused_ssim(a, b))
    assert 0.0 < s < 1.0
    # maximizing SSIM by gradient ascent moves b toward a
    g = jax.grad(lambda x: ssim.fused_ssim(a, x))
    b2 = b
    s0 = float(ssim.fused_ssim(a, b2))
    for _ in range(100):
        b2 = b2 + 1.0 * g(b2)
    s1 = float(ssim.fused_ssim(a, b2))
    assert s1 > s0 + 0.01, (s0, s1)


def test_ssim_valid_padding_shape():
    a = jnp.ones((3, 20, 24))
    m = ssim.ssim_map(a, a, padding="valid")
    assert m.shape == (3, 10, 14)
