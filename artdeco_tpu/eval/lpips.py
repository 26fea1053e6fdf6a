"""LPIPS perceptual metric in pure JAX (AlexNet-feature variant).

Reference behavior: ``/root/reference/Reconstruct/scene/scene_models/
h3dgsv3.py:98`` builds ``lpips.LPIPS(net='alex')`` and evaluates it on every
test frame (``h3dgsv3.py:545``).  That implementation (Zhang et al., CVPR'18)
is: AlexNet conv features at 5 depths -> per-channel unit normalization ->
squared difference -> learned non-negative 1x1 "lin" head per layer ->
spatial mean -> sum over layers.  Inputs are in [-1, 1] and shifted/scaled
by fixed per-channel constants.

TPU-first design: the whole metric is one jitted function of static image
shape — five VALID convs + two max-pools, all MXU-friendly; no torch at
runtime.  Weights come from either

* ``convert_lpips_torch(state_dict)`` — maps a torch state dict holding the
  torchvision AlexNet ``features.{0,3,6,8,10}.{weight,bias}`` tensors plus
  the official LPIPS ``lin{0..4}.model.1.weight`` heads, or
* ``random_lpips_params(seed)`` — a documented fallback for environments
  with no checkpoint (this image has no torchvision/lpips and no egress):
  Zhang et al. (CVPR'18, Tab. 5) report that *untrained* nets already
  correlate with human judgements well above classic metrics, so a fixed-
  seed random AlexNet gives a deterministic, comparable perceptual score.
  Scores from the fallback are comparable across runs of this codebase but
  NOT numerically equal to the official LPIPS values.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# torchvision AlexNet features config: (out_ch, kernel, stride, pad)
_ALEX_CFG = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
# maxpool(3, stride 2) sits after relu1 and relu2 in torchvision AlexNet
_POOL_AFTER = (0, 1)

# official LPIPS input scaling (lpips/lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LpipsParams(NamedTuple):
    conv_w: tuple   # per layer (out, in, kh, kw)
    conv_b: tuple   # per layer (out,)
    lin_w: tuple    # per layer (out_ch,) non-negative head


def random_lpips_params(seed: int = 0) -> LpipsParams:
    """Deterministic random-init AlexNet-LPIPS (documented fallback)."""
    rng = np.random.RandomState(seed)
    conv_w, conv_b, lin_w = [], [], []
    in_ch = 3
    for out_ch, k, _, _ in _ALEX_CFG:
        fan_in = in_ch * k * k
        std = (2.0 / fan_in) ** 0.5
        conv_w.append(jnp.asarray(
            rng.randn(out_ch, in_ch, k, k).astype(np.float32) * std))
        conv_b.append(jnp.zeros((out_ch,), jnp.float32))
        # uniform heads: plain average over channels
        lin_w.append(jnp.full((out_ch,), 1.0 / out_ch, jnp.float32))
        in_ch = out_ch
    return LpipsParams(tuple(conv_w), tuple(conv_b), tuple(lin_w))


def convert_lpips_torch(state_dict) -> LpipsParams:
    """Build params from a torch state dict (torchvision AlexNet features +
    official LPIPS linear heads).  Accepts either tensors or numpy arrays."""

    def arr(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return jnp.asarray(np.asarray(x, np.float32))

    feat_ids = (0, 3, 6, 8, 10)
    conv_w = tuple(arr(state_dict[f"features.{i}.weight"]) for i in feat_ids)
    conv_b = tuple(arr(state_dict[f"features.{i}.bias"]) for i in feat_ids)
    lin_w = []
    for k in range(5):
        w = arr(state_dict[f"lin{k}.model.1.weight"])
        lin_w.append(jnp.maximum(w.reshape(-1), 0.0))  # heads are >= 0
    return LpipsParams(conv_w, conv_b, tuple(lin_w))


def _alex_features(params: LpipsParams, x):
    """x: (N, 3, H, W) in scaled space -> list of 5 feature maps."""
    feats = []
    for i, (w, b) in enumerate(zip(params.conv_w, params.conv_b)):
        _, k, s, p = _ALEX_CFG[i]
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(s, s), padding=[(p, p), (p, p)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + b[None, :, None, None]
        x = jax.nn.relu(x)
        feats.append(x)
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                "VALID",
            )
    return feats


@functools.partial(jax.jit, static_argnums=())
def _lpips_core(params: LpipsParams, img0, img1):
    # imgs (3, H, W) in [0, 1] -> [-1, 1] -> LPIPS scaling
    def prep(im):
        im = im * 2.0 - 1.0
        im = (im - jnp.asarray(_SHIFT)[:, None, None]) / (
            jnp.asarray(_SCALE)[:, None, None])
        return im[None]

    f0 = _alex_features(params, prep(img0))
    f1 = _alex_features(params, prep(img1))
    total = 0.0
    for a, b, w in zip(f0, f1, params.lin_w):
        a = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        total = total + jnp.mean(
            jnp.sum(d * w[None, :, None, None], axis=1))
    return total


class Lpips:
    """Callable LPIPS metric: ``Lpips()(img0, img1)`` with (3,H,W) in [0,1]."""

    def __init__(self, params: LpipsParams | None = None):
        self.params = params if params is not None else random_lpips_params()
        self.is_fallback = params is None

    def __call__(self, img0, img1):
        return _lpips_core(self.params, jnp.asarray(img0), jnp.asarray(img1))


_default: Lpips | None = None


def get_default_lpips() -> Lpips:
    """Process-wide LPIPS instance.  Loads a converted checkpoint from
    ``$ARTDECO_LPIPS_NPZ`` (an .npz of the torch tensors, see
    ``convert_lpips_torch``) when present, else the documented random-init
    fallback."""
    global _default
    if _default is None:
        import os

        path = os.environ.get("ARTDECO_LPIPS_NPZ", "")
        if path and os.path.exists(path):
            data = dict(np.load(path))
            _default = Lpips(convert_lpips_torch(data))
        else:
            _default = Lpips()
    return _default
