"""XFeat port tests: torch parity of the backbone, converter mapping, and
the fixed-size detect pipeline mechanics.

The torch model here is built from the architecture spec (XFeat CVPR 2024 /
reference ``Reconstruct/scene/extractor_model.py:28-168``) inside the test,
loaded with random weights, and compared against the flax port through
``convert_xfeat_state_dict`` — the same strategy as the MASt3R/Pi3 parity
tests (no pretrained checkpoint in this environment).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artdeco_tpu.models import xfeat as XF

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402


def _torch_xfeat(stride=4, block3_stride=2):
    class Basic(tnn.Module):
        # param keys `*.layer.{0,1}.*` — the upstream BasicLayer layout
        def __init__(self, cin, cout, k=3, s=1, p=1):
            super().__init__()
            self.layer = tnn.Sequential(
                tnn.Conv2d(cin, cout, k, padding=p, stride=s, bias=False),
                tnn.BatchNorm2d(cout, affine=False),
                tnn.ReLU(inplace=True),
            )

        def forward(self, x):
            return self.layer(x)

    def basic(cin, cout, k=3, s=1, p=1):
        return Basic(cin, cout, k=k, s=s, p=p)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm = tnn.InstanceNorm2d(1)
            self.skip1 = tnn.Sequential(
                tnn.AvgPool2d(stride, stride=stride),
                tnn.Conv2d(1, 24, 1, stride=1, padding=0),
            )
            b1s = {1: (1, 1, 1, 1), 2: (1, 2, 1, 1), 4: (1, 2, 1, 2)}[stride]
            self.block1 = tnn.Sequential(
                basic(1, 4, s=b1s[0]), basic(4, 8, s=b1s[1]),
                basic(8, 8, s=b1s[2]), basic(8, 24, s=b1s[3]),
            )
            self.block2 = tnn.Sequential(basic(24, 24), basic(24, 24))
            self.block3 = tnn.Sequential(
                basic(24, 64, s=block3_stride), basic(64, 64),
                basic(64, 64, k=1, p=0),
            )
            self.block4 = tnn.Sequential(
                basic(64, 64, s=2), basic(64, 64), basic(64, 64))
            self.block5 = tnn.Sequential(
                basic(64, 128, s=2), basic(128, 128), basic(128, 128),
                basic(128, 64, k=1, p=0),
            )
            self.block_fusion = tnn.Sequential(
                basic(64, 64), basic(64, 64),
                tnn.Conv2d(64, 64, 1, padding=0),
            )
            self.heatmap_head = tnn.Sequential(
                basic(64, 64, k=1, p=0), basic(64, 64, k=1, p=0),
                tnn.Conv2d(64, 1, 1), tnn.Sigmoid(),
            )
            self.keypoint_head = tnn.Sequential(
                basic(64, 64, k=1, p=0), basic(64, 64, k=1, p=0),
                basic(64, 64, k=1, p=0), tnn.Conv2d(64, 65, 1),
            )

        def _unfold2d(self, x, ws=2):
            B, C, H, W = x.shape
            x = (x.unfold(2, ws, ws).unfold(3, ws, ws)
                 .reshape(B, C, H // ws, W // ws, ws ** 2))
            return x.permute(0, 1, 4, 2, 3).reshape(B, -1, H // ws, W // ws)

        def forward(self, x):
            with torch.no_grad():
                x = x.mean(dim=1, keepdim=True)
                x = self.norm(x)
            x1 = self.block1(x)
            x2 = self.block2(x1 + self.skip1(x))
            x3 = self.block3(x2)
            x4 = self.block4(x3)
            x5 = self.block5(x4)
            x4 = tF.interpolate(x4, (x3.shape[-2], x3.shape[-1]),
                                mode="bilinear")
            x5 = tF.interpolate(x5, (x3.shape[-2], x3.shape[-1]),
                                mode="bilinear")
            feats = self.block_fusion(x3 + x4 + x5)
            heatmap = self.heatmap_head(feats)
            keypoints = self.keypoint_head(self._unfold2d(x, ws=8))
            return feats, keypoints, heatmap

    return Net()


def _randomize(net, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = net.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.rand(v.shape, generator=g) * 0.5 + 0.5
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.2
    net.load_state_dict(sd)
    return net


@pytest.mark.parametrize("block3_stride", [2, 1])
def test_backbone_torch_parity(block3_stride):
    net = _randomize(_torch_xfeat(4, block3_stride)).eval()
    cfg = XF.XFeatConfig(stride=4, block3_stride=block3_stride)
    params = XF.convert_xfeat_state_dict(net.state_dict(), cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    model = XF.XFeatModel(cfg)

    rng = np.random.RandomState(1)
    img = rng.rand(1, 3, 64, 96).astype(np.float32)

    with torch.no_grad():
        tf_, tk, th = net(torch.from_numpy(img))
    x = XF.instance_norm_gray(jnp.asarray(img)).transpose(0, 2, 3, 1)
    jf, jk, jh = model.apply({"params": params}, x)

    for tv, jv, name in ((tf_, jf, "feats"), (tk, jk, "kpts"),
                         (th, jh, "heat")):
        tv = tv.numpy().transpose(0, 2, 3, 1)
        err = np.abs(tv - np.asarray(jv)).max()
        scale = max(np.abs(tv).max(), 1e-6)
        assert err / scale < 2e-4, f"{name}: rel err {err / scale:.2e}"


def test_detect_and_compute_mechanics():
    cfg = XF.sparse_config(top_k=64)
    model = XF.XFeatModel(cfg)
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(1, 3, 64, 96).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 96, 1)))["params"]
    kpts, feats, scores = XF.detect_and_compute(
        params, img, cfg=cfg, model=model)
    assert kpts.shape == (64, 2) and feats.shape == (64, 64)
    k = np.asarray(kpts)
    s = np.asarray(scores)
    f = np.asarray(feats)
    assert (k[:, 0] >= 0).all() and (k[:, 0] <= 96).all()
    assert (k[:, 1] >= 0).all() and (k[:, 1] <= 64).all()
    # scores sorted descending (top_k) and zero-score rows have zero desc
    assert (np.diff(s) <= 1e-6).all()
    dead = s <= 0
    if dead.any():
        assert np.abs(f[dead]).max() == 0.0
    live = ~dead
    if live.any():
        norms = np.linalg.norm(f[live], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_detector_wrapper_interface():
    from artdeco_tpu.poses.feature_detector import FeatureDetector

    rng = np.random.RandomState(3)
    img = rng.rand(3, 64, 96).astype(np.float32)
    det = FeatureDetector(num_kpts=32)
    dk = det(img)
    assert dk.kpts.shape == (32, 2)

    # learned path: random-init weights via a converted checkpoint roundtrip
    import tempfile, os
    from artdeco_tpu.utils.params_io import save_pytree_npz, load_pytree_npz

    net = _randomize(_torch_xfeat(4, 2))
    params = XF.convert_xfeat_state_dict(net.state_dict())
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "xfeat.npz")
        save_pytree_npz(p, params)
        det2 = FeatureDetector(num_kpts=32, xfeat_checkpoint=p)
        dk2 = det2(img)
        assert dk2.kpts.shape == (32, 2) and dk2.desc.shape == (32, 64)
