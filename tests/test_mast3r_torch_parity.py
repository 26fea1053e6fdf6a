"""Numerical parity of the flax MASt3R port against the reference torch model.

Instantiates the reference ``AsymmetricMASt3R`` (ViT-L encoder, dual decoder,
catmlp+dpt heads — the exact released-checkpoint architecture string) with
random weights, converts the state dict with ``convert_mast3r``, and checks
that both implementations produce the same pointmaps/confidences/descriptors
on the same input pair.  Reference: ``VSLAM/thirdparty/mast3r/mast3r/model.py``
and ``dust3r/dust3r/model.py:127-211``.

Runs only when the reference tree is present (slow; CPU f32 both sides).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/VSLAM/thirdparty/mast3r"

pytestmark = pytest.mark.slow


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")
def test_full_size_torch_parity():
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "dust3r"))
    sys.path.insert(0, os.path.join(REF, "dust3r", "croco"))
    import torch

    torch.manual_seed(0)
    from mast3r.model import AsymmetricMASt3R

    inf = float("inf")
    model = AsymmetricMASt3R(
        output_mode="pts3d+desc24", head_type="catmlp+dpt",
        depth_mode=("exp", -inf, inf), conf_mode=("exp", 1, inf),
        enc_embed_dim=1024, dec_embed_dim=768, enc_num_heads=16,
        dec_num_heads=12, enc_depth=24, dec_depth=12,
        img_size=(512, 512), patch_embed_cls="PatchEmbedDust3R",
        two_confs=True, desc_conf_mode=("exp", 0, inf),
        landscape_only=False, pos_embed="RoPE100",
    ).eval()

    h, w = 384, 512
    rng = np.random.RandomState(0)
    img1 = (rng.rand(1, 3, h, w).astype(np.float32) * 2 - 1)
    img2 = (rng.rand(1, 3, h, w).astype(np.float32) * 2 - 1)
    shape = torch.tensor([[h, w]])
    with torch.no_grad():
        res1, res2 = model(
            {"img": torch.from_numpy(img1), "true_shape": shape,
             "instance": ["0"]},
            {"img": torch.from_numpy(img2), "true_shape": shape,
             "instance": ["1"]},
        )

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    import jax.numpy as jnp

    from artdeco_tpu.models import mast3r as M
    from artdeco_tpu.models.convert_mast3r import convert_state_dict
    from artdeco_tpu.models.mast3r_infer import Mast3rRunner

    cfg = M.MASt3RConfig(compute_dtype=jnp.float32)
    params = convert_state_dict(sd, cfg)
    runner = Mast3rRunner(cfg, params, match_cfg=dict(
        max_iter=1, lambda_init=1e-8, convergence_thresh=1e-6,
        dist_thresh=0.1, radius=0, dilation_max=1,
    ))
    f1, p1 = runner.encode_image(jnp.asarray(img1))
    f2, p2 = runner.encode_image(jnp.asarray(img2))
    rA, rB = runner.decode(f1, p1, f2, p2, (h, w))

    def rel(a, b):
        a = np.asarray(a, np.float64).reshape(-1)
        b = np.asarray(b, np.float64).reshape(-1)
        return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)

    checks = {
        "pts3d_1": (rA["pts3d"][0], res1["pts3d"][0].numpy()),
        "conf_1": (rA["conf"][0], res1["conf"][0].numpy()),
        "desc_1": (rA["desc"][0], res1["desc"][0].numpy()),
        "desc_conf_1": (rA["desc_conf"][0], res1["desc_conf"][0].numpy()),
        "pts3d_2": (rB["pts3d"][0], res2["pts3d_in_other_view"][0].numpy()),
        "conf_2": (rB["conf"][0], res2["conf"][0].numpy()),
        "desc_2": (rB["desc"][0], res2["desc"][0].numpy()),
    }
    errs = {k: rel(a, b) for k, (a, b) in checks.items()}
    print("parity rel errs:", {k: f"{v:.2e}" for k, v in errs.items()})
    for k, e in errs.items():
        assert e < 5e-3, (k, e, errs)
