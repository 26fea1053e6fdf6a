"""Numerical parity of the flax Pi3 port against the reference torch model.

Full-size architecture (DINOv2 ViT-L/14 + 36-block RoPE decoder + heads,
``/root/reference/VSLAM/thirdparty/Pi3/pi3/models/pi3.py:16-216``), random
weights, 2-frame input.  Runs only when the reference tree is present.
"""

import os
import sys

import numpy as np
import pytest

REF_PI3 = "/root/reference/VSLAM/thirdparty/Pi3"

pytestmark = pytest.mark.slow


@pytest.mark.skipif(not os.path.isdir(REF_PI3), reason="reference tree absent")
def test_full_size_pi3_torch_parity():
    sys.path.insert(0, REF_PI3)
    import torch

    torch.manual_seed(0)
    from pi3.models.pi3 import Pi3 as TorchPi3

    model = TorchPi3().eval()

    n, h, w = 2, 224, 224
    rng = np.random.RandomState(0)
    imgs = rng.rand(1, n, 3, h, w).astype(np.float32)
    with torch.no_grad():
        res = model(torch.from_numpy(imgs))

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    import jax.numpy as jnp

    from artdeco_tpu.models.convert_pi3 import convert_pi3_state_dict
    from artdeco_tpu.models.pi3 import Pi3, Pi3Config

    cfg = Pi3Config(compute_dtype=jnp.float32)
    params = convert_pi3_state_dict(sd, cfg)
    out = Pi3(cfg).apply(params, jnp.asarray(imgs))

    def rel(a, b):
        a = np.asarray(a, np.float64).reshape(-1)
        b = np.asarray(b, np.float64).reshape(-1)
        return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)

    errs = {
        "local_points": rel(out["local_points"], res["local_points"].numpy()),
        "conf": rel(out["conf"], res["conf"].numpy()),
        "camera_poses": rel(out["camera_poses"], res["camera_poses"].numpy()),
        "points": rel(out["points"], res["points"].numpy()),
    }
    print("pi3 parity rel errs:", {k: f"{v:.2e}" for k, v in errs.items()})
    for k, e in errs.items():
        assert e < 5e-3, (k, e, errs)
