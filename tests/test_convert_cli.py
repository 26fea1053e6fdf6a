"""convert_checkpoints.py: detection + conversion over synthetic released
state dicts for every model family (VERDICT r2 task 9)."""

import importlib.util
import os
import pickle

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "convert_checkpoints", os.path.join(REPO, "scripts/convert_checkpoints.py")
)
cc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cc)


def _save_pth(path, sd):
    torch = pytest.importorskip("torch")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)


def test_mast3r_and_pi3_roundtrip(tmp_path):
    from artdeco_tpu.models.convert_mast3r import synth_state_dict
    from artdeco_tpu.models.mast3r import MASt3RConfig
    from artdeco_tpu.models.convert_pi3 import synth_pi3_state_dict
    from artdeco_tpu.models.pi3 import Pi3Config
    from artdeco_tpu.utils.params_io import load_pytree_npz

    mcfg = MASt3RConfig(enc_depth=2, dec_depth=2, enc_embed_dim=64,
                        dec_embed_dim=64, enc_num_heads=2, dec_num_heads=2)
    pcfg = Pi3Config(enc_depth=2, dec_depth=2, enc_embed_dim=32,
                     dec_embed_dim=64, enc_num_heads=2, dec_num_heads=2,
                     head_depth=2)

    src = tmp_path / "released"
    out = tmp_path / "out"
    src.mkdir(); out.mkdir()
    _save_pth(str(src / "MASt3R_synth.pth"), synth_state_dict(mcfg))
    _save_pth(str(src / "pi3_synth.pth"), synth_pi3_state_dict(pcfg))

    for fname, kind, cfgkey, cfg in [
        ("MASt3R_synth.pth", "mast3r", "mast3r", mcfg),
        ("pi3_synth.pth", "pi3", "pi3", pcfg),
    ]:
        path = str(src / fname)
        sd = cc._load_raw(path)
        assert cc.detect_kind(path, sd) == kind
        entry = cc.convert_one(kind, path, str(out), cfgs={cfgkey: cfg})
        loaded = load_pytree_npz(entry["output"])
        assert isinstance(loaded, dict) and loaded


def test_retrieval_codebook_lpips_dav2(tmp_path):
    rng = np.random.RandomState(0)
    src = tmp_path / "released"
    out = tmp_path / "out"
    src.mkdir(); out.mkdir()

    # retrieval head (trainingfree: prewhitener only)
    head_sd = {"prewhiten.m": rng.randn(1, 16).astype(np.float32),
               "prewhiten.p": rng.randn(16, 16).astype(np.float32)}
    _save_pth(str(src / "trainingfree.pth"), head_sd)
    p = str(src / "trainingfree.pth")
    assert cc.detect_kind(p, cc._load_raw(p)) == "retrieval"
    e = cc.convert_one("retrieval", p, str(out))
    assert os.path.exists(e["output"])

    # codebook pickle
    cents = rng.randn(32, 16).astype(np.float32)
    with open(src / "codebook.pkl", "wb") as fh:
        pickle.dump({"state": {"centroids": cents}}, fh)
    e = cc.convert_one("codebook", str(src / "codebook.pkl"), str(out))
    np.testing.assert_allclose(np.load(e["output"]), cents)

    # lpips (synthetic alexnet-shaped dict from the lpips test helper)
    from tests.test_lpips import _synth_torch_sd

    lp = _synth_torch_sd(rng)
    _save_pth(str(src / "lpips_alex.pth"), lp)
    p = str(src / "lpips_alex.pth")
    assert cc.detect_kind(p, cc._load_raw(p)) == "lpips"
    e = cc.convert_one("lpips", p, str(out))
    assert os.path.exists(e["output"])

    # DepthAnythingV2 tiny
    from artdeco_tpu.models import depth_anything as DA
    from tests.test_depth_anything import synth_sd

    cfg = DA.tiny_dav2_config()
    _save_pth(str(src / "depth_anything_v2_vitl_synth.pth"), synth_sd(cfg))
    p = str(src / "depth_anything_v2_vitl_synth.pth")
    assert cc.detect_kind(p, cc._load_raw(p)) == "dav2"
    e = cc.convert_one("dav2", p, str(out), cfgs={"dav2": cfg})
    assert os.path.exists(e["output"])

    # manifest path: run main() over the mixed directory with tiny kinds
    manifest = cc.main(["--src", str(src), "--out", str(out),
                        "--only", "retrieval,codebook,lpips"])
    kinds = {m.get("kind") for m in manifest if "kind" in m}
    assert {"retrieval", "codebook", "lpips"} <= kinds
