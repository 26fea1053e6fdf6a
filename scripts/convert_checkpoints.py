#!/usr/bin/env python
"""Convert a directory of released checkpoints into the repo's npz format.

One command readies every model the system can load (driver configs 1-4
run without code changes once the outputs are pointed at):

    python scripts/convert_checkpoints.py --src /path/to/released --out ckpts/

Detected artifacts (by filename, then by state-dict key signature):

  MASt3R        MASt3R_*.pth / *.safetensors   -> mast3r.npz
                (AsymmetricMASt3R; VSLAM/thirdparty/mast3r/mast3r/model.py)
  Pi3           pi3*.safetensors / *.pth       -> pi3.npz
                (Pi3/pi3/models/pi3.py)
  retrieval     *trainingfree*.pth             -> retrieval_head.npz
                (mast3r/retrieval/model.py checkpoint)
  codebook      *codebook*.pkl / .npy          -> codebook.npy
                (asmk codebook pickle)
  DepthAnything depth_anything_v2*.pth         -> dav2_<enc>.npz
                (Reconstruct/scene/mono_depth.py wrapped network)
  LPIPS         *lpips*/alex.pth / lpips_*.pth -> lpips_alex.npz
                (h3dgsv3.py:98 metric network)

Each conversion runs the repo's converter (numerics already proven by the
torch-parity tests) and writes a flattened-npz pytree plus manifest.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_raw(path: str) -> dict:
    """Raw state dict from .pth/.safetensors/.npz as numpy arrays."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    if path.endswith(".npz"):
        with np.load(path) as d:
            return {k: d[k] for k in d.files}
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: np.asarray(v) for k, v in sd.items()
            if hasattr(v, "shape") or np.isscalar(v)}


def _sig(sd: dict) -> set:
    return set(sd.keys())


def detect_kind(path: str, sd: dict) -> str:
    name = os.path.basename(path).lower()
    keys = _sig(sd)
    has = lambda p: any(k.startswith(p) for k in keys)
    if has("downstream_head1.") or "mast3r" in name:
        return "mast3r"
    if has("decoder.") and (has("point_head") or has("camera_head")) \
            or "pi3" in name:
        return "pi3"
    if "prewhiten.m" in keys or "trainingfree" in name:
        return "retrieval"
    if "codebook" in name:
        return "codebook"
    if has("pretrained.") or "depth_anything" in name:
        return "dav2"
    if any(k.startswith("lin0.") for k in keys) or "lpips" in name:
        return "lpips"
    if has("net.block1.") or has("block_fusion.") or "xfeat" in name:
        return "xfeat"
    return "unknown"


def convert_one(kind: str, path: str, out_dir: str, cfgs: dict = None) -> dict:
    """cfgs: optional {kind: config} overrides (tests use tiny configs)."""
    from artdeco_tpu.utils.params_io import save_pytree_npz

    cfgs = cfgs or {}
    entry = {"source": path, "kind": kind}
    if kind == "mast3r":
        from artdeco_tpu.models.convert_mast3r import convert_state_dict
        from artdeco_tpu.models.mast3r import MASt3RConfig

        params = convert_state_dict(
            _load_raw(path), cfgs.get("mast3r", MASt3RConfig())
        )
        out = os.path.join(out_dir, "mast3r.npz")
        save_pytree_npz(out, params)
    elif kind == "pi3":
        from artdeco_tpu.models.convert_pi3 import convert_pi3_state_dict
        from artdeco_tpu.models.pi3 import Pi3Config

        params = convert_pi3_state_dict(
            _load_raw(path), cfgs.get("pi3", Pi3Config())
        )
        out = os.path.join(out_dir, "pi3.npz")
        save_pytree_npz(out, params)
    elif kind == "retrieval":
        # runtime loader consumes the raw dict; persist it as flat npz
        sd = _load_raw(path)
        out = os.path.join(out_dir, "retrieval_head.npz")
        np.savez(out, **sd)
    elif kind == "codebook":
        from artdeco_tpu.vslam.retrieval import load_codebook

        cents = load_codebook(path)
        out = os.path.join(out_dir, "codebook.npy")
        np.save(out, cents)
    elif kind == "dav2":
        from artdeco_tpu.models.depth_anything import (
            convert_dav2_state_dict, dav2_config,
        )

        name = os.path.basename(path).lower()
        enc = next((e for e in ("vits", "vitb", "vitl", "vitg")
                    if e in name), "vitl")
        params = convert_dav2_state_dict(
            _load_raw(path), cfgs.get("dav2", dav2_config(enc))
        )
        out = os.path.join(out_dir, f"dav2_{enc}.npz")
        save_pytree_npz(out, params)
        entry["encoder"] = enc
    elif kind == "lpips":
        from artdeco_tpu.eval.lpips import convert_lpips_torch

        sd = _load_raw(path)
        # validate convertibility, then store the raw tensors (the runtime
        # path $ARTDECO_LPIPS_NPZ re-runs convert_lpips_torch on load)
        convert_lpips_torch(sd)
        out = os.path.join(out_dir, "lpips_alex.npz")
        np.savez(out, **sd)
    elif kind == "xfeat":
        from artdeco_tpu.models.xfeat import convert_xfeat_state_dict

        params = convert_xfeat_state_dict(_load_raw(path))
        out = os.path.join(out_dir, "xfeat.npz")
        save_pytree_npz(out, params)
    else:
        raise ValueError(f"unknown checkpoint kind for {path}")
    entry["output"] = out
    entry["bytes"] = os.path.getsize(out)
    return entry


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True,
                    help="directory of released checkpoint files")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--only", default="",
                    help="comma-separated kinds to convert (default all)")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    only = set(filter(None, args.only.split(",")))

    manifest = []
    exts = (".pth", ".ckpt", ".safetensors", ".pkl", ".npy", ".npz")
    for root, _, files in os.walk(args.src):
        for f in sorted(files):
            if not f.lower().endswith(exts):
                continue
            path = os.path.join(root, f)
            try:
                sd = {} if f.endswith((".pkl", ".npy")) else _load_raw(path)
                kind = detect_kind(path, sd)
                if kind == "unknown" or (only and kind not in only):
                    print(f"skip {f} ({kind})")
                    continue
                entry = convert_one(kind, path, args.out)
                manifest.append(entry)
                print(f"converted {f} -> {entry['output']}")
            except Exception as e:
                print(f"FAILED {f}: {e}")
                manifest.append({"source": path, "error": str(e)})
    with open(os.path.join(args.out, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    print(f"wrote {os.path.join(args.out, 'manifest.json')} "
          f"({len(manifest)} entries)")
    return manifest


if __name__ == "__main__":
    main()
