"""Flattened-npz (de)serialization for nested parameter pytrees.

The repo's on-disk weight format: a single ``.npz`` whose keys are
``/``-joined paths into the nested dict (flax params / converter outputs).
Loads with plain numpy — no torch or safetensors needed at run time.
"""

from __future__ import annotations

import numpy as np


def flatten_dict(d: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in d.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_dict(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_dict(flat: dict) -> dict:
    out: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def save_pytree_npz(path: str, params: dict):
    np.savez(path, **flatten_dict(params))


def load_pytree_npz(path: str) -> dict:
    with np.load(path) as data:
        return unflatten_dict({k: data[k] for k in data.files})
