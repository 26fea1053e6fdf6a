"""Scene export: gaussian PLY, xyz+RGB PLY, COLMAP binary model, TUM poses,
camera-frustum PLYs, test renders.

Reference surfaces: ``h3dgsv3.py:1058-1218`` (construct_list_of_attributes,
save_ply, save_pcd, save), ``Reconstruct/utils.py:475-634`` (save_ply /
save_poses_as_pyramid_ply), ``dataloaders/utils_IO.py:107-523`` (COLMAP
binary model write), ``keyframe.py:201-259`` (to_json / to_colmap).
Writers are dependency-free (raw binary PLY / COLMAP formats).
"""

from __future__ import annotations

import json
import os
import struct
from typing import Dict, List

import numpy as np


# ---------------------------------------------------------------------------
# PLY
# ---------------------------------------------------------------------------

def write_ply(path: str, fields: List[tuple], columns: List[np.ndarray]):
    """Binary little-endian PLY. fields: [(name, 'f4'|'u1'), ...]."""
    n = columns[0].shape[0]
    type_map = {"f4": "float", "u1": "uchar"}
    np_map = {"f4": np.float32, "u1": np.uint8}
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    for name, t in fields:
        header.append(f"property {type_map[t]} {name}")
    header.append("end_header\n")
    rec = np.core.records.fromarrays(
        [c.astype(np_map[t]) for c, (_, t) in zip(columns, fields)],
        names=[name for name, _ in fields],
    )
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        rec.tofile(f)


def gaussian_ply_fields(sh_degree: int) -> List[tuple]:
    """h3dgsv3.construct_list_of_attributes (:1052-1065)."""
    k = (sh_degree + 1) ** 2
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(3 * (k - 1))]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(3)]
    names += [f"rotation_{i}" for i in range(4)]
    return [(n, "f4") for n in names]


def save_gaussian_ply(path: str, scene_model) -> int:
    """MLP-baked gaussian PLY (h3dgsv3.save_ply :1067-1101): scaling and
    rotation are exported AFTER the mlp_cov modulation so standard 3DGS
    viewers reproduce the render."""
    import jax.numpy as jnp

    from artdeco_tpu.mapper.scene_model import mlp_cov_apply

    slab = scene_model.slab
    active = np.asarray(slab.active)
    sel = np.where(active)[0]
    xyz = np.asarray(slab.xyz)[sel]
    f_dc = np.asarray(slab.f_dc)[sel]          # (N, 1, 3)
    f_rest = np.asarray(slab.f_rest)[sel]      # (N, K-1, 3)
    opacity = np.asarray(slab.opacity)[sel]

    cls_id = np.asarray(slab.cls_id)[sel]
    gfeat = np.asarray(scene_model.gfeat.val)[
        np.clip(cls_id, 0, scene_model.cfg.cluster_capacity - 1)
    ]
    local = np.asarray(slab.local_feat)[sel]
    feats = jnp.asarray(np.concatenate([gfeat, local], axis=-1))
    sr = np.asarray(mlp_cov_apply(scene_model.mlp, feats))
    scaling = np.log(
        (1.0 / (1.0 + np.exp(-sr[:, :3])))
        * np.exp(np.asarray(slab.scaling)[sel])
        + 1e-30
    )
    rotation = np.asarray(slab.rotation)[sel] * sr[:, 3:7]

    # torch layout: transpose(1,2).flatten -> channel-major coefficients
    f_dc_flat = f_dc.transpose(0, 2, 1).reshape(len(sel), -1)
    f_rest_flat = f_rest.transpose(0, 2, 1).reshape(len(sel), -1)

    cols = (
        [xyz[:, i] for i in range(3)]
        + [np.zeros(len(sel), np.float32)] * 3
        + [f_dc_flat[:, i] for i in range(3)]
        + [f_rest_flat[:, i] for i in range(f_rest_flat.shape[1])]
        + [opacity[:, 0]]
        + [scaling[:, i] for i in range(3)]
        + [rotation[:, i] for i in range(4)]
    )
    write_ply(path, gaussian_ply_fields(scene_model.cfg.sh_degree), cols)
    return len(sel)


def read_gaussian_ply(path: str) -> dict:
    """Parse a (baked) gaussian PLY written by :func:`save_gaussian_ply`
    back into field arrays (plain numpy; binary little-endian only)."""
    with open(path, "rb") as f:
        names = []
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("property"):
                names.append(line.split()[-1])
            elif line == "end_header":
                break
            elif not line:
                raise ValueError(f"{path}: truncated PLY header")
        rec = np.fromfile(f, dtype=np.dtype([(n, "<f4") for n in names]))
    cols = {n: rec[n] for n in names}
    n = len(rec)
    xyz = np.stack([cols["x"], cols["y"], cols["z"]], -1)
    f_dc = np.stack([cols[f"f_dc_{i}"] for i in range(3)], -1)[:, None, :]
    n_rest = sum(1 for k in names if k.startswith("f_rest_"))
    if n_rest:
        flat = np.stack([cols[f"f_rest_{i}"] for i in range(n_rest)], -1)
        f_rest = flat.reshape(n, 3, n_rest // 3).transpose(0, 2, 1)
    else:
        f_rest = np.zeros((n, 0, 3), np.float32)
    return dict(
        xyz=xyz, f_dc=f_dc, f_rest=f_rest,
        opacity=cols["opacity"][:, None],
        scaling=np.stack([cols[f"scale_{i}"] for i in range(3)], -1),
        rotation=np.stack([cols[f"rotation_{i}"] for i in range(4)], -1),
    )


def load_scene_for_viewing(run_dir: str, focal: float = None):
    """Rebuild a renderable scene from a saved run directory.

    The gaussian PLY is MLP-baked (scaling/rotation already modulated), so
    the loaded scene renders through an IDENTITY mlp_cov: zero hidden
    weights, output bias [+20,+20,+20, 1,1,1,1] — sigmoid(+20) == 1 leaves
    the baked scale untouched and unit rotation gains keep the baked
    quaternion.  d_max is +inf (no LOD culling for offline inspection).
    The reference's disk-loading viewer path is broken
    (``gaussianviewer.py:56`` imports a nonexistent module); this is the
    working equivalent.
    """
    import glob
    import json

    import jax.numpy as jnp

    from artdeco_tpu.mapper.config import MapperConfig
    from artdeco_tpu.mapper.scene_model import MlpCov

    candidates = (
        glob.glob(os.path.join(run_dir, "pcd", "gs.ply"))
        + glob.glob(os.path.join(run_dir, "**", "gs.ply"), recursive=True)
        + ([run_dir] if run_dir.endswith(".ply") else [])
    )
    if not candidates:
        raise FileNotFoundError(f"no gs.ply under {run_dir}")
    fields = read_gaussian_ply(candidates[0])
    n = len(fields["xyz"])
    k = 1 + fields["f_rest"].shape[1]
    sh_degree = int(round(np.sqrt(k))) - 1

    meta_path = os.path.join(run_dir, "metadata.json")
    width, height, f = 640, 360, focal or 500.0
    if os.path.isfile(meta_path):
        try:
            meta = json.load(open(meta_path))
            cfgm = meta.get("config", meta)
            width = int(cfgm.get("width", width))
            height = int(cfgm.get("height", height))
            f = float(cfgm.get("f", cfgm.get("focal", f)))
        except Exception:
            pass

    cfg = MapperConfig(capacity=max(n, 1), sh_degree=sh_degree,
                       local_feat_dim=1, global_feat_dim=1,
                       cluster_capacity=1, voxel_table_size=2)
    from artdeco_tpu.mapper import gaussians as G_

    slab = G_.create_slab(max(n, 1), sh_degree, 1, 1e-4)
    slab = dataclasses_replace_slab(slab, fields, n)
    mlp = MlpCov(
        w1=jnp.zeros((2, 2)), b1=jnp.zeros((2,)),
        w2=jnp.zeros((2, 7)),
        b2=jnp.asarray([20.0, 20.0, 20.0, 1.0, 1.0, 1.0, 1.0]),
    )

    class _ViewerScene:
        pass

    vs = _ViewerScene()
    vs.slab = slab
    vs.mlp = mlp
    vs.cfg = cfg
    vs.width, vs.height, vs.f = width, height, f

    class _GF:
        # Dg=1 + local Dl=1 -> mlp feat_dim 2 (matches w1 above)
        val = jnp.zeros((1, 1))

    vs.gfeat = _GF()
    return vs


def dataclasses_replace_slab(slab, fields: dict, n: int):
    """Scatter loaded PLY fields into a fresh slab's first ``n`` rows."""
    import dataclasses as _dc

    import jax.numpy as jnp

    upd = dict(active=jnp.asarray(np.arange(slab.capacity) < n))
    for key in ("xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity"):
        base = getattr(slab, key)
        v = np.asarray(fields[key], np.float32)
        if v.shape[1:] != base.shape[1:]:   # f_rest K mismatch etc.
            continue
        upd[key] = jnp.asarray(base).at[:n].set(v)
    upd["d_max"] = jnp.full((slab.capacity, 1), 1e10, jnp.float32)
    return _dc.replace(slab, **upd)


def save_xyz_rgb_ply(path: str, scene_model) -> int:
    """xyz + DC-term RGB point cloud (h3dgsv3.save_pcd :1103-1121)."""
    slab = scene_model.slab
    sel = np.where(np.asarray(slab.active))[0]
    xyz = np.asarray(slab.xyz)[sel]
    f_dc = np.asarray(slab.f_dc)[sel][:, 0, :]
    c0 = 0.28209479177387814
    rgb = np.clip(f_dc * c0 + 0.5, 0, 1)
    rgb_u8 = (rgb * 255).astype(np.uint8)
    fields = [("x", "f4"), ("y", "f4"), ("z", "f4"),
              ("red", "u1"), ("green", "u1"), ("blue", "u1")]
    write_ply(path, fields,
              [xyz[:, 0], xyz[:, 1], xyz[:, 2],
               rgb_u8[:, 0], rgb_u8[:, 1], rgb_u8[:, 2]])
    return len(sel)


def save_poses_as_pyramid_ply(Rts_w2c: np.ndarray, path: str,
                              size: float = 0.3, color: str = "red"):
    """Camera frusta as 5-vertex pyramids (Reconstruct/utils.py:475-560)."""
    cols = {"red": (255, 0, 0), "green": (0, 255, 0), "blue": (0, 0, 255)}
    c = cols.get(color, (255, 0, 0))
    verts = []
    base = np.asarray([
        [0, 0, 0],
        [-0.5, -0.375, 1], [0.5, -0.375, 1],
        [0.5, 0.375, 1], [-0.5, 0.375, 1],
    ]) * size
    for Rt in Rts_w2c:
        c2w = np.linalg.inv(Rt)
        v = base @ c2w[:3, :3].T + c2w[:3, 3]
        verts.append(v)
    verts = np.concatenate(verts, axis=0) if verts else np.zeros((0, 3))
    n = verts.shape[0]
    fields = [("x", "f4"), ("y", "f4"), ("z", "f4"),
              ("red", "u1"), ("green", "u1"), ("blue", "u1")]
    write_ply(path, fields, [
        verts[:, 0], verts[:, 1], verts[:, 2],
        np.full(n, c[0], np.uint8), np.full(n, c[1], np.uint8),
        np.full(n, c[2], np.uint8),
    ])


# ---------------------------------------------------------------------------
# COLMAP binary model (utils_IO.py write_model format)
# ---------------------------------------------------------------------------

def rotmat_to_qvec(R: np.ndarray) -> np.ndarray:
    """3x3 -> COLMAP (qw, qx, qy, qz)."""
    K = np.array([
        [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
        [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
        [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1], R[2, 2] - R[0, 0] - R[1, 1], 0],
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1],
         R[0, 0] + R[1, 1] + R[2, 2]],
    ]) / 3.0
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    if q[0] < 0:
        q = -q
    return q


def write_colmap_model(out_dir: str, cameras: Dict, images: Dict):
    """cameras: id -> dict(model_id, width, height, params);
    images: id -> dict(qvec, tvec, camera_id, name)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(cameras)))
        for cid, c in cameras.items():
            f.write(struct.pack("<iiQQ", cid, c["model_id"],
                                c["width"], c["height"]))
            for p in c["params"]:
                f.write(struct.pack("<d", float(p)))
    with open(os.path.join(out_dir, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for iid, im in images.items():
            f.write(struct.pack("<i", iid))
            for q in im["qvec"]:
                f.write(struct.pack("<d", float(q)))
            for t in im["tvec"]:
                f.write(struct.pack("<d", float(t)))
            f.write(struct.pack("<i", im["camera_id"]))
            f.write(im["name"].encode() + b"\x00")
            f.write(struct.pack("<Q", 0))  # no 2D points
    with open(os.path.join(out_dir, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 0))


def read_colmap_model(model_dir: str):
    """Minimal binary reader (roundtrip tests; utils_IO.py read_model)."""
    cameras = {}
    with open(os.path.join(model_dir, "cameras.bin"), "rb") as f:
        n = struct.unpack("<Q", f.read(8))[0]
        num_params = {0: 3, 1: 4, 2: 4, 3: 5, 4: 8}  # SIMPLE_PINHOLE..OPENCV
        for _ in range(n):
            cid, model_id, w, h = struct.unpack("<iiQQ", f.read(24))
            k = num_params.get(model_id, 4)
            params = struct.unpack(f"<{k}d", f.read(8 * k))
            cameras[cid] = dict(model_id=model_id, width=w, height=h,
                                params=list(params))
    images = {}
    with open(os.path.join(model_dir, "images.bin"), "rb") as f:
        n = struct.unpack("<Q", f.read(8))[0]
        for _ in range(n):
            iid = struct.unpack("<i", f.read(4))[0]
            qvec = struct.unpack("<4d", f.read(32))
            tvec = struct.unpack("<3d", f.read(24))
            cam_id = struct.unpack("<i", f.read(4))[0]
            name = b""
            while True:
                ch = f.read(1)
                if ch == b"\x00":
                    break
                name += ch
            n2d = struct.unpack("<Q", f.read(8))[0]
            f.read(n2d * 24)
            images[iid] = dict(qvec=list(qvec), tvec=list(tvec),
                               camera_id=cam_id, name=name.decode())
    return cameras, images


# ---------------------------------------------------------------------------
# Full scene save (h3dgsv3.save :1123-1218)
# ---------------------------------------------------------------------------

def save_scene(scene_model, path: str, reconstruction_time: float = 0.0,
               n_frames: int = 0, save_renders: bool = True,
               with_lpips: bool = True) -> dict:
    import jax.numpy as jnp

    from artdeco_tpu.mapper import keyframe as KFmod

    metrics = {
        "num keyframes": len(scene_model.keyframes),
        "num gaussians": int(scene_model.n_active_gaussians),
    }
    if reconstruction_time > 0:
        metrics["time"] = reconstruction_time
        if n_frames > 0:
            metrics["FPS"] = n_frames / reconstruction_time
    metrics.update(scene_model.evaluate(with_lpips=with_lpips))

    if not path:
        return metrics
    os.makedirs(path, exist_ok=True)
    pcd_path = os.path.join(path, "point_clouds")
    os.makedirs(pcd_path, exist_ok=True)
    save_gaussian_ply(os.path.join(pcd_path, "gs.ply"), scene_model)
    save_xyz_rgb_ply(os.path.join(pcd_path, "xyz_rgb.ply"), scene_model)

    # keyframe metadata (keyframe.to_json)
    Rts = np.asarray(KFmod.get_all_Rt(scene_model.pool))
    kf_json = []
    for kf in scene_model.keyframes:
        if kf is None:
            continue
        kf_json.append({
            "info": {"is_test": bool(kf.is_test), "name": kf.image_name},
            "Rt": Rts[kf.index].tolist(),
            "f": scene_model.f,
        })
    metadata = {
        **metrics,
        "config": {
            "width": scene_model.width,
            "height": scene_model.height,
            "sh_degree": scene_model.cfg.sh_degree,
            "f": scene_model.f,
        },
        "keyframes": kf_json,
    }
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(metadata, f, indent=4, default=str)

    if save_renders:
        save_test_frames(scene_model, os.path.join(path, "test_images"))

    # COLMAP export (keyframe.to_colmap + write_model)
    cameras = {}
    images = {}
    cx, cy = (scene_model.width - 1) / 2, (scene_model.height - 1) / 2
    for kf in scene_model.keyframes:
        if kf is None:
            continue
        i = kf.index
        cameras[i] = dict(model_id=0, width=scene_model.width,
                          height=scene_model.height,
                          params=[scene_model.f, cx, cy])  # SIMPLE_PINHOLE
        R = Rts[i, :3, :3]
        t = Rts[i, :3, 3]
        images[i] = dict(qvec=rotmat_to_qvec(R).tolist(), tvec=t.tolist(),
                         camera_id=i, name=kf.image_name)
    colmap_dir = os.path.join(path, "colmap")
    write_colmap_model(colmap_dir, cameras, images)
    save_xyz_rgb_ply(os.path.join(colmap_dir, "points3D.ply"), scene_model)

    # TUM keyframe poses + frusta (h3dgsv3.py:1185-1216)
    with open(os.path.join(path, "onthefly.txt"), "w") as f1:
        Rt_list = []
        for kf in scene_model.keyframes:
            if kf is None:
                continue
            Twc = np.linalg.inv(Rts[kf.index])
            q = rotmat_to_qvec(Twc[:3, :3])
            x, y, z = Twc[:3, 3]
            name = os.path.splitext(kf.image_name)[0]
            f1.write(f"{name} {x} {y} {z} {q[1]} {q[2]} {q[3]} {q[0]}\n")
            Rt_list.append(Rts[kf.index])
    save_poses_as_pyramid_ply(np.asarray(Rt_list),
                              os.path.join(path, "onthefly.ply"),
                              size=0.3, color="red")
    return metrics


def save_test_frames(scene_model, out_dir: str):
    """Render + export test views (h3dgsv3.py:560-593)."""
    import jax.numpy as jnp

    os.makedirs(out_dir, exist_ok=True)
    for kf in scene_model.keyframes:
        if kf is None or not kf.is_test:
            continue
        pkg = scene_model.render_from_id(kf.index, pyr_lvl=0)
        img = np.asarray(jnp.clip(pkg["render"], 0, 1))
        arr = (img.transpose(1, 2, 0) * 255).astype(np.uint8)
        try:
            import cv2

            cv2.imwrite(
                os.path.join(out_dir, f"{kf.index:05d}.png"),
                cv2.cvtColor(arr, cv2.COLOR_RGB2BGR),
            )
        except Exception:
            np.save(os.path.join(out_dir, f"{kf.index:05d}.npy"), arr)
