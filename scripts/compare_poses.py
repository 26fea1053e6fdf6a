"""Compare two TUM trajectory files sharing timestamps (frame-for-frame).

Role parity: ``/root/reference/scripts/compare_poses.py`` — there, the SLAM
frame poses and the mapper's ``onthefly.txt`` are joined on timestamp, the
relative SE(3) ``T_map * T_slam^-1`` is computed per frame, and the max
translation / rotation-angle discrepancies are printed (a debug check that
the mapper poses track the SLAM poses).  This version takes the two files as
arguments and reports mean/max of both quantities.

Usage: python scripts/compare_poses.py slam_frames.txt onthefly.txt
"""

import sys

import numpy as np


def load_tum(path: str) -> dict:
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            t, x, y, z, qx, qy, qz, qw = map(float, line.split()[:8])
            if qw < 0:  # canonical hemisphere so identical poses join cleanly
                qx, qy, qz, qw = -qx, -qy, -qz, -qw
            out[round(t, 6)] = np.asarray([x, y, z, qx, qy, qz, qw])
    return out


def pose_matrix(p: np.ndarray) -> np.ndarray:
    x, y, z, qx, qy, qz, qw = p
    n = qx * qx + qy * qy + qz * qz + qw * qw
    s = 2.0 / n if n > 0 else 0.0
    R = np.array([
        [1 - s * (qy * qy + qz * qz), s * (qx * qy - qz * qw),
         s * (qx * qz + qy * qw)],
        [s * (qx * qy + qz * qw), 1 - s * (qx * qx + qz * qz),
         s * (qy * qz - qx * qw)],
        [s * (qx * qz - qy * qw), s * (qy * qz + qx * qw),
         1 - s * (qx * qx + qy * qy)],
    ])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = (x, y, z)
    return T


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(1)
    a = load_tum(sys.argv[1])
    b = load_tum(sys.argv[2])
    common = sorted(set(a) & set(b))
    if not common:
        raise SystemExit("no common timestamps")
    translations, angles = [], []
    for t in common:
        T_rel = pose_matrix(b[t]) @ np.linalg.inv(pose_matrix(a[t]))
        translations.append(float(np.linalg.norm(T_rel[:3, 3])))
        c = (np.trace(T_rel[:3, :3]) - 1.0) / 2.0
        angles.append(float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))))
    print(f"{len(common)} common poses "
          f"(of {len(a)} / {len(b)})")
    print(f"translation  mean {np.mean(translations):.6f}  "
          f"max {np.max(translations):.6f}")
    print(f"rotation deg mean {np.mean(angles):.6f}  "
          f"max {np.max(angles):.6f}")
    print(np.max(translations), np.max(angles))


if __name__ == "__main__":
    main()
