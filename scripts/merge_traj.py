"""Interleave several image directories into one boustrophedon sequence.

Reference: ``Reconstruct/scripts/merge_traj.py`` — round-robin over the
input directories, reversing the directory order every round so the merged
capture sweeps back and forth (useful for stitching multiple passes of the
same scene into one streaming trajectory).

Usage: python scripts/merge_traj.py OUT_DIR DIR1 DIR2 ...
"""

import shutil
import sys
from pathlib import Path

IMAGE_EXTS = {".jpg", ".jpeg", ".png"}


def main(argv):
    if len(argv) < 3:
        print("usage: merge_traj.py out_dir dir1 dir2 ...", file=sys.stderr)
        return 1
    out_dir = Path(argv[1])
    out_dir.mkdir(parents=True, exist_ok=True)
    lists = [
        sorted(p for p in Path(d).iterdir()
               if p.is_file() and p.suffix.lower() in IMAGE_EXTS)
        for d in argv[2:]
    ]
    order = list(range(len(lists)))
    out_idx = 0
    for i in range(max(map(len, lists), default=0)):
        for k in order:
            if i < len(lists[k]):
                src = lists[k][i]
                shutil.copy(src, out_dir / f"{out_idx:06d}{src.suffix.lower()}")
                out_idx += 1
        order.reverse()   # serpentine: next round visits dirs backwards
    print(f"merged {out_idx} images into {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
