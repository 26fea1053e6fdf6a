"""Per-directory image count + first-image size summary (CSV).

Role parity: ``/root/reference/scripts/img_summary.py`` — dataset vetting
before a batch run: how many frames each capture has and at what resolution.

Usage: python scripts/img_summary.py DIR [DIR ...]
"""

import os
import sys
from pathlib import Path

EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".webp"}


def summarize(root: Path):
    count, first = 0, None
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if Path(f).suffix.lower() in EXTS:
                count += 1
                if first is None:
                    first = Path(dirpath) / f
    size = ""
    if first is not None:
        try:
            import cv2

            im = cv2.imread(str(first))
            if im is not None:
                size = f"{im.shape[1]}x{im.shape[0]}"
        except Exception:
            pass
    return count, size


def main():
    if len(sys.argv) < 2:
        print(f"Usage: {Path(sys.argv[0]).name} DIR [DIR ...]",
              file=sys.stderr)
        raise SystemExit(1)
    print("name,count,image_size")
    counts = []
    for arg in sys.argv[1:]:
        p = Path(arg)
        if not p.is_dir():
            print(f"{p.name},0,")
            continue
        count, size = summarize(p)
        counts.append(count)
        print(f"{p.name},{count},{size}")
    if counts:
        print(f"min {min(counts)} max {max(counts)}")


if __name__ == "__main__":
    main()
