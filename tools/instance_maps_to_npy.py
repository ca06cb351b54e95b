"""Convert color-coded instance-mask images to integer id maps (CLI).

Counterpart of the reference's utils/instance_maps_to_npy.py
(create_instance_id_map:7 with a hard-coded color→id table :22-28, folder
CLI): reads mask PNGs, maps each distinct color to an instance id, writes
``<stem>_instance_id.npy`` files into masks/instance_ids_npy/.

    python tools/instance_maps_to_npy.py --masks-dir data/scene/masks \\
        --out-dir data/scene/masks/instance_ids_npy
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# the reference's hard-coded domino color table (utils/instance_maps_to_npy.py:22-28)
DEFAULT_COLOR_TO_ID = {
    (0, 0, 0): 0,  # background
    (255, 0, 0): 1,
    (0, 255, 0): 2,
    (0, 0, 255): 3,
}


def create_instance_id_map(mask_rgb: np.ndarray, color_to_id=None,
                           tolerance: int = 10) -> np.ndarray:
    """RGB mask → int id map. Colors not in the table get fresh ids
    (auto-discovered, sorted by frequency)."""
    H, W = mask_rgb.shape[:2]
    out = np.zeros((H, W), np.int32)
    table = dict(color_to_id or DEFAULT_COLOR_TO_ID)
    flat = mask_rgb.reshape(-1, 3).astype(np.int32)

    assigned = np.zeros(H * W, bool)
    for color, idx in table.items():
        m = (np.abs(flat - np.array(color)) <= tolerance).all(axis=1)
        out.reshape(-1)[m] = idx
        assigned |= m

    # auto-discover remaining colors
    if not assigned.all():
        rest = flat[~assigned]
        colors, counts = np.unique(rest, axis=0, return_counts=True)
        next_id = max(table.values()) + 1
        for c in colors[np.argsort(-counts)]:
            m = (~assigned) & (flat == c).all(axis=1)
            out.reshape(-1)[m] = next_id
            next_id += 1
            assigned |= m
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--masks-dir", required=True)
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--tolerance", type=int, default=10)
    args = ap.parse_args()
    out_dir = args.out_dir or os.path.join(args.masks_dir, "instance_ids_npy")
    os.makedirs(out_dir, exist_ok=True)

    from PIL import Image

    n = 0
    for name in sorted(os.listdir(args.masks_dir)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        with Image.open(os.path.join(args.masks_dir, name)) as im:
            rgb = np.asarray(im.convert("RGB"))
        idmap = create_instance_id_map(rgb, tolerance=args.tolerance)
        stem = os.path.splitext(name)[0]
        np.save(os.path.join(out_dir, f"{stem}_instance_id.npy"), idmap)
        n += 1
    print(f"wrote {n} instance id maps to {out_dir}")


if __name__ == "__main__":
    main()
