"""Benchmark dataset fetcher (reference examples/datasets/download_dataset.py).

Downloads + extracts the standard benchmark captures into data/:

    python examples/datasets/download_dataset.py mipnerf360
    python examples/datasets/download_dataset.py --list

Uses stdlib urllib (no curl dependency). In an air-gapped environment
(such as this image, which has no network egress) the download fails fast
with a pointer to the procedural fallback:

    python examples/benchmarks/make_scene.py --out data/synth0
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile
from urllib.error import URLError
from urllib.request import urlopen

# public dataset URLs (same set the reference fetches)
URLS = {
    "mipnerf360": [
        "http://storage.googleapis.com/gresearch/refraw360/360_v2.zip",
    ],
    "mipnerf360_extra": [
        "https://storage.googleapis.com/gresearch/refraw360/360_extra_scenes.zip",
    ],
    "bilarf_data": [
        "https://huggingface.co/datasets/Yuehao/bilarf_data/resolve/main/bilarf_data.zip",
    ],
    "zipnerf": [
        f"https://storage.googleapis.com/gresearch/refraw360/zipnerf/{s}.zip"
        for s in ("berlin", "london", "nyc", "alameda")
    ],
    "zipnerf_undistorted": [
        "https://storage.googleapis.com/gresearch/refraw360/"
        f"zipnerf-undistorted/{s}.zip"
        for s in ("berlin", "london", "nyc", "alameda")
    ],
}

# extraction dir names under --save-dir (reference dataset_rename_map)
RENAME = {
    "mipnerf360": "360_v2",
    "mipnerf360_extra": "360_v2",
    "bilarf_data": "bilarf",
    "zipnerf": "zipnerf",
    "zipnerf_undistorted": "zipnerf_undistorted",
}


def download_and_extract(url: str, extract_dir: str, timeout: int = 30):
    os.makedirs(extract_dir, exist_ok=True)
    name = url.rsplit("/", 1)[-1]
    zip_path = os.path.join(extract_dir, name)
    if not os.path.exists(zip_path):
        print(f"downloading {url}")
        try:
            with urlopen(url, timeout=timeout) as r, open(zip_path, "wb") as f:
                total = int(r.headers.get("Content-Length") or 0)
                done = 0
                while True:
                    chunk = r.read(1 << 22)
                    if not chunk:
                        break
                    f.write(chunk)
                    done += len(chunk)
                    if total:
                        pct = 100 * done / total
                        print(f"\r  {done >> 20} MiB ({pct:.0f}%)",
                              end="", flush=True)
                print()
        except (URLError, OSError, TimeoutError) as e:
            if os.path.exists(zip_path):
                os.remove(zip_path)
            raise SystemExit(
                f"download failed ({e}). If this environment has no network "
                "egress, generate a procedural scene instead:\n"
                "    python examples/benchmarks/make_scene.py --out data/synth0"
            )
    print(f"extracting {zip_path}")
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(extract_dir)
    os.remove(zip_path)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset", nargs="?", default="mipnerf360",
                    choices=sorted(URLS))
    ap.add_argument("--save-dir", default="data")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()
    if args.list:
        for k, v in URLS.items():
            print(f"{k}: {len(v)} file(s) → {RENAME[k]}/")
        return
    extract_dir = os.path.join(args.save_dir, RENAME[args.dataset])
    for url in URLS[args.dataset]:
        download_and_extract(url, extract_dir)
    print(f"done → {extract_dir}")


if __name__ == "__main__":
    main()
