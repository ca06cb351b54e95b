"""PNG compression codec + trainer compression/PLY-export stages.

Reference: gsplat/compression/png_compression.py (compress:75,
decompress:113) and the trainer's run_compression stage
(examples/simple_trainer.py:1464-1478).
"""

import glob
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from tdgs.compression import PngCompression


def _random_splats(n=1024, k=9, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "means": (rng.normal(size=(n, 3)) * 2.0).astype(np.float32),
        "scales": rng.uniform(-5.0, -2.0, size=(n, 3)).astype(np.float32),
        "quats": rng.normal(size=(n, 4)).astype(np.float32),
        "opacities": rng.uniform(-2.0, 3.0, size=(n,)).astype(np.float32),
        "sh0": (rng.normal(size=(n, 1, 3)) * 0.5).astype(np.float32),
        "shN": (rng.normal(size=(n, k - 1, 3)) * 0.05).astype(np.float32),
    }


def test_png_compression_values_roundtrip(tmp_path):
    """Row-order-independent check: sorted per-column values survive the
    quantization round trip (the codec reorders rows by Morton code)."""
    splats = _random_splats(n=900)  # square → no crop
    method = PngCompression(n_clusters=128)
    method.compress(str(tmp_path), splats)
    out = method.decompress(str(tmp_path))

    for key, tol in [
        ("means", 2e-3),       # 16-bit log-quantized
        ("scales", 3e-2),      # 8-bit min-max
        ("opacities", 4e-2),   # 8-bit min-max
        ("sh0", 2e-2),         # 8-bit min-max
    ]:
        a = np.sort(np.asarray(splats[key]).reshape(-1))
        b = np.sort(np.asarray(out[key]).reshape(-1))
        assert a.shape == b.shape, key
        err = np.abs(a - b).max()
        assert err < tol, (key, err)
    # shN goes through a K-means codebook — lossy; just check shape+finite
    assert out["shN"].shape == splats["shN"].shape
    assert np.isfinite(out["shN"]).all()


def test_png_compression_crops_to_square(tmp_path):
    splats = _random_splats(n=1000)  # 31² = 961 keep
    method = PngCompression(n_clusters=64)
    method.compress(str(tmp_path), splats)
    out = method.decompress(str(tmp_path))
    assert out["means"].shape[0] == 31 * 31
    # the cropped rows are the lowest-opacity ones
    kept_min = np.sort(out["opacities"].reshape(-1))[0]
    orig_sorted = np.sort(splats["opacities"])
    assert kept_min >= orig_sorted[1000 - 961] - 5e-2


@pytest.mark.slow
def test_trainer_compression_and_ply_stages(tmp_path):
    """Runner.run_compression / Runner.export_ply (reference
    run_compression + ply_steps export)."""
    from tdgs.strategy import MCMCStrategy
    from tdgs.training.config import Config
    from tdgs.training.trainer import Runner
    from tdgs.utils.test_data import make_colmap_test_scene

    make_colmap_test_scene(str(tmp_path / "scene"))
    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        max_steps=20,
        eval_steps=[],
        save_steps=[],
        save_ply=True,
        ply_steps=[20],
        sh_degree=1,
        strategy=MCMCStrategy(cap_max=256, refine_start_iter=1000),
        capacity=256,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=4,
        rasterizer="jax",
    )
    runner = Runner(cfg)
    runner.train()

    # ply_steps export fired inside train()
    plys = glob.glob(str(tmp_path / "results" / "ply" / "*.ply"))
    assert len(plys) == 1, plys
    from tdgs.utils.ply import load_ply

    loaded = load_ply(plys[0])
    n_alive = int(
        np.asarray(
            jnp.asarray(runner.splats["opacities"]) > np.log(1 / 254.0)
        ).sum()
    )
    assert loaded["means"].shape[0] <= cfg.capacity
    assert loaded["means"].shape[0] > 0

    # compression round-trip evals at stage="compress"
    stats = runner.run_compression(20)
    assert np.isfinite(stats["psnr"]), stats
    assert os.path.exists(
        str(tmp_path / "results" / "stats" / "compress_step20.json")
    )
    with open(
        str(tmp_path / "results" / "stats" / "compress_step20.json")
    ) as f:
        assert json.load(f)["num_GS"] > 0
    # original (uncompressed) splats restored afterwards
    assert runner.splats["means"].shape[0] == cfg.capacity
