import os

import numpy as np
import jax
import pytest

from tdgs.strategy import DefaultStrategy, MCMCStrategy
from tdgs.training.config import Config
from tdgs.training.trainer import Runner
from tests.test_datasets import write_synthetic_colmap


def render_target_scene(root, n_images=8, width=64, height=48):
    """Synthetic scene whose images are actual 3DGS renders — trainable."""
    import struct
    from PIL import Image
    import jax.numpy as jnp

    from tdgs.rendering import rasterization

    rng = np.random.default_rng(7)
    os.makedirs(os.path.join(root, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    sparse = os.path.join(root, "sparse", "0")

    n_pts = 120
    pts = rng.normal(size=(n_pts, 3)).astype(np.float32) * 0.4 + [0, 0, 4.0]
    cols = rng.uniform(0.2, 1.0, size=(n_pts, 3)).astype(np.float32)

    f = 70.0
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32)
    viewmats = []
    for i in range(n_images):
        vm = np.eye(4, dtype=np.float32)
        vm[0, 3] = 0.4 * np.cos(2 * np.pi * i / n_images)
        vm[1, 3] = 0.4 * np.sin(2 * np.pi * i / n_images)
        viewmats.append(vm)
    viewmats = np.stack(viewmats)

    # ground-truth gaussians at the points
    quats = np.tile([1.0, 0, 0, 0], (n_pts, 1)).astype(np.float32)
    scales = np.full((n_pts, 3), 0.06, np.float32)
    opac = np.full((n_pts,), 0.95, np.float32)
    img, _, _ = rasterization(
        jnp.asarray(pts), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(cols), jnp.asarray(viewmats),
        jnp.asarray(np.tile(K, (n_images, 1, 1))), width, height,
        backgrounds=jnp.zeros((n_images, 3)),
    )
    img = np.clip(np.asarray(img), 0, 1)

    with open(os.path.join(sparse, "cameras.bin"), "wb") as fd:
        fd.write(struct.pack("<Q", 1))
        fd.write(struct.pack("<iiQQ", 1, 1, width, height))
        fd.write(struct.pack("<4d", f, f, width / 2, height / 2))
    with open(os.path.join(sparse, "points3D.bin"), "wb") as fd:
        fd.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            fd.write(struct.pack("<q", i + 1))
            fd.write(struct.pack("<3d", *pts[i]))
            fd.write(struct.pack("<3B", *(cols[i] * 255).astype(np.uint8)))
            fd.write(struct.pack("<d", 0.5))
            fd.write(struct.pack("<Q", 0))
    with open(os.path.join(sparse, "images.bin"), "wb") as fd:
        fd.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            name = f"img_{i:03d}.png"
            fd.write(struct.pack("<i", i + 1))
            fd.write(struct.pack("<4d", 1.0, 0, 0, 0))
            fd.write(struct.pack("<3d", *viewmats[i, :3, 3]))
            fd.write(struct.pack("<i", 1))
            fd.write(name.encode() + b"\x00")
            fd.write(struct.pack("<Q", 0))
            Image.fromarray((img[i] * 255).astype(np.uint8)).save(
                os.path.join(root, "images", name)
            )


@pytest.mark.parametrize("strategy", ["mcmc", "default", "default_absgrad"])
def test_trainer_loss_drops_and_eval(tmp_path, strategy):
    render_target_scene(str(tmp_path / "scene"))
    strat = (
        MCMCStrategy(cap_max=512, refine_start_iter=10, refine_every=20,
                     refine_stop_iter=100, noise_lr=1e3)
        if strategy == "mcmc"
        else DefaultStrategy(refine_start_iter=10, refine_every=20,
                             refine_stop_iter=100, reset_every=10_000,
                             absgrad=strategy == "default_absgrad")
    )
    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        max_steps=60,
        eval_steps=[60],
        save_steps=[60],
        sh_degree=1,
        sh_degree_interval=20,
        strategy=strat,
        capacity=512,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=4,
        tb_every=10,
        rasterizer="jax",
    )
    runner = Runner(cfg)
    out = runner.train()
    hist = out["history"]
    assert hist[-1]["loss"] < hist[0]["loss"] * 0.8, hist
    stats = runner.eval(60)
    assert stats["psnr"] > 15.0, stats
    assert os.path.exists(str(tmp_path / "results" / "ckpts" / "ckpt_60.pkl"))

    # resume restores state
    runner2 = Runner(cfg)
    step = runner2.load_checkpoint(
        str(tmp_path / "results" / "ckpts" / "ckpt_60.pkl")
    )
    assert step == 60
    np.testing.assert_allclose(
        np.asarray(runner2.splats["means"]), np.asarray(runner.splats["means"])
    )


def test_trainer_batch_size_2(tmp_path):
    """batch_size > 1: images fold into the camera axis; the means2d tap
    and DefaultStrategy state must keep consistent shapes."""
    render_target_scene(str(tmp_path / "scene"))
    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        max_steps=30,
        eval_steps=[],
        save_steps=[],
        batch_size=2,
        sh_degree=1,
        sh_degree_interval=20,
        strategy=DefaultStrategy(refine_start_iter=10, refine_every=10,
                                 refine_stop_iter=100, reset_every=10_000),
        capacity=512,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=4,
        tb_every=10,
        rasterizer="jax",
    )
    runner = Runner(cfg)
    out = runner.train()
    hist = out["history"]
    assert hist[-1]["loss"] < hist[0]["loss"], hist
    assert np.isfinite(np.asarray(runner.strategy_state["grad2d"])).all()


def test_trainer_app_opt(tmp_path):
    """Appearance optimization (reference app_opt): per-image embedding +
    MLP over per-gaussian features replaces SH colors; loss must drop and
    eval (embed-free) must render."""
    render_target_scene(str(tmp_path / "scene"))
    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        max_steps=50,
        eval_steps=[50],
        save_steps=[],
        sh_degree=1,
        sh_degree_interval=20,
        strategy=MCMCStrategy(cap_max=256, refine_start_iter=1000),
        capacity=256,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=4,
        tb_every=10,
        rasterizer="jax",
        app_opt=True,
        feature_dim=8,
        app_embed_dim=4,
    )
    runner = Runner(cfg)
    assert "features" in runner.splats and "colors" in runner.splats
    assert "app_embeds" in runner.aux_params
    out = runner.train()
    hist = out["history"]
    assert hist[-1]["loss"] < hist[0]["loss"] * 0.9, hist
    # embeddings actually trained
    assert np.abs(np.asarray(runner.aux_params["app_embeds"])).max() > 0
    stats = runner.eval(50)
    assert stats["psnr"] > 12.0, stats


def test_trainer_2dgs_variant(tmp_path):
    """2DGS trainer (reference simple_trainer_2dgs.py): surfel model with
    normal-consistency + distortion losses."""
    render_target_scene(str(tmp_path / "scene"))
    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        model_type="2dgs",
        normal_loss=True,
        normal_start_iter=10,
        dist_loss=True,
        dist_start_iter=5,
        max_steps=40,
        eval_steps=[40],
        save_steps=[],
        sh_degree=1,
        sh_degree_interval=20,
        strategy=MCMCStrategy(cap_max=256, refine_start_iter=1000),
        capacity=256,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=4,
        tb_every=10,
        rasterizer="jax",
    )
    runner = Runner(cfg)
    out = runner.train()
    hist = out["history"]
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"] * 1.2
    stats = runner.eval(40)
    assert stats["psnr"] > 12.0, stats


def test_trainer_pose_opt_and_bilagrid(tmp_path):
    """Pose optimization + bilateral grid wired into the train step."""
    render_target_scene(str(tmp_path / "scene"))
    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        max_steps=30,
        eval_steps=[],
        save_steps=[],
        sh_degree=1,
        sh_degree_interval=20,
        strategy=MCMCStrategy(cap_max=256, refine_start_iter=1000),
        capacity=256,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=4,
        tb_every=10,
        rasterizer="jax",
        pose_opt=True,
        pose_opt_lr=1e-4,
        use_bilateral_grid=True,
        bilateral_grid_shape=(4, 4, 2),
    )
    runner = Runner(cfg)
    assert "pose" in runner.aux_params and "bilagrid" in runner.aux_params
    pose0 = np.asarray(runner.aux_params["pose"]).copy()
    grid0 = np.asarray(runner.aux_params["bilagrid"]).copy()
    out = runner.train()
    assert np.isfinite(out["history"][-1]["loss"])
    # aux params actually trained
    assert np.abs(np.asarray(runner.aux_params["pose"]) - pose0).max() > 0
    assert np.abs(np.asarray(runner.aux_params["bilagrid"]) - grid0).max() > 0
