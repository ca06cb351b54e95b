import os

import numpy as np
import jax
import pytest

from tdgs.strategy import DefaultStrategy, MCMCStrategy
from tdgs.training.config import Config
from tdgs.training.trainer import Runner
from tdgs.utils.test_data import make_colmap_test_scene as render_target_scene
from tests.test_datasets import write_synthetic_colmap


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


def test_trainer_3dgut_eval3d(tmp_path):
    """3DGUT trainer (reference simple_trainer.py:189-190 with_ut/with_eval3d,
    benchmarks/3dgut/mcmc.sh): UT projection + world-space eval3d render in
    the train step. MCMC strategy (eval3d has no screen-space gradients)."""
    render_target_scene(str(tmp_path / "scene"))
    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        with_ut=True,
        with_eval3d=True,
        max_steps=30,
        eval_steps=[30],
        save_steps=[],
        sh_degree=1,
        sh_degree_interval=20,
        strategy=MCMCStrategy(cap_max=256, refine_start_iter=10,
                              refine_every=20, refine_stop_iter=100),
        capacity=256,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=4,
        tb_every=10,
    )
    runner = Runner(cfg)
    out = runner.train()
    hist = out["history"]
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"], hist
    stats = runner.eval(30)
    assert stats["psnr"] > 12.0, stats

    # with_ut without with_eval3d is a config error (reference :1651-1652)
    with pytest.raises(AssertionError):
        Runner(Config(data_dir=str(tmp_path / "scene"),
                      result_dir=str(tmp_path / "results2"),
                      with_ut=True))


def test_trainer_live_viewer(tmp_path):
    """Live viewer attached to the training loop (reference
    simple_trainer.py:690,1286): frames must be servable over HTTP while
    training runs, with render-tab knob overrides applied."""
    import threading
    import urllib.request

    render_target_scene(str(tmp_path / "scene"))
    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        max_steps=25,
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
        disable_viewer=False,
        viewer_port=18734,
    )
    runner = Runner(cfg)
    assert runner.viewer is not None
    results = {}

    def poll():
        try:
            for mode in ("rgb", "depth", "alpha"):
                url = (f"http://localhost:18734/render?dist=5&mode={mode}"
                       f"&sh=1&w=96&h=64")
                with urllib.request.urlopen(url, timeout=300) as r:
                    results[mode] = (r.status, r.read(2048))
        except urllib.error.HTTPError as e:  # surfaced via the assert below
            results["error"] = e.read()[:2000].decode(errors="replace")
        except Exception as e:
            results["error"] = repr(e)

    th = threading.Thread(target=poll)
    th.start()
    runner.train()
    th.join(timeout=180)
    runner.viewer.shutdown()
    assert "error" not in results, results
    for mode in ("rgb", "depth", "alpha"):
        status, head = results[mode]
        assert status == 200
        assert head[:2] == b"\xff\xd8", f"{mode}: not a JPEG"  # JPEG magic


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


def test_trainer_background_color(tmp_path):
    """Config.background_color composites train + eval renders onto a
    constant backdrop (needed when the GT images have a flat background —
    without it the model fabricates huge flat splats to explain it)."""
    import jax.numpy as jnp

    render_target_scene(str(tmp_path / "scene"))
    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        max_steps=4,
        eval_steps=[],
        save_steps=[],
        sh_degree=1,
        sh_degree_interval=2,
        strategy=MCMCStrategy(cap_max=512, refine_start_iter=1000),
        capacity=512,
        tile_capacity=256,
        isect_capacity=1 << 14,
        tb_every=10,
        rasterizer="jax",
        background_color=(0.2, 0.5, 0.9),
        max_scale=0.05,
    )
    runner = Runner(cfg)
    out = runner.train()
    assert np.isfinite(out["history"][-1]["loss"])
    # Config.max_scale projects scales onto the ceiling after every step
    assert float(np.exp(np.asarray(runner.splats["scales"]).max())) <= 0.0501

    # an empty-alpha view must show exactly the configured backdrop
    d = runner.trainset[0]
    vm = np.asarray(d["viewmat"]).copy()
    vm[2, 3] -= 1e3  # scene behind the camera → near-plane culls all
    img, alpha, _ = runner.rasterize_splats(
        runner.splats, jnp.asarray(vm)[None], jnp.asarray(d["K"])[None],
        32, 32, 1,
        backgrounds=jnp.asarray(cfg.background_color, jnp.float32)[None],
    )
    assert float(np.asarray(alpha).max()) < 1e-3
    np.testing.assert_allclose(
        np.asarray(img[0]).reshape(-1, 3).mean(0), [0.2, 0.5, 0.9], atol=1e-3
    )


def test_trainer_capacity_growth(tmp_path):
    """Host re-jit capacity growth (reference DefaultStrategy grows N
    unboundedly, strategy/default.py:262-309): with max_capacity set and
    the alive fraction above capacity_growth_at, the Runner doubles the
    static capacity at a refine boundary; optimizer moments and strategy
    accumulators are padded with dead rows and training keeps working."""
    render_target_scene(str(tmp_path / "scene"))
    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        max_steps=40,
        eval_steps=[],
        save_steps=[],
        sh_degree=1,
        strategy=DefaultStrategy(refine_start_iter=10, refine_every=10,
                                 refine_stop_iter=100, reset_every=10_000),
        capacity=128,  # scene has 120 SfM points → alive frac ≈ 0.94
        max_capacity=512,
        capacity_growth_at=0.85,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=1000,
        rasterizer="jax",
    )
    runner = Runner(cfg)
    assert runner.capacity == 128
    out = runner.train()
    # growth fired at least once (it may fire again if densification
    # fills the grown slots before the next refine boundary)
    cap = runner.capacity
    assert cap in (256, 512), cap
    assert runner.splats["means"].shape[0] == cap
    # optimizer moments and strategy state padded to the new capacity
    flat = jax.tree.leaves(runner.opt_state)
    assert any(
        getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == cap
        for leaf in flat
    )
    assert runner.strategy_state["grad2d"].shape[0] == cap
    assert np.isfinite(out["history"][-1]["loss"])
    # dead padding renders nothing: alive count stays below capacity
    op = np.asarray(jax.nn.sigmoid(runner.splats["opacities"]))
    assert (op > 1.0 / 255.0).sum() < cap


def test_orbax_checkpoint_roundtrip(tmp_path):
    """ckpt_format="orbax": save_checkpoint writes a ckpt_{step}/ directory
    (async multi-host TPU idiom) and load_checkpoint auto-detects it,
    restoring splats + optimizer + strategy counters exactly."""
    render_target_scene(str(tmp_path / "scene"))
    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        max_steps=10,
        eval_steps=[],
        save_steps=[10],
        sh_degree=1,
        strategy=MCMCStrategy(cap_max=256, refine_start_iter=1000),
        capacity=256,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=4,
        rasterizer="jax",
        ckpt_format="orbax",
    )
    runner = Runner(cfg)
    runner.train()
    ckpt_dir = str(tmp_path / "results" / "ckpts" / "ckpt_10")
    assert os.path.isdir(ckpt_dir), ckpt_dir

    runner2 = Runner(cfg)
    step = runner2.load_checkpoint(ckpt_dir)
    assert step == 10
    np.testing.assert_allclose(
        np.asarray(runner2.splats["means"]),
        np.asarray(runner.splats["means"]),
    )
    np.testing.assert_allclose(
        np.asarray(runner2.opt_state["mu"]["means"]),
        np.asarray(runner.opt_state["mu"]["means"]),
    )


def test_depth_loss_paths(tmp_path):
    """Sparse COLMAP-point and dense refined-depth supervision both train
    (reference depth_loss branches, simple_trainer.py:724-869)."""
    import json

    render_target_scene(str(tmp_path / "scene"))
    # write dense refined depth maps at half resolution (exercises the
    # nearest-resize in the Dataset)
    import glob as _glob

    img_names = sorted(
        os.path.basename(p)
        for p in _glob.glob(str(tmp_path / "scene" / "images" / "*.png"))
    )
    ddir = tmp_path / "scene" / "refined_depths"
    os.makedirs(ddir, exist_ok=True)
    for name in img_names:
        stem = os.path.splitext(name)[0]
        np.save(str(ddir / f"{stem}_refined_depth.npy"),
                np.full((24, 32), 6.0, np.float32))

    def run(tag, **kw):
        from tdgs.strategy import MCMCStrategy
        from tdgs.training.config import Config
        from tdgs.training.trainer import Runner

        cfg = Config(
            data_dir=str(tmp_path / "scene"),
            result_dir=str(tmp_path / f"results_{tag}"),
            data_factor=1,
            max_steps=6,
            eval_steps=[],
            save_steps=[],
            sh_degree=1,
            strategy=MCMCStrategy(cap_max=256, refine_start_iter=1000),
            capacity=256,
            tile_capacity=256,
            isect_capacity=1 << 14,
            test_every=4,
            tb_every=2,
            rasterizer="jax",
            depth_loss=True,
            **kw,
        )
        Runner(cfg).train()
        rows = [
            json.loads(l)
            for l in open(str(tmp_path / f"results_{tag}" / "metrics.jsonl"))
        ]
        vals = [r["train/depthloss"] for r in rows if "train/depthloss" in r]
        assert vals and np.isfinite(vals).all(), rows
        return vals

    run("sparse")
    run("dense", use_precomputed_depths=True)


def test_depth_normal_loss_regularizers(tmp_path):
    """depth_normal_loss: edge-aware depth smoothness + depth-normal TV
    terms appear (gated past depth_normal_start_step) and stay finite
    (reference add_simplified_depth_normal_loss)."""
    import json

    render_target_scene(str(tmp_path / "scene"))
    from tdgs.strategy import MCMCStrategy
    from tdgs.training.config import Config
    from tdgs.training.trainer import Runner

    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        max_steps=6,
        eval_steps=[],
        save_steps=[],
        sh_degree=1,
        strategy=MCMCStrategy(cap_max=256, refine_start_iter=1000),
        capacity=256,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=4,
        tb_every=2,
        rasterizer="jax",
        depth_normal_loss=True,
        depth_normal_start_step=3,
    )
    Runner(cfg).train()
    rows = [
        json.loads(l)
        for l in open(str(tmp_path / "results" / "metrics.jsonl"))
    ]
    sm = {r["step"]: r["train/depthsmooth"] for r in rows
          if "train/depthsmooth" in r}
    tv = {r["step"]: r["train/normalconsist"] for r in rows
          if "train/normalconsist" in r}
    assert sm and tv
    assert np.isfinite(list(sm.values())).all()
    # gate: zero before the warmup step, positive after
    assert sm[2] == 0.0 and tv[2] == 0.0
    assert sm[6] > 0.0 and tv[6] > 0.0


def test_mono_normal_map_supervision(tmp_path):
    """load_normals: monocular normal maps from normals/*.npy supervise
    per-gaussian differentiable normals (reference simple_trainer.py
    :792-848), gated by start_normal_loss_step."""
    import glob as _glob
    import json

    render_target_scene(str(tmp_path / "scene"))
    ndir = tmp_path / "scene" / "normals"
    os.makedirs(ndir, exist_ok=True)
    img_names = sorted(
        os.path.basename(p)
        for p in _glob.glob(str(tmp_path / "scene" / "images" / "*.png"))
    )
    for name in img_names:
        stem = os.path.splitext(name)[0]
        nmap = np.zeros((48, 64, 3), np.float32)
        nmap[..., 2] = 1.0  # all normals face the camera
        np.save(str(ndir / f"{stem}.npy"), nmap)

    from tdgs.strategy import MCMCStrategy
    from tdgs.training.config import Config
    from tdgs.training.trainer import Runner

    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        max_steps=6,
        eval_steps=[],
        save_steps=[],
        sh_degree=1,
        strategy=MCMCStrategy(cap_max=256, refine_start_iter=1000),
        capacity=256,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=4,
        tb_every=2,
        rasterizer="jax",
        load_normals=True,
        start_normal_loss_step=3,
    )
    Runner(cfg).train()
    rows = [
        json.loads(l)
        for l in open(str(tmp_path / "results" / "metrics.jsonl"))
    ]
    nl = {r["step"]: r["train/normalloss"] for r in rows
          if "train/normalloss" in r}
    assert nl, rows
    assert np.isfinite(list(nl.values())).all()
    assert nl[2] == 0.0          # gated off before start step
    assert nl[6] > 0.0           # active after


def test_pose_noise_is_fixed_and_correctable(tmp_path):
    """pose_noise corrupts training poses with a FIXED perturbation,
    separate from the learnable pose_opt corrector (reference
    pose_perturb, simple_trainer.py:488-491,:750): with both on, training
    still converges and the corrector moves away from identity."""
    render_target_scene(str(tmp_path / "scene"))
    from tdgs.strategy import MCMCStrategy
    from tdgs.training.config import Config
    from tdgs.training.trainer import Runner

    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        max_steps=30,
        eval_steps=[],
        save_steps=[],
        sh_degree=1,
        strategy=MCMCStrategy(cap_max=256, refine_start_iter=1000),
        capacity=256,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=4,
        tb_every=10,
        rasterizer="jax",
        pose_noise=1e-3,
        pose_opt=True,
        pose_opt_lr=1e-3,
    )
    runner = Runner(cfg)
    # the perturbation is nonzero and the corrector starts at identity
    assert float(np.abs(np.asarray(runner._pose_perturb)).max()) > 0
    assert float(np.abs(np.asarray(runner.aux_params["pose"])).max()) == 0
    out = runner.train()
    hist = out["history"]
    assert hist[-1]["loss"] < hist[0]["loss"], hist
    # the perturbation never trained; the corrector did
    assert float(np.abs(np.asarray(runner._pose_perturb)).max()) > 0
    assert float(np.abs(np.asarray(runner.aux_params["pose"])).max()) > 0


def test_save_depth_normal_vis(tmp_path):
    """save_depth_normal_vis dumps depth + depth-normal PNGs at tb cadence
    (reference add_depth_normal_visualization_to_training_loop)."""
    import glob as _glob

    render_target_scene(str(tmp_path / "scene"))
    from tdgs.strategy import MCMCStrategy
    from tdgs.training.config import Config
    from tdgs.training.trainer import Runner

    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        max_steps=4,
        eval_steps=[],
        save_steps=[],
        sh_degree=1,
        strategy=MCMCStrategy(cap_max=256, refine_start_iter=1000),
        capacity=256,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=4,
        tb_every=2,
        rasterizer="jax",
        depth_normal_loss=True,     # depth-producing render mode
        save_depth_normal_vis=True,
    )
    Runner(cfg).train()
    depths = _glob.glob(str(tmp_path / "results" / "vis" / "depth_*.png"))
    normals = _glob.glob(str(tmp_path / "results" / "vis" / "normal_*.png"))
    assert len(depths) >= 2 and len(normals) >= 2, (depths, normals)


def test_trainer_2dgs_default_strategy_densifies(tmp_path):
    """2DGS + DefaultStrategy: the means2d tap must deliver screen-space
    gradients so grow/prune has signal (the reference's 2DGS trainer
    densifies with DefaultStrategy by default)."""
    render_target_scene(str(tmp_path / "scene"))
    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        model_type="2dgs",
        max_steps=8,
        eval_steps=[],
        save_steps=[],
        sh_degree=1,
        strategy=DefaultStrategy(refine_start_iter=1000, reset_every=10_000),
        capacity=256,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=4,
        tb_every=4,
        rasterizer="jax",
    )
    runner = Runner(cfg)
    runner.train()
    state = runner.strategy_state
    assert (np.asarray(state["count"]) > 0).any()
    assert (np.asarray(state["grad2d"]) > 0).any(), (
        "2DGS means2d tap delivered no densify signal"
    )


def test_bilateral_grid_cc_metrics(tmp_path):
    """With bilateral grids on, eval reports color-corrected metrics
    (reference cc_psnr/cc_ssim/cc_lpips, simple_trainer.py:1351-1356);
    the affine fit can only improve PSNR."""
    render_target_scene(str(tmp_path / "scene"))
    from tdgs.strategy import MCMCStrategy
    from tdgs.training.config import Config
    from tdgs.training.trainer import Runner

    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        max_steps=6,
        eval_steps=[],
        save_steps=[],
        sh_degree=1,
        strategy=MCMCStrategy(cap_max=256, refine_start_iter=1000),
        capacity=256,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=4,
        rasterizer="jax",
        use_bilateral_grid=True,
    )
    runner = Runner(cfg)
    runner.train()
    stats = runner.eval(6)
    assert "cc_psnr" in stats and np.isfinite(stats["cc_psnr"])
    assert stats["cc_psnr"] >= stats["psnr"] - 0.3, stats
