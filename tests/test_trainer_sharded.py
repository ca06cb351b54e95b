"""Multi-device gaussian-sharded training through the Runner.

The reference's flagship distributed mode trains with gaussians sharded
per rank and the projection→all_to_all→rasterize exchange inside
rasterization (gsplat/rendering.py:360-611, examples/simple_trainer.py
rank-strided init :298-301). Here Config.sharded=True lays the splat
pytree over a 1-D "gauss" mesh and the train step renders through
tdgs.parallel.rasterization_sharded on the virtual 8-device CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdgs.strategy import DefaultStrategy, MCMCStrategy
from tdgs.training.config import Config
from tdgs.training.trainer import Runner
from tdgs.utils.test_data import make_colmap_test_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("sharded_scene")
    make_colmap_test_scene(str(root), n_images=16)
    return str(root)


def _base_cfg(scene_dir, tmp_path, **kw):
    kw.setdefault("strategy", MCMCStrategy(cap_max=256,
                                           refine_start_iter=1000))
    kw.setdefault("max_steps", 8)
    kw.setdefault("sharded", True)
    kw.setdefault("rasterizer", "jax")
    return Config(
        data_dir=scene_dir,
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        eval_steps=[],
        save_steps=[],
        sh_degree=1,
        capacity=256,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=16,
        batch_size=8,
        **kw,
    )


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device mesh")
def test_sharded_training_runs_and_shards_state(scene_dir, tmp_path):
    cfg = _base_cfg(scene_dir, tmp_path)
    runner = Runner(cfg)

    # splats + optimizer moments live sharded over the gauss axis
    assert len(runner.splats["means"].sharding.device_set) == \
        jax.device_count()
    moments = jax.tree.leaves(runner.opt_state)
    assert any(
        getattr(m, "ndim", 0) >= 1 and m.shape[0] == cfg.capacity
        and len(m.sharding.device_set) == jax.device_count()
        for m in moments
    )

    out = runner.train()
    losses = [h["loss"] for h in out["history"]]
    assert np.isfinite(losses).all(), losses
    # parameters stayed sharded through the donated-step updates
    assert len(runner.splats["means"].sharding.device_set) == \
        jax.device_count()

    # eval falls back to the replicated single-program path (C=1)
    stats = runner.eval(cfg.max_steps)
    assert np.isfinite(stats["psnr"]), stats


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device mesh")
def test_sharded_default_strategy_gets_screen_grads(scene_dir, tmp_path):
    """DefaultStrategy under sharding: the means2d tap gradient flows back
    through the all_to_all and feeds grad2d accumulation + a refine pass."""
    # refine once at step 4 (exercises sharded grow/prune scatters), then
    # steps 5-8 re-accumulate — the final state must hold fresh signal
    # (the refine pass itself zeroes the accumulators)
    cfg = _base_cfg(
        scene_dir, tmp_path,
        strategy=DefaultStrategy(
            refine_start_iter=2, refine_every=4, refine_stop_iter=5,
            reset_every=10_000,
        ),
    )
    runner = Runner(cfg)
    runner.train()
    state = runner.strategy_state
    grad2d = np.asarray(state["grad2d"])
    count = np.asarray(state["count"])
    assert (count > 0).any(), "no gaussian ever counted as visible"
    assert np.isfinite(grad2d).all()
    assert (grad2d > 0).any(), "screen-grad tap delivered no signal"


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device mesh")
def test_sharded_matches_unsharded_first_step(scene_dir, tmp_path):
    """One train step sharded vs unsharded from identical init: same loss
    to float tolerance (the exchange is a pure re-layout of the math)."""
    cfg_s = _base_cfg(scene_dir, tmp_path / "s", max_steps=1, tb_every=1)
    cfg_u = _base_cfg(scene_dir, tmp_path / "u", max_steps=1, tb_every=1,
                      sharded=False)
    loss_s = Runner(cfg_s).train()["history"][-1]["loss"]
    loss_u = Runner(cfg_u).train()["history"][-1]["loss"]
    assert abs(loss_s - loss_u) < 2e-4, (loss_s, loss_u)


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device mesh")
@pytest.mark.slow
def test_sharded_2dgs_training(scene_dir, tmp_path):
    """Config.sharded with the 2DGS family: surfel features ship through
    the exchange, the densify tap still delivers screen grads, and normal/
    distortion losses run on camera-sharded outputs."""
    cfg = _base_cfg(
        scene_dir, tmp_path,
        model_type="2dgs",
        normal_loss=True,
        normal_start_iter=2,
        dist_loss=True,
        dist_start_iter=2,
        strategy=DefaultStrategy(refine_start_iter=1000,
                                 reset_every=10_000),
    )
    runner = Runner(cfg)
    out = runner.train()
    losses = [h["loss"] for h in out["history"]]
    assert np.isfinite(losses).all(), losses
    state = runner.strategy_state
    assert (np.asarray(state["count"]) > 0).any()
    assert (np.asarray(state["grad2d"]) > 0).any()
    stats = runner.eval(cfg.max_steps)
    assert np.isfinite(stats["psnr"]), stats


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device mesh")
def test_sharded_eval3d_training(scene_dir, tmp_path):
    """Config.sharded with the world-space (eval3d) family: per-(camera,
    gaussian) response features ship through the exchange; MCMC strategy
    (eval3d produces no screen-space gradients)."""
    cfg = _base_cfg(
        scene_dir, tmp_path,
        with_eval3d=True,
        strategy=MCMCStrategy(cap_max=256, refine_start_iter=2,
                              refine_every=4),
    )
    runner = Runner(cfg)
    out = runner.train()
    losses = [h["loss"] for h in out["history"]]
    assert np.isfinite(losses).all(), losses
    stats = runner.eval(cfg.max_steps)
    assert np.isfinite(stats["psnr"]), stats


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device mesh")
def test_sharded_absgrad_training(scene_dir, tmp_path):
    """Carve-out lifted: DefaultStrategy(absgrad=True) under Config.sharded.
    The |grad| tap ships through the all_to_all transpose back to each
    gaussian's owner device (reference trains absgrad under its
    distributed mode with no restriction)."""
    cfg = _base_cfg(
        scene_dir, tmp_path,
        rasterizer="packed",
        strategy=DefaultStrategy(
            absgrad=True, refine_start_iter=2, refine_every=4,
            refine_stop_iter=5, reset_every=10_000,
        ),
    )
    runner = Runner(cfg)
    out = runner.train()
    assert np.isfinite([h["loss"] for h in out["history"]]).all()
    grad2d = np.asarray(runner.strategy_state["grad2d"])
    assert np.isfinite(grad2d).all()
    assert (grad2d > 0).any(), "absgrad tap delivered no signal"


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device mesh")
def test_sharded_app_opt_training(scene_dir, tmp_path):
    """Carve-out lifted: appearance optimization (per-camera MLP colors)
    under Config.sharded — colors ship as [C, n, D] through the exchange
    (reference simple_trainer.py:515 wraps app_module in DDP)."""
    cfg = _base_cfg(scene_dir, tmp_path, app_opt=True, app_embed_dim=4,
                    feature_dim=8)
    runner = Runner(cfg)
    emb0 = np.asarray(runner.aux_params["app_embeds"]).copy()
    out = runner.train()
    assert np.isfinite([h["loss"] for h in out["history"]]).all()
    emb1 = np.asarray(runner.aux_params["app_embeds"])
    assert np.abs(emb1 - emb0).max() > 0, "appearance embeds never updated"
    stats = runner.eval(cfg.max_steps)
    assert np.isfinite(stats["psnr"]), stats


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device mesh")
@pytest.mark.slow
def test_sharded_load_normals_training(scene_dir, tmp_path):
    """Carve-out lifted: monocular normal supervision under Config.sharded
    — the loss samples normal maps at meta['means2d'], which the sharded
    render now returns (pre-exchange projected centers)."""
    import os

    ndir = os.path.join(scene_dir, "normals")
    os.makedirs(ndir, exist_ok=True)
    for name in os.listdir(os.path.join(scene_dir, "images")):
        stem = os.path.splitext(name)[0]
        nmap = np.zeros((48, 64, 3), np.float32)
        nmap[..., 2] = 1.0
        np.save(os.path.join(ndir, f"{stem}.npy"), nmap)

    cfg = _base_cfg(
        scene_dir, tmp_path,
        load_normals=True,
        start_normal_loss_step=2,
    )
    runner = Runner(cfg)
    out = runner.train()
    losses = [h["loss"] for h in out["history"]]
    assert np.isfinite(losses).all(), losses
    import json

    rows = [
        json.loads(l)
        for l in open(os.path.join(cfg.result_dir, "metrics.jsonl"))
    ]
    nl = [r for r in rows if "train/normalloss" in r]
    assert nl and np.isfinite([r["train/normalloss"] for r in nl]).all()
    assert any(r["train/normalloss"] > 0 for r in nl)


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device mesh")
def test_sharded_eval3d_depth_training(scene_dir, tmp_path):
    """Carve-out lifted: depth channels through sharded eval3d training —
    depth_loss renders RGB+ED via rasterization_eval3d_sharded (reference
    appends depth through the same eval3d raster path,
    gsplat/rendering.py:614-629,668-759)."""
    import json
    import os

    cfg = _base_cfg(
        scene_dir, tmp_path,
        with_eval3d=True,
        depth_loss=True,
        strategy=MCMCStrategy(cap_max=256, refine_start_iter=1000),
    )
    runner = Runner(cfg)
    out = runner.train()
    losses = [h["loss"] for h in out["history"]]
    assert np.isfinite(losses).all(), losses
    rows = [
        json.loads(l)
        for l in open(os.path.join(cfg.result_dir, "metrics.jsonl"))
    ]
    dl = [r["train/depthloss"] for r in rows if "train/depthloss" in r]
    assert dl and np.isfinite(dl).all(), rows


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device mesh")
def test_sharded_eval3d_load_normals_training(scene_dir, tmp_path):
    """Carve-out lifted: load_normals with eval3d — the monocular normal
    loss samples maps at meta['means2d'], which the sharded eval3d render
    now returns (pre-exchange projected centers, tiling projection)."""
    import json
    import os

    ndir = os.path.join(scene_dir, "normals")
    os.makedirs(ndir, exist_ok=True)
    for name in os.listdir(os.path.join(scene_dir, "images")):
        stem = os.path.splitext(name)[0]
        nmap = np.zeros((48, 64, 3), np.float32)
        nmap[..., 2] = 1.0
        np.save(os.path.join(ndir, f"{stem}.npy"), nmap)

    cfg = _base_cfg(
        scene_dir, tmp_path,
        with_eval3d=True,
        load_normals=True,
        start_normal_loss_step=2,
        strategy=MCMCStrategy(cap_max=256, refine_start_iter=1000),
    )
    runner = Runner(cfg)
    out = runner.train()
    losses = [h["loss"] for h in out["history"]]
    assert np.isfinite(losses).all(), losses
    rows = [
        json.loads(l)
        for l in open(os.path.join(cfg.result_dir, "metrics.jsonl"))
    ]
    nl = [r for r in rows if "train/normalloss" in r]
    assert nl and np.isfinite([r["train/normalloss"] for r in nl]).all()


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device mesh")
def test_sharded_ut_fisheye_eval3d_training(scene_dir, tmp_path):
    """Carve-out lifted: with_ut + non-pinhole camera model under
    Config.sharded — UT tiling projection + world-space rays built from
    the local cameras (reference fisheye benchmark: --camera_model
    fisheye --with_ut --with_eval3d, distributed-capable)."""
    cfg = _base_cfg(
        scene_dir, tmp_path,
        with_eval3d=True,
        with_ut=True,
        camera_model="fisheye",
        strategy=MCMCStrategy(cap_max=256, refine_start_iter=1000),
    )
    runner = Runner(cfg)
    out = runner.train()
    losses = [h["loss"] for h in out["history"]]
    assert np.isfinite(losses).all(), losses
    stats = runner.eval(cfg.max_steps)
    assert np.isfinite(stats["psnr"]), stats
