"""Viewer server + render-fn tests (reference examples/gsplat_viewer*.py,
simple_viewer*.py variants)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tdgs.viewer.server import (
    RenderTabState,
    ViewerServer,
    make_splat_render_fn,
    orbit_camera,
)


def _splats(n=64, seed=5):
    rng = np.random.default_rng(seed)
    return {
        "means": jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        "quats": jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        "scales": jnp.asarray(
            np.log(rng.uniform(0.05, 0.2, size=(n, 3))).astype(np.float32)
        ),
        "opacities": jnp.asarray(rng.normal(size=(n,)).astype(np.float32)),
        "sh0": jnp.asarray(rng.normal(size=(n, 1, 3)).astype(np.float32)),
        "shN": jnp.zeros((n, 15, 3), jnp.float32),
    }


@pytest.mark.parametrize("model_type", ["3dgs", "2dgs", "3dgut"])
@pytest.mark.parametrize("mode", ["rgb", "depth", "alpha"])
def test_render_fn_model_types(model_type, mode):
    """All three viewer families (reference simple_viewer{,_2dgs,_3dgut}.py)
    must produce finite uint8 frames for every render-tab mode."""
    render_fn = make_splat_render_fn(_splats(), model_type=model_type)
    vm = orbit_camera(0.4, 0.3, 4.0, np.zeros(3, np.float32))
    K = np.array([[80.0, 0, 48], [0, 80.0, 32], [0, 0, 1]], np.float32)
    img = render_fn(vm, K, 96, 64, RenderTabState(render_mode=mode))
    assert img.shape == (64, 96, 3) and img.dtype == np.uint8
    assert img.max() > 0  # the scene is visible


def test_viewer_http_roundtrip():
    """ViewerServer serves the page + frames with knob query params."""
    import urllib.request

    render_fn = make_splat_render_fn(_splats())
    viewer = ViewerServer(render_fn, port=18741, width=96, height=64)
    th = viewer.start()
    try:
        with urllib.request.urlopen(
            "http://localhost:18741/", timeout=60
        ) as r:
            assert r.status == 200 and b"tdgs viewer" in r.read(4096)
        url = ("http://localhost:18741/render?dist=4&mode=rgb&sh=2"
               "&w=64&h=48&az=0.3&el=0.2")
        with urllib.request.urlopen(url, timeout=120) as r:
            head = r.read(2)
            assert r.status == 200 and head == b"\xff\xd8"
    finally:
        viewer.shutdown()
        th.join(timeout=10)


@pytest.mark.parametrize("model_type", ["3dgs", "2dgs"])
def test_trainer_live_render_fn(model_type, tmp_path):
    """The trainer's live-view render (Runner._viewer_render_fn) must
    route through the trained family's render math — 2DGS surfels through
    rasterization_2dgs (reference ships gsplat_viewer_2dgs.py for this)."""
    import sys

    sys.path.insert(0, "tests")
    from test_trainer import render_target_scene

    from tdgs.strategy import MCMCStrategy
    from tdgs.training.config import Config
    from tdgs.training.trainer import Runner

    render_target_scene(str(tmp_path / "scene"))
    cfg = Config(
        data_dir=str(tmp_path / "scene"),
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        model_type=model_type,
        max_steps=2,
        eval_steps=[],
        save_steps=[],
        sh_degree=1,
        strategy=MCMCStrategy(cap_max=256, refine_start_iter=1000),
        capacity=256,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=4,
        rasterizer="jax",
    )
    runner = Runner(cfg)
    vm = np.asarray(runner.trainset[0]["viewmat"])
    K = np.asarray(runner.trainset[0]["K"])
    for mode in ("rgb", "depth", "alpha"):
        img = runner._viewer_render_fn(
            vm, K, 64, 48, RenderTabState(render_mode=mode)
        )
        assert img.shape == (48, 64, 3) and img.dtype == np.uint8
        assert np.isfinite(img.astype(np.float32)).all()


def test_fly_camera_matches_orbit_pose():
    """A fly camera placed at the orbit camera's eye, looking at the
    target, reproduces the orbit viewmat (free-cam parity with the
    reference's viser 6-DoF navigation)."""
    from tdgs.viewer.server import fly_camera, orbit_camera

    az, el, dist = 0.7, 0.25, 5.0
    target = np.zeros(3, np.float32)
    vm_orbit = orbit_camera(az, el, dist, target)
    eye = dist * np.array(
        [np.cos(az) * np.cos(el), np.sin(az) * np.cos(el), np.sin(el)],
        np.float32,
    )
    # looking back at the origin: yaw/pitch of -eye direction
    fwd = -eye / np.linalg.norm(eye)
    yaw = np.arctan2(fwd[1], fwd[0])
    pitch = np.arcsin(fwd[2])
    vm_fly = fly_camera(eye, yaw, pitch)
    np.testing.assert_allclose(vm_fly, vm_orbit, rtol=1e-5, atol=1e-5)


def test_viewer_http_free_camera_and_knobs():
    """The /render endpoint accepts the free-camera pose (px/py/pz +
    yaw/pitch), an explicit vm matrix, and the full knob set."""
    import urllib.request

    from tdgs.viewer.server import ViewerServer, fly_camera

    seen = {}

    def render_fn(vm, K, width, height, st):
        seen["vm"] = np.asarray(vm).copy()
        seen["st"] = st
        return np.zeros((height, width, 3), np.uint8)

    srv = ViewerServer(render_fn, width=64, height=48, port=18742)
    th = srv.start()
    try:
        url = ("http://localhost:18742/render?px=1&py=2&pz=3&yaw=0.5"
               "&pitch=-0.2&mode=rgb&sh=1&near=0.05&far=100&rclip=1.5"
               "&eps2d=0.4&bg=0.2,0.3,0.4&w=32&h=24")
        with urllib.request.urlopen(url, timeout=30) as r:
            assert r.status == 200
        exp = fly_camera(np.array([1, 2, 3], np.float32), 0.5, -0.2)
        np.testing.assert_allclose(seen["vm"], exp, rtol=1e-5, atol=1e-6)
        st = seen["st"]
        assert st.near_plane == 0.05 and st.far_plane == 100.0
        assert st.radius_clip == 1.5 and abs(st.eps2d - 0.4) < 1e-6
        assert np.allclose(st.backgrounds, (0.2, 0.3, 0.4))

        # explicit pose matrix (16 comma floats, row-major)
        vm = np.eye(4, dtype=np.float32)
        vm[2, 3] = 7.0
        q = ",".join(str(float(x)) for x in vm.ravel())
        with urllib.request.urlopen(
            f"http://localhost:18742/render?vm={q}", timeout=30
        ) as r:
            assert r.status == 200
        np.testing.assert_allclose(seen["vm"], vm)
    finally:
        srv.shutdown()
        th.join(timeout=5)
