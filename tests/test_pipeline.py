import numpy as np
import jax.numpy as jnp

from tdgs.pipeline import GaussianModel, apply_transform, render_splats
from tdgs.utils.ply import save_ply


def make_ply(tmp_path, n=40, k_rest=3):
    rng = np.random.default_rng(120)
    path = str(tmp_path / "scene.ply")
    save_ply(
        path,
        means=rng.normal(size=(n, 3)).astype(np.float32) + [0, 0, 5],
        scales=np.log(rng.uniform(0.05, 0.2, (n, 3))).astype(np.float32),
        quats=rng.normal(size=(n, 4)).astype(np.float32),
        opacities=rng.normal(size=(n,)).astype(np.float32),
        sh0=rng.normal(size=(n, 1, 3)).astype(np.float32),
        shN=rng.normal(size=(n, k_rest, 3)).astype(np.float32),
    )
    return path


def test_gaussian_model_loads_and_pads_sh(tmp_path):
    path = make_ply(tmp_path, k_rest=3)  # degree-1 rest bands
    model = GaussianModel(sh_degree=3)
    splats = model.load_splats_from_ply(path)
    assert splats["shN"].shape == (40, 15, 3)  # padded to degree 3
    assert np.all(np.asarray(splats["shN"][:, 3:, :]) == 0.0)
    sub = model.select(np.arange(10))
    assert sub["means"].shape == (10, 3)


def test_apply_transform_parity(tmp_path):
    """Identity transform is a no-op; pure translation moves the subset
    about its centroid (reference main.py:183-228 semantics)."""
    path = make_ply(tmp_path)
    model = GaussianModel()
    splats = model.load_splats_from_ply(path)

    out = apply_transform(
        splats, jnp.zeros(3), jnp.array([1.0, 0, 0, 0])
    )
    np.testing.assert_allclose(
        np.asarray(out["means"]), np.asarray(splats["means"]), atol=1e-6
    )

    idx = jnp.arange(10)
    out = apply_transform(splats, jnp.array([1.0, 0, 0]),
                          jnp.array([1.0, 0, 0, 0]), indices=idx)
    np.testing.assert_allclose(
        np.asarray(out["means"][:10]),
        np.asarray(splats["means"][:10]) + [1, 0, 0],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out["means"][10:]), np.asarray(splats["means"][10:]),
        atol=1e-6,
    )

    # 90° rotation about z about the subset centroid preserves centroid
    q90 = jnp.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)],
                    dtype=jnp.float32)
    out = apply_transform(splats, jnp.zeros(3), q90, indices=idx)
    c0 = np.asarray(splats["means"][:10]).mean(0)
    c1 = np.asarray(out["means"][:10]).mean(0)
    np.testing.assert_allclose(c1, c0, atol=1e-5)


def test_render_splats_from_ply(tmp_path):
    path = make_ply(tmp_path)
    model = GaussianModel()
    splats = model.load_splats_from_ply(path)
    viewmat = np.eye(4, dtype=np.float32)
    K = np.array([[60.0, 0, 32], [0, 60, 24], [0, 0, 1]], np.float32)
    img, alpha = render_splats(splats, viewmat, K, 64, 48, rasterizer="jax")
    assert img.shape == (48, 64, 3)
    assert float(alpha.max()) > 0.0
    assert np.isfinite(np.asarray(img)).all()
