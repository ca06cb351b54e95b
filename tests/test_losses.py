import numpy as np
import jax.numpy as jnp

from tdgs.training import losses as L


def test_psnr_identity():
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 16, 16, 3)))
    assert float(L.psnr(img, img)) > 100.0
    noisy = img + 0.1
    p = float(L.psnr(noisy, img))
    np.testing.assert_allclose(p, 20.0, atol=0.1)  # mse=0.01 → 20 dB


def test_ssim_bounds_and_identity():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    assert float(L.ssim(a, a)) > 0.9999
    s_ab = float(L.ssim(a, b))
    assert -1.0 <= s_ab < 0.9


def test_ssim_monotone_in_noise():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    s1 = float(L.ssim(img + 0.02, img))
    s2 = float(L.ssim(img + 0.2, img))
    assert s1 > s2


def test_dssim_l1_zero_at_identity():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(size=(1, 24, 24, 3)).astype(np.float32))
    assert float(L.d_ssim_l1_loss(img, img)) < 1e-5


def test_ssim_matches_torch_reference():
    """Cross-check against torchmetrics (torch CPU is baked in)."""
    try:
        from torchmetrics.functional import structural_similarity_index_measure
        import torch
    except ImportError:
        import pytest

        pytest.skip("torchmetrics unavailable")
    rng = np.random.default_rng(4)
    a = rng.uniform(size=(2, 33, 47, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(np.float32)
    got = float(L.ssim(jnp.asarray(a), jnp.asarray(b)))
    want = float(
        structural_similarity_index_measure(
            torch.from_numpy(a).permute(0, 3, 1, 2),
            torch.from_numpy(b).permute(0, 3, 1, 2),
            data_range=1.0,
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_lpips_metric_properties():
    """LPIPS proxy: zero at identity, monotone under increasing corruption,
    deterministic across calls."""
    import jax.numpy as jnp
    from tdgs.training.metrics import lpips

    rng = np.random.default_rng(99)
    img = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    d0 = float(lpips(img, img)[0])
    d1 = float(lpips(img, jnp.clip(img + 0.05 * noise, 0, 1))[0])
    d2 = float(lpips(img, jnp.clip(img + 0.2 * noise, 0, 1))[0])
    assert d0 < 1e-6
    assert d0 < d1 < d2
    assert float(lpips(img, jnp.clip(img + 0.2 * noise, 0, 1))[0]) == d2


def test_ssim_flat_regions_stay_finite():
    """Regression: on TPU the SSIM convs must run at f32 precision (bf16 MXU
    default) and variances must be clamped ≥ 0 — otherwise E[x²]−E[x]² comes
    out ≈ −5e-3 on flat regions, the denominator (var_p+var_t+c2) crosses
    zero, and the photometric loss emits ±inf (corrupting training). Flat
    gray + near-flat renders reproduce the failing regime; grads must be
    finite too."""
    import jax

    rng = np.random.default_rng(7)
    # flat 0.78-gray target (the domino scene background) + near-flat pred
    t = jnp.full((1, 64, 64, 3), 0.78, jnp.float32)
    p = t + jnp.asarray(
        rng.normal(scale=1e-4, size=(1, 64, 64, 3)).astype(np.float32)
    )
    s = float(L.ssim(p, t))
    assert np.isfinite(s) and 0.99 < s <= 1.0001

    loss, grad = jax.value_and_grad(
        lambda x: L.d_ssim_l1_loss(x, t)
    )(p)
    assert np.isfinite(float(loss))
    assert bool(jnp.isfinite(grad).all())

    # clamp path: inject a filter whose variance estimate is negative
    mu = L._filter2d_separable(p, L._gaussian_window(11, 1.5))
    var = jnp.maximum(
        L._filter2d_separable(p * p, L._gaussian_window(11, 1.5)) - mu**2,
        0.0,
    )
    assert float(var.min()) >= 0.0


def test_depth_loss_dense_masked_disparity():
    """Dense refined-depth loss (reference simple_trainer.py:851-869):
    masked L1 in disparity space; zero-depth pixels excluded."""
    from tdgs.training.losses import depth_loss_dense

    rd = jnp.full((1, 4, 4, 1), 2.0)
    gt = jnp.full((1, 4, 4), 4.0)
    # rendered disp 0.5, gt disp 0.25 → |diff| = 0.25 everywhere
    out = float(depth_loss_dense(rd, gt, scene_scale=2.0))
    np.testing.assert_allclose(out, 0.25 * 2.0, rtol=1e-6)
    # invalidate half the gt: loss unchanged (mean over valid only)
    gt_masked = gt.at[:, :2].set(0.0)
    out2 = float(depth_loss_dense(rd, gt_masked, scene_scale=2.0))
    np.testing.assert_allclose(out2, 0.25 * 2.0, rtol=1e-6)
    # everything invalid → 0
    assert float(depth_loss_dense(rd, jnp.zeros((1, 4, 4)))) == 0.0


def test_lpips_learned_weights_path(tmp_path, monkeypatch):
    """With a local weights npz, lpips() runs the real AlexNet-LPIPS
    architecture (convs + maxpools + lin calibration) and the impl tag
    flips from the random proxy to learned-alex."""
    import numpy as np

    from tdgs.training import metrics as M

    rng = np.random.default_rng(0)
    # AlexNet feature convs: (out, in, k, k) per torchvision
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    z = {}
    for i, s in enumerate(shapes):
        z[f"conv{i}_w"] = (rng.normal(size=s) * 0.05).astype(np.float32)
        z[f"conv{i}_b"] = np.zeros(s[0], np.float32)
    for i, s in enumerate(shapes):
        z[f"lin{i}"] = rng.uniform(0, 0.1, size=s[0]).astype(np.float32)
    path = tmp_path / "lpips_alex.npz"
    np.savez(path, **z)

    monkeypatch.setenv("TDGS_LPIPS_WEIGHTS", str(path))
    M._load_learned.cache_clear()
    try:
        assert M.lpips_impl("alex") == "learned-alex"
        img0 = rng.uniform(0, 1, size=(1, 64, 64, 3)).astype(np.float32)
        img1 = np.clip(img0 + rng.normal(size=img0.shape) * 0.1, 0, 1
                       ).astype(np.float32)
        import jax.numpy as jnp

        same = float(M.lpips(jnp.asarray(img0), jnp.asarray(img0))[0])
        diff = float(M.lpips(jnp.asarray(img0),
                             jnp.asarray(img1, jnp.float32))[0])
        assert abs(same) < 1e-6
        assert diff > 0 and np.isfinite(diff)
    finally:
        M._load_learned.cache_clear()

    monkeypatch.delenv("TDGS_LPIPS_WEIGHTS")
    assert M.lpips_impl("alex") == "random-proxy"
