import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdgs.ops import sh as SH


def fibonacci_sphere(n):
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    return np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)], -1
    ).astype(np.float32)


@pytest.mark.parametrize("degree", [0, 1, 2, 3, 4])
def test_sh_orthonormality(degree):
    """Real SH bases are orthonormal over the sphere — a property-based
    oracle independent of any implementation."""
    n = 200_000
    dirs = fibonacci_sphere(n)
    K = (degree + 1) ** 2
    bases = np.asarray(SH.eval_sh_bases(K, jnp.asarray(dirs)), dtype=np.float64)
    gram = bases.T @ bases * (4 * np.pi / n)
    np.testing.assert_allclose(gram, np.eye(K), atol=2e-2)


def test_sh_degree0_is_constant():
    dirs = jnp.asarray(fibonacci_sphere(10))
    coeffs = jnp.ones((10, 1, 3))
    colors = SH.spherical_harmonics(0, dirs, coeffs)
    np.testing.assert_allclose(np.asarray(colors), 0.2820947917738781, atol=1e-6)


def test_sh_linear_band_signs():
    # With only the l=1, m=0 coefficient set, color must be ∝ +z direction
    # (basis value at +z is -fTmpA = +0.488...).
    coeffs = np.zeros((1, 4, 3), dtype=np.float32)
    coeffs[:, 2, :] = 1.0
    up = SH.spherical_harmonics(1, jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray(coeffs))
    down = SH.spherical_harmonics(1, jnp.asarray([[0.0, 0.0, -1.0]]), jnp.asarray(coeffs))
    assert float(up[0, 0]) > 0.4
    np.testing.assert_allclose(np.asarray(up), -np.asarray(down), atol=1e-6)


def test_sh_inactive_bands_ignored():
    rng = np.random.default_rng(0)
    dirs = jnp.asarray(fibonacci_sphere(32))
    coeffs = jnp.asarray(rng.normal(size=(32, 25, 3)).astype(np.float32))
    c1 = SH.spherical_harmonics(1, dirs, coeffs)
    c1b = SH.spherical_harmonics(1, dirs, coeffs.at[:, 4:, :].set(99.0))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c1b), atol=1e-6)


def test_sh_masks_zero_output_and_grad():
    rng = np.random.default_rng(1)
    dirs = jnp.asarray(fibonacci_sphere(8))
    coeffs = jnp.asarray(rng.normal(size=(8, 9, 3)).astype(np.float32))
    masks = jnp.asarray([True, False] * 4)
    colors = SH.spherical_harmonics(2, dirs, coeffs, masks=masks)
    assert np.all(np.asarray(colors)[1::2] == 0.0)

    g = jax.grad(lambda c: jnp.sum(SH.spherical_harmonics(2, dirs, c, masks=masks)))(
        coeffs
    )
    assert np.all(np.asarray(g)[1::2] == 0.0)
    assert np.isfinite(np.asarray(g)).all()


def test_sh_rotation_invariance_of_power():
    """Total band power is rotation invariant: evaluating a fixed coeff
    vector over many dirs then averaging squared color equals the band
    power, independent of basis orientation conventions."""
    rng = np.random.default_rng(2)
    coeffs = rng.normal(size=(25, 3)).astype(np.float32)
    n = 100_000
    dirs = fibonacci_sphere(n)
    colors = np.asarray(
        SH.spherical_harmonics(
            4, jnp.asarray(dirs), jnp.broadcast_to(coeffs, (n, 25, 3))
        )
    )
    mean_sq = (colors**2).mean(0) * 4 * np.pi
    want = (coeffs**2).sum(0)
    np.testing.assert_allclose(mean_sq, want, rtol=5e-2)
