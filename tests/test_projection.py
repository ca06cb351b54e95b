import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdgs.ops import projection as P
from tdgs.ops import transforms as T
from tests import oracles


def make_scene(rng, N=128, C=2, width=64, height=48):
    means = rng.normal(size=(N, 3)).astype(np.float32) * 2.0
    means[:, 2] += 5.0  # mostly in front
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = rng.uniform(0.05, 0.6, size=(N, 3)).astype(np.float32)
    opacities = rng.uniform(0.1, 1.0, size=(N,)).astype(np.float32)

    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    for c in range(1, C):
        Rc = oracles.quat_to_rotmat_np(rng.normal(size=4)).astype(np.float32)
        viewmats[c, :3, :3] = Rc
        viewmats[c, :3, 3] = rng.normal(size=3).astype(np.float32)
    K = np.array(
        [[50.0, 0, width / 2], [0, 50.0, height / 2], [0, 0, 1]], dtype=np.float32
    )
    Ks = np.tile(K, (C, 1, 1))
    return means, quats, scales, opacities, viewmats, Ks, width, height


@pytest.mark.parametrize("camera_model", ["pinhole", "ortho", "fisheye"])
def test_fully_fused_projection_matches_oracle(camera_model):
    rng = np.random.default_rng(11)
    means, quats, scales, opacities, viewmats, Ks, width, height = make_scene(rng)
    covars = oracles.covar_np(quats, scales).astype(np.float32)

    radii, means2d, depths, conics, _ = P.fully_fused_projection(
        jnp.asarray(means),
        jnp.asarray(quats),
        jnp.asarray(scales),
        jnp.asarray(viewmats),
        jnp.asarray(Ks),
        width,
        height,
        camera_model=camera_model,
    )
    radii = np.asarray(radii)
    means2d = np.asarray(means2d)
    depths = np.asarray(depths)
    conics = np.asarray(conics)

    for c in range(viewmats.shape[0]):
        r_o, m_o, d_o, con_o, _ = oracles.project_gaussians_np(
            means, covars, viewmats[c], Ks[c], width, height,
            camera_model=camera_model,
        )
        np.testing.assert_array_equal(radii[c], r_o)
        valid = (r_o > 0).all(-1)
        np.testing.assert_allclose(means2d[c][valid], m_o[valid], rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(depths[c][valid], d_o[valid], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(conics[c][valid], con_o[valid], rtol=2e-3, atol=1e-3)


def test_opacity_aware_radius_and_compensations():
    rng = np.random.default_rng(12)
    means, quats, scales, opacities, viewmats, Ks, width, height = make_scene(rng, C=1)
    covars = oracles.covar_np(quats, scales).astype(np.float32)

    radii, means2d, depths, conics, comps = P.fully_fused_projection(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), width, height,
        opacities=jnp.asarray(opacities), calc_compensations=True,
    )
    r_o, m_o, d_o, con_o, comp_o = oracles.project_gaussians_np(
        means, covars, viewmats[0], Ks[0], width, height,
        opacities=opacities, calc_compensations=True,
    )
    np.testing.assert_array_equal(np.asarray(radii)[0], r_o)
    valid = (r_o > 0).all(-1)
    np.testing.assert_allclose(
        np.asarray(comps)[0][valid], comp_o[valid], rtol=1e-3, atol=1e-4
    )
    # opacity-aware radius must be <= the fixed 3.33 bound
    radii_noop, *_ = P.fully_fused_projection(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), width, height,
    )
    both = valid & (np.asarray(radii_noop)[0] > 0).all(-1)
    assert (np.asarray(radii)[0][both] <= np.asarray(radii_noop)[0][both]).all()


def test_covars_override():
    rng = np.random.default_rng(13)
    means, quats, scales, _, viewmats, Ks, width, height = make_scene(rng, N=32, C=1)
    covars = oracles.covar_np(quats, scales).astype(np.float32)
    out_qs = P.fully_fused_projection(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), width, height,
    )
    out_cv = P.fully_fused_projection(
        jnp.asarray(means), None, None,
        jnp.asarray(viewmats), jnp.asarray(Ks), width, height,
        covars=jnp.asarray(covars),
    )
    np.testing.assert_allclose(
        np.asarray(out_qs[1]), np.asarray(out_cv[1]), rtol=1e-4, atol=1e-3
    )


def test_projection_differentiable():
    rng = np.random.default_rng(14)
    means, quats, scales, opacities, viewmats, Ks, width, height = make_scene(
        rng, N=16, C=1
    )

    def loss(means, quats, scales):
        _, m2d, depths, conics, _ = P.fully_fused_projection(
            means, quats, scales, jnp.asarray(viewmats), jnp.asarray(Ks),
            width, height,
        )
        return jnp.sum(m2d) + jnp.sum(depths) + jnp.sum(conics)

    g = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales)
    )
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()


def test_radius_clip_culls():
    rng = np.random.default_rng(15)
    means, quats, scales, _, viewmats, Ks, width, height = make_scene(rng, C=1)
    r0, *_ = P.fully_fused_projection(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), width, height, radius_clip=0.0,
    )
    r5, *_ = P.fully_fused_projection(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), width, height, radius_clip=8.0,
    )
    r0 = np.asarray(r0)
    r5 = np.asarray(r5)
    # exactly the gaussians with both radii <= clip get culled
    small = (r0 > 0).all(-1) & (r0 <= 8).all(-1)
    assert small.any()
    assert np.all(r5[small] == 0)
    keep = (r0 > 0).all(-1) & ~small
    np.testing.assert_array_equal(r5[keep], r0[keep])
