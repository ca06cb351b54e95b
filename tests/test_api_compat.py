"""Drop-in API compatibility with reference call sites.

gsplat users call rasterization()/rasterization_2dgs() with kwargs that are
CUDA-build implementation details (packed, sparse_grad, segmented,
channel_chunk), torch-autograd side channels (absgrad), or dispatch flags
(distributed, with_eval3d). These must be accepted with documented TPU
semantics (reference signatures: gsplat/rendering.py:33-66, :1270-1292;
optimizer: gsplat/optimizers/selective_adam.py:6-86).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdgs.rendering import rasterization, rasterization_2dgs


def make_scene(rng, N=64, C=2, width=64, height=48):
    means = rng.normal(size=(N, 3)).astype(np.float32) * 1.5 + [0, 0, 6.0]
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = rng.uniform(0.05, 0.4, size=(N, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 1.0, size=(N,)).astype(np.float32)
    sh = rng.normal(size=(N, 4, 3)).astype(np.float32) * 0.3
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, 0, 3] = np.linspace(-0.5, 0.5, C)
    K = np.array([[60.0, 0, width / 2], [0, 60.0, height / 2], [0, 0, 1]],
                 np.float32)
    Ks = np.tile(K, (C, 1, 1))
    return (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmats),
            jnp.asarray(Ks), width, height)


def test_reference_kwargs_accepted_and_inert():
    """A verbatim reference call site (packed/sparse_grad/segmented/
    channel_chunk/distributed on one device) renders identically to the
    plain call."""
    rng = np.random.default_rng(7)
    *scene, width, height = make_scene(rng)
    plain = rasterization(*scene, width, height, sh_degree=1)
    compat = rasterization(
        *scene, width, height, sh_degree=1,
        packed=True, sparse_grad=False, segmented=True, channel_chunk=16,
        absgrad=False,
    )
    np.testing.assert_array_equal(np.asarray(plain[0]), np.asarray(compat[0]))
    np.testing.assert_array_equal(np.asarray(plain[1]), np.asarray(compat[1]))


def test_absgrad_without_tap_raises_with_recipe():
    rng = np.random.default_rng(8)
    *scene, width, height = make_scene(rng, N=16)
    with pytest.raises(ValueError, match="means2d_abs_tap"):
        rasterization(*scene, width, height, sh_degree=1, absgrad=True)


def test_absgrad_with_tap_accepted():
    rng = np.random.default_rng(9)
    means, quats, scales, opac, sh, viewmats, Ks, width, height = make_scene(
        rng, N=16
    )
    tap = jnp.zeros((viewmats.shape[0], means.shape[0], 2), jnp.float32)
    img, _, meta = rasterization(
        means, quats, scales, opac, sh, viewmats, Ks, width, height,
        sh_degree=1, absgrad=True, means2d_abs_tap=tap,
    )
    assert np.isfinite(np.asarray(img)).all()


@pytest.mark.slow
def test_distributed_kwarg_delegates_to_sharded():
    """distributed=True on the 8-device CPU mesh routes through
    rasterization_sharded and matches the single-device render."""
    if jax.device_count() < 2:
        pytest.skip("needs the virtual multi-device mesh")
    rng = np.random.default_rng(10)
    means, quats, scales, opac, sh, viewmats, Ks, width, height = make_scene(
        rng, C=8
    )
    plain = rasterization(
        means, quats, scales, opac, sh, viewmats, Ks, width, height,
        sh_degree=1, tile_capacity=128,
    )
    dist = rasterization(
        means, quats, scales, opac, sh, viewmats, Ks, width, height,
        sh_degree=1, tile_capacity=128, distributed=True,
    )
    np.testing.assert_allclose(
        np.asarray(plain[0]), np.asarray(dist[0]), rtol=1e-4, atol=1e-4
    )


def test_with_eval3d_kwarg_selects_world_space_path():
    """with_eval3d=True renders through the world-space rasterizer: close
    to the 2D path in image space, and meta carries no means2d screen taps
    from the 2D compositing path."""
    rng = np.random.default_rng(11)
    means, quats, scales, opac, sh, viewmats, Ks, width, height = make_scene(
        rng, N=32, C=1
    )
    img2d, _, _ = rasterization(
        means, quats, scales, opac, sh, viewmats, Ks, width, height,
        sh_degree=1,
    )
    img3d, _, _ = rasterization(
        means, quats, scales, opac, sh, viewmats, Ks, width, height,
        sh_degree=1, with_eval3d=True,
    )
    # world-space evaluation differs from EWA 2D by design; same scene →
    # same picture to low tolerance
    err = np.abs(np.asarray(img2d) - np.asarray(img3d)).mean()
    assert err < 0.05, err


def test_2dgs_reference_kwargs_accepted():
    rng = np.random.default_rng(12)
    means, quats, scales, opac, sh, viewmats, Ks, width, height = make_scene(
        rng, N=32, C=1
    )
    out_plain = rasterization_2dgs(
        means, quats, scales, opac, sh, viewmats, Ks, width, height,
        sh_degree=1,
    )
    out_compat = rasterization_2dgs(
        means, quats, scales, opac, sh, viewmats, Ks, width, height,
        sh_degree=1, eps2d=0.3, packed=False, sparse_grad=False,
    )
    np.testing.assert_array_equal(
        np.asarray(out_plain[0]), np.asarray(out_compat[0])
    )
    with pytest.raises(ValueError, match="absgrad"):
        rasterization_2dgs(
            means, quats, scales, opac, sh, viewmats, Ks, width, height,
            sh_degree=1, absgrad=True,
        )
    # absgrad=True with the explicit tap is the supported spelling
    # (reference rendering.py:1290 absgrad consumed by simple_trainer_2dgs)
    N = means.shape[0]
    out_abs = rasterization_2dgs(
        means, quats, scales, opac, sh, viewmats, Ks, width, height,
        sh_degree=1, absgrad=True,
        means2d_abs_tap=jnp.zeros((viewmats.shape[0], N, 2)),
    )
    np.testing.assert_allclose(
        np.asarray(out_plain[0]), np.asarray(out_abs[0]), atol=1e-6
    )


def test_selective_adam_class_matches_transformation():
    """The stateful SelectiveAdam class (reference optimizer API) takes the
    same step as the functional selective_adam transformation, and frozen
    rows keep value + moments."""
    from tdgs.ops.adam import SelectiveAdam, selective_adam

    rng = np.random.default_rng(13)
    params = {
        "a": jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(8,)).astype(np.float32)),
    }
    grads = jax.tree.map(
        lambda p: jnp.asarray(
            rng.normal(size=p.shape).astype(np.float32)
        ),
        params,
    )
    vis = jnp.asarray([True, False] * 4)

    opt = SelectiveAdam(params, lr=1e-2)
    new_params = opt.step(grads, visibility=vis)

    tx = selective_adam(1e-2)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params, visibility=vis)
    want = jax.tree.map(lambda p, u: p + u, params, updates)

    for k in params:
        np.testing.assert_allclose(
            np.asarray(new_params[k]), np.asarray(want[k]), rtol=1e-6
        )
        frozen = np.asarray(new_params[k])[1::2]
        np.testing.assert_array_equal(frozen, np.asarray(params[k])[1::2])

    # two more steps: moments accumulate identically
    new2 = opt.step(grads, visibility=vis)
    assert not np.allclose(np.asarray(new2["a"]), np.asarray(new_params["a"]))


def test_package_exports_selective_adam_class():
    import tdgs

    assert hasattr(tdgs, "SelectiveAdam")
