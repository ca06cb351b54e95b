import numpy as np
import jax
import jax.numpy as jnp

from tdgs.segmentation import (
    apply_segmentation_head,
    cgc_contrastive_clustering_loss,
    cgc_spatial_regularizer,
    cluster_quality,
    contrastive_segmentation_loss,
    init_segmentation_head,
    kmeans,
    kmeans_identity_encodings_background,
)
from tdgs.segmentation.clustering import save_cluster_groups, load_cluster_groups


def make_mask_and_features(rng, H=32, W=32, D=8, n_inst=3, noise=0.05):
    """Mask with n_inst blobs; features = per-instance prototype + noise."""
    mask = np.zeros((H, W), np.int32)
    protos = rng.normal(size=(n_inst + 1, D)).astype(np.float32)
    for i in range(1, n_inst + 1):
        x0 = (i - 1) * (W // n_inst)
        mask[:, x0 : x0 + W // n_inst - 2] = i
    feats = protos[mask] + rng.normal(size=(H, W, D)).astype(np.float32) * noise
    return mask, feats, protos


def test_cgc_loss_lower_for_separated_features():
    rng = np.random.default_rng(70)
    mask, feats_good, protos = make_mask_and_features(rng, noise=0.02)
    feats_bad = rng.normal(size=feats_good.shape).astype(np.float32)
    l_good = float(
        cgc_contrastive_clustering_loss(jnp.asarray(feats_good), jnp.asarray(mask))
    )
    l_bad = float(
        cgc_contrastive_clustering_loss(jnp.asarray(feats_bad), jnp.asarray(mask))
    )
    assert l_good < l_bad


def test_cgc_loss_zero_when_single_instance():
    rng = np.random.default_rng(71)
    mask = np.zeros((16, 16), np.int32)
    mask[:8] = 1
    feats = rng.normal(size=(16, 16, 4)).astype(np.float32)
    l = float(cgc_contrastive_clustering_loss(jnp.asarray(feats), jnp.asarray(mask)))
    assert l == 0.0


def test_cgc_loss_differentiable():
    rng = np.random.default_rng(72)
    mask, feats, _ = make_mask_and_features(rng)
    g = jax.grad(
        lambda f: cgc_contrastive_clustering_loss(f, jnp.asarray(mask))
    )(jnp.asarray(feats))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_spatial_regularizer_prefers_smooth_fields():
    rng = np.random.default_rng(73)
    N, D = 256, 8
    pos = rng.uniform(size=(N, 3)).astype(np.float32)
    # ideal field for the regularizer: spatially-coherent, mutually
    # orthogonal cluster features (near → same one-hot, far → orthogonal)
    slab = np.minimum((pos[:, 0] * D).astype(int), D - 1)
    f_smooth = np.eye(D, dtype=np.float32)[slab]
    f_rand = rng.normal(size=(N, D)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    l_s = float(
        cgc_spatial_regularizer(jnp.asarray(f_smooth), jnp.asarray(pos), key,
                                num_samples=256)
    )
    l_r = float(
        cgc_spatial_regularizer(jnp.asarray(f_rand), jnp.asarray(pos), key,
                                num_samples=256)
    )
    assert l_s < l_r


def test_contrastive_segmentation_loss_and_quality():
    rng = np.random.default_rng(74)
    mask, feats_good, _ = make_mask_and_features(rng, noise=0.02)
    feats_bad = rng.normal(size=feats_good.shape).astype(np.float32)
    l_good = float(
        contrastive_segmentation_loss(jnp.asarray(feats_good), jnp.asarray(mask))
    )
    l_bad = float(
        contrastive_segmentation_loss(jnp.asarray(feats_bad), jnp.asarray(mask))
    )
    assert l_good < l_bad
    intra, inter = cluster_quality(jnp.asarray(feats_good), jnp.asarray(mask))
    assert float(intra) < float(inter)  # compact, separated clusters


def test_head_shapes_and_grad():
    key = jax.random.PRNGKey(1)
    p = init_segmentation_head(key, 16, 64, 16)
    x = jax.random.normal(key, (100, 16))
    y = apply_segmentation_head(p, x)
    assert y.shape == (100, 16)
    g = jax.grad(lambda p: jnp.sum(apply_segmentation_head(p, x) ** 2))(p)
    assert all(np.isfinite(np.asarray(v)).all() for v in g.values())


def test_kmeans_recovers_clusters():
    rng = np.random.default_rng(75)
    K, D = 4, 8
    cents = rng.normal(size=(K, D)).astype(np.float32) * 4
    labels_true = rng.integers(0, K, 500)
    X = cents[labels_true] + rng.normal(size=(500, D)).astype(np.float32) * 0.1
    # init near the true centroids (anchor-based init, as the pipeline does)
    init = cents + rng.normal(size=cents.shape).astype(np.float32) * 0.5
    labels, out_cents = kmeans(jnp.asarray(X), jnp.asarray(init), iters=20)
    labels = np.asarray(labels)
    # same-cluster consistency
    for k in range(K):
        got = labels[labels_true == k]
        assert (got == got[0]).mean() > 0.99


def test_kmeans_identity_pipeline(tmp_path):
    rng = np.random.default_rng(76)
    H, W, D, n_inst = 24, 24, 8, 3
    mask, feat_map, protos = make_mask_and_features(rng, H, W, D, n_inst, 0.02)
    # gaussians: 50 per instance with the instance's prototype
    N = 150
    gl = np.repeat(np.arange(1, n_inst + 1), 50)
    enc = protos[gl] + rng.normal(size=(N, D)).astype(np.float32) * 0.02
    res = kmeans_identity_encodings_background(
        feat_map, mask, enc, outlier_percentile=95.0
    )
    labels = res["labels"]
    assert res["centroids"].shape[0] == n_inst
    # most gaussians of one true group share a cluster label
    for g in range(1, n_inst + 1):
        got = labels[gl == g]
        got = got[got >= 0]
        vals, counts = np.unique(got, return_counts=True)
        assert counts.max() / len(got) > 0.95
    # ~5% marked background by the percentile rule
    assert 0.01 < (labels < 0).mean() < 0.2

    save_cluster_groups(str(tmp_path / "groups.npz"), res)
    groups = load_cluster_groups(str(tmp_path / "groups.npz"))
    assert sum(len(v) for v in groups.values()) == N


def test_visualization_exports(tmp_path):
    """t-SNE/PCA cluster plots + identity-map RGB + depth colormap
    (reference load_identity_encodings.py:494-533, visualize.py)."""
    from tdgs.segmentation.visualize import (
        save_depth_as_image,
        save_identity_map,
        tsne_plot,
    )

    rng = np.random.default_rng(0)
    enc = rng.normal(size=(300, 16)).astype(np.float32)
    labels = np.concatenate([np.full(100, -1), np.repeat([0, 1], 100)])
    p1 = tsne_plot(enc, labels, str(tmp_path / "tsne.png"), subsample=200)
    assert (tmp_path / "tsne.png").stat().st_size > 1000, p1

    fmap = rng.normal(size=(24, 32, 16)).astype(np.float32)
    p2 = save_identity_map(fmap, str(tmp_path / "idmap.png"))
    assert (tmp_path / "idmap.png").stat().st_size > 100, p2

    depth = np.zeros((24, 32), np.float32)
    depth[4:20, 4:28] = np.linspace(1, 5, 16)[:, None]
    p3 = save_depth_as_image(depth, str(tmp_path / "depth.png"))
    assert (tmp_path / "depth.png").stat().st_size > 100, p3

    from PIL import Image

    img = np.asarray(Image.open(tmp_path / "depth.png"))
    assert (img[0, 0] == 0).all()  # invalid pixels get invalid_color
