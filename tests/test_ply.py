import numpy as np

from tdgs.utils.ply import (
    export_splats,
    load_ply,
    load_ply_compressed,
    morton_sort_centers,
    save_ply,
    save_ply_compressed,
    save_splat,
)


def make_splats(rng, n=50, k=16):
    return dict(
        means=rng.normal(size=(n, 3)).astype(np.float32),
        scales=rng.normal(size=(n, 3)).astype(np.float32),
        quats=rng.normal(size=(n, 4)).astype(np.float32),
        opacities=rng.normal(size=(n,)).astype(np.float32),
        sh0=rng.normal(size=(n, 1, 3)).astype(np.float32),
        shN=rng.normal(size=(n, k - 1, 3)).astype(np.float32),
    )


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(80)
    s = make_splats(rng)
    path = str(tmp_path / "test.ply")
    save_ply(path, **s)
    out = load_ply(path)
    for k in s:
        np.testing.assert_allclose(out[k].reshape(s[k].shape), s[k], rtol=1e-6)


def test_ply_extra_properties(tmp_path):
    rng = np.random.default_rng(81)
    s = make_splats(rng, n=20)
    ident = rng.normal(size=(20, 16)).astype(np.float32)
    path = str(tmp_path / "test.ply")
    save_ply(path, **s, extra={"identity_encodings": ident})
    out = load_ply(path)
    np.testing.assert_allclose(out["identity_encodings"], ident, rtol=1e-6)


def test_splat_format_size(tmp_path):
    rng = np.random.default_rng(82)
    s = make_splats(rng, n=33)
    path = str(tmp_path / "test.splat")
    save_splat(path, s["means"], s["scales"], s["quats"], s["opacities"], s["sh0"])
    import os

    assert os.path.getsize(path) == 33 * 32  # 32 bytes per splat


def test_morton_sort_locality():
    rng = np.random.default_rng(83)
    pts = rng.uniform(size=(2000, 3)).astype(np.float32)
    order = morton_sort_centers(pts)
    sorted_pts = pts[order]
    # consecutive points in morton order are much closer than random order
    d_sorted = np.linalg.norm(np.diff(sorted_pts, axis=0), axis=1).mean()
    d_orig = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
    assert d_sorted < 0.5 * d_orig


def test_export_splats_api(tmp_path):
    rng = np.random.default_rng(84)
    s = make_splats(rng, n=10)
    export_splats(**s, format="ply", save_to=str(tmp_path / "a.ply"))
    export_splats(**s, format="splat", save_to=str(tmp_path / "a.splat"))
    export_splats(**s, format="ply_compressed",
                  save_to=str(tmp_path / "a.compressed.ply"))
    out = load_ply(str(tmp_path / "a.ply"))
    assert out["means"].shape == (10, 3)


def test_ply_compressed_roundtrip(tmp_path):
    """Quantized round-trip: decode must recover all params to within the
    quantization step of each packing (11/10/11 position+scale, 10-bit
    smallest-three quats, 8-bit colors/opacity, 8-bit f_rest in [-4, 4))."""
    rng = np.random.default_rng(85)
    n = 600  # > 2 chunks of 256
    s = make_splats(rng, n=n, k=4)
    s["shN"] = np.clip(s["shN"], -3.9, 3.9)
    path = str(tmp_path / "c.ply")
    save_ply_compressed(path, **s)
    out = load_ply_compressed(path)

    opac = 1 / (1 + np.exp(-s["opacities"].astype(np.float64)))
    keep = opac > 1 / 255.0
    order = morton_sort_centers(s["means"][keep])

    def ref(k):
        return s[k][keep][order]

    assert out["means"].shape == (keep.sum(), 3)
    span = s["means"].max(0) - s["means"].min(0)
    np.testing.assert_allclose(
        out["means"], ref("means"), atol=float(span.max()) / 1023
    )
    span_s = s["scales"].max(0) - s["scales"].min(0)
    np.testing.assert_allclose(
        out["scales"], ref("scales"), atol=float(span_s.max()) / 1023
    )
    # quats: compare as rotations (sign-canonicalized, normalized)
    q_ref = ref("quats")
    q_ref = q_ref / np.linalg.norm(q_ref, axis=-1, keepdims=True)
    dot = np.abs(np.sum(q_ref * out["quats"], axis=-1))
    assert dot.min() > 0.999
    np.testing.assert_allclose(
        1 / (1 + np.exp(-out["opacities"])),
        1 / (1 + np.exp(-ref("opacities"))),
        atol=1.5 / 255,
    )
    np.testing.assert_allclose(out["shN"], ref("shN"), atol=8.0 / 256 + 1e-6)


def test_ply_compressed_drops_transparent(tmp_path):
    rng = np.random.default_rng(86)
    s = make_splats(rng, n=40, k=2)
    s["opacities"][:15] = -10.0  # sigmoid ≈ 4.5e-5 < 1/255 → dropped
    path = str(tmp_path / "c.ply")
    save_ply_compressed(path, **s)
    out = load_ply_compressed(path)
    assert out["means"].shape[0] == 25


def test_load_ply_milo_channel_interleaved(tmp_path):
    """load_ply_milo (reference gsplat/utils.py:349) reads the f_rest
    block channel-interleaved: flat column j maps to (coeff j//3, ch j%3)
    instead of the Inria coefficient-major layout."""
    import numpy as np

    from tdgs.utils.ply import load_ply, load_ply_milo, save_ply

    n, km1 = 5, 3
    rng = np.random.default_rng(11)
    splats = {
        "means": rng.normal(size=(n, 3)).astype(np.float32),
        "scales": rng.normal(size=(n, 3)).astype(np.float32),
        "quats": rng.normal(size=(n, 4)).astype(np.float32),
        "opacities": rng.normal(size=(n,)).astype(np.float32),
        "sh0": rng.normal(size=(n, 1, 3)).astype(np.float32),
        "shN": rng.normal(size=(n, km1, 3)).astype(np.float32),
    }
    path = str(tmp_path / "s.ply")
    save_ply(path, splats["means"], splats["scales"], splats["quats"],
             splats["opacities"], splats["sh0"], splats["shN"])

    std = load_ply(path)["shN"]           # [n, km1, 3] coefficient-major
    milo = load_ply_milo(path)["shN"]     # channel-interleaved reread
    assert milo.shape == (n, km1, 3)
    # the two interpretations are permutations of the same flat block
    np.testing.assert_allclose(
        np.sort(std.reshape(n, -1), axis=1),
        np.sort(milo.reshape(n, -1), axis=1),
        rtol=1e-6,
    )
    # explicit index map: milo[:, j//3, j%3] == flat column j
    flat = std.transpose(0, 2, 1).reshape(n, -1)
    for j in range(3 * km1):
        np.testing.assert_allclose(milo[:, j // 3, j % 3], flat[:, j])
