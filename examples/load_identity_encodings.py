"""Cluster trained identity encodings into object groups (CLI).

Counterpart of the reference's examples/load_identity_encodings.py:
loads a tdgs checkpoint, inspects splats.identity_encodings, re-renders the
identity map through the segmentation head, runs anchor-initialized K-means
with 95th-percentile background split (the main path, reference :387-476),
optionally a DBSCAN eps sweep (:191), and saves cluster_groups.npz
(:566-569).

    python examples/load_identity_encodings.py --ckpt results/x/ckpts/ckpt_30000.pkl \\
        --data-dir data/scene --out cluster_groups.npz
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdgs.utils.platform import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORM_NAME even if the plugin ignores it

import numpy as np


def load_and_inspect_identity_encodings(ckpt_path: str):
    """(reference :20) Load encodings + segmentation head from a checkpoint."""
    with open(ckpt_path, "rb") as f:
        state = pickle.load(f)
    enc = np.asarray(state["splats"]["identity_encodings"])
    head = state.get("segmentation_head")
    print(f"identity_encodings: shape {enc.shape}, "
          f"norm mean {np.linalg.norm(enc, axis=-1).mean():.4f}")
    return state, enc, head


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--data-factor", type=int, default=1)
    ap.add_argument("--view-index", type=int, default=0,
                    help="train view used for anchor centroids")
    ap.add_argument("--out", default="cluster_groups.npz")
    ap.add_argument("--method", choices=["kmeans", "dbscan"], default="kmeans")
    ap.add_argument("--target-clusters", type=int, default=3)
    ap.add_argument("--outlier-percentile", type=float, default=95.0)
    ap.add_argument("--plots", action="store_true",
                    help="save t-SNE scatter + PCA identity-map PNGs next "
                    "to --out (reference :344-360, :494-533)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from tdgs.datasets import Dataset, Parser
    from tdgs.segmentation import (
        apply_segmentation_head,
        dbscan_identity_encodings,
        kmeans_identity_encodings_background,
    )
    from tdgs.segmentation.clustering import save_cluster_groups
    from tdgs.rendering import rasterization
    from tdgs.models.gaussians import splat_activations

    state, enc, head = load_and_inspect_identity_encodings(args.ckpt)
    splats = {k: jnp.asarray(v) for k, v in state["splats"].items()}

    if args.method == "dbscan":
        res = dbscan_identity_encodings(enc, target_clusters=args.target_clusters)
        print(f"DBSCAN: {res['n_clusters']} clusters at eps={res['eps']:.3f}")
    else:
        # render the identity map for the anchor view
        # (reference get_identity_map_from_checkpoint:107)
        parser = Parser(args.data_dir, factor=args.data_factor,
                        load_instance_masks=True)
        ds = Dataset(parser, "train")
        d = ds[args.view_index]
        assert "instance_mask" in d, (
            "anchor view has no instance mask under masks/instance_ids_npy/"
        )
        H, W = d["image"].shape[:2]
        means, quats, scales, opacities, _ = splat_activations(splats)
        feats = apply_segmentation_head(
            {k: jnp.asarray(v) for k, v in head.items()},
            splats["identity_encodings"],
        )
        fmap, _, _ = rasterization(
            means, quats, scales, opacities, feats,
            jnp.asarray(d["viewmat"])[None], jnp.asarray(d["K"])[None],
            W, H, sh_degree=None,
        )
        res = kmeans_identity_encodings_background(
            np.asarray(fmap[0]), d["instance_mask"], np.asarray(feats),
            outlier_percentile=args.outlier_percentile,
        )
        labels = res["labels"]
        print(f"K-means: {len(res['fg_ids'])} clusters; "
              f"{(labels < 0).mean() * 100:.1f}% background")

    save_cluster_groups(args.out, res)
    print(f"saved {args.out}")

    if args.plots:
        from tdgs.segmentation.visualize import save_identity_map, tsne_plot

        stem = os.path.splitext(args.out)[0]
        feats_for_plot = (
            np.asarray(apply_segmentation_head(
                {k: jnp.asarray(v) for k, v in head.items()}, enc
            )) if head is not None else enc
        )
        print("saved", tsne_plot(feats_for_plot, res["labels"],
                                 f"{stem}_tsne.png"))
        if args.method == "kmeans":
            print("saved", save_identity_map(np.asarray(fmap[0]),
                                             f"{stem}_identity_map.png"))


if __name__ == "__main__":
    main()
