"""End-to-end identity-vector segmentation training on a synthetic scene
(the fork's core pipeline: train with CGC losses → cluster encodings)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdgs.strategy import MCMCStrategy
from tdgs.training.config import Config
from tdgs.training.trainer import Runner
from tests.test_trainer import render_target_scene


def add_instance_masks(root, n_images=8, width=64, height=48):
    """Instance masks: left half = object 1, right half = object 2."""
    mdir = os.path.join(root, "masks", "instance_ids_npy")
    os.makedirs(mdir, exist_ok=True)
    mask = np.zeros((height, width), np.int32)
    mask[:, : width // 2] = 1
    mask[:, width // 2 :] = 2
    for i in range(n_images):
        np.save(os.path.join(mdir, f"img_{i:03d}_instance_id.npy"), mask)


def test_segmentation_training_and_clustering(tmp_path):
    root = str(tmp_path / "scene")
    render_target_scene(root)
    add_instance_masks(root)

    cfg = Config(
        data_dir=root,
        result_dir=str(tmp_path / "results"),
        data_factor=1,
        max_steps=40,
        eval_steps=[],
        save_steps=[40],
        sh_degree=1,
        sh_degree_interval=20,
        strategy=MCMCStrategy(cap_max=256, refine_start_iter=1000),
        capacity=256,
        tile_capacity=256,
        isect_capacity=1 << 14,
        test_every=4,
        rasterizer="jax",
        with_segmentation=True,
        identity_dim=8,
        seg_start_iter=5,
        seg_loss_every=5,
        seg_loss_weight=0.5,
        seg_spatial_every=10,
    )
    runner = Runner(cfg)
    assert "identity_encodings" in runner.splats
    assert runner.seg_head is not None
    head0 = np.asarray(runner.seg_head["w1"]).copy()
    enc0 = np.asarray(runner.splats["identity_encodings"]).copy()

    out = runner.train()
    assert out["history"][-1]["loss"] < out["history"][0]["loss"] * 1.5

    # segmentation actually trained (head + encodings moved)
    assert np.abs(np.asarray(runner.seg_head["w1"]) - head0).max() > 1e-6
    assert np.abs(
        np.asarray(runner.splats["identity_encodings"]) - enc0
    ).max() > 1e-6

    # identity map renders with feature channels
    fmap = runner.render_identity_map(0)
    assert fmap.shape[-1] == 8
    assert np.isfinite(fmap).all()

    # checkpoint carries the head
    import pickle

    with open(str(tmp_path / "results" / "ckpts" / "ckpt_40.pkl"), "rb") as f:
        state = pickle.load(f)
    assert "segmentation_head" in state

    # clustering pipeline on the trained encodings
    from tdgs.segmentation import (
        apply_segmentation_head,
        kmeans_identity_encodings_background,
    )

    d = runner.trainset[0]
    feats = apply_segmentation_head(
        runner.seg_head, runner.splats["identity_encodings"]
    )
    res = kmeans_identity_encodings_background(
        fmap, d["instance_mask"], np.asarray(feats)
    )
    assert res["centroids"].shape[0] == 2  # two mask objects → two clusters
    assert set(np.unique(res["labels"])) <= {-1, 0, 1}
