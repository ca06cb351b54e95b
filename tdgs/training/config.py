"""Training configuration (dataclass; tyro-compatible CLI).

Capability parity with the reference's Config (examples/simple_trainer.py:46,
~90 flags) including the fork's segmentation/normals/depth extensions.
Flags that are CUDA-memory-mode specific (packed/sparse_grad) don't exist;
TPU capacity knobs (isect_capacity, tile_capacity) replace them.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Literal, Optional, Tuple, Union

from tdgs.strategy import DefaultStrategy, MCMCStrategy


@dataclass
class Config:
    # data
    data_dir: str = "data/360_v2/garden"
    data_factor: int = 4
    result_dir: str = "results/garden"
    test_every: int = 8
    normalize_world_space: bool = True
    patch_size: Optional[int] = None

    # run schedule
    max_steps: int = 30_000
    eval_steps: List[int] = field(default_factory=lambda: [7_000, 30_000])
    save_steps: List[int] = field(default_factory=lambda: [7_000, 30_000])
    ply_steps: List[int] = field(default_factory=lambda: [7_000, 30_000])
    save_ply: bool = False
    steps_scaler: float = 1.0  # global step scaling (reference :237-255)
    batch_size: int = 1

    # model init
    init_type: Literal["sfm", "random"] = "sfm"
    init_num_pts: int = 100_000
    init_extent: float = 3.0
    # cap the SFM seed: deterministically subsample the triangulated pool
    # to at most this many init gaussians (None = use all points; MCMC
    # runs need n_init <= cap_max)
    sfm_max_points: Optional[int] = None
    sh_degree: int = 3
    sh_degree_interval: int = 1000
    init_opa: float = 0.1
    init_scale: float = 1.0

    # render
    near_plane: float = 0.01
    far_plane: float = 1e10
    camera_model: Literal["pinhole", "ortho", "fisheye"] = "pinhole"
    antialiased: bool = False
    rasterizer: Literal[
        "auto", "jax", "pallas", "packed", "packed_inference"
    ] = "auto"
    tile_capacity: int = 1024
    isect_capacity: Optional[int] = None
    max_tiles_per_gauss: int = 32
    # exact tile coverage (reference two-pass count/cumsum expansion,
    # IntersectTile.cu:95-113): sorts `isect_capacity` rows instead of the
    # dense N*max_tiles_per_gauss expansion — the right default for large
    # caps (>=0.5M) where the dense expansion dominates the train step
    isect_exact: bool = False

    # model family
    model_type: Literal["3dgs", "2dgs"] = "3dgs"

    # 3DGUT (reference simple_trainer.py:189-190, benchmarks/3dgut/mcmc.sh):
    # with_ut projects through the unscented transform (distorted cameras,
    # rolling shutter); with_eval3d rasterizes in world space along true
    # camera rays. Training uses the differentiable eval3d Pallas kernel on
    # TPU (rasterize_eval3d_pallas). Note eval3d renders don't touch
    # means2d, so the DefaultStrategy's screen-gradient grow criterion
    # never fires — use MCMCStrategy, as the reference's 3dgut benchmark
    # scripts do.
    with_ut: bool = False
    with_eval3d: bool = False

    # 2DGS losses (reference simple_trainer_2dgs.py:153-164)
    normal_loss: bool = False
    normal_lambda: float = 5e-2
    normal_start_iter: int = 7_000
    dist_loss: bool = False
    dist_lambda: float = 1e-2
    dist_start_iter: int = 3_000

    # losses
    ssim_lambda: float = 0.2
    random_bkgd: bool = False
    # constant compositing background for train/eval renders, for datasets
    # whose GT images have a known flat backdrop (e.g. the procedural
    # domino scene). Without it the model must fabricate huge flat splats
    # to explain the backdrop. None → composite onto black.
    background_color: Optional[Tuple[float, float, float]] = None
    # hard ceiling on per-axis splat scale in world units, applied as a
    # projection after every optimizer step. Degenerate frame-filling
    # splats cover thousands of tiles each and wreck rasterization
    # throughput; the reference's DefaultStrategy similarly prunes
    # scale > prune_scale3d·scene_scale (strategy/default.py:311-339).
    max_scale: Optional[float] = None
    depth_loss: bool = False
    depth_lambda: float = 1e-2
    # dense precomputed depth maps (refined_depths/*_refined_depth.npy,
    # e.g. PriorDepthAnything output) instead of sparse COLMAP points
    # (reference Config.use_precomputed_depths :178 + dense disparity-L1
    # branch simple_trainer.py:851-869). Falls back to sparse per image
    # when no map exists.
    use_precomputed_depths: bool = False
    # self-supervised depth-normal regularizers for 3DGS (reference
    # Config.depth_normal_loss :227 → add_simplified_depth_normal_loss,
    # utils.py:1741-1808: edge-aware depth smoothness + TV of
    # depth-derived normals, gated past a warmup step)
    depth_normal_loss: bool = False
    depth_normal_start_step: int = 1000
    lambda_depth_smooth: float = 0.1
    lambda_normal_consistency: float = 0.01
    # monocular normal-map supervision (reference Config.load_normals :223,
    # normals/ dir per image; progressive cosine loss on per-gaussian
    # differentiable normals vs map samples, simple_trainer.py:792-848)
    load_normals: bool = False
    start_normal_loss_step: int = 5000
    mono_normal_lambda: float = 0.1
    # save depth + depth-normal visualizations during training at tb_every
    # cadence (reference Config.save_depth_normal_vis :234; PNGs land in
    # {result_dir}/vis/). Needs a depth-producing render mode (any of
    # depth_loss / depth_normal_loss)
    save_depth_normal_vis: bool = False
    opacity_reg: float = 0.0
    scale_reg: float = 0.0

    # learning rates (reference create_splats_with_optimizers:339-355)
    means_lr: float = 1.6e-4
    scales_lr: float = 5e-3
    quats_lr: float = 1e-3
    opacities_lr: float = 5e-2
    sh0_lr: float = 2.5e-3
    shN_lr: float = 2.5e-3 / 20.0

    # strategy
    strategy: Union[DefaultStrategy, MCMCStrategy] = field(
        default_factory=DefaultStrategy
    )
    # static gaussian capacity; None → MCMC cap_max or 4x initial count
    capacity: Optional[int] = None
    # host re-jit capacity growth (DefaultStrategy only; the reference's
    # DefaultStrategy grows N unboundedly, strategy/default.py:262-309).
    # When set, capacity doubles — one recompile at the new static shape —
    # whenever alive gaussians exceed capacity_growth_at of the current
    # capacity, up to max_capacity. None = fixed capacity.
    max_capacity: Optional[int] = None
    capacity_growth_at: float = 0.85

    # post-training compression stage (reference --compression png →
    # Runner.run_compression, simple_trainer.py:1464-1478)
    compression: Optional[str] = None
    # camera-trajectory video after training (reference render_traj_path /
    # disable_video; path type: interp | ellipse | spiral)
    render_traj_path: str = "interp"
    disable_video: bool = False
    # extra scene-scale multiplier (reference global_scale)
    global_scale: float = 1.0
    # visibility-masked (selective) Adam. The reference gates this behind
    # --visible_adam (default off, CUDA op); on TPU the mask is a free
    # jnp.where, so it defaults ON here. Set False for plain Adam.
    visible_adam: bool = True
    # save eval renders next to the stats JSONs (reference tb_save_image)
    tb_save_image: bool = False
    # checkpoint container: "pickle" (single host file, the pipeline
    # tools read it) or "orbax" (async multi-host-safe TPU idiom; saves
    # sharded arrays without a host gather, restores into ckpt_{step}/
    # directories)
    ckpt_format: str = "pickle"
    # multi-device gaussian-sharded training (the reference's distributed
    # mode, gsplat/rendering.py:360-611 + distributed.py, re-done as one
    # shard_map over a 1-D device mesh — tdgs/parallel/sharded_render.py).
    # Requires batch_size % n_devices == 0 and capacity % n_devices == 0;
    # eval/render paths fall back to replicated single-program rendering.
    sharded: bool = False
    # NOT ported: reference Config.dash_gaussian is dead code (its
    # dash_scheduler is never constructed anywhere in the reference),
    # and use_fused_bilagrid imports an external package.

    # pose optimization (reference CameraOptModule)
    pose_opt: bool = False
    pose_opt_lr: float = 1e-5
    pose_opt_reg: float = 1e-6
    # appearance optimization (reference simple_trainer.py:161-167):
    # per-image embedding + MLP over per-gaussian features instead of SH
    app_opt: bool = False
    app_embed_dim: int = 16
    app_opt_lr: float = 1e-3
    app_opt_reg: float = 1e-6
    feature_dim: int = 32
    pose_noise: float = 0.0

    # native decode-ahead data loading (counterpart of DataLoader workers)
    data_prefetch: bool = True

    # identity-vector segmentation (fork extension, simple_trainer.py:198-220)
    with_segmentation: bool = False
    # load masks/instance_ids_npy/*_instance_id.npy (reference
    # Config.load_instance_masks :210). None = follow with_segmentation
    load_instance_masks: Optional[bool] = None
    identity_dim: int = 16
    identity_lr: float = 1.6e-3
    seg_start_iter: int = 1000
    seg_loss_every: int = 50
    seg_loss_weight: float = 0.3
    seg_spatial_every: int = 500
    seg_spatial_weight: float = 0.1
    # CGC hyperparameters (reference Config.cgc_* :215-219): minimum mask
    # cluster size for the contrastive loss; kNN pull/push structure of
    # the spatial regularizer
    cgc_min_cluster: int = 30
    cgc_k_near: int = 2
    cgc_k_far: int = 5
    cgc_lambda_near: float = 0.05
    cgc_lambda_far: float = 0.15

    # live viewer (reference simple_trainer.py:690,1286 — the HTTP orbit
    # viewer attached to the training loop via a lock; default off for
    # headless/CI runs)
    disable_viewer: bool = True
    viewer_port: int = 8080

    # misc
    seed: int = 42
    tb_every: int = 100
    use_bilateral_grid: bool = False
    bilateral_grid_shape: Tuple[int, int, int] = (16, 16, 8)
    lpips_net: str = "alex"

    def adjusted(self) -> "Config":
        """Scale all step-based schedules by steps_scaler
        (reference adjust_steps, simple_trainer.py:237-255)."""
        s = self.steps_scaler
        if s == 1.0:
            return self
        strat = self.strategy
        strat = dataclasses.replace(
            strat,
            refine_start_iter=int(strat.refine_start_iter * s),
            refine_stop_iter=int(strat.refine_stop_iter * s),
            refine_every=max(1, int(strat.refine_every * s)),
            **(
                {"reset_every": max(1, int(strat.reset_every * s))}
                if isinstance(strat, DefaultStrategy)
                else {}
            ),
        )
        return dataclasses.replace(
            self,
            max_steps=int(self.max_steps * s),
            eval_steps=[int(x * s) for x in self.eval_steps],
            save_steps=[int(x * s) for x in self.save_steps],
            ply_steps=[int(x * s) for x in self.ply_steps],
            sh_degree_interval=int(self.sh_degree_interval * s),
            strategy=strat,
            steps_scaler=1.0,
        )
