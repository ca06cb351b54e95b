"""Strategy primitives: masked, fixed-capacity param/optimizer surgery.

Replaces gsplat/strategy/ops.py (duplicate/split/remove/reset_opa/relocate/
sample_add/inject_noise_to_position + _update_param_with_optimizer). Every
op here is a pure jnp function over the full-capacity arrays — scatters and
masks instead of concatenation/indexed rebuilds, so shapes stay static and
everything jits.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tdgs.models.gaussians import DEAD_OPACITY_LOGIT, SplatParams
from tdgs.ops.relocation import compute_relocation
from tdgs.ops.transforms import quat_scale_to_covar_preci

_EPS = jnp.finfo(jnp.float32).eps


def zero_opt_rows(opt_state: Any, mask: jnp.ndarray) -> Any:
    """Zero optimizer-moment rows where mask is True.

    Applies to every array leaf whose leading dim equals the capacity
    (the reference's optimizer_fn convention, strategy/ops.py:47-90).
    Integer leaves (step counters) are left untouched.
    """
    C = mask.shape[0]

    def f(leaf):
        if isinstance(leaf, jnp.ndarray) and leaf.ndim >= 1 and leaf.shape[0] == C \
                and jnp.issubdtype(leaf.dtype, jnp.floating):
            m = mask.reshape((C,) + (1,) * (leaf.ndim - 1))
            return jnp.where(m, 0.0, leaf)
        return leaf

    return jax.tree.map(f, opt_state)


def pad_rows(tree: Any, old_capacity: int, new_capacity: int) -> Any:
    """Pad every array leaf whose leading dim equals ``old_capacity`` with
    zero rows up to ``new_capacity`` (host re-jit capacity growth: new rows
    are dead slots, so zero optimizer moments / strategy accumulators are
    exactly what a freshly granted slot gets from zero_opt_rows anyway)."""
    pad = new_capacity - old_capacity
    assert pad >= 0

    def f(leaf):
        if isinstance(leaf, jnp.ndarray) and leaf.ndim >= 1 \
                and leaf.shape[0] == old_capacity:
            return jnp.pad(leaf, [(0, pad)] + [(0, 0)] * (leaf.ndim - 1))
        return leaf

    return jax.tree.map(f, tree)


def _logit(x):
    return jnp.log(x) - jnp.log1p(-x)


def refine_mcmc(
    params: SplatParams,
    opt_state: Any,
    key: jax.Array,
    n_before: jnp.ndarray,  # [] int32: active-region size before this refine
    n_target: jnp.ndarray,  # [] int32: active-region size after (≥ n_before)
    binoms: jnp.ndarray,
    min_opacity: float = 0.005,
) -> Tuple[SplatParams, Any, jnp.ndarray]:
    """One MCMC refine at fixed capacity: relocate dead + activate new slots.

    Fuses the reference's ``relocate`` + ``sample_add`` (strategy/ops.py:
    244-341) into one masked pass: every *target* slot (dead within the
    active region, or newly activated in [n_before, n_target)) samples a
    source from the alive set with probability ∝ opacity, takes the source's
    parameters, and both get the Eq.-9 relocation opacity/scale. Optimizer
    moments of touched rows are zeroed.

    Returns (params, opt_state, n_relocated).

    Delta vs the reference: relocation and growth share one sampling pass
    (the reference samples twice, the second time including just-relocated
    gaussians) — same stationary dynamics, half the passes.
    """
    C = params["means"].shape[0]
    op = jax.nn.sigmoid(params["opacities"])
    slots = jnp.arange(C, dtype=jnp.int32)
    in_active = slots < n_before
    dead = in_active & (op <= min_opacity)
    new = (slots >= n_before) & (slots < n_target)
    target = dead | new
    alive = in_active & (op > min_opacity)

    probs = jnp.where(alive, op, 0.0)
    logits = jnp.log(jnp.maximum(probs, _EPS)) + jnp.where(alive, 0.0, -1e9)
    sampled = jax.random.categorical(key, logits, shape=(C,)).astype(jnp.int32)

    # ratios: how many targets chose each source, +1 for the source itself
    cnt = jnp.zeros((C,), jnp.int32).at[sampled].add(target.astype(jnp.int32))
    ratios = cnt[sampled] + 1

    new_op, new_scales = compute_relocation(
        op[sampled], jnp.exp(params["scales"][sampled]), ratios, binoms
    )
    new_op = jnp.clip(new_op, min_opacity, 1.0 - float(_EPS))
    new_op_logit = _logit(new_op)
    new_log_scales = jnp.log(jnp.maximum(new_scales, 1e-12))

    # 1) write relocated opacity/scale into the SOURCE slots
    scatter_idx = jnp.where(target, sampled, C)  # C = dropped
    opacities = params["opacities"].at[scatter_idx].set(new_op_logit, mode="drop")
    scales = params["scales"].at[scatter_idx].set(new_log_scales, mode="drop")
    upd = dict(params, opacities=opacities, scales=scales)

    # 2) targets copy the (post-update) source rows
    out = {}
    tmask = target
    for name, p in upd.items():
        m = tmask.reshape((C,) + (1,) * (p.ndim - 1))
        out[name] = jnp.where(m, p[sampled], p)

    touched = target | (cnt > 0)
    opt_state = zero_opt_rows(opt_state, touched)
    return out, opt_state, jnp.sum(dead)


def inject_noise_to_position(
    params: SplatParams,
    key: jax.Array,
    scaler: jnp.ndarray,
    active_mask: Optional[jnp.ndarray] = None,
) -> SplatParams:
    """MCMC exploration noise: means += Σ · ε · σ(−100·(1−op−0.995)) · scaler
    (reference strategy/ops.py:343-369)."""
    op = jax.nn.sigmoid(params["opacities"])
    covars, _ = quat_scale_to_covar_preci(
        params["quats"], jnp.exp(params["scales"]), compute_preci=False
    )
    # gate = σ(k·((1−op) − x0)) with k=100, x0=0.995: only near-dead
    # gaussians (op ≲ 0.005) receive exploration noise.
    gate = jax.nn.sigmoid(100.0 * ((1.0 - op) - 0.995))
    noise = jax.random.normal(key, params["means"].shape) * gate[:, None] * scaler
    noise = jnp.einsum("nij,nj->ni", covars, noise, precision="highest")
    if active_mask is not None:
        noise = jnp.where(active_mask[:, None], noise, 0.0)
    return dict(params, means=params["means"] + noise)


def grow_and_prune_default(
    params: SplatParams,
    opt_state: Any,
    key: jax.Array,
    grad2d: jnp.ndarray,  # [C] accumulated screen-grad norms
    count: jnp.ndarray,  # [C] visibility counts
    radii_norm: jnp.ndarray,  # [C] max normalized screen radius seen
    scene_scale: float,
    grow_grad2d: float = 0.0002,
    grow_scale3d: float = 0.01,
    grow_scale2d: float = 0.05,
    prune_opa: float = 0.005,
    prune_scale3d: float = 0.1,
    prune_scale2d: float = 0.15,
    use_scale2d: bool = False,
    prune_too_big: bool = False,
    revised_opacity: bool = False,
) -> Tuple[SplatParams, Any, Dict[str, jnp.ndarray]]:
    """One DefaultStrategy refine at fixed capacity (reference
    strategy/default.py:262-339 _grow_gs/_prune_gs and ops.py duplicate/split).

    - duplicate: high screen-grad & small 3D scale → copy into a free slot
    - split: high screen-grad & large scale (or large 2D radius) → two
      children sampled from the parent covariance with scales/1.6; one
      overwrites the parent, one takes a free slot
    - prune: low opacity (or too large when prune_too_big) → deactivate

    Free slots are dead slots; grow requests beyond the free pool are
    dropped by descending gradient priority.
    """
    C = params["means"].shape[0]
    op = jax.nn.sigmoid(params["opacities"])
    # In the fixed-capacity design "opacity below prune_opa" IS the dead
    # state — opacity-pruning is implicit. Only the too-big prune needs an
    # explicit deactivation.
    alive = op > prune_opa
    g_avg = grad2d / jnp.maximum(count, 1.0)

    scale_max = jnp.exp(params["scales"]).max(axis=-1)
    is_grad_high = (g_avg > grow_grad2d) & alive
    is_small = scale_max <= grow_scale3d * scene_scale
    is_dupli = is_grad_high & is_small
    is_split = is_grad_high & ~is_small
    if use_scale2d:
        is_split = is_split | (alive & (radii_norm > grow_scale2d))

    # ---- prune first (frees slots)
    too_big = scale_max > prune_scale3d * scene_scale
    if use_scale2d:
        too_big = too_big | (radii_norm > prune_scale2d)
    prune = (alive & too_big) if prune_too_big else jnp.zeros((C,), bool)
    opacities = jnp.where(prune, DEAD_OPACITY_LOGIT, params["opacities"])
    params = dict(params, opacities=opacities)
    alive = alive & ~prune
    is_dupli = is_dupli & ~prune
    is_split = is_split & ~prune

    # ---- allocate free slots to grow requests by gradient priority
    request = (is_dupli | is_split) & alive
    free = ~alive
    # rank requests: highest gradient first
    req_score = jnp.where(request, g_avg, -jnp.inf)
    req_order = jnp.argsort(-req_score)  # requesting slots first
    free_order = jnp.argsort(jnp.where(free, 0, 1), stable=True)  # free slots first
    n_req = jnp.sum(request)
    n_free = jnp.sum(free)
    n_grant = jnp.minimum(n_req, n_free)

    k = jnp.arange(C)
    src = req_order  # k-th granted request's source slot
    dst = free_order  # k-th free slot
    granted = k < n_grant

    src_is_split = is_split[src]

    # children sampled from parent covariance (ops.py:split:123-180)
    covars, _ = quat_scale_to_covar_preci(
        params["quats"], jnp.exp(params["scales"]), compute_preci=False
    )
    k1, k2 = jax.random.split(key)
    eps1 = jax.random.normal(k1, (C, 3))
    eps2 = jax.random.normal(k2, (C, 3))
    # sample = mean + L·ε with L from covar eigen — use matmul with Σ^{1/2}
    # approximation via R·diag(s): exact for gaussian sampling
    from tdgs.ops.transforms import quat_to_rotmat

    R = quat_to_rotmat(params["quats"])
    L = R * jnp.exp(params["scales"])[:, None, :]
    samp1 = params["means"] + jnp.einsum("nij,nj->ni", L, eps1, precision="highest")
    samp2 = params["means"] + jnp.einsum("nij,nj->ni", L, eps2, precision="highest")
    split_scales = params["scales"] - math.log(1.6)
    if revised_opacity:
        # arXiv:2404.06109: o_new = 1 - sqrt(1 - o)
        new_op_logit = _logit(jnp.clip(1.0 - jnp.sqrt(1.0 - op), 1e-6, 1 - 1e-6))
    else:
        new_op_logit = params["opacities"]

    # Build child A (overwrites source slot when split) and child B (goes to
    # the granted free slot; exact copy when duplicate).
    def mk_child(base: SplatParams, use_sample, which):
        out = {}
        for name, p in base.items():
            v = p
            if name == "means":
                v = jnp.where(use_sample[:, None], which, p)
            elif name == "scales":
                v = jnp.where(use_sample[:, None], split_scales, p)
            elif name == "opacities":
                v = jnp.where(use_sample, new_op_logit, p)
            out[name] = v
        return out

    childA = mk_child(params, is_split, samp1)  # applied in place at split srcs
    childB = mk_child(params, is_split, samp2)  # scattered to free slots
    del src_is_split

    # in-place: split sources get child A
    new_params = {}
    for name in params:
        m = is_split.reshape((C,) + (1,) * (params[name].ndim - 1))
        new_params[name] = jnp.where(m, childA[name], params[name])

    # scatter child B rows (or duplicate copies) into granted free slots
    dst_idx = jnp.where(granted, dst, C)
    for name in new_params:
        rows = childB[name][src]
        new_params[name] = new_params[name].at[dst_idx].set(rows, mode="drop")

    # zero moments of every touched row
    touched_split = is_split
    touched_new = jnp.zeros((C,), bool).at[dst_idx].set(granted, mode="drop")
    opt_state = zero_opt_rows(opt_state, touched_split | touched_new | prune)

    info = {
        "n_dupli": jnp.sum(is_dupli),
        "n_split": jnp.sum(is_split),
        "n_prune": jnp.sum(prune),
        "n_granted": n_grant,
    }
    return new_params, opt_state, info


def reset_opacities(
    params: SplatParams,
    opt_state: Any,
    value: float = 0.01,
) -> Tuple[SplatParams, Any]:
    """Clamp opacities to ≤ value and reset their moments
    (reference ops.py:reset_opa:213-242)."""
    new_logit = jnp.minimum(params["opacities"], _logit(jnp.asarray(value)))
    params = dict(params, opacities=new_logit)
    C = new_logit.shape[0]

    # zero only the opacities moments: mask all rows but restrict by name —
    # moments are stored per-param in pytrees keyed like params, so zero
    # every leaf matching the opacities shape.
    def f(leaf):
        if isinstance(leaf, jnp.ndarray) and leaf.shape == new_logit.shape \
                and jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros_like(leaf)
        return leaf

    opt_state = jax.tree.map(f, opt_state)
    return params, opt_state
