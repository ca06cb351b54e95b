import numpy as np
import jax
import jax.numpy as jnp

from tdgs.models import gaussians as G
from tdgs.ops import adam as A
from tdgs.ops.relocation import compute_relocation, make_binoms
from tdgs.strategy import MCMCStrategy, DefaultStrategy
from tdgs.strategy.ops import inject_noise_to_position, refine_mcmc, zero_opt_rows


def relocation_bruteforce(op, scale, n):
    """CUDA kernel semantics (RelocationCUDA.cu:26-43), python loops."""
    new_op = 1.0 - (1.0 - op) ** (1.0 / n)
    denom = 0.0
    import math

    for i in range(1, n + 1):
        for k in range(i):
            denom += math.comb(i - 1, k) * ((-1) ** k / np.sqrt(k + 1)) * new_op ** (
                k + 1
            )
    return new_op, (op / denom) * scale


def test_compute_relocation_matches_bruteforce():
    rng = np.random.default_rng(50)
    N = 16
    ops = rng.uniform(0.01, 0.99, N).astype(np.float32)
    scales = rng.uniform(0.01, 1.0, (N, 3)).astype(np.float32)
    ratios = rng.integers(1, 8, N).astype(np.int32)
    binoms = make_binoms()
    new_op, new_sc = compute_relocation(
        jnp.asarray(ops), jnp.asarray(scales), jnp.asarray(ratios), binoms
    )
    for i in range(N):
        wo, ws = relocation_bruteforce(float(ops[i]), scales[i], int(ratios[i]))
        np.testing.assert_allclose(float(new_op[i]), wo, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(new_sc[i]), ws, rtol=5e-3)


def make_params(key, n_alive, cap):
    pts = jax.random.normal(key, (n_alive, 3))
    params = G.create_splats(pts, None, key, sh_degree=1, n_max=cap)
    return params


def test_refine_mcmc_relocates_and_grows():
    key = jax.random.PRNGKey(0)
    cap, n0 = 64, 32
    params = make_params(key, n0, cap)
    # kill 5 of the first 32
    params["opacities"] = params["opacities"].at[:5].set(-8.0)
    tx = A.selective_adam(1e-2)
    opt_state = tx.init(params)
    # dirty the moments so zeroing is observable
    opt_state = opt_state._replace(
        exp_avg=jax.tree.map(lambda x: x + 1.0, opt_state.exp_avg)
    )

    n_target = 40
    new_params, new_opt, n_reloc = refine_mcmc(
        params, opt_state, key, jnp.int32(n0), jnp.int32(n_target), make_binoms()
    )
    assert int(n_reloc) == 5
    op = np.asarray(jax.nn.sigmoid(new_params["opacities"]))
    # relocated + grown slots are now alive
    assert (op[:n_target] > 0.005).all()
    # beyond target still dead
    assert (op[n_target:] < 0.005).all()
    # relocated means coincide with some alive gaussian's mean
    means = np.asarray(new_params["means"])
    old_means = np.asarray(params["means"][5:n0])
    for i in list(range(5)) + list(range(n0, n_target)):
        d = np.abs(old_means - means[i]).sum(-1).min()
        assert d < 1e-5, i
    # moments of touched rows zeroed
    ea = np.asarray(new_opt.exp_avg["means"])
    assert (ea[:5] == 0).all()
    assert (ea[n0:n_target] == 0).all()


def test_inject_noise_moves_low_opacity_more():
    key = jax.random.PRNGKey(1)
    cap = 32
    params = make_params(key, cap, cap)
    # gate σ(100·((1−op)−0.995)): live gaussians frozen, near-dead ones noisy
    params["opacities"] = params["opacities"].at[:16].set(6.0)  # op≈1 → frozen
    params["opacities"] = params["opacities"].at[16:].set(-8.0)  # op≈3e-4 → noisy
    out = inject_noise_to_position(params, key, jnp.float32(1.0))
    delta = np.abs(np.asarray(out["means"]) - np.asarray(params["means"])).sum(-1)
    assert delta[:16].max() < 1e-4
    assert delta[16:].min() > 1e-5


def test_mcmc_strategy_end_to_end_steps():
    key = jax.random.PRNGKey(2)
    cap, n0 = 64, 20
    params = make_params(key, n0, cap)
    strat = MCMCStrategy(cap_max=cap, refine_start_iter=0, refine_every=2,
                         noise_lr=1e2)
    tx = A.selective_adam(1e-2)
    opt_state = tx.init(params)
    state = strat.initialize_state(params)
    assert state["n_alive"] == n0
    for step in range(1, 7):
        params, opt_state, state = strat.step_post_backward(
            params, opt_state, state, step, {}, jax.random.fold_in(key, step),
            lr=1e-4,
        )
    assert state["n_alive"] == 23  # 20 → 21 → 22 → 23 over 3 refines
    op = np.asarray(jax.nn.sigmoid(params["opacities"]))
    assert (op[: state["n_alive"]] > 0.005).all()


def test_selective_adam_masks_updates():
    params = {"x": jnp.ones((8, 3))}
    grads = {"x": jnp.ones((8, 3))}
    tx = A.selective_adam(0.1)
    st = tx.init(params)
    vis = jnp.array([True] * 4 + [False] * 4)
    upd, st2 = tx.update(grads, st, params, visibility=vis)
    u = np.asarray(upd["x"])
    assert (u[:4] != 0).all()
    assert (u[4:] == 0).all()
    m = np.asarray(st2.exp_avg["x"])
    assert (m[:4] != 0).all() and (m[4:] == 0).all()


def test_default_strategy_grow_prune():
    key = jax.random.PRNGKey(3)
    cap, n0 = 64, 16
    params = make_params(key, n0, cap)
    # make gaussian 0 small (dup candidate), gaussian 1 huge (split candidate)
    params["scales"] = params["scales"].at[0].set(jnp.log(0.001))
    params["scales"] = params["scales"].at[1].set(jnp.log(5.0))
    strat = DefaultStrategy(refine_start_iter=0, refine_every=1, verbose=False)
    tx = A.selective_adam(1e-2)
    opt_state = tx.init(params)
    state = strat.initialize_state(params, scene_scale=1.0)

    info = {
        "radii": jnp.ones((1, cap, 2), jnp.int32)
        * jnp.asarray((jnp.arange(cap) < n0)[None, :, None], jnp.int32),
        "width": 64,
        "height": 64,
    }
    # big screen grads for slots 0 and 1 only
    v_means2d = jnp.zeros((1, cap, 2)).at[0, :2, :].set(0.5)
    state = strat.update_state(state, info, v_means2d)
    g = np.asarray(state["grad2d"])
    assert g[0] > 0 and g[1] > 0 and (g[2:] == 0).all()

    n_before = int((np.asarray(jax.nn.sigmoid(params["opacities"])) > 0.005).sum())
    params2, opt2, state2 = strat.step_post_backward(
        params, opt_state, state, 1, info, key
    )
    n_after = int((np.asarray(jax.nn.sigmoid(params2["opacities"])) > 0.005).sum())
    assert n_after == n_before + 2  # one dup + one split child into free slots
    # split parent got resampled mean and shrunk scale
    assert float(params2["scales"][1].max()) < float(params["scales"][1].max())
    # state reset after refine
    assert float(state2["grad2d"].sum()) == 0.0


def test_zero_opt_rows():
    st = {"m": jnp.ones((8, 3)), "c": jnp.ones(()), "i": jnp.ones((8,), jnp.int32)}
    mask = jnp.array([True] * 4 + [False] * 4)
    out = zero_opt_rows(st, mask)
    assert (np.asarray(out["m"])[:4] == 0).all()
    assert (np.asarray(out["m"])[4:] == 1).all()
    assert float(out["c"]) == 1.0
    assert (np.asarray(out["i"]) == 1).all()  # int leaves untouched
