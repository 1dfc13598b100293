"""Strategy tests (model: reference tests/test_strategy.py — run the
callbacks end-to-end and assert shape/consistency invariants; here also that
everything stays static-shape and jit-compatible)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.models.splats import (
    create_splats,
    DEAD_OPACITY_LOGIT,
)
from gscodec_studio_tpu.optimizers import build_splat_optimizers
from gscodec_studio_tpu.optimizers.builders import apply_updates
from gscodec_studio_tpu.strategy import DefaultStrategy, MCMCStrategy
from gscodec_studio_tpu.strategy import ops as sops


@pytest.fixture
def splats(rng):
    pts = rng.random((200, 3)).astype(np.float32) * 2 - 1
    rgb = rng.random((200, 3)).astype(np.float32)
    return create_splats(pts, rgb, cap=512, sh_degree=2)


def test_create_splats_shapes(splats):
    assert splats["means"].shape == (512, 3)
    assert splats["sh0"].shape == (512, 1, 3)
    assert splats["shN"].shape == (512, 8, 3)
    op = jax.nn.sigmoid(splats["opacities"])
    assert int(jnp.sum(op > 0.005)) == 200  # live slots
    np.testing.assert_allclose(
        np.asarray(splats["opacities"][200:]), DEAD_OPACITY_LOGIT
    )


def test_allocate_slots():
    free = jnp.asarray([True, False, True, False, True, False])
    want = jnp.asarray([False, True, False, True, False, True])
    dst, ok = sops.allocate_slots(free, want)
    assert list(np.asarray(ok)) == [False, True, False, True, False, True]
    assert np.asarray(dst)[1] == 0 and np.asarray(dst)[3] == 2
    assert np.asarray(dst)[5] == 4

    # More wants than free slots: excess dropped.
    want2 = jnp.ones(6, bool)
    dst2, ok2 = sops.allocate_slots(free, want2)
    assert int(jnp.sum(ok2)) == 3


def test_default_strategy_refine_jits(splats, rng):
    strat = DefaultStrategy()
    cap = splats["means"].shape[0]
    txs, opt_states = build_splat_optimizers(splats)
    state = strat.initialize_state(cap, scene_scale=1.0)
    # Fake accumulated gradients: big grads on first 50 live gaussians.
    state["grad2d"] = state["grad2d"].at[:50].set(1.0)
    state["count"] = state["count"].at[:200].set(1.0)

    refine = jax.jit(
        lambda p, o, s, k: strat.refine(p, o, s, 1000, k), static_argnums=()
    )
    params2, opt2, state2 = refine(
        splats, opt_states, state, jax.random.PRNGKey(0)
    )
    assert params2["means"].shape == splats["means"].shape
    n_live_before = int(jnp.sum(jax.nn.sigmoid(splats["opacities"]) > 0.005))
    n_live_after = int(jnp.sum(jax.nn.sigmoid(params2["opacities"]) > 0.005))
    assert n_live_after > n_live_before  # grew
    # accumulators reset
    assert float(jnp.sum(state2["grad2d"])) == 0.0


def test_default_strategy_prune(splats):
    strat = DefaultStrategy()
    cap = splats["means"].shape[0]
    txs, opt_states = build_splat_optimizers(splats)
    state = strat.initialize_state(cap, scene_scale=1.0)
    # Make some live slots nearly transparent -> should be pruned.
    params = dict(splats)
    params["opacities"] = params["opacities"].at[:20].set(-8.0)  # sigmoid ~3e-4
    p2, o2, s2 = strat.refine(params, opt_states, state, 4000, jax.random.PRNGKey(0))
    assert np.all(np.asarray(p2["opacities"][:20]) == DEAD_OPACITY_LOGIT)


def test_mcmc_strategy_refine(splats):
    strat = MCMCStrategy(cap_max=512)
    cap = splats["means"].shape[0]
    txs, opt_states = build_splat_optimizers(splats)
    state = strat.initialize_state(cap, scene_scale=1.0, n_init=200)

    p, o, s = splats, opt_states, state
    for i in range(3):
        p, o, s = jax.jit(
            lambda p, o, s, k: strat.refine(p, o, s, 1000, k)
        )(p, o, s, jax.random.PRNGKey(i))
    n_alloc = int(jnp.sum(s["allocated"]))
    # grew ~5% per refine: 200 -> 210 -> 221 -> 233
    assert 225 <= n_alloc <= 240
    # all allocated slots are live after relocation
    op = jax.nn.sigmoid(p["opacities"])
    assert float(jnp.min(jnp.where(s["allocated"], op, 1.0))) > 0.004


def test_relocation_never_births_dead(splats):
    """Reference parity (gsplat/strategy/ops.py:294): the split opacity
    1-(1-o)^(1/n) of a source NEAR the death threshold falls below it —
    the clamp at min_opacity must keep every relocated slot alive, or the
    pair is re-relocated every refine (round 4's churn signature)."""
    from gscodec_studio_tpu.strategy.ops import relocate_dead

    cap = splats["means"].shape[0]
    # all live sources barely above the threshold: op ~ 0.006
    logit = float(np.log(0.006 / (1 - 0.006)))
    params = dict(splats)
    params["opacities"] = jnp.full((cap,), logit, jnp.float32)
    dead = jnp.arange(cap) >= cap // 2  # relocate half onto the rest
    _, opt_states = build_splat_optimizers(splats)
    out, _ = relocate_dead(
        params, opt_states, jax.random.PRNGKey(0), dead, 0.005,
    )
    op = np.asarray(jax.nn.sigmoid(out["opacities"]))
    # every touched slot (sources and clones) is alive
    assert op.min() >= 0.005 - 1e-6, op.min()


def test_mcmc_noise_injection(splats):
    strat = MCMCStrategy()
    p2 = strat.inject_noise(splats, jax.random.PRNGKey(0), lr=1e-4)
    moved = np.abs(np.asarray(p2["means"] - splats["means"])).sum(axis=-1)
    op = np.asarray(jax.nn.sigmoid(splats["opacities"]))
    assert moved[op > 0.005].mean() > 0  # live ones move
    assert np.allclose(moved[op <= 0.005], 0)  # dead ones don't


def test_optimizer_step_and_surgery(splats, rng):
    txs, states = build_splat_optimizers(splats)
    grads = jax.tree_util.tree_map(jnp.ones_like, splats)
    p2, s2 = apply_updates(txs, states, splats, grads)
    assert not np.allclose(np.asarray(p2["means"]), np.asarray(splats["means"]))
    # Surgery: zeroing momenta on a mask leaves shapes intact.
    kill = jnp.zeros(512, bool).at[:10].set(True)
    p3, s3 = sops.remove_slots(p2, s2, kill)
    mu = s3["means"][0].mu
    assert np.allclose(np.asarray(mu[:10]), 0.0)
    assert not np.allclose(np.asarray(mu[10:20]), 0.0)


def test_selective_adam_masks_updates(splats):
    txs, states = build_splat_optimizers(splats, visible_adam=True)
    grads = jax.tree_util.tree_map(jnp.ones_like, splats)
    vis = jnp.zeros(512).at[:100].set(1.0)
    p2, s2 = apply_updates(
        txs, states, splats, grads, visibility=vis, visible_adam=True
    )
    d = np.abs(np.asarray(p2["means"] - splats["means"])).sum(-1)
    assert d[:100].min() > 0
    assert np.allclose(d[100:], 0)


def test_modified_stg_differs_from_stg():
    """Modified_STG vs STG (reference modified_stg.py vs STG_Strategy.py):
    (1) Modified gates densification stats by the temporal-visibility mask;
    (2) Modified never freezes omega/rotation grads, STG does post-freeze
    with the accumulated _zero_omegabymotion keep rule."""
    from gscodec_studio_tpu.strategy.stg import (
        STGStrategy, ModifiedSTGStrategy,
    )

    n = 64
    rng = np.random.default_rng(0)
    stg = STGStrategy()
    mod = ModifiedSTGStrategy()
    params = {
        "means": jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32)),
        "scales": jnp.asarray(
            np.log(0.3) * np.ones((n, 3), np.float32)  # mid-scale band
        ),
        "opacities": jnp.full((n,), 3.0, jnp.float32),  # sigmoid ~0.95
        "motion": jnp.zeros((n, 9), jnp.float32).at[: n // 2, 0].set(1.0),
        "omega": jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32)),
        "quats": jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32)),
    }

    # (1) temporal-visibility-aware stats
    info = {
        "width": 64, "height": 48, "n_cameras": 1,
        "radii": jnp.full((1, n), 5, jnp.int32),
        "t_vis_mask": jnp.arange(n) < n // 4,  # only first quarter visible
    }
    v = jnp.ones((1, n, 2), jnp.float32)
    s_stg = stg.update_state(stg.initialize_state(n, 1.0), info, v)
    s_mod = mod.update_state(mod.initialize_state(n, 1.0), info, v)
    assert np.asarray(s_stg["count"]).sum() == n  # plain STG counts all
    assert np.asarray(s_mod["count"]).sum() == n // 4  # Modified gates
    assert np.asarray(s_mod["grad2d"])[n // 4 :].sum() == 0.0

    # (2) omega freeze: STG masks omega grads of low-motion splats and
    # rotation grads of kept ones after freeze_start; Modified never does
    grads = {
        "omega": jnp.ones((n, 4), jnp.float32),
        "quats": jnp.ones((n, 4), jnp.float32),
    }
    keep = np.asarray(stg.compute_omega_mask(params))
    assert keep[: n // 2].all() and not keep[n // 2 :].any()
    g_stg = stg.mask_gradients(params, grads, stg.freeze_start_iter + 1)
    g_mod = mod.mask_gradients(params, grads, stg.freeze_start_iter + 1)
    assert np.allclose(np.asarray(g_stg["omega"])[n // 2 :], 0.0)
    assert np.asarray(g_stg["omega"])[: n // 2].all()
    assert np.allclose(np.asarray(g_stg["quats"])[: n // 2], 0.0)
    assert np.asarray(g_mod["omega"]).all()
    assert np.asarray(g_mod["quats"]).all()
    # before the freeze boundary STG leaves everything live too
    g_pre = stg.mask_gradients(params, grads, 100)
    assert np.asarray(g_pre["omega"]).all()
