"""STG strategy + HEVC-fallback codec tests."""

import numpy as np
import jax
import jax.numpy as jnp

from gscodec_studio_tpu.models.temporal import create_dyn_splats
from gscodec_studio_tpu.strategy.stg import STGStrategy
from gscodec_studio_tpu.optimizers import build_splat_optimizers


def test_stg_strategy_runs(rng):
    pts = rng.random((100, 3)).astype(np.float32)
    splats = create_dyn_splats(pts, cap=256)
    strat = STGStrategy()
    import optax

    txs = {k: optax.adam(1e-3) for k in splats}
    opt_states = {k: txs[k].init(v) for k, v in splats.items()}
    state = strat.initialize_state(256, 1.0)
    state["grad2d"] = state["grad2d"].at[:30].set(1.0)
    state["count"] = state["count"].at[:100].set(1.0)
    p2, o2, s2 = jax.jit(lambda *a: strat.refine(*a))(
        splats, opt_states, state, jnp.asarray(1000), jax.random.PRNGKey(0)
    )
    assert int(s2["densify_count"].sum()) > 0
    # budget exhausts: after desicnt refines the same splats stop densifying
    s2 = dict(s2)
    s2["densify_count"] = jnp.full(256, strat.desicnt)
    s2["grad2d"] = s2["grad2d"].at[:30].set(1.0)
    s2["count"] = s2["count"].at[:100].set(1.0)
    n_before = int(jnp.sum(jax.nn.sigmoid(p2["opacities"]) > 0.005))
    p3, o3, s3 = strat.refine(p2, o2, s2, jnp.asarray(1100), jax.random.PRNGKey(1))
    n_after = int(jnp.sum(jax.nn.sigmoid(p3["opacities"]) > 0.005))
    assert n_after <= n_before + 1  # no growth once budget exhausted

    # gradient masking after refine_stop
    grads = {k: jnp.ones_like(v) for k, v in p3.items()}
    g2 = strat.mask_gradients(p3, grads, step=jnp.asarray(20_000))
    assert float(jnp.abs(g2["omega"]).sum()) < float(
        jnp.abs(grads["omega"]).sum()
    ) or float(jnp.abs(g2["quats"]).sum()) < float(jnp.abs(grads["quats"]).sum())

    # bounds pruning
    p4 = dict(p3)
    p4["means"] = p4["means"].at[0].set(jnp.asarray([0.0, 0.0, 100.0]))
    p4["opacities"] = p4["opacities"].at[0].set(3.0)
    p5, _ = strat.prune_bounds(p4, o3)
    assert float(jax.nn.sigmoid(p5["opacities"][0])) < 0.005


def test_hevc_fallback_roundtrip(rng, tmp_path):
    from gscodec_studio_tpu.compression.hevc_compression import HevcCompression

    n = 1600
    splats = {
        "means": (rng.standard_normal((n, 3)) * 2).astype(np.float32),
        "scales": (-5 + rng.random((n, 3))).astype(np.float32),
        "quats": rng.standard_normal((n, 4)).astype(np.float32),
        "opacities": (3 * rng.random(n)).astype(np.float32),
        "sh0": rng.standard_normal((n, 1, 3)).astype(np.float32),
        "shN": (0.05 * rng.standard_normal((n, 8, 3))).astype(np.float32),
    }
    codec = HevcCompression(kmeans_iters=2, shn_clusters=128)
    d = str(tmp_path / "hevc")
    codec.compress(d, splats)
    out = codec.decompress(d)
    assert out["means"].shape == (40 * 40, 3)
    assert out["quats"].shape == (1600, 4)
