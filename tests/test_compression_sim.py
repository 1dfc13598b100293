"""Training-time compression simulation tests (model: reference
P9-P12 behavior — STE quantization, factorized entropy bits, ada mask)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.compression_sim import (
    fake_quantize_ste,
    log_transform,
    inverse_log_transform,
    init_factorized,
    factorized_bits,
    CompressionSimulation,
)
from gscodec_studio_tpu.compression_sim.ada_mask import (
    annealing_mask_apply,
    annealing_mask_sparsity_loss,
    annealing_temperature,
)


def test_fake_quantize_round_ste(rng):
    x = jnp.asarray(rng.standard_normal(1000).astype(np.float32) * 3)
    xq, q = fake_quantize_ste(x, -10.0, 2.0, 8)
    # values land on the quantization grid
    levels = (np.asarray(xq) - (-10.0)) / q
    np.testing.assert_allclose(levels, np.round(levels), atol=1e-3)
    # straight-through gradient is identity (within bounds)
    g = jax.grad(lambda x: jnp.sum(fake_quantize_ste(x, -10.0, 2.0, 8)[0] ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(xq), atol=1e-4)


def test_log_transform_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal(100).astype(np.float32) * 10)
    np.testing.assert_allclose(
        inverse_log_transform(log_transform(x)), x, rtol=1e-5, atol=1e-5
    )


def test_factorized_entropy_model_learns(rng):
    """Bits under the model decrease as it fits the data distribution."""
    import optax

    key = jax.random.PRNGKey(0)
    params = init_factorized(key, channel=3)
    data = jnp.asarray(
        np.round(rng.standard_normal((2000, 3)) * 4).astype(np.float32)
    )
    tx = optax.adam(5e-3)
    st = tx.init(params)

    def loss(p):
        return jnp.mean(factorized_bits(p, data, 1.0))

    l0 = float(loss(params))
    step = jax.jit(
        lambda p, s: (lambda g: tx.update(g, s, p))(jax.grad(loss)(p))
    )
    for _ in range(200):
        upd, st = step(params, st)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, upd)
    l1 = float(loss(params))
    assert l1 < l0 - 0.3, (l0, l1)
    # sanity: likelihoods are proper (bits > 0)
    assert l1 > 0


def test_annealing_mask(rng):
    logits = jnp.asarray(rng.standard_normal(50).astype(np.float32))
    x = jnp.ones((50, 8, 3))
    t_early = float(annealing_temperature(0))
    t_late = float(annealing_temperature(30_000))
    assert t_early == pytest.approx(5.0)
    assert t_late == pytest.approx(0.1, rel=0.01)
    soft = annealing_mask_apply(logits, x, 15_000)
    hard = annealing_mask_apply(logits, x, 15_000, training=False)
    assert set(np.unique(np.asarray(hard))) <= {0.0, 1.0}
    loss = annealing_mask_sparsity_loss(logits, 15_000)
    assert np.isfinite(float(loss))


def test_simulation_end_to_end(rng):
    sim = CompressionSimulation(
        entropy_model_opt=True, shN_ada_mask_opt=True, cap=64, max_steps=1000,
        ada_mask_start=10,
    )
    sim_params = sim.init_params(jax.random.PRNGKey(0))
    splats = {
        "means": jnp.asarray(rng.standard_normal((64, 3)).astype(np.float32)),
        "scales": jnp.asarray(-rng.random((64, 3)).astype(np.float32) * 5),
        "quats": jnp.asarray(rng.standard_normal((64, 4)).astype(np.float32)),
        "opacities": jnp.asarray(rng.standard_normal(64).astype(np.float32)),
        "sh0": jnp.asarray(rng.standard_normal((64, 1, 3)).astype(np.float32)),
        "shN": jnp.asarray(rng.standard_normal((64, 8, 3)).astype(np.float32)),
    }
    new, bits, aux = jax.jit(sim.simulate)(
        splats, sim_params, jnp.asarray(20_000), jax.random.PRNGKey(1)
    )
    assert float(bits) > 0  # entropy terms active past their start steps
    assert float(aux) > 0  # mask sparsity loss active
    assert new["means"] is splats["means"] or np.allclose(
        np.asarray(new["means"]), np.asarray(splats["means"])
    )
    # quantized attrs are on-grid
    q = (2.0 - (-10.0)) / 255
    lv = (np.asarray(new["scales"]) + 10.0) / q
    np.testing.assert_allclose(lv, np.round(lv), atol=1e-3)
    # gradients flow into sim params
    g = jax.grad(
        lambda sp: sim.simulate(splats, sp, jnp.asarray(20_000),
                                jax.random.PRNGKey(1))[1]
    )(sim_params)
    total = sum(
        float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g["entropy"])
    )
    assert total > 0


def test_hash_grid_encoder(rng):
    from gscodec_studio_tpu.compression_sim.hash_grid import (
        hash_grid_init, hash_grid_encode,
    )

    tables, cfg = hash_grid_init(jax.random.PRNGKey(0), n_levels=4)
    x = jnp.asarray(rng.random((100, 3)).astype(np.float32))
    out = hash_grid_encode(tables, cfg, x)
    assert out.shape == (100, 8)
    # continuity: nearby points get nearby features
    x2 = x + 1e-4
    out2 = hash_grid_encode(tables, cfg, x2)
    assert float(jnp.abs(out - out2).max()) < 1e-3
    # binarized mode stays finite and differentiable
    g = jax.grad(
        lambda t: jnp.sum(hash_grid_encode(t, cfg, x, binarize=True) ** 2)
    )(tables)
    assert np.isfinite(np.asarray(g)).all()


def test_gaussian_conditional_model_learns(rng):
    """The position-conditioned entropy model reduces bits on spatially
    structured data (the point of the hash-grid conditioning)."""
    import optax
    from gscodec_studio_tpu.compression_sim.hash_grid import (
        gaussian_conditional_init, gaussian_conditional_bits,
    )

    pos = jnp.asarray(rng.random((2000, 3)).astype(np.float32))
    # values strongly correlated with position
    vals = jnp.asarray(
        np.round(8 * np.sin(12 * np.asarray(pos[:, :1])) + rng.standard_normal((2000, 1)) * 0.3)
    ).astype(jnp.float32)
    params, cfgs = gaussian_conditional_init(jax.random.PRNGKey(0), channel=1,
                                             n_levels_3d=6, n_levels_2d=2)
    tx = optax.adam(2e-3)
    st = tx.init(params)

    def loss(p):
        return jnp.mean(gaussian_conditional_bits(p, cfgs, vals, pos, 1.0))

    l0 = float(loss(params))

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        upd, s = tx.update(g, s, p)
        return optax.apply_updates(p, upd), s

    for _ in range(150):
        params, st = step(params, st)
    l1 = float(loss(params))
    assert l1 < l0 - 0.5, (l0, l1)


def test_simulation_gaussian_model(rng):
    sim = CompressionSimulation(
        entropy_model_opt=True, cap=128, entropy_model_type="gaussian_model",
        gaussian_sample=64,
    )
    sim_params = sim.init_params(jax.random.PRNGKey(0))
    splats = {
        "means": jnp.asarray(rng.standard_normal((128, 3)).astype(np.float32)),
        "scales": jnp.asarray(-rng.random((128, 3)).astype(np.float32) * 5),
        "quats": jnp.asarray(rng.standard_normal((128, 4)).astype(np.float32)),
        "opacities": jnp.asarray(rng.standard_normal(128).astype(np.float32)),
        "sh0": jnp.asarray(rng.standard_normal((128, 1, 3)).astype(np.float32)),
        "shN": jnp.asarray(rng.standard_normal((128, 8, 3)).astype(np.float32)),
    }
    new, bits, aux = sim.simulate(
        splats, sim_params, jnp.asarray(25_000), jax.random.PRNGKey(1)
    )
    assert float(bits) > 0
    g = jax.grad(
        lambda sp: sim.simulate(splats, sp, jnp.asarray(25_000),
                                jax.random.PRNGKey(1))[1]
    )(sim_params)
    total = sum(
        float(jnp.sum(jnp.abs(l)))
        for l in jax.tree_util.tree_leaves(g["entropy"])
    )
    assert total > 0
