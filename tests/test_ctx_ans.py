"""Gaussian-conditional context rANS: round trip + rate win on
position-structured data (the VERDICT done-criterion for shipping the
conditional entropy model; reference entropy_coding_compression.py:467+)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gscodec_studio_tpu.compression.entropy_coding import (
    _decode_attr_ans,
    _decode_attr_ans_gauss,
    _encode_attr_ans,
    _encode_attr_ans_gauss,
)
from gscodec_studio_tpu.compression_sim.entropy_model import (
    factorized_bits,
    init_factorized,
)
from gscodec_studio_tpu.compression_sim.hash_grid import (
    gaussian_conditional_bits,
    gaussian_conditional_init,
)

LO, HI, BITS = -10.0, 2.0, 8
QSTEP = (HI - LO) / (2**BITS - 1)


def _structured_data(rng, n=4096):
    """Values strongly determined by position — the regime where a
    position-conditional model beats any marginal (factorized) model."""
    pos = rng.random((n, 3)).astype(np.float32)
    base = LO + (HI - LO) * (
        0.5 + 0.4 * np.sin(6.0 * pos[:, 0]) * np.cos(4.0 * pos[:, 1])
    )
    vals = np.stack(
        [base + 0.05 * rng.standard_normal(n) for _ in range(3)], axis=1
    ).astype(np.float32)
    return pos, np.clip(vals, LO, HI)


def _train(loss_fn, params, steps=250, lr=5e-3):
    tx = optax.adam(lr)
    st = tx.init(params)

    @jax.jit
    def step(params, st):
        l, g = jax.value_and_grad(loss_fn)(params)
        upd, st = tx.update(g, st, params)
        return optax.apply_updates(params, upd), st, l

    for _ in range(steps):
        params, st, l = step(params, st)
    return params, float(l)


def test_ctx_ans_roundtrip_and_beats_factorized(rng, tmp_path):
    pos_np, vals = _structured_data(rng)
    pos = jnp.asarray(pos_np)
    x = jnp.asarray(vals)
    # quantize exactly like the encoder so rate estimates match the stream
    xq = jnp.round((x - LO) / QSTEP) * QSTEP + LO

    gparams, gcfgs = gaussian_conditional_init(
        jax.random.PRNGKey(0), channel=3, n_levels_3d=4, n_levels_2d=2,
        mlp_width=32, log2_hashmap_3d=12, log2_hashmap_2d=10,
    )
    gparams, gl = _train(
        lambda p: jnp.mean(
            gaussian_conditional_bits(p, gcfgs, xq, pos, QSTEP,
                                      binarize=True)
        ),
        gparams,
    )
    fparams = init_factorized(jax.random.PRNGKey(1), 3, (3, 3))
    fparams, fl = _train(
        lambda p: jnp.mean(factorized_bits(p, xq, QSTEP)), fparams
    )

    d = str(tmp_path)
    mg = _encode_attr_ans_gauss(
        d, "scales_g", vals, LO, HI, BITS, (gparams, gcfgs), pos_np
    )
    mf = _encode_attr_ans(d, "scales_f", vals, LO, HI, BITS, fparams)

    # exact symbol round trip through the ctx coder
    dec = _decode_attr_ans_gauss(d, "scales_g", mg, pos_np)
    np.testing.assert_allclose(dec, np.asarray(xq), atol=1e-5)
    dec_f = _decode_attr_ans(d, "scales_f", mf)
    np.testing.assert_allclose(dec_f, np.asarray(xq), atol=1e-5)

    size_g = os.path.getsize(os.path.join(d, "scales_g.ans"))
    size_f = os.path.getsize(os.path.join(d, "scales_f.ans"))
    # the conditional stream must beat the marginal stream decisively on
    # position-structured data
    assert size_g < 0.8 * size_f, (size_g, size_f, gl, fl)


def test_entropy_codec_gaussian_models_integration(rng, tmp_path):
    """EntropyCodingCompression end-to-end with ('gaussian', ...) models:
    positions derive from DECODED means on both sides."""
    from gscodec_studio_tpu.compression.entropy_coding import (
        EntropyCodingCompression,
    )

    n = 1156  # 34^2
    pos, vals = _structured_data(rng, n)
    splats = {
        "means": (pos * 4.0 - 2.0).astype(np.float32),
        "scales": vals,
        "quats": rng.standard_normal((n, 4)).astype(np.float32),
        "opacities": (2.0 + rng.standard_normal(n)).astype(np.float32),
        "sh0": (0.2 * rng.standard_normal((n, 1, 3))).astype(np.float32),
        "shN": np.zeros((n, 0, 3), np.float32),
    }
    gparams, gcfgs = gaussian_conditional_init(
        jax.random.PRNGKey(0), channel=3, n_levels_3d=2, n_levels_2d=1,
        mlp_width=16, log2_hashmap_3d=10, log2_hashmap_2d=8,
    )
    codec = EntropyCodingCompression(shn_clusters=16, kmeans_iters=2)
    d = str(tmp_path / "c")
    codec.compress(
        d, splats, entropy_models={"scales": ("gaussian", (gparams, gcfgs))}
    )
    out = codec.decompress(d)
    assert out["scales"].shape[1] == 3
    # ANS is lossless over the quantized grid: error bounded by q_step/2
    assert np.all(np.isfinite(out["scales"]))
    assert np.abs(
        np.clip(np.sort(splats["scales"], axis=0), LO, HI)
        - np.sort(out["scales"], axis=0)
    ).max() <= QSTEP * 0.51 + 1e-5
