"""Distributed rendering/training on the 8-virtual-device CPU mesh
(replaces the reference's process-spawning tests/_test_distributed.py with a
deterministic in-process mesh; SURVEY.md §4 note)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import make_test_scene
from gscodec_studio_tpu.models.splats import create_splats, splat_activations
from gscodec_studio_tpu.optimizers import build_splat_optimizers
from gscodec_studio_tpu.parallel import (
    make_mesh,
    distributed_render,
    distributed_train_step,
)
from gscodec_studio_tpu.rendering import rasterization

G = 8


@pytest.fixture(scope="module")
def dist_scene():
    """Module-shared scene + optimizers: the compiled-step caches in
    parallel/distributed.py then reuse one compilation across tests."""
    rng = np.random.default_rng(1234)
    N, C, W, H = 128, G, 16, 16
    pts = (rng.random((N, 3)).astype(np.float32) - 0.5) * 2
    rgb = rng.random((N, 3)).astype(np.float32)
    splats = create_splats(pts, rgb, cap=N, sh_degree=1, init_opacity=0.6,
                           init_scale=2.0)
    s = make_test_scene(rng, C=C, N=N, width=W, height=H)
    txs, opt_states = build_splat_optimizers(splats)
    targets = jnp.asarray(rng.random((G, H, W, 3)).astype(np.float32))
    mesh = make_mesh(G)
    return dict(splats=splats, viewmats=jnp.asarray(s["viewmats"]),
                Ks=jnp.asarray(s["Ks"]), W=W, H=H, txs=txs,
                opt_states=opt_states, targets=targets, mesh=mesh)


@pytest.mark.skipif(jax.device_count() < G, reason="needs 8 devices")
def test_distributed_render_matches_single_and_bucketed(dist_scene):
    """Dense-exchange sharded render == single-device render; the
    visibility-bucketed exchange matches the dense one when the cap covers
    every visible Gaussian and stays finite when it does not."""
    d = dist_scene
    splats, viewmats, Ks, W, H = (d["splats"], d["viewmats"], d["Ks"],
                                  d["W"], d["H"])
    mesh = d["mesh"]

    imgs_d = distributed_render(
        mesh, splats, viewmats, Ks, W, H, sh_degree=1, isect_capacity=8192
    )

    means, quats, scales, opac = splat_activations(splats)
    colors = jnp.concatenate([splats["sh0"], splats["shN"]], axis=1)
    imgs_s, _, _ = rasterization(
        means, quats, scales, opac, colors, viewmats, Ks, W, H,
        sh_degree=1, isect_capacity=8192,
    )
    np.testing.assert_allclose(
        np.asarray(imgs_d), np.asarray(imgs_s), rtol=1e-3, atol=2e-3
    )

    bucketed = distributed_render(
        mesh, splats, viewmats, Ks, W, H, sh_degree=1, isect_capacity=8192,
        exchange_cap=128 // G,  # == Nl: cap covers every visible gaussian
    )
    np.testing.assert_allclose(
        np.asarray(bucketed), np.asarray(imgs_d), rtol=1e-4, atol=1e-4
    )
    # under-capacity: overflow is counted, render stays finite
    tight = distributed_render(
        mesh, splats, viewmats, Ks, W, H, sh_degree=1, isect_capacity=8192,
        exchange_cap=4,
    )
    assert np.all(np.isfinite(np.asarray(tight)))


@pytest.mark.skipif(jax.device_count() < G, reason="needs 8 devices")
def test_distributed_train_step_descends_and_bucketed_parity(dist_scene):
    """Two dense steps descend; one bucketed step with a covering cap
    produces the SAME update as the dense step (gradients flow back
    through the gathers + all_to_all identically)."""
    d = dist_scene
    splats, viewmats, Ks = d["splats"], d["viewmats"], d["Ks"]
    mesh, txs, opt_states, targets = (d["mesh"], d["txs"], d["opt_states"],
                                      d["targets"])

    p, o = splats, opt_states
    losses = []
    for _ in range(2):
        p, o, loss, _ = distributed_train_step(
            mesh, p, o, txs, targets, viewmats, Ks, sh_degree=1,
            isect_capacity=4096,
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.all(np.isfinite(np.asarray(p["means"])))
    assert not np.allclose(np.asarray(p["means"]), np.asarray(splats["means"]))

    # bucketed-vs-dense parity from the SAME starting state
    p_d, _, loss_d, _ = distributed_train_step(
        mesh, splats, opt_states, txs, targets, viewmats, Ks, sh_degree=1,
        isect_capacity=4096,
    )
    p_b, _, loss_b, diag = distributed_train_step(
        mesh, splats, opt_states, txs, targets, viewmats, Ks, sh_degree=1,
        isect_capacity=4096, exchange_cap=128 // G,
    )
    np.testing.assert_allclose(float(loss_b), float(loss_d), rtol=1e-5)
    for k in p_d:
        np.testing.assert_allclose(
            np.asarray(p_b[k]), np.asarray(p_d[k]), rtol=1e-4, atol=1e-5,
            err_msg=k,
        )


def test_multihost_launcher_single_process():
    """cli() runs the payload with (rank, world, devices) on a single
    process and shuts down cleanly (the reference launcher contract,
    gsplat/distributed.py:304-360)."""
    import jax
    from gscodec_studio_tpu.parallel.launcher import cli, make_global_mesh

    seen = {}

    def payload(rank, world, devices, extra):
        seen.update(rank=rank, world=world, n_dev=len(devices), extra=extra)
        mesh = make_global_mesh()
        assert mesh.devices.size == len(jax.devices())
        return rank

    out = cli(payload, "x")
    assert out == 0
    assert seen["rank"] == 0 and seen["world"] == 1
    assert seen["extra"] == "x" and seen["n_dev"] >= 1
