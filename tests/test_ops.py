"""Op-level unit tests (model: reference tests/test_basic.py — dual
implementation: our jnp ops vs the upstream pure-torch oracle where available,
plus standalone numerical checks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gscodec_studio_tpu.ops import (
    quat_to_rotmat,
    quat_scale_to_covar_preci,
    world_to_cam,
    proj,
    fully_fused_projection,
    spherical_harmonics,
    num_sh_bases,
    compute_relocation,
)
from gscodec_studio_tpu.ops.quat import triu_unpack

from tests.reference_oracle import get_torch_impl

ref = get_torch_impl()
needs_ref = pytest.mark.skipif(ref is None, reason="reference oracle unavailable")


def t(x):
    import torch

    return torch.from_numpy(np.asarray(x))


@needs_ref
def test_quat_scale_to_covar_preci(rng):
    quats = rng.standard_normal((100, 4)).astype(np.float32)
    scales = (0.1 + rng.random((100, 3))).astype(np.float32)
    covars, precis = quat_scale_to_covar_preci(jnp.asarray(quats), jnp.asarray(scales))
    covars_ref, precis_ref = ref._quat_scale_to_covar_preci(t(quats), t(scales))
    np.testing.assert_allclose(covars, covars_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(precis, precis_ref.numpy(), rtol=2e-2, atol=1e-2)
    # triu packing round trip
    covars_t, _ = quat_scale_to_covar_preci(
        jnp.asarray(quats), jnp.asarray(scales), triu=True
    )
    np.testing.assert_allclose(triu_unpack(covars_t), covars, rtol=1e-6)


def test_quat_rotmat_orthonormal(rng):
    quats = rng.standard_normal((50, 4)).astype(np.float32)
    R = quat_to_rotmat(jnp.asarray(quats))
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (50, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


@needs_ref
def test_world_to_cam(rng, test_scene):
    s = test_scene
    covars, _ = quat_scale_to_covar_preci(
        jnp.asarray(s["quats"]), jnp.asarray(s["scales"]), compute_preci=False
    )
    means_c, covars_c = world_to_cam(
        jnp.asarray(s["means"]), covars, jnp.asarray(s["viewmats"])
    )
    means_c_ref, covars_c_ref = ref._world_to_cam(
        t(s["means"]), t(np.asarray(covars)), t(s["viewmats"])
    )
    np.testing.assert_allclose(means_c, means_c_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(covars_c, covars_c_ref.numpy(), rtol=1e-4, atol=1e-5)


@needs_ref
@pytest.mark.parametrize("camera_model", ["pinhole", "ortho", "fisheye"])
def test_proj(rng, test_scene, camera_model):
    s = test_scene
    C, N = s["viewmats"].shape[0], s["means"].shape[0]
    covars, _ = quat_scale_to_covar_preci(
        jnp.asarray(s["quats"]), jnp.asarray(s["scales"]), compute_preci=False
    )
    means_c, covars_c = world_to_cam(
        jnp.asarray(s["means"]), covars, jnp.asarray(s["viewmats"])
    )
    means2d, covars2d = proj(
        means_c, covars_c, jnp.asarray(s["Ks"]), s["width"], s["height"], camera_model
    )
    ref_fn = {"pinhole": ref._persp_proj, "ortho": ref._ortho_proj,
              "fisheye": ref._fisheye_proj}[camera_model]
    means2d_ref, covars2d_ref = ref_fn(
        t(np.asarray(means_c)), t(np.asarray(covars_c)), t(s["Ks"]),
        s["width"], s["height"],
    )
    np.testing.assert_allclose(means2d, means2d_ref.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(covars2d, covars2d_ref.numpy(), rtol=1e-3, atol=1e-3)


@needs_ref
@pytest.mark.parametrize("calc_compensations", [False, True])
@pytest.mark.parametrize("camera_model", ["pinhole", "ortho", "fisheye"])
def test_fully_fused_projection(rng, test_scene, calc_compensations, camera_model):
    import torch

    s = test_scene
    radii, means2d, depths, conics, compensations = fully_fused_projection(
        jnp.asarray(s["means"]),
        None,
        jnp.asarray(s["quats"]),
        jnp.asarray(s["scales"]),
        jnp.asarray(s["viewmats"]),
        jnp.asarray(s["Ks"]),
        s["width"],
        s["height"],
        calc_compensations=calc_compensations,
        camera_model=camera_model,
    )
    (
        radii_ref,
        means2d_ref,
        depths_ref,
        conics_ref,
        compensations_ref,
    ) = ref._fully_fused_projection(
        t(s["means"]),
        ref._quat_scale_to_covar_preci(t(s["quats"]), t(s["scales"]))[0],
        t(s["viewmats"]),
        t(s["Ks"]),
        s["width"],
        s["height"],
        calc_compensations=calc_compensations,
        camera_model=camera_model,
    )
    radii = np.asarray(radii)
    valid = (radii > 0) & (radii_ref.numpy() > 0)
    # radii: int output, allow off-by-one from float rounding
    assert (np.abs(radii - radii_ref.numpy())[valid] <= 1).mean() > 0.999
    np.testing.assert_allclose(
        np.asarray(means2d)[valid], means2d_ref.numpy()[valid], rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(depths)[valid], depths_ref.numpy()[valid], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(conics)[valid], conics_ref.numpy()[valid], rtol=1e-2, atol=1e-2
    )
    if calc_compensations:
        np.testing.assert_allclose(
            np.asarray(compensations)[valid],
            compensations_ref.numpy()[valid],
            rtol=1e-3,
            atol=1e-3,
        )

    # Gradient parity on a scalar loss over visible gaussians.
    def loss_jax(means, quats, scales):
        r, m2d, d, cn, _ = fully_fused_projection(
            means,
            None,
            quats,
            scales,
            jnp.asarray(s["viewmats"]),
            jnp.asarray(s["Ks"]),
            s["width"],
            s["height"],
            camera_model=camera_model,
        )
        w = jnp.asarray(valid, dtype=jnp.float32)
        return (
            jnp.sum(m2d.sum(-1) * w) + jnp.sum(d * w) + jnp.sum(cn.sum(-1) * w)
        )

    g_means, g_quats, g_scales = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.asarray(s["means"]), jnp.asarray(s["quats"]), jnp.asarray(s["scales"])
    )

    means_t = t(s["means"]).requires_grad_(True)
    quats_t = t(s["quats"]).requires_grad_(True)
    scales_t = t(s["scales"]).requires_grad_(True)
    covars_t = ref._quat_scale_to_covar_preci(quats_t, scales_t)[0]
    r, m2d, d, cn, _ = ref._fully_fused_projection(
        means_t,
        covars_t,
        t(s["viewmats"]),
        t(s["Ks"]),
        s["width"],
        s["height"],
        camera_model=camera_model,
    )
    w = torch.from_numpy(valid.astype(np.float32))
    (m2d.sum(-1) * w).sum().add((d * w).sum()).add((cn.sum(-1) * w).sum()).backward()
    np.testing.assert_allclose(g_means, means_t.grad.numpy(), rtol=2e-1, atol=1e-2)
    np.testing.assert_allclose(g_scales, scales_t.grad.numpy(), rtol=2e-1, atol=1e-2)
    np.testing.assert_allclose(g_quats, quats_t.grad.numpy(), rtol=2e-1, atol=1e-2)


@needs_ref
@pytest.mark.parametrize("sh_degree", [0, 1, 2, 3, 4])
def test_spherical_harmonics(rng, sh_degree):
    import torch

    N = 500
    K = num_sh_bases(4)
    coeffs = rng.standard_normal((N, K, 3)).astype(np.float32)
    dirs = rng.standard_normal((N, 3)).astype(np.float32)
    colors = spherical_harmonics(sh_degree, jnp.asarray(dirs), jnp.asarray(coeffs))

    coeffs_t = t(coeffs).requires_grad_(True)
    dirs_t = t(dirs).requires_grad_(True)
    colors_ref = ref._spherical_harmonics(sh_degree, dirs_t, coeffs_t)
    np.testing.assert_allclose(
        colors, colors_ref.detach().numpy(), rtol=1e-4, atol=1e-5
    )

    g_dirs, g_coeffs = jax.grad(
        lambda d, c: jnp.sum(spherical_harmonics(sh_degree, d, c) ** 2),
        argnums=(0, 1),
    )(jnp.asarray(dirs), jnp.asarray(coeffs))
    (colors_ref**2).sum().backward()
    np.testing.assert_allclose(g_coeffs, coeffs_t.grad.numpy(), rtol=1e-3, atol=1e-4)
    if sh_degree >= 1:  # at degree 0 dirs don't contribute (torch grad is None)
        np.testing.assert_allclose(g_dirs, dirs_t.grad.numpy(), rtol=1e-3, atol=1e-3)


def test_relocation_matches_naive(rng):
    """Cross-check the table-based relocation against a direct numpy
    transcription of Eq. 9 (compute_relocation.cu:22-37)."""
    import math

    N, n_max = 64, 51
    opacities = (0.005 + 0.99 * rng.random(N)).astype(np.float32)
    scales = rng.random((N, 3)).astype(np.float32)
    ratios = rng.integers(1, n_max + 1, N).astype(np.int32)

    new_op, new_scales = compute_relocation(
        jnp.asarray(opacities), jnp.asarray(scales), jnp.asarray(ratios), n_max
    )

    exp_op = 1.0 - np.power(1.0 - opacities, 1.0 / ratios)
    exp_scales = np.zeros_like(scales)
    for idx in range(N):
        denom = 0.0
        for i in range(1, int(ratios[idx]) + 1):
            for k in range(i):
                bin_coeff = math.comb(i - 1, k)
                term = ((-1) ** k / math.sqrt(k + 1)) * exp_op[idx] ** (k + 1)
                denom += bin_coeff * term
        exp_scales[idx] = (opacities[idx] / denom) * scales[idx]
    np.testing.assert_allclose(new_op, exp_op, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(new_scales, exp_scales, rtol=1e-3, atol=1e-5)
