"""Test configuration: force the CPU backend with 8 virtual devices so
single-chip math tests and multi-device sharding tests both run anywhere
(mirrors the driver's dryrun environment)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The container's sitecustomize force-registers the axon TPU plugin and
# programmatically sets jax_platforms — override it back to CPU for tests.
jax.config.update("jax_platforms", "cpu")
# The suite is compile-dominated (trainer scan graphs take minutes on CPU);
# a persistent cache makes re-runs mostly cache hits, which is what makes
# "run the fast tier before every landing" practical.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_test_scene(rng, C=2, N=1000, width=64, height=48, scene_extent=3.0):
    """Synthetic multi-camera splat scene (replaces the reference's
    assets/test_garden.npz fixture, gsplat/_helper.py:9-55)."""
    means = (rng.random((N, 3), dtype=np.float32) - 0.5) * scene_extent
    quats = rng.standard_normal((N, 4)).astype(np.float32)
    scales = (0.05 + 0.1 * rng.random((N, 3))).astype(np.float32)
    opacities = rng.random(N, dtype=np.float32)

    viewmats = []
    for i in range(C):
        angle = 2 * np.pi * i / max(C, 1) * 0.1
        R = np.array(
            [
                [np.cos(angle), 0, np.sin(angle)],
                [0, 1, 0],
                [-np.sin(angle), 0, np.cos(angle)],
            ],
            dtype=np.float32,
        )
        t = np.array([0.1 * i, 0.0, 4.0], dtype=np.float32)
        vm = np.eye(4, dtype=np.float32)
        vm[:3, :3] = R
        vm[:3, 3] = t
        viewmats.append(vm)
    viewmats = np.stack(viewmats)

    f = 0.8 * width
    Ks = np.array(
        [[[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]]] * C, dtype=np.float32
    )
    return dict(
        means=means,
        quats=quats,
        scales=scales,
        opacities=opacities,
        viewmats=viewmats,
        Ks=Ks,
        width=width,
        height=height,
    )


@pytest.fixture
def test_scene(rng):
    return make_test_scene(rng)


# Oracle-parity tests reproduce the CUDA early-stop semantics exactly.
from gscodec_studio_tpu.ops import rasterize_pallas as _rp

_rp.CUTOFF_MODE = "exact"
