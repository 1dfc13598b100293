"""Render loaded .ply splat dicts for codec evaluation.

TPU-native equivalent of the reference's ply_loader_renderer.py (1,135
LoC): load Inria-convention .ply splats, render a camera set, and compute
GSC metrics between a reference render and a decoded render — the piece
that closes the MPEG anchor rate-distortion loop
(examples/compress_ply_sequence.py:77-95 + ply_loader_renderer.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def orbit_cameras(
    points: np.ndarray,
    n_views: int = 4,
    width: int = 640,
    height: int = 480,
    fov_scale: float = 0.9,
    elevation: float = 0.15,
    radius_scale: float = 2.2,
):
    """Deterministic orbit rig around the cloud centroid — a self-contained
    camera set when no COLMAP poses ship with the sequence."""
    target = np.median(points, axis=0)
    spread = float(np.linalg.norm(points - target, axis=1).mean())
    radius = radius_scale * max(spread, 1e-3)
    f = fov_scale * width
    K = np.array(
        [[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32
    )
    cams = []
    for i in range(n_views):
        phi = 2.0 * np.pi * i / n_views
        eye = target + radius * np.array(
            [np.cos(phi), elevation, np.sin(phi)], np.float32
        )
        fwd = target - eye
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, np.array([0, -1, 0], np.float32))
        right = right / np.linalg.norm(right)
        up = np.cross(fwd, right)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, fwd, eye
        cams.append({"camtoworld": c2w, "K": K,
                     "width": width, "height": height})
    return cams


def render_splats(
    splats: Dict[str, np.ndarray],
    cameras: Sequence[Dict],
    sh_degree: Optional[int] = None,
    isect_capacity: int = 1 << 20,
    rasterizer: str = "auto",
) -> List[np.ndarray]:
    """Render a splat dict (means/quats/scales/opacities(logit)/sh0/shN)
    for each camera; returns [H, W, 3] float arrays in [0, 1]."""
    import jax
    import jax.numpy as jnp

    from gscodec_studio_tpu.rendering import rasterization
    from gscodec_studio_tpu.ops.raster_v2 import _supports_mosaic

    if rasterizer == "auto":
        rasterizer = "fused" if _supports_mosaic() else "pallas"

    n = len(splats["means"])
    sh0 = np.asarray(splats.get("sh0", np.zeros((n, 1, 3)))).reshape(n, 1, 3)
    shN = np.asarray(splats.get("shN", np.zeros((n, 0, 3)))).reshape(n, -1, 3)
    if sh_degree is None:
        k_total = 1 + shN.shape[1]
        sh_degree = max(int(round(np.sqrt(k_total))) - 1, 0)
    colors = jnp.asarray(np.concatenate([sh0, shN], axis=1))
    means = jnp.asarray(splats["means"])
    quats = jnp.asarray(splats["quats"])
    scales = jnp.exp(jnp.asarray(splats["scales"]))
    opac = jax.nn.sigmoid(jnp.asarray(splats["opacities"]).reshape(n))

    renders = []
    fns = {}
    for cam in cameras:
        w, h = int(cam["width"]), int(cam["height"])
        if (w, h) not in fns:
            fns[(w, h)] = jax.jit(
                lambda vm, K, means, quats, scales, opac, colors, _w=w,
                _h=h: rasterization(
                    means, quats, scales, opac, colors, vm[None], K[None],
                    _w, _h, sh_degree=sh_degree,
                    isect_capacity=isect_capacity, rasterizer=rasterizer,
                )[0]
            )
        vm = jnp.asarray(
            np.linalg.inv(np.asarray(cam["camtoworld"], np.float32))
        )
        img = fns[(w, h)](
            vm, jnp.asarray(np.asarray(cam["K"], np.float32)), means, quats,
            scales, opac, colors,
        )
        renders.append(np.clip(np.asarray(img[0]), 0.0, 1.0))
    return renders


def sequence_metrics(
    ref_frames: Sequence[Dict[str, np.ndarray]],
    dec_frames: Sequence[Dict[str, np.ndarray]],
    cameras: Sequence[Dict],
    **render_kw,
) -> Dict[str, float]:
    """Render original vs decoded splats per frame and average GSC metrics
    (YCbCr PSNR + SSIM) over (frame, view) — the decoded-vs-source-render
    distortion the MPEG anchor scripts report."""
    from gscodec_studio_tpu.utils.gsc_metrics import gsc_metrics

    acc: Dict[str, list] = {}
    for ref, dec in zip(ref_frames, dec_frames):
        r_imgs = render_splats(ref, cameras, **render_kw)
        d_imgs = render_splats(dec, cameras, **render_kw)
        for r, d in zip(r_imgs, d_imgs):
            for k, v in gsc_metrics(r, d).items():
                acc.setdefault(k, []).append(v)
    return {k: float(np.mean(v)) for k, v in acc.items()}
