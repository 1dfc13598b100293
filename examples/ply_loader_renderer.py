"""Load .ply splats and render/evaluate them (reference
examples/ply_loader_renderer.py): render a camera set (COLMAP poses when
available, else a deterministic orbit rig), dump PNGs, and — given a second
.ply or render dir — report GSC metrics (YCbCr PSNR / SSIM)."""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_cameras(args, points):
    from gscodec_studio_tpu.utils.ply_render import orbit_cameras

    if args.colmap_dir:
        from gscodec_studio_tpu.datasets.colmap import Parser

        p = Parser(args.colmap_dir, factor=args.factor)
        cams = []
        for i in range(0, len(p.camtoworlds), args.view_stride):
            cid = p.camera_ids[i]
            w, h = p.imsize_dict[cid]
            cams.append({
                "camtoworld": p.camtoworlds[i],
                "K": p.Ks_dict[cid].astype(np.float32),
                "width": w, "height": h,
            })
        return cams
    return orbit_cameras(points, n_views=args.n_views, width=args.width,
                         height=args.height)


def main():

    import os as _os

    if _os.environ.get("JAX_PLATFORMS"):  # honor JAX_PLATFORMS (axon relay)
        import jax

        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    p = argparse.ArgumentParser()
    p.add_argument("--ply", required=True,
                   help=".ply file or directory of frame_*.ply")
    p.add_argument("--ref_ply", default=None,
                   help="optional reference .ply (file/dir) for metrics")
    p.add_argument("--out_dir", default="results/ply_render")
    p.add_argument("--colmap_dir", default=None)
    p.add_argument("--factor", type=int, default=4)
    p.add_argument("--view_stride", type=int, default=16)
    p.add_argument("--n_views", type=int, default=4)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--save_images", action="store_true")
    args = p.parse_args()

    import imageio.v2 as imageio

    from gscodec_studio_tpu.utils.ply import load_ply
    from gscodec_studio_tpu.utils.gsc_metrics import gsc_metrics
    from gscodec_studio_tpu.utils.ply_render import render_splats

    def load_frames(path):
        if os.path.isdir(path):
            return [load_ply(f) for f in sorted(
                glob.glob(os.path.join(path, "*.ply")))]
        return [load_ply(path)]

    frames = load_frames(args.ply)
    cams = load_cameras(args, np.asarray(frames[0]["means"]))
    os.makedirs(args.out_dir, exist_ok=True)
    print(f"{len(frames)} frame(s), {len(cams)} view(s)")

    refs = load_frames(args.ref_ply) if args.ref_ply else None
    acc = {}
    for fi, fr in enumerate(frames):
        imgs = render_splats(fr, cams)
        if args.save_images:
            for vi, img in enumerate(imgs):
                imageio.imwrite(
                    os.path.join(args.out_dir, f"f{fi:04d}_v{vi:02d}.png"),
                    (img * 255).astype(np.uint8),
                )
        if refs is not None:
            rimgs = render_splats(refs[fi], cams)
            for r, d in zip(rimgs, imgs):
                for k, v in gsc_metrics(r, d).items():
                    acc.setdefault(k, []).append(v)
    out = {k: float(np.mean(v)) for k, v in acc.items()}
    if out:
        with open(os.path.join(args.out_dir, "metrics.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
