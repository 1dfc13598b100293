"""Viewer: load a checkpoint/.ply and render an orbit/trajectory video or
serve the interactive HTTP viewer (reference examples/simple_viewer.py;
viser is absent from this image, so --interactive uses the dependency-free
utils/viewer.py orbit viewer instead)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

# honor JAX_PLATFORMS even though the sitecustomize force-registers the
# axon TPU plugin (CPU runs must not touch/hang on the TPU relay)
import os as _os
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ply", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="/tmp/viewer_out")
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--height", type=int, default=540)
    p.add_argument("--n_frames", type=int, default=60)
    p.add_argument("--traj", choices=["ellipse", "spiral"], default="ellipse")
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--interactive", action="store_true",
                   help="serve the HTTP orbit viewer instead of rendering"
                   " an offline trajectory")
    p.add_argument("--port", type=int, default=8080)
    args = p.parse_args()

    from gscodec_studio_tpu.rendering import rasterization
    from gscodec_studio_tpu.datasets.traj import (
        generate_ellipse_path, generate_spiral_path, look_at,
    )

    if args.ply:
        from gscodec_studio_tpu.utils.ply import load_ply

        splats = load_ply(args.ply)
    elif args.ckpt:
        z = np.load(args.ckpt)
        splats = {
            k.split("/", 1)[1]: z[k] for k in z.files if k.startswith("splats/")
        }
    else:
        raise SystemExit("need --ply or --ckpt")

    means = jnp.asarray(splats["means"])
    quats = jnp.asarray(splats["quats"])
    scales = jnp.exp(jnp.asarray(splats["scales"]))
    opac = jax.nn.sigmoid(jnp.asarray(splats["opacities"]))
    colors = jnp.concatenate(
        [jnp.asarray(splats["sh0"]), jnp.asarray(splats["shN"])], axis=1
    )

    center = np.asarray(means).mean(axis=0)
    r = np.percentile(np.linalg.norm(np.asarray(means) - center, axis=-1), 70)
    poses = []
    for th in np.linspace(0, 2 * np.pi, args.n_frames, endpoint=False):
        eye = center + 2.5 * r * np.array([np.cos(th), -0.3, np.sin(th)])
        poses.append(look_at(eye, center))
    poses = np.stack(poses)

    f = 1.1 * args.width
    K = jnp.asarray(
        np.array(
            [[f, 0, args.width / 2], [0, f, args.height / 2], [0, 0, 1]],
            np.float32,
        )
    )

    if args.interactive:
        from gscodec_studio_tpu.utils.viewer import SplatViewer

        def render_fn(c2w, Kv, w, h):
            img, _, _ = rasterization(
                means, quats, scales, opac, colors,
                jnp.asarray(np.linalg.inv(c2w).astype(np.float32))[None],
                jnp.asarray(Kv)[None], w, h, sh_degree=args.sh_degree,
                isect_capacity=4 << 20,
            )
            return np.asarray(jnp.clip(img[0], 0, 1))

        SplatViewer(
            render_fn, width=args.width, height=args.height,
            center=center, radius=2.5 * float(r),
        ).serve(args.port)
        return

    os.makedirs(args.output_dir, exist_ok=True)
    import imageio.v2 as imageio

    @jax.jit
    def render(viewmat):
        img, _, _ = rasterization(
            means, quats, scales, opac, colors, viewmat[None], K[None],
            args.width, args.height, sh_degree=args.sh_degree,
            isect_capacity=4 << 20,
        )
        return jnp.clip(img[0], 0, 1)

    for i, c2w in enumerate(poses):
        img = render(jnp.asarray(np.linalg.inv(c2w).astype(np.float32)))
        imageio.imwrite(
            os.path.join(args.output_dir, f"frame_{i:04d}.png"),
            (np.asarray(img) * 255).astype(np.uint8),
        )
        print(f"\r{i+1}/{len(poses)}", end="")
    print(f"\nwrote {len(poses)} frames to {args.output_dir}")


if __name__ == "__main__":
    main()
