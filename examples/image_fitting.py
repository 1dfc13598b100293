"""2D toy: fit N Gaussians to a single image (reference
examples/image_fitting.py) — the minimum end-to-end slice of the renderer +
optimizer, runnable on CPU or one chip."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

# honor JAX_PLATFORMS even though the sitecustomize force-registers the
# axon TPU plugin (CPU runs must not touch/hang on the TPU relay)
import os as _os
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import optax

from gscodec_studio_tpu.rendering import rasterization


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img_path", type=str, default=None)
    p.add_argument("--num_points", type=int, default=10_000)
    p.add_argument("--iterations", type=int, default=1000)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--save_path", type=str, default="/tmp/image_fit.png")
    args = p.parse_args()

    if args.img_path:
        import imageio.v2 as imageio

        target = (
            np.asarray(imageio.imread(args.img_path))[..., :3] / 255.0
        ).astype(np.float32)
        H, W = target.shape[:2]
    else:
        H, W = args.height, args.width
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        target = np.stack(
            [yy / H, xx / W, (1 - yy / H) * (xx / W)], axis=-1
        ).astype(np.float32)
    target_j = jnp.asarray(target)[None]

    rng = np.random.default_rng(0)
    N = args.num_points
    fov_x = np.pi / 2
    f = 0.5 * W / np.tan(0.5 * fov_x)
    params = {
        "means": jnp.asarray(
            (rng.random((N, 3), np.float32) - 0.5)
            * jnp.asarray([2 * np.tan(fov_x / 2) * 8, 2 * H / W * 8, 1])
            + jnp.asarray([0, 0, 8.0])
        ),
        "scales": jnp.asarray(np.log(0.05 + 0.1 * rng.random((N, 3), np.float32) * 8)),
        "quats": jnp.asarray(rng.standard_normal((N, 4)).astype(np.float32)),
        "opacities": jnp.zeros(N),
        "colors": jnp.asarray(rng.random((N, 3)).astype(np.float32)),
    }
    viewmats = jnp.eye(4)[None]
    Ks = jnp.asarray(np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]], np.float32))

    tx = optax.adam(args.lr)
    opt = tx.init(params)

    def loss_fn(params):
        img, _, _ = rasterization(
            params["means"], params["quats"], jnp.exp(params["scales"]),
            jax.nn.sigmoid(params["opacities"]),
            jax.nn.sigmoid(params["colors"]), viewmats, Ks, W, H,
            isect_capacity=1 << 20,
        )
        return jnp.mean((img - target_j) ** 2)

    @jax.jit
    def step(params, opt):
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    t0 = time.time()
    for it in range(args.iterations):
        params, opt, loss = step(params, opt)
        if it % 100 == 0:
            print(f"iter {it}: mse {float(loss):.5f} ({time.time()-t0:.1f}s)")

    img, _, _ = rasterization(
        params["means"], params["quats"], jnp.exp(params["scales"]),
        jax.nn.sigmoid(params["opacities"]), jax.nn.sigmoid(params["colors"]),
        viewmats, Ks, W, H, isect_capacity=1 << 20,
    )
    import imageio.v2 as imageio

    imageio.imwrite(
        args.save_path,
        (np.clip(np.asarray(img[0]), 0, 1) * 255).astype(np.uint8),
    )
    print("PSNR:", -10 * np.log10(float(loss)), "->", args.save_path)


if __name__ == "__main__":
    main()
