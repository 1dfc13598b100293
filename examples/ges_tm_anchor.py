"""GeS-TM (G-PCC) anchor leg of the MPEG comparison: pre-quantize a
trained .ply, run tmc3 (when present) over the rate ladder, post-process,
render the decoded model and report PSNR/size — the counterpart of the
video anchor in examples/compress_ply_sequence.py (reference workflow:
helper/ges_tm/pre_process_gaussian.py comments, steps 1-5)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ply", required=True, help="trained Inria .ply")
    p.add_argument("--out", default="results/ges_tm")
    p.add_argument("--rate-points", nargs="*",
                   default=["r04", "r06", "r08"])
    p.add_argument("--width", type=int, default=648)
    p.add_argument("--height", type=int, default=420)
    p.add_argument("--n-views", type=int, default=8)
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from gscodec_studio_tpu.compression import ges_tm
    from gscodec_studio_tpu.utils.ply import load_ply
    from gscodec_studio_tpu.utils.ply_render import (
        orbit_cameras, render_splats,
    )

    splats = load_ply(args.ply)
    os.makedirs(args.out, exist_ok=True)
    qply = ges_tm.pre_process(splats, args.out)
    base_bytes = os.path.getsize(qply)

    cams = orbit_cameras(splats["means"], args.n_views,
                         args.width, args.height)
    ref_imgs = render_splats(splats, cams)

    def psnr_between(a, b):
        mse = float(np.mean((a - b) ** 2))
        return 10.0 * np.log10(1.0 / max(mse, 1e-12))

    rows = []
    for rp in args.rate_points:
        dec = ges_tm.run_gpcc(qply, args.out, rp)
        if dec is None:
            # no tmc3 in this environment: evaluate the quantization-only
            # leg (the pre/post loss floor every G-PCC rate point shares)
            out = ges_tm.post_process(qply)
            size = base_bytes
            tag = f"{rp} (quant-only; tmc3 unavailable)"
        else:
            out = ges_tm.post_process(dec[0],
                                      os.path.join(args.out, "meta.npz"))
            size = dec[1]
            tag = rp
        dec_imgs = render_splats(out, cams)
        ps = float(np.mean([psnr_between(a, b)
                            for a, b in zip(ref_imgs, dec_imgs)]))
        rows.append({"rate_point": tag, "psnr_vs_uncompressed": round(ps, 3),
                     "size_bytes": int(size)})
        print(json.dumps(rows[-1]), flush=True)
        if dec is None:
            break  # all rate points collapse to the same quant-only leg

    with open(os.path.join(args.out, "ges_tm_results.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
