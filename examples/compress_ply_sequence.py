"""MPEG video-anchor style codec driver: load a tracked .ply sequence,
compress with the sequence codec at several rate points, decode, render,
and report metrics (reference examples/compress_ply_sequence.py:77-95 +
benchmarks/mpeg/video_anchor_bench.sh rate points rp0-rp3)."""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

RATE_POINTS = {  # qp per attribute class, mirroring the rp0-rp3 ladder
    "rp0": 30,
    "rp1": 25,
    "rp2": 20,
    "rp3": 15,
}


def main():

    import os as _os

    # Default to CPU: nothing in compress/decompress needs the TPU, and
    # the eval renders are small (33k-splat frames at ~QVGA). Two rounds
    # in a row the TPU leg hung mid-run on a relay device-to-host
    # transfer (r4: killed by timeout after "loaded 12 frames"; r5:
    # blocked in wait_woken at ~0% CPU after decoding one frame) — the
    # ladder must not depend on relay health. Set JAX_PLATFORMS=tpu
    # explicitly to override.
    import jax

    jax.config.update(
        "jax_platforms", _os.environ.get("JAX_PLATFORMS") or "cpu"
    )
    p = argparse.ArgumentParser()
    p.add_argument("--ply_dir", required=True,
                   help="directory of frame_*.ply (tracked sequence)")
    p.add_argument("--output_dir", default="results/ply_seq")
    p.add_argument("--rate_points", nargs="*", default=["rp2"])
    p.add_argument("--all_intra", action="store_true")
    p.add_argument("--eval_views", type=int, default=4,
                   help="orbit views for decoded-vs-source render metrics"
                   " (0 disables the evaluation loop)")
    p.add_argument("--eval_width", type=int, default=640)
    p.add_argument("--eval_height", type=int, default=480)
    p.add_argument("--eval_frame_stride", type=int, default=1)
    args = p.parse_args()

    from gscodec_studio_tpu.utils.ply import load_ply, save_ply
    from gscodec_studio_tpu.compression.seq_codec import SeqCodec
    from gscodec_studio_tpu.compression.png_compression import compressed_size

    plys = sorted(glob.glob(os.path.join(args.ply_dir, "*.ply")))
    if not plys:
        raise SystemExit(f"no .ply files in {args.ply_dir}")
    frames = [load_ply(f) for f in plys]
    print(f"loaded {len(frames)} frames, {len(frames[0]['means'])} splats")

    for rp in args.rate_points:
        qp = RATE_POINTS[rp]
        out = os.path.join(args.output_dir, rp)
        codec = SeqCodec(qp=qp, all_intra=args.all_intra)
        # the rate-point dir may hold artifacts of an earlier run (the
        # decoded/ plys of a killed round-4 leg inflated rp0's size by
        # 27 MB) — start from a clean dir so compressed_size measures
        # only this run's bitstream
        import shutil

        if os.path.isdir(out):
            shutil.rmtree(out)
        codec.compress(out, frames)
        size = compressed_size(out)
        decoded = codec.decompress(out)
        dec_dir = os.path.join(out, "decoded")
        os.makedirs(dec_dir, exist_ok=True)
        for i, fr in enumerate(decoded):
            n = len(fr["means"])
            save_ply(
                os.path.join(dec_dir, f"frame_{i:04d}.ply"),
                {
                    "means": fr["means"],
                    "scales": fr["scales"],
                    "quats": fr["quats"],
                    "opacities": fr["opacities"].reshape(-1),
                    "sh0": fr.get("sh0", np.zeros((n, 1, 3))).reshape(n, 1, 3),
                    "shN": fr.get("shN", np.zeros((n, 0, 3))).reshape(n, -1, 3),
                },
            )
        stats = {
            "rate_point": rp, "qp": qp, "bytes": size,
            "bytes_per_frame": size / len(frames),
        }
        if args.eval_views > 0:
            # close the rate-distortion loop: render decoded vs source
            # splats and report GSC metrics (reference
            # ply_loader_renderer.py + video_anchor_bench summaries)
            from gscodec_studio_tpu.utils.ply_render import (
                orbit_cameras, sequence_metrics,
            )

            cams = orbit_cameras(
                np.asarray(frames[0]["means"]), n_views=args.eval_views,
                width=args.eval_width, height=args.eval_height,
            )
            st = args.eval_frame_stride
            stats.update(sequence_metrics(frames[::st], decoded[::st], cams))
        with open(os.path.join(out, "stats.json"), "w") as f:
            json.dump(stats, f)
        print(json.dumps(stats))


if __name__ == "__main__":
    main()
