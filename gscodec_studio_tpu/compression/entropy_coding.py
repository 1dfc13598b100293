"""ANS entropy-coding test-time codec
(/root/reference/gsplat/compression/entropy_coding_compression.py:21-1059):
the PNG pipeline, but quantization-friendly attributes (scales, quats,
opacities, sh0) are coded with rANS instead of PNG — per-channel 8-bit
symbols against either (a) quantized histograms stored alongside the stream
(:282-326) or (b) the learned factorized entropy model's CDF evaluated on
the symbol grid (:398-491), in which case only the tiny model params ship.

The ANS backend is the native C++ rANS coder (csrc/rans.cpp) instead of the
reference's `constriction` dependency.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Dict, Optional

import numpy as np

from gscodec_studio_tpu.compression import codecs, native
from gscodec_studio_tpu.compression.outlier_filter import filter_splats
from gscodec_studio_tpu.compression.sort import sort_splats

# Quantization bounds/bitwidths shared with the training-time simulation
# (compression_sim/simulation.py tables — keeping them equal is what makes
# train-time QAT match test-time coding).
from gscodec_studio_tpu.compression_sim.simulation import BOUNDS, Q_BITWIDTH


def _encode_attr_ans(compress_dir, name, arr2d, lo, hi, bits, entropy_params=None):
    """arr2d [N, C] -> per-channel rANS streams."""
    n, C = arr2d.shape
    nsym = 2**bits
    q_step = (hi - lo) / (nsym - 1)
    symbols = np.clip(
        np.round((np.clip(arr2d, lo, hi) - lo) / q_step), 0, nsym - 1
    ).astype(np.uint8)

    blobs, freq_tables = [], []
    if entropy_params is not None:
        # Model-derived tables: decoder re-derives them from the stored
        # params, so no histograms ship with the stream.
        import jax.numpy as jnp
        from gscodec_studio_tpu.compression_sim.entropy_model import (
            factorized_likelihood_table,
        )

        probs = np.asarray(
            factorized_likelihood_table(
                entropy_params, jnp.arange(nsym), q_step, lo
            )
        )  # [C, nsym]
        for c in range(C):
            f = native.quantize_freqs(
                np.maximum((probs[c] * 1e9).astype(np.uint64), 1)
            )
            freq_tables.append(f)
            blobs.append(native.rans_encode(symbols[:, c], f))
        with open(os.path.join(compress_dir, f"{name}_model.pkl"), "wb") as fh:
            pickle.dump(
                {k: [np.asarray(x) for x in v] for k, v in entropy_params.items()},
                fh,
            )
        store_freqs = False
    else:
        for c in range(C):
            counts = np.bincount(symbols[:, c], minlength=nsym).astype(np.uint64)
            f = native.quantize_freqs(counts)
            freq_tables.append(f)
            blobs.append(native.rans_encode(symbols[:, c], f))
        store_freqs = True

    with open(os.path.join(compress_dir, f"{name}.ans"), "wb") as fh:
        for b in blobs:
            fh.write(len(b).to_bytes(8, "little"))
            fh.write(b)
    if store_freqs:
        np.save(
            os.path.join(compress_dir, f"{name}_freqs.npy"),
            np.stack(freq_tables),
        )
    return {
        "kind": "ans", "n": n, "channels": C, "bits": bits, "lo": lo, "hi": hi,
        "model": entropy_params is not None,
    }


def _decode_attr_ans(compress_dir, name, meta) -> np.ndarray:
    n, C, bits = meta["n"], meta["channels"], meta["bits"]
    lo, hi = meta["lo"], meta["hi"]
    nsym = 2**bits
    q_step = (hi - lo) / (nsym - 1)
    if meta["model"]:
        import jax.numpy as jnp
        from gscodec_studio_tpu.compression_sim.entropy_model import (
            factorized_likelihood_table,
        )

        with open(os.path.join(compress_dir, f"{name}_model.pkl"), "rb") as fh:
            params = pickle.load(fh)
        probs = np.asarray(
            factorized_likelihood_table(
                {k: [jnp.asarray(x) for x in v] for k, v in params.items()},
                jnp.arange(nsym), q_step, lo,
            )
        )
        freqs = np.stack(
            [
                native.quantize_freqs(
                    np.maximum((probs[c] * 1e9).astype(np.uint64), 1)
                )
                for c in range(C)
            ]
        )
    else:
        freqs = np.load(os.path.join(compress_dir, f"{name}_freqs.npy"))
    out = np.zeros((n, C), np.float32)
    with open(os.path.join(compress_dir, f"{name}.ans"), "rb") as fh:
        for c in range(C):
            ln = int.from_bytes(fh.read(8), "little")
            blob = fh.read(ln)
            syms = native.rans_decode(blob, freqs[c], n)
            out[:, c] = syms.astype(np.float32) * q_step + lo
    return out


@dataclasses.dataclass
class EntropyCodingCompression:
    """compress(dir, splats[, entropy_models]) / decompress(dir)
    (entropy_coding_compression.py:21 API)."""

    use_sort: bool = True
    shn_clusters: int = 32768
    kmeans_iters: int = 10
    ans_attrs: tuple = ("scales", "quats", "opacities", "sh0")

    def compress(
        self, compress_dir: str, splats: Dict,
        entropy_models: Optional[Dict] = None,
    ) -> None:
        os.makedirs(compress_dir, exist_ok=True)
        splats = {k: np.asarray(v) for k, v in splats.items()}
        splats, _ = filter_splats(splats)
        q = splats["quats"]
        q = q / np.clip(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12, None)
        splats["quats"] = np.where(q[:, :1] >= 0, q, -q)
        if self.use_sort:
            splats, side = sort_splats(splats)
        else:
            n = len(splats["means"])
            side = int(np.floor(np.sqrt(n)))
            keep = np.argsort(splats["opacities"])[::-1][: side * side]
            splats = {k: v[np.sort(keep)] for k, v in splats.items()}

        meta = {"side": side, "attrs": {}}
        for name, v in splats.items():
            flat = v.reshape(len(v), -1)
            if name in self.ans_attrs and name in BOUNDS:
                lo, hi = BOUNDS[name]
                bits = Q_BITWIDTH.get(name, 8)
                em = (entropy_models or {}).get(name)
                meta["attrs"][name] = _encode_attr_ans(
                    compress_dir, name, flat, lo, hi, bits, em
                )
            elif name == "means":
                grid = v.reshape(side, side, -1)
                meta["attrs"][name] = codecs.compress_png_16bit(
                    compress_dir, name, grid, log_space=True
                )
            elif name == "shN":
                grid = v.reshape(side, side, *v.shape[1:])
                meta["attrs"][name] = codecs.compress_kmeans(
                    compress_dir, name, grid, self.shn_clusters,
                    iters=self.kmeans_iters,
                )
            else:
                meta["attrs"][name] = codecs.compress_npz(
                    compress_dir, name, v
                )
        with open(os.path.join(compress_dir, "meta.json"), "w") as f:
            json.dump(meta, f)

    def decompress(self, compress_dir: str) -> Dict[str, np.ndarray]:
        with open(os.path.join(compress_dir, "meta.json")) as f:
            meta = json.load(f)
        side = meta["side"]
        n = side * side
        out = {}
        for name, m in meta["attrs"].items():
            if m["kind"] == "ans":
                arr = _decode_attr_ans(compress_dir, name, m)
            elif m["kind"] == "png16":
                arr = codecs.decompress_png_16bit(compress_dir, name, m)
            elif m["kind"] == "kmeans":
                arr = codecs.decompress_kmeans(compress_dir, name, m)
            else:
                arr = codecs.decompress_npz(compress_dir, name, m)
            arr = np.asarray(arr, np.float32)
            if name == "opacities":
                out[name] = arr.reshape(n)
            elif name == "sh0":
                out[name] = arr.reshape(n, 1, 3)
            elif name == "shN":
                out[name] = arr.reshape(n, -1, 3)
            else:
                out[name] = arr.reshape(n, -1)
        return out
