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


def _gauss_ctx_freqs(lo, hi, nsym, q_step, n_mu, n_sig):
    """Discretized context tables for the position-conditioned Gaussian:
    one rANS frequency row per (mu bin, log-sigma bin). Derived from the
    model on BOTH sides, so nothing ships but the binarized model
    (reference entropy_coding_compression.py:467-491 ships the model and
    re-derives coding distributions)."""
    import math

    sig_lo, sig_hi = q_step * 0.25, (hi - lo)
    mu_c = np.linspace(lo, hi, n_mu)
    sig_c = np.exp(np.linspace(math.log(sig_lo), math.log(sig_hi), n_sig))
    v = lo + np.arange(nsym, dtype=np.float64) * q_step
    erf = np.vectorize(math.erf)

    def cdf(x):
        return 0.5 * (1.0 + erf(x / math.sqrt(2.0)))

    rows = np.empty((n_mu * n_sig, nsym), np.uint32)
    for i, mu in enumerate(mu_c):
        for j, sg in enumerate(sig_c):
            up = cdf((v + 0.5 * q_step - mu) / sg)
            dn = cdf((v - 0.5 * q_step - mu) / sg)
            p = up - dn
            p[0] += dn[0]  # fold the tails into the edge symbols
            p[-1] += 1.0 - up[-1]
            rows[i * n_sig + j] = native.quantize_freqs(
                np.maximum((p * 1e9).astype(np.uint64), 1)
            )
    return rows, (sig_lo, sig_hi)


def _gauss_ctx_ids(mean, scale, lo, hi, sig_lo, sig_hi, n_mu, n_sig):
    mu_idx = np.clip(
        np.round((mean - lo) / (hi - lo) * (n_mu - 1)), 0, n_mu - 1
    ).astype(np.int64)
    s = np.clip(scale, sig_lo, sig_hi)
    sig_idx = np.clip(
        np.round(
            (np.log(s) - np.log(sig_lo))
            / (np.log(sig_hi) - np.log(sig_lo)) * (n_sig - 1)
        ),
        0, n_sig - 1,
    ).astype(np.int64)
    return (mu_idx * n_sig + sig_idx).astype(np.uint16)


def _pack_gauss_model(params) -> Dict:
    """Binarized export: grids ship as sign bits (the model is trained
    through the STE sign, so +-1 tables reproduce inference exactly)."""
    out = {
        "grid3d_bits": np.packbits(np.asarray(params["grid3d"]) >= 0),
        "grid3d_shape": np.asarray(params["grid3d"]).shape,
        "planes_bits": [
            np.packbits(np.asarray(p) >= 0) for p in params["planes"]
        ],
        "planes_shape": np.asarray(params["planes"][0]).shape,
        "mlp": [
            {k: np.asarray(v, np.float32) for k, v in layer.items()}
            for layer in params["mlp"]
        ],
    }
    return out


def _unpack_gauss_model(packed) -> Dict:
    import jax.numpy as jnp

    def bits_to_pm1(bits, shape):
        n = int(np.prod(shape))
        return jnp.asarray(
            (np.unpackbits(bits)[:n].astype(np.float32) * 2.0 - 1.0)
            .reshape(shape)
        )

    return {
        "grid3d": bits_to_pm1(packed["grid3d_bits"], packed["grid3d_shape"]),
        "planes": [
            bits_to_pm1(b, packed["planes_shape"])
            for b in packed["planes_bits"]
        ],
        "mlp": [
            {k: jnp.asarray(v) for k, v in layer.items()}
            for layer in packed["mlp"]
        ],
    }


def _encode_attr_ans_gauss(compress_dir, name, arr2d, lo, hi, bits, payload,
                           positions, n_mu=48, n_sig=16):
    """Context rANS against the position-conditioned Gaussian model
    (reference _compress_gaussian_ans, entropy_coding_compression.py:491+):
    context = decoded-position-derived (mu, sigma) bin; only the binarized
    model ships."""
    import jax.numpy as jnp
    from gscodec_studio_tpu.compression_sim.hash_grid import (
        gaussian_conditional_apply,
    )

    params, cfgs = payload
    n, C = arr2d.shape
    nsym = 2**bits
    q_step = (hi - lo) / (nsym - 1)
    symbols = np.clip(
        np.round((np.clip(arr2d, lo, hi) - lo) / q_step), 0, nsym - 1
    ).astype(np.uint8)

    mean, scale = map(np.asarray, gaussian_conditional_apply(
        params, cfgs, jnp.asarray(positions), binarize=True
    ))
    freqs, (sig_lo, sig_hi) = _gauss_ctx_freqs(lo, hi, nsym, q_step,
                                               n_mu, n_sig)
    blobs = []
    for c in range(C):
        ctx = _gauss_ctx_ids(mean[:, c], scale[:, c], lo, hi, sig_lo,
                             sig_hi, n_mu, n_sig)
        blobs.append(native.rans_encode_ctx(symbols[:, c], ctx, freqs))
    with open(os.path.join(compress_dir, f"{name}.ans"), "wb") as fh:
        for b in blobs:
            fh.write(len(b).to_bytes(8, "little"))
            fh.write(b)
    with open(os.path.join(compress_dir, f"{name}_gmodel.pkl"), "wb") as fh:
        pickle.dump(
            {"packed": _pack_gauss_model(params),
             "cfgs": (cfgs[0], cfgs[1], cfgs[2])},
            fh,
        )
    return {
        "kind": "ans_gauss", "n": n, "channels": C, "bits": bits,
        "lo": lo, "hi": hi, "n_mu": n_mu, "n_sig": n_sig,
    }


def _decode_attr_ans_gauss(compress_dir, name, meta, positions) -> np.ndarray:
    import jax.numpy as jnp
    from gscodec_studio_tpu.compression_sim.hash_grid import (
        gaussian_conditional_apply,
    )

    n, C, bits = meta["n"], meta["channels"], meta["bits"]
    lo, hi = meta["lo"], meta["hi"]
    n_mu, n_sig = meta["n_mu"], meta["n_sig"]
    nsym = 2**bits
    q_step = (hi - lo) / (nsym - 1)
    with open(os.path.join(compress_dir, f"{name}_gmodel.pkl"), "rb") as fh:
        stored = pickle.load(fh)
    params = _unpack_gauss_model(stored["packed"])
    mean, scale = map(np.asarray, gaussian_conditional_apply(
        params, tuple(stored["cfgs"]), jnp.asarray(positions), binarize=True
    ))
    freqs, (sig_lo, sig_hi) = _gauss_ctx_freqs(lo, hi, nsym, q_step,
                                               n_mu, n_sig)
    out = np.zeros((n, C), np.float32)
    with open(os.path.join(compress_dir, f"{name}.ans"), "rb") as fh:
        for c in range(C):
            ln = int.from_bytes(fh.read(8), "little")
            blob = fh.read(ln)
            ctx = _gauss_ctx_ids(mean[:, c], scale[:, c], lo, hi, sig_lo,
                                 sig_hi, n_mu, n_sig)
            syms = native.rans_decode_ctx(blob, ctx, freqs, n)
            out[:, c] = syms.astype(np.float32) * q_step + lo
    return out


def _norm_positions(means: np.ndarray, lo_p, hi_p) -> np.ndarray:
    return np.clip(
        (means - lo_p) / np.maximum(hi_p - lo_p, 1e-6), 0.0, 1.0
    ).astype(np.float32)


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
        # Means go first: gaussian-conditional attrs are coded against
        # contexts derived from the DECODED positions, which the decoder
        # reproduces bit-exactly (entropy_coding_compression.py:491+).
        positions = None
        needs_ctx = any(
            isinstance((entropy_models or {}).get(a), tuple)
            and (entropy_models or {}).get(a)[0] == "gaussian"
            for a in self.ans_attrs
        )
        order = ["means"] + [k for k in splats if k != "means"]
        for name in order:
            v = splats[name]
            flat = v.reshape(len(v), -1)
            if name in self.ans_attrs and name in BOUNDS:
                lo, hi = BOUNDS[name]
                bits = Q_BITWIDTH.get(name, 8)
                em = (entropy_models or {}).get(name)
                if isinstance(em, tuple) and em[0] == "gaussian":
                    meta["attrs"][name] = _encode_attr_ans_gauss(
                        compress_dir, name, flat, lo, hi, bits, em[1],
                        positions,
                    )
                else:
                    meta["attrs"][name] = _encode_attr_ans(
                        compress_dir, name, flat, lo, hi, bits, em
                    )
            elif name == "means":
                grid = v.reshape(side, side, -1)
                meta["attrs"][name] = codecs.compress_png_16bit(
                    compress_dir, name, grid, log_space=True
                )
                if needs_ctx:
                    dec_means = np.asarray(
                        codecs.decompress_png_16bit(
                            compress_dir, name, meta["attrs"][name]
                        ),
                        np.float32,
                    ).reshape(side * side, -1)
                    lo_p = np.percentile(dec_means, 1.0, axis=0)
                    hi_p = np.percentile(dec_means, 99.0, axis=0)
                    meta["pos_lo"] = lo_p.tolist()
                    meta["pos_hi"] = hi_p.tolist()
                    positions = _norm_positions(dec_means, lo_p, hi_p)
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
        positions = None
        # decode means first so gaussian-ctx attrs can derive positions
        names = sorted(
            meta["attrs"], key=lambda k: (k != "means")
        )
        for name in names:
            m = meta["attrs"][name]
            if m["kind"] == "ans_gauss":
                arr = _decode_attr_ans_gauss(compress_dir, name, m, positions)
            elif m["kind"] == "ans":
                arr = _decode_attr_ans(compress_dir, name, m)
            elif m["kind"] == "png16":
                arr = codecs.decompress_png_16bit(compress_dir, name, m)
            elif m["kind"] == "kmeans":
                arr = codecs.decompress_kmeans(compress_dir, name, m)
            else:
                arr = codecs.decompress_npz(compress_dir, name, m)
            arr = np.asarray(arr, np.float32)
            if name == "means" and "pos_lo" in meta:
                positions = _norm_positions(
                    arr.reshape(n, -1),
                    np.asarray(meta["pos_lo"], np.float32),
                    np.asarray(meta["pos_hi"], np.float32),
                )
            if name == "opacities":
                out[name] = arr.reshape(n)
            elif name == "sh0":
                out[name] = arr.reshape(n, 1, 3)
            elif name == "shN":
                out[name] = arr.reshape(n, -1, 3)
            else:
                out[name] = arr.reshape(n, -1)
        return out
