"""K-means vector quantization in JAX (replaces the reference's TorchPQ GPU
KMeans used for shN VQ, png_compression.py:444-449 / :521-601).

Minibatch Lloyd iterations with matmul distances — the assignment step is one
[B, K] matmul per chunk, which XLA puts on the MXU/accelerator; runs fine on
CPU for tests.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def kmeans(
    x: np.ndarray,  # [N, D]
    n_clusters: int,
    iters: int = 10,
    chunk: int = 65536,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (centroids [K, D], labels [N])."""
    n, d = x.shape
    k = min(n_clusters, n)
    rng = np.random.default_rng(seed)
    centroids = jnp.asarray(x[rng.choice(n, k, replace=False)], jnp.float32)
    xj = jnp.asarray(x, jnp.float32)
    x_sq = jnp.sum(xj * xj, axis=1)

    @jax.jit
    def assign_chunk(c, xc, xc_sq):
        # squared L2 via the matmul identity
        d2 = (
            xc_sq[:, None]
            - 2.0 * xc @ c.T
            + jnp.sum(c * c, axis=1)[None, :]
        )
        return jnp.argmin(d2, axis=1)

    @jax.jit
    def update(c, labels):
        sums = jax.ops.segment_sum(xj, labels, num_segments=k)
        counts = jax.ops.segment_sum(
            jnp.ones(n, jnp.float32), labels, num_segments=k
        )
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        # keep empty clusters where they were
        return jnp.where(counts[:, None] > 0, new_c, c)

    labels = jnp.zeros(n, jnp.int32)
    for _ in range(iters):
        parts = []
        for lo in range(0, n, chunk):
            parts.append(
                assign_chunk(centroids, xj[lo : lo + chunk], x_sq[lo : lo + chunk])
            )
        labels = jnp.concatenate(parts)
        centroids = update(centroids, labels)
    return np.asarray(centroids), np.asarray(labels, np.int64)
