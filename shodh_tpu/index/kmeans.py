"""Batched k-means on device — the ANN partitioner.

Replaces the reference's CPU k-means for SPANN partitioning and PQ codebook
training (``src/vector_db/spann.rs``, ``pq.rs``) with an XLA program:
assignment is one (N, D) x (D, K) MXU matmul + argmax, update is a
segment-sum — both embarrassingly batched, no Python in the loop
(lax.fori_loop over iterations).

Deterministic: init samples evenly-spaced points from the (insertion-
ordered) corpus, ties in assignment break to the lowest cluster id.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_fit(vectors, k: int, iters: int = 10):
    """Lloyd's k-means. vectors: (N, D) f32 (unit-norm works fine).

    Returns (centroids (K, D), assignments (N,) int32).
    """
    n, d = vectors.shape
    # Even-strided init: deterministic, spreads over insertion order.
    idx = (jnp.arange(k) * (n // k)).clip(0, n - 1)
    init_centroids = vectors[idx]

    def step(_, centroids):
        # Assign: cosine/dot distance (vectors unit-norm -> dot works)
        scores = jnp.dot(vectors, centroids.T, preferred_element_type=jnp.float32)
        assign = jnp.argmax(scores, axis=1).astype(jnp.int32)
        # Update: segment mean
        sums = jax.ops.segment_sum(vectors, assign, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), assign, num_segments=k)
        new_centroids = sums / jnp.maximum(counts, 1.0)[:, None]
        # Empty clusters keep their previous centroid
        new_centroids = jnp.where(counts[:, None] > 0, new_centroids, centroids)
        # Re-normalize for cosine geometry
        norms = jnp.linalg.norm(new_centroids, axis=1, keepdims=True)
        return new_centroids / jnp.maximum(norms, 1e-12)

    centroids = jax.lax.fori_loop(0, iters, step, init_centroids)
    scores = jnp.dot(vectors, centroids.T, preferred_element_type=jnp.float32)
    assignments = jnp.argmax(scores, axis=1).astype(jnp.int32)
    return centroids, assignments


def kmeans(vectors: np.ndarray, k: int, iters: int = 10) -> tuple[np.ndarray, np.ndarray]:
    """Host wrapper. Returns numpy (centroids, assignments)."""
    c, a = kmeans_fit(jnp.asarray(vectors, jnp.float32), k=k, iters=iters)
    return np.asarray(c), np.asarray(a)
