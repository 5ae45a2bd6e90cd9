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


@partial(jax.jit, static_argnames=("k", "iters", "chunk"))
def kmeans_fit_chunked(vectors, weights, init_centroids, k: int, iters: int = 10,
                       chunk: int = 65536):
    """Lloyd's k-means with the (N, K) score matrix CHUNKED over N.

    The unchunked form materializes (N, K) f32 in HBM — at 8M rows x
    ~2.9k clusters that is ~92 GB, far past one chip. Here assignment
    runs per chunk inside a lax.scan (memory O(chunk*K)), accumulating
    segment sums; per-row argmax is identical to the unchunked form, and
    the scan's fixed chunk order keeps the float accumulation
    deterministic (centroids can differ from the unchunked form only in
    final-ulp summation order). Requires n % chunk == 0; callers pad and
    pass ``weights`` (1.0 real row, 0.0 pad) so pad rows never move a
    centroid.
    """
    n, d = vectors.shape
    nc = n // chunk
    vc = vectors.reshape(nc, chunk, d)
    wc = weights.reshape(nc, chunk)

    def step(_, centroids):
        def chunk_stats(carry, xs):
            vb, wb = xs
            sums, counts = carry
            scores = jnp.dot(vb, centroids.T, preferred_element_type=jnp.float32)
            assign = jnp.argmax(scores, axis=1).astype(jnp.int32)
            sums = sums + jax.ops.segment_sum(vb * wb[:, None], assign, num_segments=k)
            counts = counts + jax.ops.segment_sum(wb, assign, num_segments=k)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            chunk_stats,
            (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32)),
            (vc, wc),
        )
        new_centroids = sums / jnp.maximum(counts, 1.0)[:, None]
        new_centroids = jnp.where(counts[:, None] > 0, new_centroids, centroids)
        norms = jnp.linalg.norm(new_centroids, axis=1, keepdims=True)
        return new_centroids / jnp.maximum(norms, 1e-12)

    centroids = jax.lax.fori_loop(0, iters, step, init_centroids)

    def chunk_assign(vb):
        scores = jnp.dot(vb, centroids.T, preferred_element_type=jnp.float32)
        return jnp.argmax(scores, axis=1).astype(jnp.int32)

    assignments = jax.lax.map(chunk_assign, vc).reshape(n)
    return centroids, assignments


# Above this row count the (N, K) assignment matrix stops fitting in HBM
# alongside the corpus and kmeans switches to the chunked form.
_CHUNKED_MIN_ROWS = 1 << 20


def kmeans(vectors: np.ndarray, k: int, iters: int = 10) -> tuple[np.ndarray, np.ndarray]:
    """Host wrapper. Returns numpy (centroids, assignments)."""
    v = np.asarray(vectors, np.float32)
    n = len(v)
    if n >= _CHUNKED_MIN_ROWS:
        chunk = 65536
        pad = (-n) % chunk
        w = np.ones(n + pad, np.float32)
        if pad:
            v = np.concatenate([v, np.zeros((pad, v.shape[1]), np.float32)])
            w[n:] = 0.0
        # even-strided init over the REAL rows (pad rows are zeros and
        # must never seed a centroid)
        idx = (np.arange(k) * (n // k)).clip(0, n - 1)
        c, a = kmeans_fit_chunked(
            jnp.asarray(v), jnp.asarray(w), jnp.asarray(v[idx]),
            k=k, iters=iters, chunk=chunk,
        )
        return np.asarray(c), np.asarray(a)[:n]
    c, a = kmeans_fit(jnp.asarray(v, jnp.float32), k=k, iters=iters)
    return np.asarray(c), np.asarray(a)


@partial(jax.jit, static_argnames=("k", "iters", "chunk"))
def kmeans_fit_int8(corpus_i8, scales, init_centroids, k: int, iters: int = 10,
                    chunk: int = 65536):
    """Chunked Lloyd's over an int8-quantized corpus, dequantized per chunk
    IN the program — the 8M+ build path: the resident operand is the 1-byte
    corpus (3 GB at 8M x 384) instead of the 12 GB f32 matrix, and the
    dequant multiply fuses into the chunk's assignment matmul. Assignment
    math is identical to the f32 form on the dequantized values."""
    n, d = corpus_i8.shape
    nc = n // chunk
    cc = corpus_i8.reshape(nc, chunk, d)
    sc = scales.reshape(nc, chunk)

    def step(_, centroids):
        def chunk_stats(carry, xs):
            cb, sb = xs
            vb = cb.astype(jnp.float32) * sb[:, None]
            sums, counts = carry
            scores = jnp.dot(vb, centroids.T, preferred_element_type=jnp.float32)
            assign = jnp.argmax(scores, axis=1).astype(jnp.int32)
            w = (sb > 0).astype(jnp.float32)  # scale 0 marks a pad row
            sums = sums + jax.ops.segment_sum(vb * w[:, None], assign, num_segments=k)
            counts = counts + jax.ops.segment_sum(w, assign, num_segments=k)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            chunk_stats,
            (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32)),
            (cc, sc),
        )
        new_centroids = sums / jnp.maximum(counts, 1.0)[:, None]
        new_centroids = jnp.where(counts[:, None] > 0, new_centroids, centroids)
        norms = jnp.linalg.norm(new_centroids, axis=1, keepdims=True)
        return new_centroids / jnp.maximum(norms, 1e-12)

    centroids = jax.lax.fori_loop(0, iters, step, init_centroids)

    def chunk_assign(xs):
        cb, sb = xs
        vb = cb.astype(jnp.float32) * sb[:, None]
        scores = jnp.dot(vb, centroids.T, preferred_element_type=jnp.float32)
        return jnp.argmax(scores, axis=1).astype(jnp.int32)

    assignments = jax.lax.map(chunk_assign, (cc, sc)).reshape(n)
    return centroids, assignments
