"""Batched cosine-distance scoring + exact top-k on device.

Replaces the reference's SIMD distance kernels and per-query graph walk
(``src/vector_db/distance_inline.rs``, ``vamana.rs:764``, ``similarity.rs``)
with MXU matmuls over a device-resident corpus matrix.

Two execution strategies, selected by corpus size:

- ``brute_topk`` (this module): one ``Q @ C^T`` matmul then ``lax.top_k``.
  Optimal at small/medium N where the (B, N) score matrix is cheap.
- ``two_level_topk`` (ops/fused_topk.py): Pallas kernel fusing the matmul
  with a per-group max reduction so the full score matrix never touches
  HBM; exact top-k recovered from the top-scoring groups. Optimal at
  N >= ~64k where HBM bandwidth dominates.

Determinism: all paths tie-break equal scores by ascending row id (the
reference's pervasive invariant, retrieval.rs:944-948) — ``lax.top_k``
prefers lower indices on ties and rows are assigned in insert order.

Vectors are L2-normalized at encode time, so cosine similarity == dot
product; no per-query norm work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def masked_scores(queries, corpus, valid, scales=None):
    """(B, N) cosine scores with invalid rows forced to -inf.

    Args:
      queries: (B, D) f32, L2-normalized.
      corpus: (N, D) f32 or int8.
      valid: (N,) f32 {0, 1} — 0 for padding/deleted rows.
      scales: (N,) f32 per-row dequant scales when corpus is int8.
    """
    if corpus.dtype == jnp.int8:
        # Dequant rides the matmul epilogue: (q . c_int8) * scale.
        raw = jax.lax.dot_general(
            queries,
            corpus,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        scores = raw * scales[None, :]
    else:
        scores = jax.lax.dot_general(
            queries,
            corpus,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return scores * valid[None, :] + (1.0 - valid[None, :]) * NEG_INF


@partial(jax.jit, static_argnames=("k",))
def brute_topk(queries, corpus, valid, k: int, scales=None):
    """Exact top-k rows by cosine score. Returns (values (B,k), rows (B,k)).

    Rows whose score is NEG_INF (masked) may appear when fewer than k valid
    rows exist; callers filter by value > NEG_INF/2.
    """
    scores = masked_scores(queries, corpus, valid, scales)
    return jax.lax.top_k(scores, k)


@jax.jit
def score_rows(queries, corpus, rows, valid, scales=None):
    """Exact scores for specific corpus rows per query.

    Args:
      queries: (B, D); rows: (B, R) int32 row ids.
    Returns: (B, R) f32 scores (masked rows -> -inf).
    """
    gathered = corpus[rows]  # (B, R, D)
    if corpus.dtype == jnp.int8:
        raw = jnp.einsum(
            "bd,brd->br", queries, gathered.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        scores = raw * scales[rows]
    else:
        scores = jnp.einsum("bd,brd->br", queries, gathered, precision=jax.lax.Precision.HIGHEST)
    v = valid[rows]
    return scores * v + (1.0 - v) * NEG_INF


def l2_normalize(x, eps: float = 1e-12):
    """L2-normalize with NaN scrub (reference: minilm.rs `normalize` :598)."""
    x = jnp.nan_to_num(x)
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, eps)
