"""Fused device recall: the whole scoring funnel as ONE XLA program.

BASELINE config 4 ("hybrid recall: vector score + Hebbian strength + decay
+ spreading-activation fusion") — at host scale the funnel orchestrates
per-candidate maps; at device scale every per-memory signal lives in an
aligned array and the entire pipeline

    cosine -> FLAT fusion with BM25 -> graph-activation bonus
           -> L5 unified scoring (importance x recency x arousal x
              credibility x feedback x tag penalty, capped boosts)
           -> deterministic top-k

compiles to a single jitted program: one matmul + elementwise epilogue +
top-k, no host roundtrips. Math mirrors engine/scoring.py and
retrieval/fusion.py exactly (parity-tested).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from shodh_tpu import constants as C
from shodh_tpu.ops.distance import NEG_INF
from shodh_tpu.retrieval.fusion import FLAT_CONSENSUS


@partial(jax.jit, static_argnames=("k",))
def fused_recall(
    query,  # (D,) f32 L2-normalized
    corpus,  # (N, D) f32 or int8
    scales,  # (N,) f32 dequant scales (ones for f32)
    valid,  # (N,) f32 {0,1}
    bm25,  # (N,) f32 raw BM25 scores (0 where absent)
    graph_activation,  # (N,) f32 in [0,1] (0 where absent)
    importance,  # (N,) f32
    hours_old,  # (N,) f32
    arousal,  # (N,) f32
    credibility,  # (N,) f32
    momentum,  # (N,) f32 in [-1,1]
    tag_penalty,  # (N,) f32
    graph_density,  # scalar f32 (edges/entity)
    k: int,
):
    """Returns (scores (k,), rows (k,)) — the funnel's final ranking."""
    # L3 vector leg: cosine via MXU
    raw = jnp.dot(corpus.astype(jnp.float32), query, precision=jax.lax.Precision.HIGHEST)
    cos = raw * scales

    # L4 FLAT fusion (fusion.py flat_fuse, vec_raw form)
    graph_on = jnp.any(graph_activation > 0)
    graph_w = jnp.where(
        graph_on,
        jnp.clip(
            C.DENSITY_GRAPH_WEIGHT_MAX
            + (graph_density - C.DENSITY_THRESHOLD_MIN)
            / (C.DENSITY_THRESHOLD_MAX - C.DENSITY_THRESHOLD_MIN)
            * (C.DENSITY_GRAPH_WEIGHT_MIN - C.DENSITY_GRAPH_WEIGHT_MAX),
            C.DENSITY_GRAPH_WEIGHT_MIN,
            C.DENSITY_GRAPH_WEIGHT_MAX,
        ),
        0.0,
    )
    hybrid_w = 1.0 - graph_w
    max_bm = jnp.maximum(jnp.max(bm25), 1e-6)
    vn = jnp.clip(cos, 0.0, 1.0)
    bn = jnp.clip(bm25 / max_bm, 0.0, 1.0)
    hi = jnp.maximum(vn, bn)
    lo = jnp.minimum(vn, bn)
    fused = hybrid_w * (hi + FLAT_CONSENSUS * lo)
    # graph leg: calibrated magnitude + multiplicative activation bonus
    max_act = jnp.maximum(jnp.max(graph_activation), 1e-6)
    fused = fused + graph_w * jnp.clip(graph_activation / max_act, 0.0, 1.0)
    fused = fused * (1.0 + graph_w * C.ACTIVATION_BONUS_SCALE * jnp.clip(graph_activation, 0.0, 1.0))

    # L5 unified scoring (engine/scoring.py unified_score)
    recency = jnp.exp(-C.RECENCY_DECAY_RATE * hours_old) * C.RECENCY_BOOST_SCALE
    arousal_f = arousal * C.AROUSAL_BOOST_SCALE
    cred_f = jnp.maximum(credibility - 0.5, 0.0) * C.CREDIBILITY_BOOST_SCALE
    boosts = jnp.minimum(C.SCORING_BOOST_CAP, 1.0 + recency + arousal_f + cred_f)
    imp = C.SCORING_IMPORTANCE_FLOOR + importance * C.SCORING_IMPORTANCE_RANGE
    mom = jnp.clip(
        momentum * C.FEEDBACK_MOMENTUM_SCALE,
        -C.FEEDBACK_MOMENTUM_SCALE,
        C.FEEDBACK_MOMENTUM_SCALE,
    )
    final = fused * imp * boosts * (1.0 + mom) * tag_penalty

    final = final * valid + (1.0 - valid) * NEG_INF
    vals, rows = jax.lax.top_k(final, k)
    return vals, rows


# Working-set sweet spot for the batched funnel, measured at 1M x 384 on
# v5e: B=32 runs 5.5 ms/batch (5.8k QPS) while one flat B=256 program takes
# 90 ms (2.8k QPS) — the (B, N) scatter planes + top_k blow past the
# cache-friendly regime. Device-side chunking was measured and REJECTED:
# lax.map pays 14-15 ms/chunk (scan bodies lose matmul pipelining against
# the resident corpus) and static unrolling exceeds the remote-compile
# 2 GiB HLO serialization limit at 8 chunks. Large batches are therefore
# WINDOWED AT THE HOST layer (engine/device_funnel.py slices into CHUNK_B
# dispatches — ~100 us dispatch overhead per window on local TPUs).
CHUNK_B = 32


@partial(jax.jit, static_argnames=("k",))
def fused_recall_batch(
    queries,  # (B, D) f32 L2-normalized
    corpus,  # (N, D) f32 or int8
    scales,  # (N,) f32
    valid,  # (N,) f32 {0,1}
    bm25_rows,  # (B, Hb) int32 sparse BM25 hit rows (pad: row 0, val 0)
    bm25_vals,  # (B, Hb) f32
    graph_rows,  # (B, Hg) int32 sparse graph-activation rows
    graph_vals,  # (B, Hg) f32
    importance,  # (N,) f32
    hours_old,  # (N,) f32
    arousal,  # (N,) f32
    credibility,  # (N,) f32
    momentum,  # (N,) f32
    tag_penalty,  # (N,) f32
    graph_density,  # scalar f32
    k: int,
):
    """Batched fused funnel: (B, k) scores+rows in ONE program.

    Identical math to :func:`fused_recall` vectorized over the query axis;
    the sparse BM25/graph legs ship as (B, H) hit lists and scatter-max
    into dense (B, N) planes ON DEVICE (shipping dense planes from host
    would move B*N floats per batch)."""
    b = queries.shape[0]
    n = corpus.shape[0]

    raw = jax.lax.dot_general(
        queries, corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, N)
    cos = raw * scales[None, :]

    bidx = jnp.arange(b)[:, None]
    bm25 = jnp.zeros((b, n), jnp.float32).at[bidx, bm25_rows].max(bm25_vals)
    graph_activation = jnp.zeros((b, n), jnp.float32).at[bidx, graph_rows].max(graph_vals)

    graph_on = jnp.any(graph_activation > 0, axis=1, keepdims=True)  # (B, 1)
    graph_w = jnp.where(
        graph_on,
        jnp.clip(
            C.DENSITY_GRAPH_WEIGHT_MAX
            + (graph_density - C.DENSITY_THRESHOLD_MIN)
            / (C.DENSITY_THRESHOLD_MAX - C.DENSITY_THRESHOLD_MIN)
            * (C.DENSITY_GRAPH_WEIGHT_MIN - C.DENSITY_GRAPH_WEIGHT_MAX),
            C.DENSITY_GRAPH_WEIGHT_MIN,
            C.DENSITY_GRAPH_WEIGHT_MAX,
        ),
        0.0,
    )
    hybrid_w = 1.0 - graph_w
    max_bm = jnp.maximum(jnp.max(bm25, axis=1, keepdims=True), 1e-6)
    vn = jnp.clip(cos, 0.0, 1.0)
    bn = jnp.clip(bm25 / max_bm, 0.0, 1.0)
    hi = jnp.maximum(vn, bn)
    lo = jnp.minimum(vn, bn)
    fused = hybrid_w * (hi + FLAT_CONSENSUS * lo)
    max_act = jnp.maximum(jnp.max(graph_activation, axis=1, keepdims=True), 1e-6)
    fused = fused + graph_w * jnp.clip(graph_activation / max_act, 0.0, 1.0)
    fused = fused * (
        1.0 + graph_w * C.ACTIVATION_BONUS_SCALE * jnp.clip(graph_activation, 0.0, 1.0)
    )

    recency = jnp.exp(-C.RECENCY_DECAY_RATE * hours_old) * C.RECENCY_BOOST_SCALE
    arousal_f = arousal * C.AROUSAL_BOOST_SCALE
    cred_f = jnp.maximum(credibility - 0.5, 0.0) * C.CREDIBILITY_BOOST_SCALE
    boosts = jnp.minimum(C.SCORING_BOOST_CAP, 1.0 + recency + arousal_f + cred_f)
    imp = C.SCORING_IMPORTANCE_FLOOR + importance * C.SCORING_IMPORTANCE_RANGE
    mom = jnp.clip(
        momentum * C.FEEDBACK_MOMENTUM_SCALE,
        -C.FEEDBACK_MOMENTUM_SCALE,
        C.FEEDBACK_MOMENTUM_SCALE,
    )
    final = fused * (imp * boosts * (1.0 + mom) * tag_penalty)[None, :]

    final = final * valid[None, :] + (1.0 - valid[None, :]) * NEG_INF
    vals, rows = jax.lax.top_k(final, k)
    return vals, rows
