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


@partial(jax.jit, static_argnames=("k", "vec_k"))
def fused_recall_pool(
    queries,  # (Q, D) f32 L2-normalized — positive + negated polar form
    #           (duplicate the positive query when there is no negated form)
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
    speaker_hash,  # (N,) i32 — crc32 of the utterance speaker prefix, 0=none
    row_flags,  # (N, 3) f32 — [has temporal_refs, has toponyms, has causal marker]
    q_ent_hashes,  # (E,) i32 — crc32 of query entities, pad -1
    q_flags,  # (4,) f32 — [is_temporal_seeking, where-question, causal-question, date_on]
    q_age_range,  # (2,) f32 — date window as [min_age_h, max_age_h] bounds on hours_old
    q_scalars,  # (3,) f32 — [temporal_match boost value, recency scale, flat consensus]
    k: int,
    vec_k: int,  # host vec-leg truncation: only the top vec_k rows per query
    #             enter the vector leg (index.search semantics — the cut is a
    #             measured noise filter; giving every row its true cosine
    #             ranked WORSE on locomo-gate: p@1 .32 vs .35)
):
    """Pool proposal for the reunified device funnel (round-2 verdict #1).

    Same L4 fusion + L5 scoring as :func:`fused_recall`, PLUS the round-2
    candidate boost stack mirrored per-row (speaker match mod.rs:3396-4730
    analog, temporal_refs presence, answer-type signals, temporal-prefilter
    window + temporal_match recency semantics) so pool SELECTION can't miss
    a boost-rescued gold. Returns

        (final (k,), rows (k,), fused (k,), cos (k,))

    where ``fused`` is the PRE-boost L4 value and ``cos`` the raw cosine —
    the host epilogue (memory_system._rank_pool) re-applies the exact boost
    stack and L5 scoring on the pool, so the served ranking is identical to
    the staged host funnel's; the device score only decides membership.
    """
    consensus = q_scalars[2]
    rscale = q_scalars[1]

    # L3 vector leg: union of positive+negated embeddings keeping best,
    # with the host funnel's per-query top-vec_k admission cut (rows below
    # a query's vec_k-th cosine do not enter that query's vector leg)
    raw = jax.lax.dot_general(
        queries, corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (Q, N)
    cos_q = raw * scales[None, :]  # (Q, N) dequantized cosines
    masked_q = cos_q * valid[None, :] + (1.0 - valid[None, :]) * NEG_INF
    # admission threshold = per-query vec_k-th cosine, via the two-level
    # group selection (bit-identical to lax.top_k, ~1.5x cheaper at corpus
    # scale — the full-array top_k here was 40% of the pool program)
    from shodh_tpu.ops.fused_topk import exact_topk_scores

    thr = exact_topk_scores(masked_q, min(vec_k, corpus.shape[0]))[0][:, -1]  # (Q,)
    admitted_q = jnp.where(masked_q >= thr[:, None], cos_q, NEG_INF)
    cos_adm = jnp.max(admitted_q, axis=0)  # (N,) NEG_INF where not admitted
    cos = jnp.where(cos_adm > NEG_INF * 0.5, cos_adm, 0.0)

    # L4 FLAT fusion (fusion.py flat_fuse, vec_raw form, vec_trust=1)
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
    fused = hybrid_w * (hi + consensus * lo)
    max_act = jnp.maximum(jnp.max(graph_activation), 1e-6)
    fused = fused + graph_w * jnp.clip(graph_activation / max_act, 0.0, 1.0)
    fused = fused * (1.0 + graph_w * C.ACTIVATION_BONUS_SCALE * jnp.clip(graph_activation, 0.0, 1.0))

    # Round-2 boost stack, selection-score arm (host re-applies exactly):
    spk_match = jnp.logical_and(
        speaker_hash > 0,
        jnp.any(speaker_hash[:, None] == q_ent_hashes[None, :], axis=1),
    ).astype(jnp.float32)
    boosted = fused * (1.0 + C.SPEAKER_MATCH_BOOST * spk_match)
    boosted = boosted * (1.0 + C.SEEK_TEMPORAL_REFS_BOOST * q_flags[0] * row_flags[:, 0])
    boosted = boosted * (
        1.0 + C.ANSWER_TYPE_BOOST * (q_flags[1] * row_flags[:, 1] + q_flags[2] * row_flags[:, 2])
    )
    in_window = jnp.logical_and(
        hours_old >= q_age_range[0], hours_old <= q_age_range[1]
    ).astype(jnp.float32) * q_flags[3]
    boosted = boosted * (1.0 + C.TEMPORAL_PREFILTER_BOOST * in_window)

    # L5 unified scoring (engine/scoring.py unified_score incl. the
    # temporal_match additive term and the seek-recency scale)
    recency = jnp.exp(-C.RECENCY_DECAY_RATE * hours_old) * rscale
    arousal_f = arousal * C.AROUSAL_BOOST_SCALE
    cred_f = jnp.maximum(credibility - 0.5, 0.0) * C.CREDIBILITY_BOOST_SCALE
    tmatch = in_window * q_scalars[0]
    boosts = jnp.minimum(C.SCORING_BOOST_CAP, 1.0 + recency + arousal_f + cred_f + tmatch)
    imp = C.SCORING_IMPORTANCE_FLOOR + importance * C.SCORING_IMPORTANCE_RANGE
    mom = jnp.clip(
        momentum * C.FEEDBACK_MOMENTUM_SCALE,
        -C.FEEDBACK_MOMENTUM_SCALE,
        C.FEEDBACK_MOMENTUM_SCALE,
    )
    final = boosted * imp * boosts * (1.0 + mom) * tag_penalty

    final = final * valid + (1.0 - valid) * NEG_INF
    vals, rows = exact_topk_scores(final[None, :], k)
    vals, rows = vals[0], rows[0]
    # cos_adm carries NEG_INF for rows outside the vector-leg admission cut
    # so the host epilogue can reconstruct mem_scores with host-identical
    # membership (PRF re-fusion reads it)
    return vals, rows, fused[rows], cos_adm[rows]


# Dispatch window for the batched funnel. Under the old dense scatter-plane
# form B=32 looked like a sweet spot (5.5 ms/batch vs "90 ms" flat B=256) —
# both numbers were constant-hoisting artifacts: the probe's hit lists were
# loop-invariant, so XLA lifted the scatter out of the timing scan; with
# fresh lists every batch (the serving reality) dense B=32 really cost
# ~70 ms and B=256 ~740 ms at 1M x 384. The sparse-correction form scales
# cleanly with B (measured round 4, H=256 hit lists, fresh per batch):
#   B=32 5.71 ms (5.6k QPS) / B=64 9.43 / B=128 16.41 / B=256 30.26 ms
#   (8.5k QPS — best per-query cost, and one tunnel dispatch instead of 8).
# Device-side chunking stays REJECTED (lax.map loses matmul pipelining;
# static unrolling exceeds the remote-compile 2 GiB HLO limit); batches
# beyond CHUNK_B are WINDOWED AT THE HOST layer (engine/device_funnel.py).
CHUNK_B = 256


def chunk_b(n_rows: int) -> int:
    """Host window size for the batched funnel, derated with corpus rows
    (round-4 advisor #3): the sparse form still materializes two (B, N)
    f32 planes in one program — 8 GB at B=256 on the 4M bucket, untested
    and tight on 16 GB HBM next to the resident corpus. B=256 is the
    measured sweet spot at <=1M rows; above that the window scales down
    to hold the planes at ~2 GB until a hardware measurement says more."""
    if n_rows <= 1 << 20:
        return CHUNK_B
    return max(32, int(CHUNK_B * (1 << 20) / n_rows))


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
    """Batched fused funnel, sparse-correction form: (B, k) in ONE program.

    Bit-identical ranking to :func:`fused_recall_batch_dense` (parity test
    ``tests/test_ops.py::test_batch_funnel_sparse_parity``) but without the
    two dense (B, N) scatter planes: with B=32 at 1M rows those planes cost
    ~512 MB of pure HBM traffic per batch (2x zero-init write + 2x epilogue
    read) to carry <=512 hits/query. Here the BM25/graph legs stay sparse:

      1. base plane  = hybrid_w * clip(cos) * rowfactor  (pure elementwise
         on the dot output — the exact dense value wherever both legs are 0,
         term-for-term in the same op order);
      2. the two hit lists are JOINED on device ((Hb x Hg) equality — tiny)
         so every entry sees BOTH leg values, then the full fusion formula
         runs on the (B, Hb+Hg) entries only;
      3. corrected finals scatter-max into the base plane (corrections are
         provably >= base: hi >= vn, consensus/graph terms are non-negative,
         the activation bonus multiplier >= 1, rowfactor >= 0 — so max =
         replace, and cross-list duplicates compute the same joined value);
      4. selection via the two-level group gather (exact_topk_scores,
         bit-identical to lax.top_k and ~1.5x cheaper at corpus scale —
         measured on the pool program, BENCHMARKS 'reunified pool program').

    Per-query leg scalars (max_bm, max_act, graph_on) come straight from the
    sparse value lists: scores are non-negative, so the max over a 0-padded
    list equals the max over the 0-initialized dense plane."""
    from shodh_tpu.ops.fused_topk import exact_topk_scores

    b = queries.shape[0]

    raw = jax.lax.dot_general(
        queries, corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, N)
    cos = raw * scales[None, :]

    # per-query leg scalars from the sparse lists (identical to the dense
    # plane maxes: scores >= 0, pad val 0)
    graph_on = jnp.any(graph_vals > 0, axis=1, keepdims=True)  # (B, 1)
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
    max_bm = jnp.maximum(jnp.max(bm25_vals, axis=1, keepdims=True), 1e-6)
    max_act = jnp.maximum(jnp.max(graph_vals, axis=1, keepdims=True), 1e-6)

    # row factor — same (N,) op order as the dense form so gathered entries
    # reproduce its bits exactly
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
    rowfactor = imp * boosts * (1.0 + mom) * tag_penalty  # (N,)

    # base plane: both legs zero -> hi = vn, lo = 0, no graph term, bonus
    # multiplier 1 — dense value reduces term-for-term to hybrid_w * vn
    vn = jnp.clip(cos, 0.0, 1.0)
    final = (hybrid_w * vn) * rowfactor[None, :]
    final = final * valid[None, :] + (1.0 - valid[None, :]) * NEG_INF

    # device-side join: every hit entry sees BOTH leg values
    eq = bm25_rows[:, :, None] == graph_rows[:, None, :]  # (B, Hb, Hg)
    act_for_b = jnp.max(jnp.where(eq, graph_vals[:, None, :], 0.0), axis=2)
    bm_for_g = jnp.max(jnp.where(eq, bm25_vals[:, :, None], 0.0), axis=1)
    rows_all = jnp.concatenate([bm25_rows, graph_rows], axis=1)  # (B, H)
    bm_all = jnp.concatenate([bm25_vals, bm_for_g], axis=1)
    act_all = jnp.concatenate([act_for_b, graph_vals], axis=1)

    # full fusion formula on the entries, dense op order preserved
    vn_e = jnp.clip(jnp.take_along_axis(cos, rows_all, axis=1), 0.0, 1.0)
    bn_e = jnp.clip(bm_all / max_bm, 0.0, 1.0)
    hi = jnp.maximum(vn_e, bn_e)
    lo = jnp.minimum(vn_e, bn_e)
    fused_e = hybrid_w * (hi + FLAT_CONSENSUS * lo)
    fused_e = fused_e + graph_w * jnp.clip(act_all / max_act, 0.0, 1.0)
    fused_e = fused_e * (
        1.0 + graph_w * C.ACTIVATION_BONUS_SCALE * jnp.clip(act_all, 0.0, 1.0)
    )
    valid_e = jnp.take(valid, rows_all)
    corr_e = fused_e * jnp.take(rowfactor, rows_all)
    corr_e = corr_e * valid_e + (1.0 - valid_e) * NEG_INF

    bidx = jnp.arange(b)[:, None]
    final = final.at[bidx, rows_all].max(corr_e)
    vals, rows = exact_topk_scores(final, k)
    return vals, rows


@partial(jax.jit, static_argnames=("k",))
def fused_recall_batch_dense(
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
    """Dense-plane reference form of :func:`fused_recall_batch` (identical
    math to :func:`fused_recall` vectorized over the query axis; the sparse
    legs scatter-max into dense (B, N) planes). Kept as the parity oracle
    and A/B arm — the sparse-correction form above is the serving default."""
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


def fused_recall_pool_sharded(mesh, axis: str, k: int, vec_k: int):
    """Row-sharded :func:`fused_recall_pool` over a device mesh (round-4
    verdict #3: the north-star funnel past one chip's HBM).

    Returns a jitted callable with the SAME signature and bit-identical
    outputs as ``fused_recall_pool(..., k=k, vec_k=vec_k)``. Every per-row
    input (corpus + the eleven metadata mirrors) splits along ``axis``;
    query-side inputs replicate. Global reductions become per-shard
    partials + ICI merges, each exact:

    - ``max_bm`` / ``max_act`` / ``graph_on``: per-shard max + ``pmax``
      (max is associative — bitwise the same result);
    - the vector-leg admission threshold (per-query global vec_k-th
      cosine): per-shard exact top-vec_k VALUES + all_gather + merged
      top_k — containment gives exactness, values carry no shard bias;
    - the final pool selection: per-shard exact top-k carrying
      (final, fused, cos_adm, global row), all-gathered in ascending
      shard order and merged — equal-score ties break on the lowest
      global row exactly like the flat ``exact_topk_scores``.

    Communication is O(S·Q·vec_k + S·k) floats over ICI; no (Q, N) or
    (N,) array ever leaves its shard.
    """
    from jax.sharding import PartitionSpec as P

    from shodh_tpu.ops.fused_topk import exact_topk_scores

    n_shards = mesh.shape[axis]

    def _local(queries, corpus, scales, valid, bm25, graph_activation,
               importance, hours_old, arousal, credibility, momentum,
               tag_penalty, graph_density, speaker_hash, row_flags,
               q_ent_hashes, q_flags, q_age_range, q_scalars):
        rows_per_shard = corpus.shape[0]
        shard_idx = jax.lax.axis_index(axis)
        consensus = q_scalars[2]
        rscale = q_scalars[1]

        raw = jax.lax.dot_general(
            queries, corpus,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        cos_q = raw * scales[None, :]
        masked_q = cos_q * valid[None, :] + (1.0 - valid[None, :]) * NEG_INF

        # global per-query vec_k-th cosine: shard-local top-kk values +
        # ICI merge (containment: the global vec_k-th is among the union
        # of shard-local top-vec_k sets)
        n_total = rows_per_shard * n_shards
        global_vk = min(vec_k, n_total)
        kk_v = min(global_vk, rows_per_shard)
        loc_vk = exact_topk_scores(masked_q, kk_v)[0]  # (Q, kk_v)
        all_vk = jax.lax.all_gather(loc_vk, axis)  # (S, Q, kk_v)
        merged_vk = jnp.transpose(all_vk, (1, 0, 2)).reshape(
            loc_vk.shape[0], n_shards * kk_v
        )
        thr = jax.lax.top_k(merged_vk, global_vk)[0][:, -1]  # (Q,)

        admitted_q = jnp.where(masked_q >= thr[:, None], cos_q, NEG_INF)
        cos_adm = jnp.max(admitted_q, axis=0)
        cos = jnp.where(cos_adm > NEG_INF * 0.5, cos_adm, 0.0)

        # L4 fusion with pmax'd leg scalars
        graph_on = (
            jax.lax.pmax(jnp.any(graph_activation > 0).astype(jnp.int32), axis) > 0
        )
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
        max_bm = jnp.maximum(jax.lax.pmax(jnp.max(bm25), axis), 1e-6)
        vn = jnp.clip(cos, 0.0, 1.0)
        bn = jnp.clip(bm25 / max_bm, 0.0, 1.0)
        hi = jnp.maximum(vn, bn)
        lo = jnp.minimum(vn, bn)
        fused = hybrid_w * (hi + consensus * lo)
        max_act = jnp.maximum(jax.lax.pmax(jnp.max(graph_activation), axis), 1e-6)
        fused = fused + graph_w * jnp.clip(graph_activation / max_act, 0.0, 1.0)
        fused = fused * (
            1.0 + graph_w * C.ACTIVATION_BONUS_SCALE
            * jnp.clip(graph_activation, 0.0, 1.0)
        )

        # boost stack + L5 (pure elementwise — identical op order per slice)
        spk_match = jnp.logical_and(
            speaker_hash > 0,
            jnp.any(speaker_hash[:, None] == q_ent_hashes[None, :], axis=1),
        ).astype(jnp.float32)
        boosted = fused * (1.0 + C.SPEAKER_MATCH_BOOST * spk_match)
        boosted = boosted * (
            1.0 + C.SEEK_TEMPORAL_REFS_BOOST * q_flags[0] * row_flags[:, 0]
        )
        boosted = boosted * (
            1.0 + C.ANSWER_TYPE_BOOST
            * (q_flags[1] * row_flags[:, 1] + q_flags[2] * row_flags[:, 2])
        )
        in_window = jnp.logical_and(
            hours_old >= q_age_range[0], hours_old <= q_age_range[1]
        ).astype(jnp.float32) * q_flags[3]
        boosted = boosted * (1.0 + C.TEMPORAL_PREFILTER_BOOST * in_window)

        recency = jnp.exp(-C.RECENCY_DECAY_RATE * hours_old) * rscale
        arousal_f = arousal * C.AROUSAL_BOOST_SCALE
        cred_f = jnp.maximum(credibility - 0.5, 0.0) * C.CREDIBILITY_BOOST_SCALE
        tmatch = in_window * q_scalars[0]
        boosts = jnp.minimum(
            C.SCORING_BOOST_CAP, 1.0 + recency + arousal_f + cred_f + tmatch
        )
        imp = C.SCORING_IMPORTANCE_FLOOR + importance * C.SCORING_IMPORTANCE_RANGE
        mom = jnp.clip(
            momentum * C.FEEDBACK_MOMENTUM_SCALE,
            -C.FEEDBACK_MOMENTUM_SCALE,
            C.FEEDBACK_MOMENTUM_SCALE,
        )
        final = boosted * imp * boosts * (1.0 + mom) * tag_penalty
        final = final * valid + (1.0 - valid) * NEG_INF

        # per-shard pool top-k, carrying the epilogue values of each
        # candidate, then the ascending-shard ICI merge
        kk = min(k, rows_per_shard)
        loc_vals, loc_rows = exact_topk_scores(final[None, :], kk)
        loc_vals, loc_rows = loc_vals[0], loc_rows[0]
        cand = jnp.stack(
            [
                loc_vals,
                fused[loc_rows],
                cos_adm[loc_rows],
                (loc_rows + shard_idx * rows_per_shard).astype(jnp.float32),
            ]
        )  # (4, kk)
        all_cand = jax.lax.all_gather(cand, axis)  # (S, 4, kk)
        merged = jnp.transpose(all_cand, (1, 0, 2)).reshape(4, n_shards * kk)
        out_k = min(k, n_shards * kk)
        out_vals, pos = jax.lax.top_k(merged[0], out_k)
        out_rows = merged[3][pos].astype(jnp.int32)
        return out_vals, out_rows, merged[1][pos], merged[2][pos]

    row = P(axis)
    rep = P()
    fn = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            rep, row, row, row, row, row, row, row, row, row, row, row,
            rep, row, (P(axis, None)), rep, rep, rep, rep,
        ),
        out_specs=(rep, rep, rep, rep),
        check_vma=False,  # outputs replicated by construction (all_gather)
    )
    return jax.jit(fn)
