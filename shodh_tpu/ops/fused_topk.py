"""Fused Pallas distance + two-level exact top-k for large corpora.

Motivation (see ops/distance.py): at N >= ~64k the unfused path writes a
(B, N) f32 score matrix to HBM and reads it back for top-k — at
N=1M, B=256 that is ~2 GB of extra HBM traffic against a 384 MB (int8)
corpus read. HBM bandwidth is the bottleneck, so we fuse.

Design constraints: Mosaic has no in-kernel sort/top_k primitive, so the
kernel must be selection-free. We use the classic two-level exact scheme:

  Pass 1 (Pallas, fused): stream corpus tiles through VMEM, compute the
    (B, TILE) score block on the MXU, and max-reduce each 128-row group
    to a single value -> (B, G) group maxes. The (B, N) matrix lives only
    in VMEM, one tile at a time.

  Pass 2 (XLA, tiny): lax.top_k over (B, G) picks the k best groups per
    query. Exactness: any row with score >= the global kth score makes its
    group's max >= kth score, and at most k groups can have max >= kth
    score — so the top-k groups contain every top-k row. Gather those
    groups' rows, rescore exactly (einsum over a (B, k*128, D) gather),
    and take the final top-k.

Determinism: selected groups are sorted ascending before the gather so
candidate rows appear in ascending global row order; the final lax.top_k
then tie-breaks by ascending row id, matching brute force (score desc,
id asc — the reference invariant).

Group size is 128 (one lane row) so the in-kernel reduction is a single
reshape+max on the VPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shodh_tpu.ops.distance import NEG_INF

GROUP = 128  # corpus rows per group (= one VREG lane row)
TILE_N = 1024  # corpus rows per kernel grid step
_INTERPRET = None  # resolved lazily: interpret on CPU test meshes


def _interpret() -> bool:
    global _INTERPRET
    if _INTERPRET is None:
        _INTERPRET = jax.default_backend() != "tpu"
    return _INTERPRET


def _groupmax_kernel(q_ref, c_ref, scale_ref, valid_ref, out_ref):
    """One grid step: scores for a (TILE_N, D) corpus tile -> group maxes.

    q_ref:    (B, D) f32 — resident across all steps (block index fixed).
    c_ref:    (TILE_N, D) corpus tile (f32 or int8).
    scale_ref:(TILE_N,) f32 dequant scales (ones for f32 corpora).
    valid_ref:(TILE_N,) f32 {0,1}.
    out_ref:  (TILE_N // GROUP, B) f32 group maxes for this tile, transposed
              so the output block satisfies Mosaic's (8, 128)-divisibility
              tiling rule (B is a full dimension; groups-per-tile is 8-aligned).
    """
    q = q_ref[:]
    c = c_ref[:]
    raw = jax.lax.dot_general(
        q,
        c.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, TILE_N)
    scale = scale_ref[:][None, :]
    valid = valid_ref[:][None, :]
    scores = raw * scale * valid + (1.0 - valid) * NEG_INF
    b = scores.shape[0]
    out_ref[:] = jnp.max(scores.reshape(b, TILE_N // GROUP, GROUP), axis=-1).T


def groupmax_scores(queries, corpus, scales, valid):
    """Pass 1: (B, G) per-group score maxima, G = N // GROUP.

    N (padded capacity) must be a multiple of TILE_N.
    """
    b, d = queries.shape
    n = corpus.shape[0]
    assert n % TILE_N == 0, f"capacity {n} not a multiple of {TILE_N}"
    grid = (n // TILE_N,)
    groups_per_tile = TILE_N // GROUP
    gmax_t = pl.pallas_call(
        _groupmax_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((groups_per_tile, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // GROUP, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=b * d * 4 + n * d * corpus.dtype.itemsize + b * (n // GROUP) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(queries, corpus, scales, valid)
    return gmax_t.T  # (B, G)


def groupmax_scores_xla(queries, corpus, scales, valid):
    """Pure-XLA pass 1 (no Pallas): materializes the (B, N) score matrix in
    HBM, then reduces per group. Costs ~2x score-matrix HBM traffic vs the
    fused kernel but has zero custom-kernel risk; selected via
    SHODH_TOPK_IMPL=xla for A/B and as a fallback."""
    from shodh_tpu.ops.distance import masked_scores

    scores = masked_scores(queries, corpus, valid, scales)  # (B, N)
    b, n = scores.shape
    return jnp.max(scores.reshape(b, n // GROUP, GROUP), axis=-1)


def _default_impl() -> str:
    """Pallas fuses the score matrix out of HBM and wins on directly-attached
    TPUs; through axon remote execution every pallas custom call costs a
    ~200 ms tunnel roundtrip (measured: 8,946 QPS xla vs 1,204 QPS pallas at
    1M x 384), so remote tunnels default to the pure-XLA formulation."""
    import os

    if os.environ.get("SHODH_TOPK_IMPL"):
        return os.environ["SHODH_TOPK_IMPL"].lower()
    return "xla" if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") else "pallas"


def _groupmax(queries, corpus, scales, valid):
    if _default_impl() == "xla":
        return groupmax_scores_xla(queries, corpus, scales, valid)
    return groupmax_scores(queries, corpus, scales, valid)


def exact_topk_scores(scores, k: int):
    """Exact top-k over an existing (B, N) score matrix via group selection.

    The contiguous-group-gather pass 2 (see two_level_topk) applied to
    scores that are already materialized — used by the sharded per-shard
    top-k where N = rows_per_shard. Falls back to lax.top_k when N is small
    or not GROUP-divisible. Bit-identical to lax.top_k(scores, k) including
    ascending-row tie-breaks.
    """
    b, n = scores.shape
    if n < 8 * GROUP or n % GROUP:
        return jax.lax.top_k(scores, min(k, n))
    s3 = scores.reshape(b, n // GROUP, GROUP)
    gmax = jnp.max(s3, axis=-1)
    g = gmax.shape[1]
    k_groups = min(k, g)
    _, top_groups = jax.lax.top_k(gmax, k_groups)
    top_groups = jnp.sort(top_groups, axis=-1)
    cand = jnp.take_along_axis(s3, top_groups[:, :, None], axis=1).reshape(
        b, k_groups * GROUP
    )
    row_offsets = jnp.arange(GROUP, dtype=jnp.int32)[None, None, :]
    rows = (top_groups[:, :, None] * GROUP + row_offsets).reshape(b, k_groups * GROUP)
    vals, pos = jax.lax.top_k(cand, min(k, cand.shape[1]))
    return vals, jnp.take_along_axis(rows, pos, axis=-1)


# --------------------------------------------------------------------------
# Certified quantized pass-1 selection (round-2 "break the fp32 floor").
#
# The exact XLA path spends ~all its time on the (B, N) matmul at
# Precision.HIGHEST (6-pass bf16 emulation). Selection does not need exact
# scores — only pass-2 rescoring does. So: compute pass 1 in ONE bf16 pass
# (~6x fewer MXU passes), select top-m groups with slack (m >= 4k), rescore
# those rows exactly at HIGHEST, and PROVE the result equals the exact path:
#
#   For bf16-rounded queries q^ (corpus int8 -> bf16 is exact; |v|<=127
#   fits bf16's 8 significand bits), the raw-dot error obeys
#     |s^ - s| <= u * ||q||_2 * ||c||_2,   u = 2^-8 (bf16 round-off)
#   so with bound = max over valid rows of scale_r * ||c_r||_2,
#     eps_b = SAFETY * u * ||q_b||_2 * bound        (SAFETY=1.25 covers f32
#                                                    accumulation round-off)
#   Let beta_b = the m-th best APPROX group max and s_k = the exact k-th
#   candidate score after rescore. Every excluded group g has approx max
#   <= beta_b, hence TRUE max <= beta_b + eps_b. If beta_b + eps_b < s_k
#   (strict, so index tie-breaks cannot be usurped), no excluded row can
#   enter the top-k -> the fast result is bit-identical to the exact path.
#   Otherwise lax.cond falls back to the full exact computation.
#
# The certificate makes the fast path safe even on adversarial ties: ties
# at the boundary fail the strict inequality and take the exact branch.
# --------------------------------------------------------------------------

_BF16_U = 2.0**-8  # upper bound on bf16 round-to-nearest relative error
_EPS_SAFETY = 1.25  # head-room for f32 accumulation round-off in the MXU


def _slack_groups(k: int, g: int) -> int:
    import os

    m = int(os.environ.get("SHODH_TOPK_SLACK_GROUPS", "0")) or max(4 * k, 32)
    return min(m, g)


def _fast_enabled() -> bool:
    import os

    return os.environ.get("SHODH_TOPK_FAST", "1") != "0"


@jax.jit
def corpus_score_bound(corpus, scales, valid):
    """max over valid rows of scale_r * ||c_r||_2 — the certificate's
    corpus term. One pass; recompute per index version, not per query."""
    norms = jnp.linalg.norm(corpus.astype(jnp.float32), axis=1)
    return jnp.max(norms * scales * valid)


def _rescore_exact_groups(queries, corpus, scales, valid, top_groups):
    """Exact HIGHEST-precision scores for the selected groups' rows.

    Gathers whole CONTIGUOUS (GROUP, D) blocks from the (G, GROUP, D) view —
    48 KB aligned DMAs — NOT per-row 384 B scatters (round-1 measurement:
    scattered row gather cost 28.5 ms/batch at 1M, contiguity is the whole
    game). Returns (B, m*GROUP) candidate scores.
    """
    b = queries.shape[0]
    n, d = corpus.shape
    g = n // GROUP
    m = top_groups.shape[1]
    c3 = corpus.reshape(g, GROUP, d)[top_groups]  # (B, m, GROUP, D) contiguous
    raw = jnp.einsum(
        "bd,bmgd->bmg", queries, c3.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(b, m * GROUP)
    s = scales.reshape(g, GROUP)[top_groups].reshape(b, m * GROUP)
    v = valid.reshape(g, GROUP)[top_groups].reshape(b, m * GROUP)
    return raw * s * v + (1.0 - v) * NEG_INF


def _certified_parts(queries, corpus, valid, k: int, scales, bound):
    """Fast-path candidate result + the safety certificate.

    Returns (vals, ids, safe). ``safe`` True proves (vals, ids) equals the
    exact path bit-for-bit; False means the boundary margin was thinner
    than the bf16 error bound and the caller must take the exact path.
    """
    b, d = queries.shape
    n = corpus.shape[0]
    g = n // GROUP
    m = _slack_groups(k, g)

    # Pass 1: ONE bf16 MXU pass (the exact path does 6).
    raw = jax.lax.dot_general(
        queries.astype(jnp.bfloat16),
        corpus.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    approx = raw * scales[None, :] * valid[None, :] + (1.0 - valid[None, :]) * NEG_INF
    gmax = jnp.max(approx.reshape(b, g, GROUP), axis=-1)

    top_vals, top_groups = jax.lax.top_k(gmax, m)
    beta = top_vals[:, -1]  # m-th best approx group max, (B,)
    top_groups = jnp.sort(top_groups, axis=-1)  # ascending rows => tie-breaks
    row_offsets = jnp.arange(GROUP, dtype=jnp.int32)[None, None, :]
    rows = (top_groups[:, :, None] * GROUP + row_offsets).reshape(b, m * GROUP)

    cand = _rescore_exact_groups(queries, corpus, scales, valid, top_groups)
    vals, pos = jax.lax.top_k(cand, k)
    ids = jnp.take_along_axis(rows, pos, axis=-1)

    eps = _EPS_SAFETY * _BF16_U * jnp.linalg.norm(queries, axis=-1) * bound
    safe = jnp.all(beta + eps < vals[:, k - 1])
    return vals, ids, safe


def _certified_fast_topk(queries, corpus, valid, k: int, scales, bound):
    """bf16 pass-1 group selection with exact rescore + certified fallback."""
    vals, ids, safe = _certified_parts(queries, corpus, valid, k, scales, bound)

    def exact_path(_):
        from shodh_tpu.ops.distance import masked_scores

        scores = masked_scores(queries, corpus, valid, scales)
        return exact_topk_scores(scores, k)

    return jax.lax.cond(safe, lambda _: (vals, ids), exact_path, operand=None)


def _candidate_rows(gmax, k: int):
    """Top-k groups -> candidate row ids, ascending for tie-breaks."""
    b, g = gmax.shape
    k_groups = min(k, g)
    _, top_groups = jax.lax.top_k(gmax, k_groups)  # (B, k_groups)
    # Ascending group order => ascending global row order for tie-breaks.
    top_groups = jnp.sort(top_groups, axis=-1)
    row_offsets = jnp.arange(GROUP, dtype=jnp.int32)[None, None, :]
    return (top_groups[:, :, None] * GROUP + row_offsets).reshape(b, k_groups * GROUP)


@partial(jax.jit, static_argnames=("k",))
def two_level_topk(queries, corpus, valid, k: int, scales=None, bound=None):
    """Exact top-k via fused group-max + group rescoring.

    Same signature/result contract as ops.distance.brute_topk. When
    ``bound`` (a scalar from :func:`corpus_score_bound`) is provided on the
    XLA path, selection runs the certified bf16 fast pass 1 — bit-identical
    output with a proven fallback (see the block comment above
    ``_certified_fast_topk``); ~6x fewer MXU passes on the dominant matmul.
    """
    b, d = queries.shape
    n = corpus.shape[0]
    if scales is None:
        scales = jnp.ones((n,), jnp.float32)

    if (
        bound is not None
        and _fast_enabled()
        and _default_impl() == "xla"
        and n // GROUP > _slack_groups(k, n // GROUP)
    ):
        return _certified_fast_topk(queries, corpus, valid, k, scales, bound)

    if _default_impl() == "xla":
        # The XLA pass 1 materializes the full (B, N) score matrix anyway —
        # so pass 2 gathers SCORES instead of re-gathering corpus rows
        # (k*GROUP*D int8 ~ 126 MB) and recomputing dots. Gather whole
        # CONTIGUOUS groups from the (B, G, GROUP) view: 512 B-aligned
        # slices, not k*GROUP scattered columns. Measured on v5e at
        # 1M x 384 / B=256: corpus-gather rescan 28.5 ms/batch -> flat
        # score gather 19.7 ms -> contiguous group gather 12.9 ms.
        from shodh_tpu.ops.distance import masked_scores

        scores = masked_scores(queries, corpus, valid, scales)
        return exact_topk_scores(scores, k)

    # Pallas pass 1 never writes the score matrix to HBM, so pass 2 must
    # re-gather the candidate corpus rows and rescore exactly.
    gmax = groupmax_scores(queries, corpus, scales, valid)  # (B, G)
    rows = _candidate_rows(gmax, k)
    gathered = corpus[rows]  # (B, R, D)
    raw = jnp.einsum("bd,brd->br", queries, gathered.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST)
    cand = raw * scales[rows] * valid[rows] + (1.0 - valid[rows]) * NEG_INF
    vals, pos = jax.lax.top_k(cand, k)
    return vals, jnp.take_along_axis(rows, pos, axis=-1)
