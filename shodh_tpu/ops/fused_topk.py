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
# Measured anatomy at 1M x 384, B=256 on v5e (see BENCHMARKS.md): the
# matmul itself costs ~5.5 ms in ONE bf16 pass vs ~7.6 ms at HIGHEST, and
# the old scale/mask epilogue + f32 group-max chain added ~6 ms of pure
# (B, N)-matrix HBM traffic. Selection does not need exact scores — only
# the final rescore does — so the fast path eliminates every per-element
# epilogue and keeps the score matrix in bf16:
#
#   Pass 1: q_bf16 @ corpus_approx -> (B, N) bf16, where corpus_approx is
#     a PRE-SCALED bf16 mirror with invalid rows zeroed (built once per
#     index version by :func:`corpus_approx_bf16`). No scale multiply, no
#     mask pass; the bf16 matrix halves the group-max read traffic.
#     Zeroed invalid rows can only INFLATE a group max (never deflate a
#     valid row's score), which keeps every bound below one-sided-sound;
#     the exact rescore masks them to -inf so they can never surface.
#   Stage 1 (groups): top-m group maxes with slack (m >= 4k). beta = the
#     m-th best approx group max.
#   Stage 2 (rows): gather the selected groups' approx scores (contiguous
#     slices of the already-materialized bf16 matrix), take the top-R rows
#     (R >= max(4k, 64)). gamma = the R-th best approx row score.
#   Rescore: gather ONLY those R corpus rows (B*R*D int8 ~ 6 MB at k=10,
#     B=256 — scattered is fine at this size), exact HIGHEST einsum with
#     the true scales + validity mask, final top-k.
#
# Exactness certificate. With u = 2^-8 (bf16 round-off) the approx score
# error obeys |s^ - s| <= ~3u * ||q||_2 * bound  (three bf16 roundings:
# the mirror values int8*scale -> bf16, the query cast, the matmul output
# cast; products are exact in f32 on the MXU, accumulation error is
# O(2^-24)). bound = max over valid rows of scale_r*||c_r||_2
# (:func:`corpus_score_bound`). Any row excluded at either stage has
# approx score <= max(beta, gamma), hence TRUE score <= max(beta, gamma)
# + eps. If max(beta, gamma) + eps < s_k (strict, so index tie-breaks
# cannot be usurped), the true top-k all survived both stages and the
# result equals the exact path; otherwise lax.cond falls back to the full
# exact computation. Adversarial exact ties at the boundary fail the
# strict inequality and take the exact branch by construction.
# --------------------------------------------------------------------------

_BF16_U = 2.0**-8  # upper bound on bf16 round-to-nearest relative error
_EPS_SAFETY = 3.5  # covers the three bf16 roundings + f32 accumulation


def _slack_groups(k: int, g: int) -> int:
    """Slack sized so random-data boundary margins clear the 3.5u error
    bound (measured: m=4k left rank-40 margins ~0.012 < eps 0.0143 at 1M —
    certificate failed every batch; at 4M m=80 still fell back 1/4 batches —
    m>=96 / R>=512 clear the margins through 4M with ~0.5 ms extra
    selection, far cheaper than a 41 ms fallback)."""
    import os

    m = int(os.environ.get("SHODH_TOPK_SLACK_GROUPS", "0")) or max(12 * k, 96)
    return min(m, g)


def _slack_rows(k: int, limit: int) -> int:
    import os

    r = int(os.environ.get("SHODH_TOPK_SLACK_ROWS", "0")) or max(32 * k, 512)
    return min(r, limit)


def _fast_enabled() -> bool:
    import os

    return os.environ.get("SHODH_TOPK_FAST", "1") != "0"


def _fast_min_rows() -> int:
    """Measured crossover (v5e, B=256, k=10, through the axon tunnel):
    certified loses at 65k (7.0 vs 4.1 ms — fixed selection overhead),
    washes at 1M (12.6 vs 12.7 ms), wins 1.33x at 4M (30.9 vs 41.1 ms,
    8,292 vs 6,226 QPS). The win grows with N because pass 1 halves the
    score-matrix bytes and skips 5 of 6 HIGHEST emulation passes while
    stage-2 cost stays ~constant."""
    import os

    return int(os.environ.get("SHODH_TOPK_FAST_MIN_ROWS", str(2 * 1024 * 1024)))


@jax.jit
def corpus_score_bound(corpus, scales, valid):
    """max over valid rows of scale_r * ||c_r||_2 — the certificate's
    corpus term. One pass; recompute per index version, not per query."""
    norms = jnp.linalg.norm(corpus.astype(jnp.float32), axis=1)
    return jnp.max(norms * scales * valid)


@jax.jit
def corpus_approx_bf16(corpus, scales, valid):
    """Pre-scaled bf16 mirror with invalid rows zeroed — pass 1 needs no
    per-element epilogue at all. One pass per index version."""
    return (
        corpus.astype(jnp.float32) * (scales * valid)[:, None]
    ).astype(jnp.bfloat16)


def _certified_parts(queries, corpus, valid, k: int, scales, bound, approx=None):
    """Fast-path candidate result + the safety certificate.

    Returns (vals, ids, safe). ``safe`` True proves (vals, ids) equals the
    exact path bit-for-bit; False means a selection boundary margin was
    thinner than the bf16 error bound and the caller must take the exact
    path. ``approx`` is the :func:`corpus_approx_bf16` mirror (built inline
    when absent — callers that can should cache it per index version).
    """
    b, d = queries.shape
    n = corpus.shape[0]
    g = n // GROUP
    m = _slack_groups(k, g)
    if approx is None:
        approx = corpus_approx_bf16(corpus, scales, valid)

    # Pass 1: one bf16 MXU pass, bf16 score matrix, zero epilogue.
    raw = jax.lax.dot_general(
        queries.astype(jnp.bfloat16),
        approx,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.bfloat16,
    )  # (B, N) bf16
    a3 = raw.reshape(b, g, GROUP)
    gmax = jnp.max(a3, axis=-1).astype(jnp.float32)  # (B, G)

    # Stage 1: slack group selection.
    top_vals, top_groups = jax.lax.top_k(gmax, m)
    beta = top_vals[:, -1]  # m-th best approx group max, (B,)
    top_groups = jnp.sort(top_groups, axis=-1)  # ascending rows => tie-breaks

    # Stage 2: slack row selection INSIDE the chosen groups, from the
    # already-materialized approx matrix (contiguous group slices).
    cand_approx = jnp.take_along_axis(a3, top_groups[:, :, None], axis=1)
    cand_approx = cand_approx.reshape(b, m * GROUP).astype(jnp.float32)
    row_offsets = jnp.arange(GROUP, dtype=jnp.int32)[None, None, :]
    cand_rows = (top_groups[:, :, None] * GROUP + row_offsets).reshape(b, m * GROUP)
    r = _slack_rows(k, m * GROUP)
    top_row_vals, top_row_pos = jax.lax.top_k(cand_approx, r)
    gamma = top_row_vals[:, -1]  # R-th best approx row score, (B,)
    rows = jnp.take_along_axis(cand_rows, top_row_pos, axis=-1)  # (B, R)
    rows = jnp.sort(rows, axis=-1)  # ascending row ids => brute tie-breaks

    # Exact rescore of just R rows per query (~6 MB gather at defaults).
    gathered = corpus[rows]  # (B, R, D)
    raw_exact = jnp.einsum(
        "bd,brd->br", queries, gathered.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    v = valid[rows]
    cand = raw_exact * scales[rows] * v + (1.0 - v) * NEG_INF
    vals, pos = jax.lax.top_k(cand, k)
    ids = jnp.take_along_axis(rows, pos, axis=-1)

    eps = _EPS_SAFETY * _BF16_U * jnp.linalg.norm(queries, axis=-1) * bound
    boundary = jnp.maximum(beta, gamma)
    safe = jnp.all(boundary + eps < vals[:, k - 1])
    return vals, ids, safe


# --------------------------------------------------------------------------
# INT8 certified pass-1 (round-3 extension; certificate v3 since round 4):
# v5e's int8 MXU path runs at 394 TOPS vs 197 bf16 TFLOPS, and the corpus
# is ALREADY int8 with per-row dequant scales — so the corpus itself is the
# selection operand and the corpus-side quantization error is exactly ZERO:
#
#   s_r = q . (scale_r * c_r),  q = s_q*q8 + f (actual residual)
#       = s_q*scale_r*(q8 . c_r) + f . c'_r
#   |s_r - s_q*scale_r*(q8 . c_r)| <= ||f||_2 * ||c'_r||_2  (Cauchy-Schwarz)
#
# i.e. the ONLY approximation is the query residual — eps ~ ||f|| ~ 0.013
# for unit-norm d=384 queries, as tight as the bf16 certificate (3.5u ~
# 0.0137) with HALF the pass-1 HBM bytes (no bf16 mirror at all) and the
# 2x int8 MXU rate. The scale multiply fuses into the matmul consumer and
# the scaled matrix materializes as bf16; its rounding is one more
# |x|*2^-8 term inside the one-sided bound inflation (_inflate).
#
# History (BENCH_r03/r04, BENCHMARKS "int8 certified selection"): v1's
# global worst-case L1 bound (S, max-row-L1, ||q^||_1/2+M1/2+D/4) NEVER
# fired on hardware (0/14 batches); v2 (per-group re-quantization steps +
# exact residual norms) fired 8/8 at 1M but paid a second 384 MB mirror
# and a second residual term, landing SLOWER than bf16 (19.6 vs 15.9 ms).
# v3 fires 8/8 AND wins: 8.48 ms vs 10.42 exact at 1M x 384, B=256,
# iters=32 (30.2k QPS/chip).
#
# Selection ranks groups/rows by their true-score UPPER bound, so the
# m-th/R-th selected bound IS the certificate boundary: every dropped
# row's true score <= max(beta_pad, gamma_pad); strict < of the exact
# rescored k-th value proves bit-equality, else lax.cond takes the exact
# path. Knobs (measured in tools/bench_breakdown.py, defaults = the 1M
# winner): SHODH_TOPK_SGROUP selection-group rows (stage-1 top_k cost is
# (B, N/SG); 128 since round 4 — finer groups tighten beta so the zone
# halves at full margin), SHODH_TOPK_ZONE_ROWS stage-2 zone width (at
# sg128: z=8192 fires 32/32 at 1M and 16/16 at 4M; at the old sg256,
# z=15360 fired 8/8 but z=10240 only 2/8), SHODH_TOPK_V3_ROWS rescore rows (the
# scattered corpus gather runs ~9.5 GB/s effective — r=512 costs ~5 ms at
# 1M, r=128 ~1.3 ms and still fires 8/8).
# --------------------------------------------------------------------------

_BF16_UP = 2.0**-7.5  # one-sided cover for bf16 round + int32->f32 + 2 mults


def _int8_enabled() -> bool:
    """Default ON since round 4: exact-or-fallback with the certificate
    measured firing 8/8 and 1.23x the exact path at 1M (SHODH_TOPK_INT8=0
    restores the bf16/exact formulations)."""
    import os

    return os.environ.get("SHODH_TOPK_INT8", "1") == "1"


def _int8_min_rows() -> int:
    """Crossover for the v3 certified path (v5e, B=256, k=10, iters=32):
    wins 1.23x at 1M (8.48 vs 10.42 ms); below ~512k the fixed selection
    cost (two top_k passes + 128-row gather) approaches the whole exact
    path and the certificate margins thin with N."""
    import os

    return int(os.environ.get("SHODH_TOPK_INT8_MIN_ROWS", str(512 * 1024)))


def _v3_sgroup() -> int:
    """Selection-group rows for the v3 certified path. Default 128 since
    the round-4 sg128 re-pairing: halving the group size halves the
    per-group max slack, so beta (and the zone boundary) tightens enough
    to run HALF the zone at FULL certificate margin — measured at 1M
    (6.505 vs 6.669 ms, both 32/32) and 4M (16.849 vs 17.015 ms, 16/16
    vs 15/16 — the sg256 default was silently paying one exact fallback
    per 16 batches at 4M). BENCHMARKS 'sg128 small-zone re-pairing'."""
    import os

    return int(os.environ.get("SHODH_TOPK_SGROUP", "0")) or 128


def _v3_params(k: int, n: int, sg: int) -> tuple[int, int, bool, int]:
    import os

    # Zone default scales with k and with the group size (sg128's tighter
    # beta carries half the sg256 zone at the same certificate margin).
    zone = int(os.environ.get("SHODH_TOPK_ZONE_ROWS", "0")) or (
        max(768 * k, 8192) if sg <= 128 else max(1536 * k, 15360)
    )
    rr = int(os.environ.get("SHODH_TOPK_V3_ROWS", "0")) or max(12 * k, 128)
    m = max(1, min(zone // sg, n // sg))
    sort16 = os.environ.get("SHODH_TOPK_SORT_BF16", "0") == "1"
    # SHODH_TOPK_SUB=s arms hierarchical stage-2: rank s-row SUBUNITS of
    # the zone by their padded max and rescore whole subunits — the wide
    # (B, m*sg) top_k shrinks by s at the cost of a slightly looser gamma.
    sub = int(os.environ.get("SHODH_TOPK_SUB", "0"))
    if sub and (sub < 2 or (m * sg) % sub or rr % sub):
        sub = 0  # incompatible shape: fall back to flat stage-2
    return m, min(rr, m * sg), sort16, sub


def _hier_blks() -> tuple[int, int]:
    """Superblock sizes for the exact hierarchical top_k in the v3 stage-1
    / stage-2 selections (0 = flat lax.top_k).

    Defaults 16/32 since the round-4 TPU sweep (v5e, 1M x 384, B=256,
    iters=32): 7.77 ms/batch vs 8.46 flat = 32.9k QPS/chip (+8.9%), sink
    checksum byte-identical across all nine swept variants (exactness on
    real data). S2=32 is the big term (the (B, zone) stage-2 sort is the
    longest); sweep table in BENCHMARKS 'hierarchical exact top_k'."""
    import os

    return (
        int(os.environ.get("SHODH_TOPK_HIER_S1", "16")),
        int(os.environ.get("SHODH_TOPK_HIER_S2", "32")),
    )


def _hier_topk(vals, kk: int, blk: int):
    """Exact-by-value top-kk over the last axis via one superblock level.

    The module's rows->groups containment argument applied AGAIN: at most
    kk superblocks can hold an element >= the kk-th largest value, so the
    top-kk superblock maxes provably cover every such element, and the
    sort length drops from L to L/blk (+ a kk*blk re-sort). Unlike the
    measured-dead SHODH_TOPK_SUB (which kept only rr/sub subunits and
    loosened gamma to a subunit max), this selects kk FULL superblocks,
    so the returned top-kk VALUES — including the boundary the
    certificate compares against — are exactly the flat sort's. Returned
    POSITIONS can differ from lax.top_k only across exactly-equal values
    (superblock-then-element ranking); use only where a certificate or
    exact rescore guards the final result. Falls back to flat when the
    shape is incompatible or the split would not shrink the sort.
    """
    b, L = vals.shape
    if blk < 2 or L % blk or L // blk < kk or kk * blk + L // blk >= L:
        return jax.lax.top_k(vals, kk)
    nb = L // blk
    v3 = vals.reshape(b, nb, blk)
    _, top_blk = jax.lax.top_k(jnp.max(v3, axis=-1), kk)
    top_blk = jnp.sort(top_blk, axis=-1)  # ascending position order
    cand = jnp.take_along_axis(v3, top_blk[:, :, None], axis=1).reshape(b, kk * blk)
    cand_pos = (
        top_blk[:, :, None] * blk + jnp.arange(blk, dtype=top_blk.dtype)[None, None, :]
    ).reshape(b, kk * blk)
    tv, tp = jax.lax.top_k(cand, kk)
    return tv, jnp.take_along_axis(cand_pos, tp, axis=-1)


def corpus_cert_pack(corpus, scales, valid, sgroup: int | None = None):
    """Per-index-version pack for the int8 certificate: NO mirror, just the
    pre-scaled row norms the query-residual bound needs.

    Returns (svalid (N,) f32 = scale*valid broadcast for the pass-1
    epilogue, cnorm (N,) f32 = ||scale*valid*c_r||_2, cg (N//sgroup,) f32
    per-selection-group max cnorm). The group size is recoverable as
    N // len(cg), so queries always match the pack they were built with.

    ``sgroup=None`` (the default) resolves to the env-selected
    :func:`_v3_sgroup` so every entry point agrees with the shipped
    sg128/z8192 pairing (ADVICE r4: the old literal default of 256 left
    direct callers silently on the superseded configuration).
    """
    if sgroup is None:
        sgroup = _v3_sgroup()
    return _corpus_cert_pack_jit(corpus, scales, valid, sgroup=sgroup)


@partial(jax.jit, static_argnames=("sgroup",))
def _corpus_cert_pack_jit(corpus, scales, valid, sgroup: int):
    n = corpus.shape[0]

    def _tile(args):
        c_t, s_t, v_t = args
        sv = s_t * v_t
        cn = jnp.sqrt(jnp.sum(jnp.square(c_t.astype(jnp.float32)), axis=1)) * sv
        return sv, cn

    tiles = max(1, n // TILE_N)
    sv, cn = jax.lax.map(
        _tile,
        (
            corpus.reshape(tiles, -1, corpus.shape[1]),
            scales.reshape(tiles, -1),
            valid.reshape(tiles, -1),
        ),
    )
    sv = sv.reshape(n)
    cn = cn.reshape(n)
    cg = jnp.max(cn.reshape(n // sgroup, sgroup), axis=1)
    return sv, cn, cg


def corpus_cert_pack_default(corpus, scales, valid):
    """corpus_cert_pack at the env-selected selection-group size."""
    return corpus_cert_pack(corpus, scales, valid, sgroup=_v3_sgroup())


def _inflate(x):
    """One-sided upper bound on a bf16-rounded, f32-multiplied score."""
    return x + jnp.abs(x) * _BF16_UP


# --------------------------------------------------------------------------
# Pallas pass-1 for the v3 certified path (round-4 "hidden layout copy").
#
# AOT memory_analysis at 1M x 384, B=256 (BENCHMARKS "hidden 512 MB layout
# copy"): when the XLA dot's (B, N) bf16 scaled matrix is consumed by BOTH
# the group-max reduce (stage 1) and the data-dependent group gather
# (stage 2), XLA keeps the dot output in its batch-in-sublanes tiled
# layout (bf16[32,8,4096,256]{3,1,2,0}) and inserts an explicit 512 MB
# `copy` HLO to the standard layout the reduce/gather emitters need —
# ~1 GB of pure relayout HBM traffic per batch. Every XLA-level fix was
# falsified (optimization_barrier, reduce_window, transposed dot,
# batch-split dots — see BENCHMARKS). This kernel emits BOTH consumers'
# operands directly: int8 MXU dot per corpus tile, scale epilogue in f32,
# one bf16 (B, TILE) block of the standard-layout scaled matrix, and the
# per-selection-group maxes — one pass, no relayout, half the temp bytes.
# --------------------------------------------------------------------------


def _p1_tile() -> int:
    import os

    return int(os.environ.get("SHODH_TOPK_P1_TILE", "0")) or 2048


def _p1_impl() -> str:
    """'pallas' (default on real TPU) or 'xla' for the v3 certified pass-1
    (SHODH_TOPK_P1). Measured same-session at 1M x 384, B=256, iters=32
    (tools/bench_breakdown.py --exp v3p_*,v3i_*): stage-1 5.27 -> 2.70 ms
    (the 512 MB relayout copy is gone), full certified path 7.83 -> 6.96
    ms, sink checksums byte-identical on hardware. Interpret-mode Pallas
    is much slower than XLA on CPU, so non-TPU backends keep 'xla'."""
    import os

    v = os.environ.get("SHODH_TOPK_P1", "").lower()
    if v:
        return v
    return "xla" if _interpret() else "pallas"


def _v3_pass1_kernel(sq_ref, q8_ref, c_ref, sv_ref, scaled_ref, gmax_ref, *, sg):
    """One grid step: int8 scores for a (TILE, D) corpus tile.

    Emits the (B, TILE) bf16 scaled block (standard layout — stage-2's
    gather operand) AND the (TILE//sg, B) group maxes (transposed so the
    output block's trailing dim is the 128-divisible B, as in
    _groupmax_kernel). Math is kept operation-for-operation identical to
    the XLA formulation in _certified_parts_int8 so the fast path stays
    byte-equal regardless of SHODH_TOPK_P1.
    """
    raw = jax.lax.dot_general(
        q8_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (B, TILE) int32 on the MXU int8 path
    scaled = (raw.astype(jnp.float32) * sq_ref[:] * sv_ref[:][None, :]).astype(
        jnp.bfloat16
    )
    scaled_ref[:] = scaled
    bb, t = scaled.shape
    gmax_ref[:] = (
        jnp.max(scaled.reshape(bb, t // sg, sg), axis=-1).astype(jnp.float32).T
    )


def v3_pass1_pallas(q8, s_q, corpus, svalid, sg: int):
    """Fused pass-1: (scaled (B, N) bf16, gmax (B, G) f32), G = N // sg."""
    b, d = q8.shape
    n = corpus.shape[0]
    # Mosaic block rules: the gmax output block (tile//sg, b) needs its
    # sublane dim divisible by 8 (or == the full array dim), so a legal
    # tile is a multiple of 8*sg that divides n — or n itself (full-array
    # blocks are always legal).
    tile = min(_p1_tile(), n)
    if n % tile or tile % sg or ((tile // sg) % 8 and tile != n):
        tile = 8 * sg if (n % (8 * sg) == 0 and 8 * sg <= n) else n
    grid = (n // tile,)
    scaled, gmax_t = pl.pallas_call(
        partial(_v3_pass1_kernel, sg=sg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile // sg, b), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n), jnp.bfloat16),
            jax.ShapeDtypeStruct((n // sg, b), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d + b * d + b * n * 2 + (n // sg) * b * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(s_q[:, None], q8, corpus, svalid)
    return scaled, gmax_t.T


def _certified_parts_int8(queries, corpus, valid, k: int, scales, pack):
    """Certificate-v3 fast path: int8 pass-1 on the CORPUS ITSELF (zero
    corpus-side quantization error), bf16 scaled score matrix, two-stage
    upper-bound selection, exact HIGHEST rescore. Returns (vals, ids,
    safe); ``safe`` proves bit-equality with the exact path — see the
    block comment above for the bound derivation."""
    svalid, cnorm, cg = pack
    b, d = queries.shape
    n = corpus.shape[0]
    g = cg.shape[0]
    sg = n // g
    m, rr, sort16, sub = _v3_params(k, n, sg)

    s_q = jnp.maximum(jnp.max(jnp.abs(queries), axis=1) / 127.0, 1e-30)  # (B,)
    q8 = jnp.clip(jnp.round(queries / s_q[:, None]), -127, 127).astype(jnp.int8)
    f = queries - s_q[:, None] * q8.astype(jnp.float32)
    # Exact per-query residual-bound coefficient (1.02 covers its own f32
    # rounding and the pad products').
    coef_b = 1.02 * jnp.sqrt(jnp.sum(f * f, axis=1))  # (B,)

    # Pass 1: int8 MXU on the corpus itself; the scale epilogue + bf16
    # cast + group max fuse into the matmul consumer. The Pallas variant
    # (SHODH_TOPK_P1=pallas) computes the SAME values in one fused pass
    # that writes the scaled matrix in standard layout, sidestepping the
    # 512 MB XLA relayout copy between the dot and the reduce/gather
    # consumers. Blocks span the full B dim (index 0 on that axis), so
    # Mosaic's full-array-dim rule makes every padded batch shape legal;
    # the b % 8 guard just keeps un-padded odd shapes on the proven XLA
    # path (DeviceVectorIndex pads b to 8/32/128/256 before this call).
    if _p1_impl() == "pallas" and b % 8 == 0:
        scaled, gmax = v3_pass1_pallas(q8, s_q, corpus, svalid, sg)
        a3 = scaled.reshape(b, g, sg)
    else:
        raw = jax.lax.dot_general(
            q8, corpus,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (B, N) int32
        scaled = (
            raw.astype(jnp.float32) * s_q[:, None] * svalid[None, :]
        ).astype(jnp.bfloat16)  # (B, N) bf16 approx true scores
        a3 = scaled.reshape(b, g, sg)
        gmax = jnp.max(a3, axis=-1).astype(jnp.float32)  # (B, G)

    # Stage 1: rank groups by the true-score UPPER bound. The hierarchical
    # selection returns the same top-m VALUES (so beta_pad is unchanged);
    # the dropped-superblock containment proof is in _hier_topk.
    h1, h2 = _hier_blks()
    upper_g = _inflate(gmax) + coef_b[:, None] * cg[None, :]
    top_vals, top_groups = _hier_topk(upper_g, m, h1)
    beta_pad = top_vals[:, -1]
    top_groups = jnp.sort(top_groups, axis=-1)

    # Stage 2: rank zone rows by the same upper bound. SHODH_TOPK_SORT_BF16
    # runs the wide top_k on bf16 values (half the sort traffic — measured
    # a wash at 1M, kept as a knob); the returned boundary is re-inflated
    # one bf16 step so it stays an upper bound on every dropped row.
    cand = jnp.take_along_axis(a3, top_groups[:, :, None], axis=1)  # (B, m, sg)
    cn_sel = cnorm.reshape(g, sg)[top_groups]  # (B, m, sg)
    upper_rows = (
        _inflate(cand.astype(jnp.float32)) + coef_b[:, None, None] * cn_sel
    ).reshape(b, m * sg)
    row_offsets = jnp.arange(sg, dtype=jnp.int32)[None, None, :]
    cand_rows = (top_groups[:, :, None] * sg + row_offsets).reshape(b, m * sg)
    if sub:
        # Hierarchical stage 2: rank sub-row subunits by padded max; a
        # dropped row's upper bound <= its subunit's max <= gamma_pad, so
        # the certificate is unchanged (slightly looser boundary). Rescored
        # rows are whole CONTIGUOUS subunits, which also DMAs better than
        # scattered single rows.
        n_su = (m * sg) // sub
        su_max = jnp.max(upper_rows.reshape(b, n_su, sub), axis=-1)
        tau = rr // sub
        top_su_vals, top_su = jax.lax.top_k(su_max, tau)
        gamma_pad = top_su_vals[:, -1]
        top_su = jnp.sort(top_su, axis=-1)
        su_rows = cand_rows.reshape(b, n_su, sub)
        rows = jnp.take_along_axis(
            su_rows, top_su[:, :, None], axis=1
        ).reshape(b, rr)
        rows = jnp.sort(rows, axis=-1)
    elif sort16:
        top_row_vals, top_row_pos = jax.lax.top_k(
            upper_rows.astype(jnp.bfloat16), rr
        )
        gamma_pad = _inflate(top_row_vals[:, -1].astype(jnp.float32))
        rows = jnp.take_along_axis(cand_rows, top_row_pos, axis=-1)
        rows = jnp.sort(rows, axis=-1)  # ascending ids => brute tie-breaks
    else:
        top_row_vals, top_row_pos = _hier_topk(upper_rows, rr, h2)
        gamma_pad = top_row_vals[:, -1]
        rows = jnp.take_along_axis(cand_rows, top_row_pos, axis=-1)
        rows = jnp.sort(rows, axis=-1)  # ascending ids => brute tie-breaks

    # Exact rescore (identical math to the bf16 path and brute force).
    gathered = corpus[rows]
    raw_exact = jnp.einsum(
        "bd,brd->br", queries, gathered.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    v = valid[rows]
    cand_exact = raw_exact * scales[rows] * v + (1.0 - v) * NEG_INF
    vals, pos = jax.lax.top_k(cand_exact, k)
    ids = jnp.take_along_axis(rows, pos, axis=-1)

    safe = jnp.all(jnp.maximum(beta_pad, gamma_pad) < vals[:, k - 1])
    return vals, ids, safe


# --------------------------------------------------------------------------
# Certificate v4 (round-4 late): hierarchical UPPER-BOUND selection.
#
# v3 ranks 256-row selection groups by bound, then re-ranks a ~15k-row
# zone — two wide sorts plus a 15k-row gather per query. But the pass-1
# kernel holds everything the per-ROW upper bound needs (the bf16 score,
# the per-query residual coefficient, the packed row norms), so it can
# emit the EXACT max of upper = inflate(score) + coef*cnorm over every
# SU=32 consecutive rows: a (B, N/32) f32 matrix. Selection collapses to
# one global containment argument (the _hier_topk lemma applied to row
# uppers): the top-R superblocks by exact max provably contain the top-R
# rows by upper, so gathering those R*32 scores and re-ranking yields the
# EXACT global R-th best row upper — a certificate boundary at least as
# tight as v3's max(beta, gamma) (v3's gamma is zone-restricted and its
# beta is a 256-row group bound). Dropped-row proof: an unselected
# block's max cannot exceed the R-th best row upper (else >= R rows would
# beat it — contradiction); within selected blocks the re-rank is exact.
# Ties at the boundary fail the strict < and fall back exactly as v3.
# Sorts shrink from (B, N/256)+(B, 15360) to (B, N/1024)+(B, 4096)x2.
# --------------------------------------------------------------------------


def _v4_enabled() -> bool:
    import os

    return os.environ.get("SHODH_TOPK_V4", "0") == "1"


def _v4_su() -> int:
    """Superblock rows for the v4 upper-bound maxes. In-kernel ('kernel'
    impl) the Mosaic lane-split reshape needs su to keep a 128-multiple
    lane dim (su=32 fails: 'unsupported shape cast (256x2048xf32) ->
    (256x64x32)'); the 'xla' impl reduces over the Pallas-written
    standard-layout matrix and supports any su."""
    import os

    return int(os.environ.get("SHODH_TOPK_V4_SU", "0")) or (
        128 if _v4_impl() == "kernel" else 32
    )


def _v4_impl() -> str:
    """'xla' (default): su maxes reduced by XLA from the v3p kernel's
    standard-layout scaled matrix (one fused 512 MB read, no relayout —
    the input is a Pallas output). 'kernel': su maxes emitted by the v4
    kernel itself (su must be lane-aligned, >= 128)."""
    import os

    return os.environ.get("SHODH_TOPK_V4_IMPL", "xla").lower()


def _v4_pass1_kernel(
    sq_ref, q8_ref, coef_ref, c_ref, sv_ref, cn_ref, scaled_ref, su_ref, *, su
):
    """v3 pass-1 plus the per-SU-block exact max of the row upper bound."""
    raw = jax.lax.dot_general(
        q8_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (B, T) int32
    scaled = (raw.astype(jnp.float32) * sq_ref[:] * sv_ref[:][None, :]).astype(
        jnp.bfloat16
    )
    scaled_ref[:] = scaled
    sf = scaled.astype(jnp.float32)
    upper = sf + jnp.abs(sf) * _BF16_UP + coef_ref[:] * cn_ref[:][None, :]
    bb, t = upper.shape
    su_ref[:] = jnp.max(upper.reshape(bb, t // su, su), axis=-1).T


def v4_pass1_pallas(q8, s_q, coef_b, corpus, svalid, cnorm, su: int):
    """Fused v4 pass-1: (scaled (B, N) bf16, su_upper (B, N//su) f32)."""
    b, d = q8.shape
    n = corpus.shape[0]
    tile = min(_p1_tile(), n)
    if n % tile or tile % (8 * su) or tile % 128:
        tile = 8 * su * max(1, 2048 // (8 * su))
        if n % tile:
            tile = n
    grid = (n // tile,)
    scaled, su_t = pl.pallas_call(
        partial(_v4_pass1_kernel, su=su),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile // su, b), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n), jnp.bfloat16),
            jax.ShapeDtypeStruct((n // su, b), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d + b * d + b * n * 2 + (n // su) * b * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(s_q[:, None], q8, coef_b[:, None], corpus, svalid, cnorm)
    return scaled, su_t.T


def _certified_parts_int8_v4(queries, corpus, valid, k: int, scales, pack):
    """Certificate-v4 fast path (see block comment). Exact-or-fallback:
    returns (vals, ids, safe) with the identical rescore math as v3."""
    svalid, cnorm, _cg = pack
    b, d = queries.shape
    n = corpus.shape[0]
    su = _v4_su()
    rr = _v3_params(k, n, _v3_sgroup())[1]  # candidate rows (default 128)

    s_q = jnp.maximum(jnp.max(jnp.abs(queries), axis=1) / 127.0, 1e-30)
    q8 = jnp.clip(jnp.round(queries / s_q[:, None]), -127, 127).astype(jnp.int8)
    f = queries - s_q[:, None] * q8.astype(jnp.float32)
    coef_b = 1.02 * jnp.sqrt(jnp.sum(f * f, axis=1))  # (B,)

    nsu = n // su
    if _v4_impl() == "kernel":
        scaled, su_up = v4_pass1_pallas(
            q8, s_q, coef_b, corpus, svalid, cnorm, su)
    else:
        # XLA su reduce over the Pallas-written standard-layout matrix:
        # the elementwise upper fuses into the reduce's single 512 MB
        # read (no relayout copy — the input layout is already standard).
        # The v3p kernel's gmax side-output (lane-aligned sg, ~4 MB) is
        # simply dropped — cheaper than a second kernel variant.
        scaled, _gmax = v3_pass1_pallas(q8, s_q, corpus, svalid, _v3_sgroup())
        sf = scaled.reshape(b, nsu, su).astype(jnp.float32)
        su_up = jnp.max(
            sf + jnp.abs(sf) * _BF16_UP
            + coef_b[:, None, None] * cnorm.reshape(nsu, su)[None, :, :],
            axis=-1,
        )

    # Top-rr superblocks by EXACT upper max (containment lemma) — the
    # inner hierarchy reuses _hier_topk with its own exactness proof.
    _, top_blk = _hier_topk(su_up, min(rr, nsu), _hier_blks()[1])
    top_blk = jnp.sort(top_blk, axis=-1)

    # Gather the selected blocks' scores + norms; exact re-rank by upper.
    kb = top_blk.shape[1]
    cand = jnp.take_along_axis(
        scaled.reshape(b, nsu, su), top_blk[:, :, None], axis=1
    )  # (B, kb, su) bf16
    cn_sel = cnorm.reshape(nsu, su)[top_blk]  # (B, kb, su)
    cf = cand.astype(jnp.float32)
    upper = (cf + jnp.abs(cf) * _BF16_UP + coef_b[:, None, None] * cn_sel).reshape(
        b, kb * su
    )
    cand_rows = (
        top_blk[:, :, None] * su + jnp.arange(su, dtype=jnp.int32)[None, None, :]
    ).reshape(b, kb * su)
    top_row_vals, top_row_pos = jax.lax.top_k(upper, min(rr, kb * su))
    gamma = top_row_vals[:, -1]  # EXACT global rr-th best row upper
    rows = jnp.sort(jnp.take_along_axis(cand_rows, top_row_pos, axis=-1), axis=-1)

    # Exact rescore (identical math to v3/brute).
    gathered = corpus[rows]
    raw_exact = jnp.einsum(
        "bd,brd->br", queries, gathered.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    v = valid[rows]
    cand_exact = raw_exact * scales[rows] * v + (1.0 - v) * NEG_INF
    vals, pos = jax.lax.top_k(cand_exact, k)
    ids = jnp.take_along_axis(rows, pos, axis=-1)

    safe = jnp.all(gamma < vals[:, k - 1])
    return vals, ids, safe


def _certified_fast_topk_int8(queries, corpus, valid, k: int, scales, int8_pack):
    b = queries.shape[0]
    if _v4_enabled() and b % 8 == 0:
        vals, ids, safe = _certified_parts_int8_v4(
            queries, corpus, valid, k, scales, int8_pack)
    else:
        vals, ids, safe = _certified_parts_int8(
            queries, corpus, valid, k, scales, int8_pack)

    def exact_path(_):
        from shodh_tpu.ops.distance import masked_scores

        scores = masked_scores(queries, corpus, valid, scales)
        return exact_topk_scores(scores, k)

    return jax.lax.cond(safe, lambda _: (vals, ids), exact_path, operand=None)


def _certified_fast_topk(queries, corpus, valid, k: int, scales, bound, approx=None):
    """bf16 pass-1 two-stage selection with exact rescore + certified fallback."""
    vals, ids, safe = _certified_parts(queries, corpus, valid, k, scales, bound, approx)

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
def two_level_topk(queries, corpus, valid, k: int, scales=None, bound=None,
                   approx=None, int8_pack=None):
    """Exact top-k via fused group-max + group rescoring.

    Same signature/result contract as ops.distance.brute_topk. When
    ``bound`` (a scalar from :func:`corpus_score_bound`) is provided on the
    XLA path, selection runs the certified bf16 fast path — exact rows with
    a proven fallback (see the block comment above ``_certified_parts``).
    Pass ``approx`` (:func:`corpus_approx_bf16`, cached per index version)
    to skip the per-call mirror build. ``int8_pack``
    (:func:`corpus_cert_pack`, cached per index version) selects the
    certified int8-MXU pass-1 — the fastest formulation at >= ~1M rows
    (same exact-or-fallback contract; SHODH_TOPK_INT8=0 disables).
    """
    b, d = queries.shape
    n = corpus.shape[0]
    if scales is None:
        scales = jnp.ones((n,), jnp.float32)

    base_ok = _fast_enabled() and _default_impl() == "xla"
    if (
        int8_pack is not None
        and base_ok
        and corpus.dtype == jnp.int8  # v3 uses the corpus AS the mirror
        and n >= _int8_min_rows()
        # the pack's group count must tile n exactly (sg * g == n)
        and (n // int8_pack[2].shape[0]) * int8_pack[2].shape[0] == n
    ):
        return _certified_fast_topk_int8(queries, corpus, valid, k, scales, int8_pack)
    fastable = (
        base_ok
        and n >= _fast_min_rows()
        and n // GROUP > _slack_groups(k, n // GROUP)
    )
    if bound is not None and fastable:
        return _certified_fast_topk(queries, corpus, valid, k, scales, bound, approx)

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
