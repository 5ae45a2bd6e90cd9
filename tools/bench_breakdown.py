"""Stage-by-stage anatomy of the 1M recall kernel (round-4 verdict #1b).

BENCH_r0{1,2,3} show the 1M exact-top-10 tier flat at ~20k QPS/chip with
MFU 8% and HBM 25% — neither compute- nor bandwidth-bound, so structural
headroom exists that three rounds never located. This tool times each
stage of the path in isolation on the real chip so the missing time has a
name: pure HBM stream, pass-1 matmul (bf16 / int8 / f32-HIGHEST /
transposed mirror), group-max reduce, stage-1 top_k, stage-2 selection,
candidate gather + exact rescore, and the assembled certified paths.

Every experiment is a jitted lax.scan over `iters` batches (queries
derived from fold_in(seed, i) so the loop body cannot be hoisted) timed on
its SECOND call; reports median of 3 timed calls. Results append to
stderr and, with --json PATH, to a JSONL file.

Usage (run as a background task, never killed mid-TPU — CLAUDE.md):
    python tools/bench_breakdown.py [--scale 1M|4M|65k] [--exp name,...]
        [--iters 8] [--json /tmp/breakdown.jsonl]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_corpus(n, d):
    rng = np.random.default_rng(0)
    parts, ss = [], []
    chunks = 16
    for _ in range(chunks):
        sub = rng.standard_normal((n // chunks, d), dtype=np.float32)
        sub /= np.linalg.norm(sub, axis=1, keepdims=True)
        s = np.maximum(np.abs(sub).max(axis=1) / 127.0, 1e-9).astype(np.float32)
        parts.append(np.clip(np.round(sub / s[:, None]), -127, 127).astype(np.int8))
        ss.append(s)
    return np.concatenate(parts), np.concatenate(ss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="1M", choices=["65k", "262k", "1M", "4M"])
    ap.add_argument("--exp", default="")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", default="")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (smoke test; sitecustomize forces axon)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from shodh_tpu.ops.distance import NEG_INF, masked_scores
    from shodh_tpu.ops.fused_topk import (
        GROUP,
        TILE_N,
        _certified_parts,
        _certified_parts_int8,
        _slack_groups,
        _slack_rows,
        corpus_approx_bf16,
        corpus_cert_pack_default,
        corpus_score_bound,
        exact_topk_scores,
        two_level_topk,
    )

    n = {"65k": 64, "262k": 256, "1M": 1024, "4M": 4096}[args.scale] * TILE_N
    d, b, k = 384, 256, 10
    g = n // GROUP
    m = _slack_groups(k, g)
    r = _slack_rows(k, m * GROUP)
    iters = args.iters
    log(f"backend={jax.default_backend()} scale={args.scale} n={n} b={b} "
        f"m={m} r={r} iters={iters}")

    t0 = time.perf_counter()
    c_np, s_np = build_corpus(n, d)
    corpus = jnp.asarray(c_np)
    scales = jnp.asarray(s_np)
    valid = jnp.ones((n,), jnp.float32)
    bound = corpus_score_bound(corpus, scales, valid)
    approx = corpus_approx_bf16(corpus, scales, valid)
    approx_t = jnp.asarray(np.ascontiguousarray(
        (c_np.astype(np.float32) * s_np[:, None]).astype(np.float32).T
    ).astype(np.float32)).astype(jnp.bfloat16)  # (D, N) transposed mirror
    pack = corpus_cert_pack_default(corpus, scales, valid)
    mirror8 = corpus  # v3: the corpus IS the int8 selection operand
    mirror8_t = jnp.asarray(np.ascontiguousarray(c_np.T))  # (D, N)
    jax.block_until_ready(approx_t)
    jax.block_until_ready(mirror8_t)
    log(f"corpus + mirrors built in {time.perf_counter() - t0:.1f}s")

    seed = jax.random.PRNGKey(42)

    def q_of(i):
        q = jax.random.normal(jax.random.fold_in(seed, i), (b, d), jnp.float32)
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    results = {}

    # Arrays must flow through jit as ARGUMENTS: closed-over device arrays
    # are baked into the HLO as constants, and the axon remote-compile
    # endpoint rejects >~100 MB payloads (HTTP 413, observed with the 384 MB
    # corpus inlined).
    ops = {
        "corpus": corpus, "scales": scales, "valid": valid, "bound": bound,
        "approx": approx, "approx_t": approx_t, "pack": pack,
        "mirror8_t": mirror8_t,
    }

    def timed(name, body, static=()):
        """body(q, i, ops) -> scalar; scanned over iters, timed on calls 2..reps+1."""
        if args.exp and name not in args.exp.split(","):
            return

        import functools

        @functools.partial(jax.jit, static_argnames=("iters",))
        def scan(iters, ops):
            def step(carry, i):
                return carry + body(q_of(i), i, ops), None

            total, _ = jax.lax.scan(step, 0.0, jnp.arange(iters))
            return total

        t0 = time.perf_counter()
        sink = float(scan(iters, ops))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            sink = float(scan(iters, ops))
            times.append((time.perf_counter() - t0) / iters)
        med = statistics.median(times)
        row = {
            "exp": name, "scale": args.scale,
            "ms_per_batch": round(med * 1e3, 3),
            "ms_min": round(min(times) * 1e3, 3),
            "ms_max": round(max(times) * 1e3, 3),
            "qps": round(b / med, 1), "compile_s": round(compile_s, 1),
            "sink": sink,
        }
        results[name] = row
        log(f"{name:28s} {med*1e3:8.2f} ms/batch  "
            f"[{min(times)*1e3:.2f}..{max(times)*1e3:.2f}]  "
            f"compile {compile_s:.1f}s")
        if args.json:
            with open(args.json, "a") as fh:
                fh.write(json.dumps(row) + "\n")

    f32 = jnp.float32

    # --- pure HBM streams (multiply by an iter-dependent scalar so the
    # reduce fuses into ONE pass over the array and cannot be hoisted) ---
    timed("stream_int8_384MB", lambda q, i, o: jnp.sum(o["corpus"].astype(f32) * q[0, 0]))
    timed("stream_bf16_768MB", lambda q, i, o: jnp.sum(o["approx"].astype(f32) * q[0, 0]))

    # --- pass-1 matmul variants, consumed by a full max (one extra (B,N)
    # read; identical across variants so deltas isolate the matmul) ---
    def mm_bf16(q, i, o):
        raw = jax.lax.dot_general(
            q.astype(jnp.bfloat16), o["approx"],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.bfloat16)
        return jnp.max(raw).astype(f32)

    def mm_bf16_t(q, i, o):
        raw = jax.lax.dot_general(
            q.astype(jnp.bfloat16), o["approx_t"],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16)
        return jnp.max(raw).astype(f32)

    def _q8(q):
        s_q = jnp.maximum(jnp.max(jnp.abs(q), axis=1) / 127.0, 1e-30)
        return jnp.clip(jnp.round(q / s_q[:, None]), -127, 127).astype(jnp.int8)

    def mm_int8(q, i, o):
        raw = jax.lax.dot_general(
            _q8(q), o["corpus"],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        return jnp.max(raw).astype(f32)

    def mm_int8_t(q, i, o):
        raw = jax.lax.dot_general(
            _q8(q), o["mirror8_t"],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return jnp.max(raw).astype(f32)

    def mm_f32_highest(q, i, o):
        return jnp.max(masked_scores(q, o["corpus"], o["valid"], o["scales"]))

    timed("mm_bf16", mm_bf16)
    timed("mm_bf16_T", mm_bf16_t)
    timed("mm_int8", mm_int8)
    timed("mm_int8_T", mm_int8_t)
    timed("mm_f32_highest", mm_f32_highest)

    # --- epilogue stages, cumulatively ---
    def gmax_of(q, o):
        raw = jax.lax.dot_general(
            q.astype(jnp.bfloat16), o["approx"],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.bfloat16)
        return raw, jnp.max(raw.reshape(b, g, GROUP), axis=-1).astype(f32)

    timed("mm+groupmax", lambda q, i, o: jnp.max(gmax_of(q, o)[1]))

    def stage1(q, i, o):
        _, gmax = gmax_of(q, o)
        tv, tg = jax.lax.top_k(gmax, m)
        return jnp.sum(tv[:, -1]) + jnp.sum(tg[:, 0]).astype(f32)

    timed("mm+groupmax+top_k_groups", stage1)

    def stage2(q, i, o):
        raw, gmax = gmax_of(q, o)
        a3 = raw.reshape(b, g, GROUP)
        tv, tg = jax.lax.top_k(gmax, m)
        tg = jnp.sort(tg, axis=-1)
        cand = jnp.take_along_axis(a3, tg[:, :, None], axis=1).reshape(b, m * GROUP)
        rv, rp = jax.lax.top_k(cand.astype(f32), r)
        return jnp.sum(rv[:, -1])

    timed("mm+gm+s1+s2_rows", stage2)

    # --- isolated non-matmul probes (synthetic inputs shipped via ops) ---
    ops["gmax_const"] = jax.random.normal(jax.random.PRNGKey(7), (b, g), jnp.float32)
    ops["cand_const"] = jax.random.normal(
        jax.random.PRNGKey(8), (b, m * GROUP), jnp.float32)
    ops["rows_const"] = jax.random.randint(jax.random.PRNGKey(9), (b, r), 0, n)

    timed("probe_topk_groups_only",
          lambda q, i, o: jnp.sum(jax.lax.top_k(o["gmax_const"] * q[0, 0], m)[0][:, -1]))
    timed("probe_topk_rows_only",
          lambda q, i, o: jnp.sum(jax.lax.top_k(o["cand_const"] * q[0, 0], r)[0][:, -1]))

    def gather_probe(q, i, o):
        rows = (o["rows_const"] + i) % n
        return jnp.sum(o["corpus"][rows].astype(f32)) * q[0, 0]

    timed("probe_gather_rescore_rows", gather_probe)

    def rescore_probe(q, i, o):
        rows = jnp.sort((o["rows_const"] + i) % n, axis=-1)
        gathered = o["corpus"][rows]
        raw = jnp.einsum("bd,brd->br", q, gathered.astype(f32),
                         precision=jax.lax.Precision.HIGHEST)
        v = o["valid"][rows]
        cand = raw * o["scales"][rows] * v + (1.0 - v) * NEG_INF
        vals, pos = jax.lax.top_k(cand, k)
        return jnp.sum(vals[:, 0])

    timed("probe_gather+rescore+topk", rescore_probe)

    # --- assembled paths ---
    def exact_path(q, i, o):
        scores = masked_scores(q, o["corpus"], o["valid"], o["scales"])
        vals, rows = exact_topk_scores(scores, k)
        return jnp.sum(vals[:, 0])

    timed("full_exact_f32_path", exact_path)

    def cert_bf16(q, i, o):
        vals, ids, safe = _certified_parts(
            q, o["corpus"], o["valid"], k, o["scales"], o["bound"], o["approx"])
        return jnp.sum(vals[:, 0]) + safe.astype(f32)

    timed("full_cert_bf16", cert_bf16)

    # --- certificate v3 (corpus-as-mirror) knob sweep. sink ~= number of
    # SAFE batches (vals folded in at 1e-6 so the rescore isn't DCE'd). ---
    import os as _os

    from shodh_tpu.ops.fused_topk import corpus_cert_pack

    # --- v3 stage anatomy at the SHIPPED env defaults (cumulative: each
    # probe adds one pipeline stage, so deltas isolate stage costs; the
    # first probe lets XLA fuse gmax into the matmul epilogue WITHOUT the
    # (B, N) materialization that stage-2's data-dependent gather forces,
    # so v3i_stage2 - v3i_stage1 includes that materialization cost). ---
    from shodh_tpu.ops.fused_topk import (
        _hier_blks,
        _hier_topk,
        _inflate,
        _v3_params,
        _v3_sgroup,
    )

    def _v3i_stages(q, o, stop, barrier=False, pallas_p1=False):
        svalid, cnorm, cg = o["pack_v3"]
        gg = cg.shape[0]
        sgv = n // gg
        mm, rr2, _, _ = _v3_params(k, n, sgv)
        s_q = jnp.maximum(jnp.max(jnp.abs(q), axis=1) / 127.0, 1e-30)
        q8 = jnp.clip(jnp.round(q / s_q[:, None]), -127, 127).astype(jnp.int8)
        fres = q - s_q[:, None] * q8.astype(jnp.float32)
        coef_b = 1.02 * jnp.sqrt(jnp.sum(fres * fres, axis=1))
        if pallas_p1:
            from shodh_tpu.ops.fused_topk import v3_pass1_pallas

            scaled, gmax = v3_pass1_pallas(q8, s_q, o["corpus"], svalid, sgv)
            a3 = scaled.reshape(b, gg, sgv)
        else:
            raw = jax.lax.dot_general(
                q8, o["corpus"], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            scaled = (raw.astype(f32) * s_q[:, None] * svalid[None, :]).astype(
                jnp.bfloat16)
            a3 = scaled.reshape(b, gg, sgv)
            gmax = jnp.max(a3, axis=-1).astype(f32)
        if stop == "gmax":
            return jnp.max(gmax)
        if barrier == "g":
            # Seal only gmax: a3 is dead downstream in the s1 probe, so this
            # tests whether the sort's fusion boundary alone causes the
            # (B, N) materialization.
            gmax = jax.lax.optimization_barrier(gmax)
        elif barrier == "ag":
            # Production shape: ONE matmul island that emits the scaled
            # matrix (needed by stage-2's gather) AND the group maxes, then
            # sealed — the selection stages can't be merged back into it.
            a3, gmax = jax.lax.optimization_barrier((a3, gmax))
        h1, h2 = _hier_blks()
        upper_g = _inflate(gmax) + coef_b[:, None] * cg[None, :]
        top_vals, top_groups = _hier_topk(upper_g, mm, h1)
        if stop == "s1":
            return jnp.sum(top_vals[:, -1]) + jnp.sum(top_groups[:, 0]).astype(f32)
        top_groups = jnp.sort(top_groups, axis=-1)
        cand = jnp.take_along_axis(a3, top_groups[:, :, None], axis=1)
        if stop == "s2gather":
            return jnp.sum(cand.astype(f32))
        cn_sel = cnorm.reshape(gg, sgv)[top_groups]
        upper_rows = (
            _inflate(cand.astype(f32)) + coef_b[:, None, None] * cn_sel
        ).reshape(b, mm * sgv)
        if stop == "s2upper":
            return jnp.sum(upper_rows)
        row_offsets = jnp.arange(sgv, dtype=jnp.int32)[None, None, :]
        cand_rows = (top_groups[:, :, None] * sgv + row_offsets).reshape(
            b, mm * sgv)
        top_row_vals, top_row_pos = _hier_topk(upper_rows, rr2, h2)
        rows = jnp.sort(
            jnp.take_along_axis(cand_rows, top_row_pos, axis=-1), axis=-1)
        if stop == "s2":
            return jnp.sum(top_row_vals[:, -1]) + jnp.sum(rows[:, 0]).astype(f32)
        gathered = o["corpus"][rows]
        raw_exact = jnp.einsum(
            "bd,brd->br", q, gathered.astype(f32),
            precision=jax.lax.Precision.HIGHEST)
        v = o["valid"][rows]
        cand_exact = raw_exact * o["scales"][rows] * v + (1.0 - v) * NEG_INF
        vals, pos = jax.lax.top_k(cand_exact, k)
        return jnp.sum(vals[:, 0])

    def _v3iT_stages(q, o, stop):
        """Transposed pass-1: corpus is the dot LHS so the scaled matrix
        materializes as (N, B) — the group reduce runs over the MIDDLE dim
        and stage-2's group gather slices the MAJOR dim. AOT memory_analysis
        at 1M: the row-major formulation keeps TWO 512 MB buffers live (XLA
        inserts a bf16[32,8,4096,256] relayout copy between the dot fusion
        and the reduce/gather consumers); this one keeps exactly ONE
        (temp 1074 MB -> 537 MB), saving ~1 GB of HBM traffic per batch."""
        svalid, cnorm, cg = o["pack_v3"]
        gg = cg.shape[0]
        sgv = n // gg
        mm, rr2, _, _ = _v3_params(k, n, sgv)
        s_q = jnp.maximum(jnp.max(jnp.abs(q), axis=1) / 127.0, 1e-30)
        q8 = jnp.clip(jnp.round(q / s_q[:, None]), -127, 127).astype(jnp.int8)
        fres = q - s_q[:, None] * q8.astype(jnp.float32)
        coef_b = 1.02 * jnp.sqrt(jnp.sum(fres * fres, axis=1))
        rawT = jax.lax.dot_general(
            o["corpus"], q8, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)  # (N, B)
        scaledT = (rawT.astype(f32) * s_q[None, :] * svalid[:, None]).astype(
            jnp.bfloat16)
        a3T = scaledT.reshape(gg, sgv, b)
        gmax = jnp.max(a3T, axis=1).astype(f32).T  # (B, G)
        if stop == "gmax":
            return jnp.max(gmax)
        h1, h2 = _hier_blks()
        upper_g = _inflate(gmax) + coef_b[:, None] * cg[None, :]
        top_vals, top_groups = _hier_topk(upper_g, mm, h1)
        if stop == "s1":
            return jnp.sum(top_vals[:, -1]) + jnp.sum(top_groups[:, 0]).astype(f32)
        top_groups = jnp.sort(top_groups, axis=-1)
        idxT = top_groups.T[:, None, :]  # (m, 1, B)
        candT = jnp.take_along_axis(
            a3T, jnp.broadcast_to(idxT, (mm, sgv, b)), axis=0)
        cand = jnp.transpose(candT, (2, 0, 1))  # (B, m, sg)
        cn_sel = cnorm.reshape(gg, sgv)[top_groups]
        upper_rows = (
            _inflate(cand.astype(f32)) + coef_b[:, None, None] * cn_sel
        ).reshape(b, mm * sgv)
        row_offsets = jnp.arange(sgv, dtype=jnp.int32)[None, None, :]
        cand_rows = (top_groups[:, :, None] * sgv + row_offsets).reshape(
            b, mm * sgv)
        top_row_vals, top_row_pos = _hier_topk(upper_rows, rr2, h2)
        rows = jnp.sort(
            jnp.take_along_axis(cand_rows, top_row_pos, axis=-1), axis=-1)
        if stop == "s2":
            return jnp.sum(top_row_vals[:, -1]) + jnp.sum(rows[:, 0]).astype(f32)
        gathered = o["corpus"][rows]
        raw_exact = jnp.einsum(
            "bd,brd->br", q, gathered.astype(f32),
            precision=jax.lax.Precision.HIGHEST)
        v = o["valid"][rows]
        cand_exact = raw_exact * o["scales"][rows] * v + (1.0 - v) * NEG_INF
        vals, pos = jax.lax.top_k(cand_exact, k)
        return jnp.sum(vals[:, 0])

    if not args.exp or any(e.startswith("v3iT_") for e in args.exp.split(",")):
        ops["pack_v3"] = corpus_cert_pack(
            corpus, scales, valid, sgroup=_v3_sgroup())
        timed("v3iT_mm_scaled_gmax", lambda q, i, o: _v3iT_stages(q, o, "gmax"))
        timed("v3iT_stage1", lambda q, i, o: _v3iT_stages(q, o, "s1"))
        timed("v3iT_stage2", lambda q, i, o: _v3iT_stages(q, o, "s2"))
        timed("v3iT_full", lambda q, i, o: _v3iT_stages(q, o, "full"))
        ops.pop("pack_v3", None)

    if not args.exp or any(e.startswith("v3p_") for e in args.exp.split(",")):
        # Pallas pass-1 (SHODH_TOPK_P1): emits the standard-layout scaled
        # matrix + group maxes in ONE pass — no XLA relayout copy.
        ops["pack_v3"] = corpus_cert_pack(
            corpus, scales, valid, sgroup=_v3_sgroup())
        timed("v3p_mm_scaled_gmax",
              lambda q, i, o: _v3i_stages(q, o, "gmax", pallas_p1=True))
        timed("v3p_stage1",
              lambda q, i, o: _v3i_stages(q, o, "s1", pallas_p1=True))
        timed("v3p_s2gather",
              lambda q, i, o: _v3i_stages(q, o, "s2gather", pallas_p1=True))
        timed("v3p_s2upper",
              lambda q, i, o: _v3i_stages(q, o, "s2upper", pallas_p1=True))
        timed("v3p_stage2",
              lambda q, i, o: _v3i_stages(q, o, "s2", pallas_p1=True))
        timed("v3p_full",
              lambda q, i, o: _v3i_stages(q, o, "full", pallas_p1=True))
        # Certificate v4: hierarchical upper-bound selection with in-kernel
        # superblock maxes (one global containment stage, tighter boundary).
        from shodh_tpu.ops.fused_topk import _certified_parts_int8_v4

        def cert_v4(q, i, o):
            vals, ids, safe = _certified_parts_int8_v4(
                q, o["corpus"], o["valid"], k, o["scales"], o["pack_v3"])
            return jnp.sum(vals[:, 0]) * 1e-6 + safe.astype(f32)

        timed("v4_full", cert_v4)
        for s2 in (8, 16, 64):
            _os.environ["SHODH_TOPK_V4_SU"] = str(s2)
            timed(f"v4_full_su{s2}", cert_v4)
        _os.environ.pop("SHODH_TOPK_V4_SU", None)
        _os.environ["SHODH_TOPK_V4_IMPL"] = "kernel"
        timed("v4_full_kernel_su128", cert_v4)
        _os.environ.pop("SHODH_TOPK_V4_IMPL", None)

        # NOTE: tile=4096/8192 OOM Mosaic's 16 MB scoped VMEM at B=256
        # (18.15M scoped for the 8192 kernel; the int32 (B, T) accumulator
        # + double-buffered in/out blocks). 2048 is the shipped default
        # and is already ~at the pass-1 floor (2.52 ms vs 1.9 ms matmul-only
        # + the 512 MB scaled write).
        ops.pop("pack_v3", None)

    if not args.exp or any(e.startswith("v3i_") for e in args.exp.split(",")):
        ops["pack_v3"] = corpus_cert_pack(
            corpus, scales, valid, sgroup=_v3_sgroup())
        timed("v3i_mm_scaled_gmax", lambda q, i, o: _v3i_stages(q, o, "gmax"))
        timed("v3i_stage1", lambda q, i, o: _v3i_stages(q, o, "s1"))
        timed("v3i_stage2", lambda q, i, o: _v3i_stages(q, o, "s2"))
        timed("v3i_full", lambda q, i, o: _v3i_stages(q, o, "full"))
        timed("v3i_stage1_barG",
              lambda q, i, o: _v3i_stages(q, o, "s1", barrier="g"))
        timed("v3i_stage1_barAG",
              lambda q, i, o: _v3i_stages(q, o, "s1", barrier="ag"))
        timed("v3i_full_barAG",
              lambda q, i, o: _v3i_stages(q, o, "full", barrier="ag"))
        ops.pop("pack_v3", None)
        ops["g_const"] = jax.random.normal(
            jax.random.PRNGKey(11), (b, n // _v3_sgroup()), jnp.float32)
        from shodh_tpu.ops.fused_topk import _slack_groups as _sg_fn
        _m_v3 = _v3_params(k, n, _v3_sgroup())[0]
        timed("probe_hier_topk_groups",
              lambda q, i, o: jnp.sum(
                  _hier_topk(o["g_const"] * q[0, 0], _m_v3,
                             _hier_blks()[0])[0][:, -1]))

    def cert_v3(q, i, o):
        vals, ids, safe = _certified_parts_int8(
            q, o["corpus"], o["valid"], k, o["scales"], o["pack_v3"])
        return jnp.sum(vals[:, 0]) * 1e-6 + safe.astype(f32)

    for name, sg, zone, rr, s16, sub, h1, h2 in (
        ("v3_sg128_z15360_r256", 128, 15360, 256, 0, 0, 0, 0),
        ("v3_sg128_z15360_r128", 128, 15360, 128, 0, 0, 0, 0),
        ("v3_sg128_z15360_r512", 128, 15360, 512, 0, 0, 0, 0),
        ("v3_sg256_z15360_r256", 256, 15360, 256, 0, 0, 0, 0),
        ("v3_sg256_z15360_r128", 256, 15360, 128, 0, 0, 0, 0),
        ("v3_sg512_z15360_r128", 512, 15360, 128, 0, 0, 0, 0),
        ("v3_sg256_z8192_r128", 256, 8192, 128, 0, 0, 0, 0),
        ("v3_sg256_z12288_r128", 256, 12288, 128, 0, 0, 0, 0),
        ("v3_sg256_z10240_r128", 256, 10240, 128, 0, 0, 0, 0),
        ("v3_sg256_z15360_r96", 256, 15360, 96, 0, 0, 0, 0),
        ("v3_sg256_z15360_r64", 256, 15360, 64, 0, 0, 0, 0),
        ("v3_sg256_z15360_r128_s16", 256, 15360, 128, 1, 0, 0, 0),
        ("v3_sg256_z12288_r96_s16", 256, 12288, 96, 1, 0, 0, 0),
        ("v3_sg256_z15360_r256_sub8", 256, 15360, 256, 0, 8, 0, 0),
        ("v3_sg256_z15360_r256_sub16", 256, 15360, 256, 0, 16, 0, 0),
        ("v3_sg256_z15360_r128_sub8", 256, 15360, 128, 0, 8, 0, 0),
        # Exact hierarchical selection (SHODH_TOPK_HIER_*): same top-m/rr
        # VALUES as the flat sort (certificate boundary unchanged), sort
        # lengths cut ~4-5x. Sweep each stage alone then jointly.
        ("v3_sg256_z15360_r128_h1x8", 256, 15360, 128, 0, 0, 8, 0),
        ("v3_sg256_z15360_r128_h2x8", 256, 15360, 128, 0, 0, 0, 8),
        ("v3_sg256_z15360_r128_h8x8", 256, 15360, 128, 0, 0, 8, 8),
        ("v3_sg256_z15360_r128_h16x16", 256, 15360, 128, 0, 0, 16, 16),
        ("v3_sg256_z15360_r128_h8x16", 256, 15360, 128, 0, 0, 8, 16),
        ("v3_sg128_z15360_r128_h8x8", 128, 15360, 128, 0, 0, 8, 8),
        ("v3_sg256_z15360_r128_h0x16", 256, 15360, 128, 0, 0, 0, 16),
        ("v3_sg256_z15360_r128_h0x32", 256, 15360, 128, 0, 0, 0, 32),
        ("v3_sg256_z15360_r128_h16x8", 256, 15360, 128, 0, 0, 16, 8),
        ("v3_sg256_z15360_r128_h16x32", 256, 15360, 128, 0, 0, 16, 32),
        # round-4-late: zone shrink candidates under the Pallas pass-1 (the
        # s2 zone gather is now the dominant stage term at +1.83 ms; sink
        # integer part == certified batches, watch it stay == iters)
        ("v3_sg256_z12288_r128_h16x32", 256, 12288, 128, 0, 0, 16, 32),
        ("v3_sg256_z13824_r128_h16x32", 256, 13824, 128, 0, 0, 16, 32),
        ("v3_sg128_z12288_r128_h16x32", 128, 12288, 128, 0, 0, 16, 32),
        ("v3_sg256_z15360_r128_h32x16", 256, 15360, 128, 0, 0, 32, 16),
        # sg128 small-zone candidates: finer groups halve the per-group max
        # slack, so beta (and the zone boundary) tightens — the cert may
        # hold 32/32 at zones where sg256 drops batches (z12288 was 31/32
        # at sg256 but sg128_z12288 fired 32/32 at ~the shipped latency).
        ("v3_sg128_z11264_r128_h16x32", 128, 11264, 128, 0, 0, 16, 32),
        ("v3_sg128_z10240_r128_h16x32", 128, 10240, 128, 0, 0, 16, 32),
        ("v3_sg128_z8192_r128_h16x32", 128, 8192, 128, 0, 0, 16, 32),
    ):
        _os.environ["SHODH_TOPK_SGROUP"] = str(sg)
        _os.environ["SHODH_TOPK_ZONE_ROWS"] = str(zone)
        _os.environ["SHODH_TOPK_V3_ROWS"] = str(rr)
        _os.environ["SHODH_TOPK_SORT_BF16"] = str(s16)
        _os.environ["SHODH_TOPK_SUB"] = str(sub)
        _os.environ["SHODH_TOPK_HIER_S1"] = str(h1)
        _os.environ["SHODH_TOPK_HIER_S2"] = str(h2)
        ops["pack_v3"] = corpus_cert_pack(corpus, scales, valid, sgroup=sg)
        timed(f"full_cert_{name}", cert_v3)
    for v in ("SHODH_TOPK_SGROUP", "SHODH_TOPK_ZONE_ROWS", "SHODH_TOPK_V3_ROWS",
              "SHODH_TOPK_SORT_BF16", "SHODH_TOPK_SUB",
              "SHODH_TOPK_HIER_S1", "SHODH_TOPK_HIER_S2"):
        _os.environ.pop(v, None)
    ops.pop("pack_v3", None)

    # int8-v2 certificate fire rate (the round-3 verdict's explicit ask)
    if not args.exp or "fire_rate" in args.exp.split(","):
        import functools

        @functools.partial(jax.jit, static_argnames=("iters",))
        def fire(iters, o):
            def step(carry, i):
                _, _, safe = _certified_parts_int8(
                    q_of(i), o["corpus"], o["valid"], k, o["scales"], o["pack"])
                _, _, safeb = _certified_parts(
                    q_of(i), o["corpus"], o["valid"], k, o["scales"],
                    o["bound"], o["approx"])
                return (carry[0] + safe.astype(jnp.int32),
                        carry[1] + safeb.astype(jnp.int32)), None

            tot, _ = jax.lax.scan(step, (jnp.int32(0), jnp.int32(0)),
                                  jnp.arange(iters))
            return tot

        n8, nb = fire(iters, ops)
        row = {"exp": "fire_rate", "scale": args.scale,
               "int8_safe": int(n8), "bf16_safe": int(nb), "of": iters}
        log(f"certificate fire rate: int8 {int(n8)}/{iters}, "
            f"bf16 {int(nb)}/{iters}")
        if args.json:
            with open(args.json, "a") as fh:
                fh.write(json.dumps(row) + "\n")

    log("done")


if __name__ == "__main__":
    main()
