"""Headline benchmark: recall QPS/chip at scale (BASELINE.json).

Measures the device recall path (two-level exact top-k, int8 corpus with
fused dequant) at increasing corpus sizes up to the BASELINE target
(~1M x 384-d vectors, batched queries B=256, top-10). Exact search means
recall@10 parity with brute force is structural (1.0); the reported number
is throughput.

Robustness: remote-TPU tunnels can stall on oversized in-flight work, so
the benchmark escalates scale step by step inside a watchdog and reports
the largest configuration that completed. Iterations run *inside* one
jitted lax.scan so the measurement amortizes host<->device dispatch
overhead and times actual device execution.

vs_baseline: the reference's published semantic-search latency is 34-58 ms
per query (README.md:183) -> ~21.7 QPS at the 46 ms midpoint. The
BASELINE.json north star is >=10x QPS/chip.

Prints ONE JSON line. Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

REFERENCE_QPS = 1000.0 / 46.0  # 21.7 QPS (README.md:183 midpoint)

# Hardware roofline (v5e defaults; override for other chips). MFU/HBM
# columns keep the perf pressure visible: the certified int8 path (round 4)
# reads the int8 corpus once and materializes the scaled score matrix as
# bf16; remaining headroom is the (B,N) write+read and the top_k sorts.
PEAK_BF16_TFLOPS = float(os.environ.get("SHODH_TPU_PEAK_TFLOPS", "197"))
PEAK_HBM_GBPS = float(os.environ.get("SHODH_TPU_PEAK_HBM_GBPS", "819"))


def roofline(n: int, d: int, b: int, per_batch_s: float, score_bytes: int = 2) -> dict:
    """MFU + HBM-bytes columns for one measured batch.

    flops: the scoring matmul (2*b*n*d — int8 MACs counted as the bf16
    roofline's FLOPs for comparability across rounds). bytes: int8 corpus
    read + score-matrix write+read + query read. ``score_bytes`` is the
    serving path's score-matrix element size: 2 for the certified int8
    pass-1 (>= SHODH_TOPK_INT8_MIN_ROWS — materializes (B, N) bf16 once
    and re-reads it for group max + stage-2 selection), 4 for the exact
    XLA path below the crossover (f32 masked scores). A certificate
    fallback batch additionally pays an uncounted exact f32 pass; at the
    shipped config the cert fires 8/8 so the columns track the fast path.
    """
    flops = 2.0 * b * n * d
    bytes_xla = n * d * 1 + 2 * (b * n * score_bytes) + b * d * 4
    tflops = flops / per_batch_s / 1e12
    return {
        "mfu_pct": round(100.0 * tflops / PEAK_BF16_TFLOPS, 2),
        "achieved_tflops": round(tflops, 2),
        "hbm_gbps": round(bytes_xla / per_batch_s / 1e9, 1),
        "hbm_util_pct": round(100.0 * bytes_xla / per_batch_s / 1e9 / PEAK_HBM_GBPS, 1),
    }
WATCHDOG_SECS = float(os.environ.get("SHODH_BENCH_WATCHDOG_SECS", "560"))
# Extra grace when NOTHING banked at the watchdog (slow device claim):
WATCHDOG_EXTRA_SECS = float(os.environ.get("SHODH_BENCH_WATCHDOG_EXTRA_SECS", "1200"))

_result_lock = threading.Lock()
_best_result: dict | None = None


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def record(result: dict) -> None:
    global _best_result
    with _result_lock:
        _best_result = result


def run_scales() -> None:
    _t_run_start = time.monotonic()
    import jax
    import jax.numpy as jnp

    from shodh_tpu.ops.fused_topk import (
        TILE_N,
        _certified_parts_int8,
        corpus_cert_pack_default,
        two_level_topk,
    )

    d, b, k = 384, 256, 10
    log(f"backend={jax.default_backend()}")

    def build_corpus(n):
        # HOST-side build + one upload. The previous device-side build ran
        # ~5 distinct eager ops through the remote tunnel, each paying a
        # cold compile (~60 s) — 296 s for the FIRST corpus, which ate the
        # 560 s watchdog before any result banked (BENCH run observed
        # "recall_qps_per_chip_unavailable"). numpy builds the same
        # quantized corpus in seconds with zero device compiles.
        import numpy as _np

        rng = _np.random.default_rng(0)
        parts, ss = [], []
        chunks = 16
        for _ in range(chunks):
            sub = rng.standard_normal((n // chunks, d), dtype=_np.float32)
            sub /= _np.linalg.norm(sub, axis=1, keepdims=True)
            s = _np.maximum(_np.abs(sub).max(axis=1) / 127.0, 1e-9).astype(_np.float32)
            parts.append(
                _np.clip(_np.round(sub / s[:, None]), -127, 127).astype(_np.int8)
            )
            ss.append(s)
        corpus = jnp.asarray(_np.concatenate(parts))
        scales = jnp.asarray(_np.concatenate(ss))
        # force materialization before timing anything
        float(jnp.sum(scales))
        return corpus, scales

    def measure(n, label, iters=8, verify_iters=4):
        t0 = time.perf_counter()
        corpus, scales = build_corpus(n)
        valid = jnp.ones((n,), jnp.float32)
        # Certified int8 pass-1 (v3: the corpus IS the selection operand;
        # the pack is just pre-scaled row norms — ops/fused_topk.py).
        pack = corpus_cert_pack_default(corpus, scales, valid)
        log(f"{label}: corpus built in {time.perf_counter() - t0:.1f}s")

        import functools

        @functools.partial(jax.jit, static_argnames=("iters",))
        def scan_batches(corpus, scales, valid, pack, seed, iters):
            def body(carry, i):
                q = jax.random.normal(jax.random.fold_in(seed, i), (b, d), jnp.float32)
                q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
                vals, rows = two_level_topk(q, corpus, valid, k, scales, int8_pack=pack)
                return carry + jnp.sum(vals[:, 0]), None

            total, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
            return total

        @functools.partial(jax.jit, static_argnames=("iters",))
        def verify_batches(corpus, scales, valid, pack, seed, iters):
            """Certificate diagnostics + equality vs the exact path."""
            def body(carry, i):
                q = jax.random.normal(jax.random.fold_in(seed, i), (b, d), jnp.float32)
                q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
                fv, fr, safe = _certified_parts_int8(q, corpus, valid, k, scales, pack)
                ev, er = two_level_topk(q, corpus, valid, k, scales)  # exact path
                # rows must be identical; values differ only by gathered-
                # contraction ulp noise (same contract as the pallas pass 2)
                same = jnp.all(fr == er) & jnp.all(jnp.abs(fv - ev) <= 1e-5)
                n_safe, n_same = carry
                return (n_safe + safe.astype(jnp.int32), n_same + same.astype(jnp.int32)), None

            (n_safe, n_same), _ = jax.lax.scan(
                body, (jnp.int32(0), jnp.int32(0)), jnp.arange(iters)
            )
            return n_safe, n_same

        seed = jax.random.PRNGKey(42)
        if verify_iters:
            ns, nm = verify_batches(corpus, scales, valid, pack, seed, verify_iters)
            log(f"{label}: certificate safe {int(ns)}/{verify_iters} batches, "
                f"fast==exact {int(nm)}/{verify_iters}")
        # Warm up the EXACT variant being timed (static iters => its own
        # compilation; timing a cold variant measures the compiler)
        t0 = time.perf_counter()
        sink = float(scan_batches(corpus, scales, valid, pack, seed, iters))
        compile_s = time.perf_counter() - t0
        log(f"{label}: compile+{iters} batches {compile_s:.1f}s (sink {sink:.2f})")
        # >=3 timed windows; report the MEDIAN with min/max spread so
        # round-over-round comparisons can see the noise floor (round-3
        # verdict #8: 65k swung -21% across rounds with single-shot timing).
        reps = max(1, int(os.environ.get("SHODH_BENCH_REPS", "3")))
        per_rep = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sink = float(scan_batches(corpus, scales, valid, pack, seed, iters))
            per_rep.append((time.perf_counter() - t0) / iters)
        per_batch = sorted(per_rep)[len(per_rep) // 2]
        qps = b / per_batch
        from shodh_tpu.ops.fused_topk import _int8_min_rows

        roof = roofline(
            n, d, b, per_batch, score_bytes=2 if n >= _int8_min_rows() else 4
        )
        log(f"{label}: {per_batch*1e3:.2f} ms/batch (median of {reps}, "
            f"min {min(per_rep)*1e3:.2f} / max {max(per_rep)*1e3:.2f}) "
            f"-> {qps:,.0f} QPS/chip "
            f"(MFU {roof['mfu_pct']}% bf16, HBM {roof['hbm_gbps']} GB/s "
            f"= {roof['hbm_util_pct']}% of peak)")
        record(
            {
                "metric": f"recall_qps_per_chip_{label}_int8_exact_top10",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / REFERENCE_QPS, 1),
                "reps": reps,
                "qps_min": round(b / max(per_rep), 1),
                "qps_max": round(b / min(per_rep), 1),
                **roof,
            }
        )
        del corpus, scales, valid, pack

    def measure_funnel(n, label, iters=8, bank=False):
        """Full hybrid funnel (config 4): fusion + L5 + top-k in one program.
        ``bank=True`` (funnel-only mode) records the B=32 batched row as the
        run's JSON result; the default leaves the exact-search headline
        from measure() untouched for the driver."""
        import functools

        from shodh_tpu.ops.device_recall import fused_recall

        corpus, scales = build_corpus(n)
        valid = jnp.ones((n,), jnp.float32)
        key = jax.random.PRNGKey(5)
        meta = {
            name: jnp.clip(jax.random.uniform(jax.random.fold_in(key, i), (n,)), 0.0, 1.0)
            for i, name in enumerate(
                ("bm25", "graph", "importance", "arousal", "credibility", "momentum")
            )
        }
        hours = jax.random.uniform(jax.random.fold_in(key, 9), (n,)) * 500
        penalty = jnp.ones((n,), jnp.float32)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def scan_funnel(corpus, scales, valid, seed, iters):
            def body(c, i):
                q = jax.random.normal(jax.random.fold_in(seed, i), (d,), jnp.float32)
                q = q / jnp.linalg.norm(q)
                vals, rows = fused_recall(
                    q, corpus, scales, valid, meta["bm25"], meta["graph"],
                    meta["importance"], hours, meta["arousal"], meta["credibility"],
                    meta["momentum"], penalty, jnp.float32(1.2), k=10,
                )
                return c + vals[0], None

            total, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
            return total

        seed = jax.random.PRNGKey(77)
        float(scan_funnel(corpus, scales, valid, seed, iters))  # compile
        t0 = time.perf_counter()
        sink = float(scan_funnel(corpus, scales, valid, seed, iters))
        per_query = (time.perf_counter() - t0) / iters
        log(
            f"{label} fused hybrid funnel (single query/program): "
            f"{per_query*1e3:.2f} ms/query -> {1/per_query:,.0f} QPS (sink {sink:.2f})"
        )

        # Reunified pool program (round 3, verdict #1): the serving fast
        # path's device side — boost mirrors + vec-leg admission cut + deep
        # pool proposal. The host epilogue re-ranks ~256 candidates in
        # python (measured separately; ~ms-scale, corpus-size-independent).
        from shodh_tpu.ops.device_recall import fused_recall_pool

        key_p = jax.random.PRNGKey(55)
        spk = jax.random.randint(jax.random.fold_in(key_p, 1), (n,), 0, 1 << 30)
        rflags = (jax.random.uniform(jax.random.fold_in(key_p, 2), (n, 3)) < 0.3).astype(jnp.float32)
        q_hashes = jnp.full((8,), -1, jnp.int32)
        q_flags = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
        q_age = jnp.zeros((2,), jnp.float32)
        q_scalars = jnp.asarray([0.0, 1.0, 0.4], jnp.float32)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def scan_pool(corpus, scales, valid, seed, iters):
            def body(c, i):
                # Q=1: the common (non-polar) query shape the engine sends
                q = jax.random.normal(jax.random.fold_in(seed, i), (1, d), jnp.float32)
                q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
                vals, rows, fused, cos = fused_recall_pool(
                    q, corpus, scales, valid, meta["bm25"], meta["graph"],
                    meta["importance"], hours, meta["arousal"], meta["credibility"],
                    meta["momentum"], penalty, jnp.float32(1.2),
                    spk, rflags, q_hashes, q_flags, q_age, q_scalars,
                    k=256, vec_k=60,
                )
                return c + vals[0], None

            total, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
            return total

        float(scan_pool(corpus, scales, valid, seed, iters))  # compile
        t0 = time.perf_counter()
        sink = float(scan_pool(corpus, scales, valid, seed, iters))
        per_query = (time.perf_counter() - t0) / iters
        log(
            f"{label} reunified pool program (boost mirrors + vec cut, top-256): "
            f"{per_query*1e3:.2f} ms/query -> {1/per_query:,.0f} QPS (sink {sink:.2f})"
        )

        # Batched funnel (VERDICT item 8): (B, k) in one program with sparse
        # BM25/graph legs scattered on device.
        from shodh_tpu.ops.device_recall import fused_recall_batch

        for bq in (32, 256):
            H = 64
            key_b = jax.random.PRNGKey(101)
            b_rows = jax.random.randint(jax.random.fold_in(key_b, 1), (bq, H), 0, n)
            b_vals = jax.random.uniform(jax.random.fold_in(key_b, 2), (bq, H)) * 5.0
            g_rows = jax.random.randint(jax.random.fold_in(key_b, 3), (bq, H), 0, n)
            g_vals = jax.random.uniform(jax.random.fold_in(key_b, 4), (bq, H))

            @functools.partial(jax.jit, static_argnames=("iters", "bq"))
            def scan_batch_funnel(corpus, scales, valid, seed, iters, bq):
                def body(c, i):
                    q = jax.random.normal(jax.random.fold_in(seed, i), (bq, d), jnp.float32)
                    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
                    # vary the hit rows per iteration: loop-INVARIANT lists
                    # let XLA hoist the whole sparse-leg work out of the
                    # scan, flattering the row ~13x (the pre-round-4 dense
                    # 5.44 ms "record" was exactly this artifact — real
                    # dense cost with fresh lists was ~70 ms/batch at 1M)
                    br = (b_rows + i * 9973) % n
                    gr = (g_rows + i * 7919) % n
                    vals, rows = fused_recall_batch(
                        q, corpus, scales, valid, br, b_vals, gr, g_vals,
                        meta["importance"], hours, meta["arousal"], meta["credibility"],
                        meta["momentum"], penalty, jnp.float32(1.2), k=10,
                    )
                    return c + jnp.sum(vals[:, 0]), None

                total, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
                return total

            float(scan_batch_funnel(corpus, scales, valid, seed, iters, bq))  # compile
            t0 = time.perf_counter()
            sink = float(scan_batch_funnel(corpus, scales, valid, seed, iters, bq))
            per_batch = (time.perf_counter() - t0) / iters
            log(
                f"{label} fused hybrid funnel B={bq}: {per_batch*1e3:.2f} ms/batch "
                f"-> {bq/per_batch:,.0f} QPS (sink {sink:.2f})"
            )
            if bank and bq == 32:
                record(
                    {
                        "metric": f"funnel_qps_per_chip_{label}_batch32",
                        "value": round(bq / per_batch, 1),
                        "unit": "queries/s",
                        "vs_baseline": round(bq / per_batch / REFERENCE_QPS, 1),
                    }
                )

    if "--small" in sys.argv:
        measure(64 * TILE_N, "65k", iters=16)
        return
    if "--funnel-only" in sys.argv:
        # The full ladder can exhaust the watchdog before the funnel rows
        # (4M corpus build alone is ~2 min of host numpy); this mode
        # measures just the serving-funnel programs at the 1M tier.
        measure_funnel(1024 * TILE_N, "1M", bank=True)
        return
    measure(64 * TILE_N, "65k", iters=32, verify_iters=0)  # below the fast-path
    measure(256 * TILE_N, "262k", iters=24, verify_iters=0)
    # 4M serves the v3 int8 certified path like 1M (>= 512k rows); the
    # bf16 bound/approx formulation (still the serving path for
    # float32-dtype DeviceVectorIndex) is covered by unit tests, not here
    measure(4096 * TILE_N, "4M", iters=12, verify_iters=2)
    measure(1024 * TILE_N, "1M", iters=32)
    # Funnel rows run via --funnel-only, NOT here: the default ladder must
    # finish inside the watchdog so the process exits through normal PJRT
    # teardown — an os._exit mid-funnel orphans the remote device claim
    # for 10-40 min (observed twice; see CLAUDE.md hazards).


def main() -> None:
    worker = threading.Thread(target=run_scales, daemon=True)
    worker.start()
    worker.join(timeout=WATCHDOG_SECS)
    with _result_lock:
        result = _best_result
    if result is None:
        # Nothing banked yet — almost always a slow remote device claim
        # (measured 270-560+ s when another process just released the
        # tunnel). Printing "unavailable" now is a guaranteed failure, so
        # keep waiting in short increments and print the moment the first
        # measurement banks, up to a hard cap.
        deadline = time.monotonic() + WATCHDOG_EXTRA_SECS
        while time.monotonic() < deadline:
            worker.join(timeout=30.0)
            with _result_lock:
                result = _best_result
            if result is not None or not worker.is_alive():
                break
    if result is None:
        result = {
            "metric": "recall_qps_per_chip_unavailable",
            "value": 0.0,
            "unit": "queries/s",
            "vs_baseline": 0.0,
        }
    print(json.dumps(result), flush=True)
    if worker.is_alive():
        # Worker is hung on a remote call: a clean interpreter exit would
        # block on it, so exit hard. (Only on this path — os._exit skips
        # PJRT teardown, which delays the next process's device claim.)
        os._exit(0)


if __name__ == "__main__":
    main()
