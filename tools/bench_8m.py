"""8M-tier hardware measurement: exact certified top-k vs IVF (verdict #4).

Settles BASELINE config 3's "partitioned ANN" axis with device data:
- exact: the certified int8-MXU v3 selection at 8,388,608 rows (the 4M
  ladder doubled; B derated via SHODH_BENCH_B because the (B, N) bf16
  pass-1 matrix is 4 GB at B=256 and the cond's exact-fallback branch
  peaks another (B, N) f32 on top);
- IVF: chunked int8 k-means build (kmeans_fit_int8 — the resident operand
  is the 1-byte corpus) + the _ivf_search program, swept over nprobe with
  recall@10 measured against the exact rows.

Synthetic uniform unit vectors are the WORST case for IVF (no cluster
structure to exploit) — its recall@nprobe here is a lower bound; real
embedding corpora cluster far better. The exact path has no such
dependence.

Run on real TPU as a background task (no timeout; see CLAUDE.md hazards):
    python tools/bench_8m.py [--rows 8388608] [--skip-exact] [--skip-ivf]
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_corpus_int8(n, d, seed=0):
    rng = np.random.default_rng(seed)
    parts, ss = [], []
    chunks = 32
    for _ in range(chunks):
        sub = rng.standard_normal((n // chunks, d), dtype=np.float32)
        sub /= np.linalg.norm(sub, axis=1, keepdims=True)
        s = np.maximum(np.abs(sub).max(axis=1) / 127.0, 1e-9).astype(np.float32)
        parts.append(np.clip(np.round(sub / s[:, None]), -127, 127).astype(np.int8))
        ss.append(s)
    return np.concatenate(parts), np.concatenate(ss)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8 * 1024 * 1024)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--skip-ivf", action="store_true")
    args = ap.parse_args()

    import jax

    if os.environ.get("SHODH_BENCH_CPU") == "1":  # smoke-test escape
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from shodh_tpu.ops.fused_topk import (
        _certified_parts_int8, corpus_cert_pack_default, two_level_topk,
    )

    n, d, k = args.rows, args.dim, args.k
    log(f"backend={jax.default_backend()} rows={n:,}")

    t0 = time.perf_counter()
    c_np, s_np = build_corpus_int8(n, d)
    log(f"corpus built on host in {time.perf_counter()-t0:.1f}s")
    corpus = jnp.asarray(c_np)
    scales = jnp.asarray(s_np)
    valid = jnp.ones((n,), jnp.float32)
    float(jnp.sum(scales))  # materialize

    results = []

    if not args.skip_exact:
        b = int(os.environ.get("SHODH_BENCH_B", "128"))
        pack = corpus_cert_pack_default(corpus, scales, valid)

        @functools.partial(jax.jit, static_argnames=("iters", "b"))
        def scan_batches(corpus, scales, valid, pack, seed, iters, b):
            def body(carry, i):
                q = jax.random.normal(jax.random.fold_in(seed, i), (b, d), jnp.float32)
                q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
                vals, rows = two_level_topk(q, corpus, valid, k, scales, int8_pack=pack)
                return carry + jnp.sum(vals[:, 0]), None

            total, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
            return total

        @functools.partial(jax.jit, static_argnames=("iters", "b"))
        def verify_batches(corpus, scales, valid, pack, seed, iters, b):
            def body(carry, i):
                q = jax.random.normal(jax.random.fold_in(seed, i), (b, d), jnp.float32)
                q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
                fv, fr, safe = _certified_parts_int8(q, corpus, valid, k, scales, pack)
                ev, er = two_level_topk(q, corpus, valid, k, scales)
                same = jnp.all(fr == er) & jnp.all(jnp.abs(fv - ev) <= 1e-5)
                ns, nm = carry
                return (ns + safe.astype(jnp.int32), nm + same.astype(jnp.int32)), None

            out, _ = jax.lax.scan(body, (jnp.int32(0), jnp.int32(0)), jnp.arange(iters))
            return out

        seed = jax.random.PRNGKey(42)
        iters = 8
        ns, nm = verify_batches(corpus, scales, valid, pack, seed, 2, b)
        log(f"8M exact B={b}: certificate safe {int(ns)}/2, fast==exact {int(nm)}/2")
        t0 = time.perf_counter()
        sink = float(scan_batches(corpus, scales, valid, pack, seed, iters, b))
        log(f"8M exact: compile+{iters} batches {time.perf_counter()-t0:.1f}s (sink {sink:.2f})")
        per_rep = []
        for _ in range(3):
            t0 = time.perf_counter()
            sink = float(scan_batches(corpus, scales, valid, pack, seed, iters, b))
            per_rep.append((time.perf_counter() - t0) / iters)
        per_batch = sorted(per_rep)[1]
        row = {
            "metric": "recall_qps_per_chip_8M_int8_exact_top10",
            "value": round(b / per_batch, 1),
            "unit": "queries/s",
            "batch": b,
            "ms_per_batch": round(per_batch * 1e3, 2),
            "ms_min": round(min(per_rep) * 1e3, 2),
            "ms_max": round(max(per_rep) * 1e3, 2),
            "cert_safe": f"{int(ns)}/2",
        }
        results.append(row)
        log(json.dumps(row))
        del pack

    if not args.skip_ivf:
        from shodh_tpu.index.ivf import _ivf_search
        from shodh_tpu.index.kmeans import kmeans_fit_int8

        kc = max(1, int(math.sqrt(n)))
        # chunk must divide n (8M = 128 * 65536 exactly)
        t0 = time.perf_counter()
        idx0 = (np.arange(kc) * (n // kc)).clip(0, n - 1)
        init = jnp.asarray(c_np[idx0].astype(np.float32) * s_np[idx0, None])
        cents, assign = kmeans_fit_int8(corpus, scales, init, k=kc, iters=10)
        cents_np = np.asarray(cents)
        assign_np = np.asarray(assign)
        log(f"IVF kmeans (K={kc}) in {time.perf_counter()-t0:.1f}s")

        # vectorized posting build (same layout as index/ivf.py)
        t0 = time.perf_counter()
        avg = max(1, int(np.ceil(n / kc)))
        pad_width = max(8, 4 * avg)
        postings = np.full((kc, pad_width), -1, np.int32)
        order = np.argsort(assign_np, kind="stable").astype(np.int64)
        sa = assign_np[order]
        starts = np.searchsorted(sa, np.arange(kc))
        pic = np.arange(n, dtype=np.int64) - starts[sa]
        in_cap = pic < pad_width
        postings[sa[in_cap], pic[in_cap]] = order[in_cap]
        overflow = np.sort(order[~in_cap]).astype(np.int32)
        if len(overflow) == 0:
            overflow = np.full((8,), -1, np.int32)
        log(f"postings built in {time.perf_counter()-t0:.1f}s "
            f"(pad {pad_width}, overflow {int((overflow >= 0).sum())})")
        postings_d = jnp.asarray(postings)
        overflow_d = jnp.asarray(overflow)
        cents_d = jnp.asarray(cents_np)

        # probe queries + exact reference rows
        rng = np.random.default_rng(7)
        bq = int(os.environ.get("SHODH_IVF_B", "32"))
        queries = rng.standard_normal((bq, d)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        q_d = jnp.asarray(queries)
        ev, er = two_level_topk(q_d, corpus, valid, k, scales)
        er_np = np.asarray(er)

        for nprobe in (5, 10, 20):
            t0 = time.perf_counter()
            vals, rows = _ivf_search(
                q_d, cents_d, postings_d, overflow_d, corpus, scales, valid,
                nprobe=nprobe, k=k,
            )
            rows.block_until_ready()
            compile_s = time.perf_counter() - t0
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _i in range(4):
                    vals, rows = _ivf_search(
                        q_d, cents_d, postings_d, overflow_d, corpus, scales,
                        valid, nprobe=nprobe, k=k,
                    )
                rows.block_until_ready()
                reps.append((time.perf_counter() - t0) / 4)
            per_batch = sorted(reps)[1]
            rows_np = np.asarray(rows)
            rec = float(
                np.mean([
                    len(set(rows_np[i].tolist()) & set(er_np[i].tolist())) / k
                    for i in range(bq)
                ])
            )
            row = {
                "metric": f"ivf_8M_nprobe{nprobe}",
                "ms_per_batch": round(per_batch * 1e3, 2),
                "qps": round(bq / per_batch, 1),
                "batch": bq,
                "recall_at_10_vs_exact": round(rec, 4),
                "compile_s": round(compile_s, 1),
            }
            results.append(row)
            log(json.dumps(row))

    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
