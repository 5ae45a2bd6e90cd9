"""A/B the batched serving funnel: dense scatter planes vs sparse correction.

The serving-throughput configuration (engine/device_funnel.py recall_batch,
CHUNK_B=32 windows) ran fused_recall_batch_dense: two (B, N) f32 scatter
planes (~512 MB of HBM traffic per batch at 1M rows) carrying <=512 hits per
query, plus a full-array lax.top_k. The sparse-correction rewrite keeps the
legs sparse and selects via the two-level group gather. This probe times both
at the bench shapes on real TPU.

    python tools/bench_batch_funnel.py [--scale 1M] [--iters 16] [--reps 3]

One process at a time on the TPU; run as a background task without timeout
(CLAUDE.md environment hazards).
"""

from __future__ import annotations

import argparse
import functools
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="1M", choices=["65k", "262k", "1M", "4M"])
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--hits", type=int, default=256, help="hit-list width per leg")
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--json", default="")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from shodh_tpu.ops.device_recall import (
        fused_recall_batch,
        fused_recall_batch_dense,
    )

    n = {"65k": 1 << 16, "262k": 1 << 18, "1M": 1 << 20, "4M": 1 << 22}[args.scale]
    d, b, h, k = 384, args.b, args.hits, args.k
    log(f"devices: {jax.devices()}  N={n} D={d} B={b} H={h} k={k}")

    rng = np.random.default_rng(7)
    t0 = time.perf_counter()
    c_np = rng.integers(-127, 128, (n, d), dtype=np.int8)
    corpus = jnp.asarray(c_np)
    norms = np.linalg.norm(c_np.astype(np.float32), axis=1)
    scales = jnp.asarray((1.0 / np.maximum(norms, 1e-6)).astype(np.float32))
    valid = jnp.ones((n,), jnp.float32)
    meta = {
        "importance": jnp.asarray(rng.uniform(0, 1, n).astype(np.float32)),
        "hours_old": jnp.asarray(rng.uniform(0, 500, n).astype(np.float32)),
        "arousal": jnp.asarray(rng.uniform(0, 1, n).astype(np.float32)),
        "credibility": jnp.asarray(rng.uniform(0, 1, n).astype(np.float32)),
        "momentum": jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32)),
        "tag_penalty": jnp.asarray(np.ones(n, np.float32)),
    }
    base_b_rows = jnp.asarray(rng.integers(0, n, (b, h), dtype=np.int64).astype(np.int32))
    base_b_vals = jnp.asarray(rng.uniform(0.1, 8, (b, h)).astype(np.float32))
    base_g_rows = jnp.asarray(rng.integers(0, n, (b, h), dtype=np.int64).astype(np.int32))
    base_g_vals = jnp.asarray(rng.uniform(0.05, 1, (b, h)).astype(np.float32))
    jax.block_until_ready(corpus)
    log(f"corpus built in {time.perf_counter() - t0:.1f}s")

    seed = jax.random.PRNGKey(42)

    def q_of(i):
        q = jax.random.normal(jax.random.fold_in(seed, i), (b, d), jnp.float32)
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    # arrays flow as ARGUMENTS (closed-over device arrays bake into the HLO;
    # the axon remote-compile endpoint rejects >~100 MB payloads)
    ops = dict(
        corpus=corpus, scales=scales, valid=valid,
        b_rows=base_b_rows, b_vals=base_b_vals,
        g_rows=base_g_rows, g_vals=base_g_vals, **meta,
    )

    results = {}

    def timed(name, fn):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def scan(iters, o):
            def step(carry, i):
                # vary rows per iter on device so nothing is hoisted
                br = (o["b_rows"] + i * 9973) % n
                gr = (o["g_rows"] + i * 7919) % n
                vals, rows = fn(
                    q_of(i), o["corpus"], o["scales"], o["valid"],
                    br, o["b_vals"], gr, o["g_vals"],
                    o["importance"], o["hours_old"], o["arousal"],
                    o["credibility"], o["momentum"], o["tag_penalty"],
                    jnp.float32(1.7), k=k,
                )
                return carry + vals[0, 0] + jnp.float32(rows[0, 0] % 97), None

            total, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(args.iters))
            return total

        t0 = time.perf_counter()
        sink = float(scan(args.iters, ops))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            sink = float(scan(args.iters, ops))
            times.append((time.perf_counter() - t0) / args.iters)
        med = statistics.median(times)
        row = {
            "exp": name, "scale": args.scale, "b": b, "hits": h, "k": k,
            "ms_per_batch": round(med * 1e3, 3),
            "ms_min": round(min(times) * 1e3, 3),
            "ms_max": round(max(times) * 1e3, 3),
            "qps": round(b / med, 1), "compile_s": round(compile_s, 1),
            "sink": sink,
        }
        results[name] = row
        log(f"{name:16s} {med*1e3:8.2f} ms/batch [{min(times)*1e3:.2f}.."
            f"{max(times)*1e3:.2f}]  {b/med:,.0f} QPS  compile {compile_s:.1f}s  "
            f"sink {sink:.3f}")
        if args.json:
            with open(args.json, "a") as fh:
                fh.write(json.dumps(row) + "\n")

    timed("dense", fused_recall_batch_dense)
    timed("sparse", fused_recall_batch)
    if "dense" in results and "sparse" in results:
        same = results["dense"]["sink"] == results["sparse"]["sink"]
        log(f"sinks {'IDENTICAL' if same else 'DIFFER'}: "
            f"{results['dense']['sink']} vs {results['sparse']['sink']}")
        log(f"speedup: {results['dense']['ms_per_batch'] / results['sparse']['ms_per_batch']:.2f}x")


if __name__ == "__main__":
    main()
