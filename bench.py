"""Headline benchmark: recall QPS/chip at 1M x 384-d memories (BASELINE.json).

Measures the fused device recall path (Pallas group-max two-level exact
top-k, int8 corpus with fused dequant) at the BASELINE target scale:
1M MiniLM-dimension vectors, batched queries (B=256), top-10. Exact search
means recall@10 vs brute force is 1.0 by construction — "recall@10 parity"
is structural, and the number reported is pure throughput.

vs_baseline: the reference's published semantic-search latency is
34-58 ms per query on its CPU engine (README.md:183; single-query
sequential pipeline) -> ~21.7 QPS at the 46 ms midpoint. The BASELINE.json
north-star target is >=10x QPS/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_QPS = 1000.0 / 46.0  # 21.7 QPS (README.md:183 midpoint)


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main() -> None:
    small = "--small" in sys.argv
    import jax
    import jax.numpy as jnp

    from shodh_tpu.ops.fused_topk import TILE_N, two_level_topk

    backend = jax.default_backend()
    n = (64 * TILE_N) if small else (1024 * TILE_N)  # 65k small / ~1.05M full
    d, b, k = 384, 256, 10
    log(f"backend={backend} corpus={n}x{d} int8, batch={b}, k={k}")

    # Corpus generated directly on device (no host->device bulk transfer):
    # random unit vectors, quantized to int8 per-row.
    key = jax.random.PRNGKey(0)
    chunks = []
    scales = []
    rows_per_chunk = n // 16
    for i in range(16):
        sub = jax.random.normal(jax.random.fold_in(key, i), (rows_per_chunk, d), jnp.float32)
        sub = sub / jnp.linalg.norm(sub, axis=1, keepdims=True)
        absmax = jnp.max(jnp.abs(sub), axis=1)
        s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        q = jnp.clip(jnp.round(sub / s[:, None]), -127, 127).astype(jnp.int8)
        chunks.append(q)
        scales.append(s)
    corpus = jnp.concatenate(chunks, axis=0)
    scale_arr = jnp.concatenate(scales, axis=0)
    del chunks, scales
    valid = jnp.ones((n,), jnp.float32)

    qkey = jax.random.fold_in(key, 999)
    queries = jax.random.normal(qkey, (b, d), jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)

    # Warmup/compile
    t0 = time.perf_counter()
    vals, rows = jax.block_until_ready(two_level_topk(queries, corpus, valid, k, scale_arr))
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    # Timed: sequential batches. Results are materialized to host each
    # iteration (np.asarray) — block_until_ready alone is not a reliable
    # completion barrier through a remote-execution tunnel.
    iters = 5 if small else 20
    latencies = []
    sink = 0.0
    for i in range(iters):
        qi = jax.random.normal(jax.random.fold_in(qkey, i), (b, d), jnp.float32)
        qi = qi / jnp.linalg.norm(qi, axis=1, keepdims=True)
        np.asarray(qi)
        t0 = time.perf_counter()
        vals, rows = two_level_topk(qi, corpus, valid, k, scale_arr)
        sink += float(np.asarray(vals)[0, 0])
        latencies.append(time.perf_counter() - t0)
    log(f"sink={sink:.3f}")
    lat = sorted(latencies)
    p50 = lat[len(lat) // 2]
    qps = b / p50
    log(f"p50 batch latency: {p50*1e3:.2f} ms for {b} queries -> {qps:,.0f} QPS/chip")
    log(f"per-query p50: {p50/b*1e6:.1f} us; exact top-{k} over {n:,} vectors")

    print(
        json.dumps(
            {
                "metric": f"recall_qps_per_chip_{'65k' if small else '1M'}x384_int8_exact_top10",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / REFERENCE_QPS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
