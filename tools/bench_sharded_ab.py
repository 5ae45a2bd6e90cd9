"""Hardware A/B: the sharded certified formulation at 1 shard vs the flat
certified path (round-5 verdict #2 done-criterion), plus the batched
funnel at 4M under the derated window (round-4 advisor #3 measurement).

Run on real TPU as a background task (no timeout; CLAUDE.md hazards):
    python tools/bench_sharded_ab.py
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import os

    import jax

    if os.environ.get("SHODH_BENCH_CPU") == "1":  # smoke-test escape
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from shodh_tpu.ops.fused_topk import corpus_cert_pack_default, two_level_topk

    d, b, k = 384, 256, 10
    n = int(os.environ.get("SHODH_AB_ROWS", str(1 << 20)))
    log(f"backend={jax.default_backend()}")

    rng = np.random.default_rng(0)
    parts, ss = [], []
    for _ in range(16):
        sub = rng.standard_normal((n // 16, d), dtype=np.float32)
        sub /= np.linalg.norm(sub, axis=1, keepdims=True)
        s = np.maximum(np.abs(sub).max(axis=1) / 127.0, 1e-9).astype(np.float32)
        parts.append(np.clip(np.round(sub / s[:, None]), -127, 127).astype(np.int8))
        ss.append(s)
    c_np, s_np = np.concatenate(parts), np.concatenate(ss)

    results = []

    # Build the sharded index FIRST; the flat arm consumes its device
    # arrays so both arms select over byte-identical quantized rows.
    from jax.sharding import Mesh

    from shodh_tpu.parallel.sharded_index import ShardedVectorIndex

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("shard",))
    vecs = c_np.astype(np.float32) * s_np[:, None]
    idx = ShardedVectorIndex(vecs, mesh, dtype="int8")

    # -- flat certified reference at 1M ------------------------------------
    corpus = idx._corpus
    scales = idx._scales
    valid = idx._valid
    pack = corpus_cert_pack_default(corpus, scales, valid)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def scan_flat(corpus, scales, valid, pack, seed, iters):
        def body(c, i):
            q = jax.random.normal(jax.random.fold_in(seed, i), (b, d), jnp.float32)
            q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
            vals, rows = two_level_topk(q, corpus, valid, k, scales, int8_pack=pack)
            return c + jnp.sum(vals[:, 0]), None

        total, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
        return total

    seed = jax.random.PRNGKey(42)
    iters = 32
    sink_flat = float(scan_flat(corpus, scales, valid, pack, seed, iters))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        sink_flat = float(scan_flat(corpus, scales, valid, pack, seed, iters))
        reps.append((time.perf_counter() - t0) / iters)
    flat_ms = sorted(reps)[1] * 1e3
    row = {"metric": "flat_certified_1M_ms_per_batch", "value": round(flat_ms, 2),
           "min": round(min(reps) * 1e3, 2), "max": round(max(reps) * 1e3, 2),
           "sink": round(sink_flat, 2)}
    results.append(row)
    log(json.dumps(row))

    # -- sharded formulation at 1 shard (same device) -----------------------
    from jax.sharding import PartitionSpec as P

    from shodh_tpu.parallel.sharded_index import _local_topk

    shard_fn = jax.shard_map(
        functools.partial(_local_topk, k=k, axis="shard"),
        mesh=mesh,
        in_specs=(P(), P("shard"), P("shard"), P("shard")) + (P("shard"),) * 3,
        out_specs=(P(), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, static_argnames=("iters",))
    def scan_sharded(corpus_s, valid_s, scales_s, sv, cn, cg, seed, iters):
        def body(c, i):
            q = jax.random.normal(jax.random.fold_in(seed, i), (b, d), jnp.float32)
            q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
            vals, rows = shard_fn(q, corpus_s, valid_s, scales_s, sv, cn, cg)
            return c + jnp.sum(vals[:, 0]), None

        total, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
        return total

    sink_sh = float(scan_sharded(
        idx._corpus, idx._valid, idx._scales, *idx._pack(), seed, iters))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        sink_sh = float(scan_sharded(
            idx._corpus, idx._valid, idx._scales, *idx._pack(), seed, iters))
        reps.append((time.perf_counter() - t0) / iters)
    sh_ms = sorted(reps)[1] * 1e3
    row = {"metric": "sharded1_certified_1M_ms_per_batch", "value": round(sh_ms, 2),
           "min": round(min(reps) * 1e3, 2), "max": round(max(reps) * 1e3, 2),
           "sink": round(sink_sh, 2), "vs_flat": round(sh_ms / flat_ms, 3),
           "sink_equal": bool(abs(sink_sh - sink_flat) < 1e-3)}
    results.append(row)
    log(json.dumps(row))
    del idx, corpus, scales, valid, pack

    # -- batched funnel at 4M under the derated window (advisor #3) ---------
    from shodh_tpu.ops.device_recall import chunk_b, fused_recall_batch

    n4 = int(os.environ.get("SHODH_AB_ROWS4", str(4 << 20)))
    parts, ss = [], []
    for _ in range(32):
        sub = rng.standard_normal((n4 // 32, d), dtype=np.float32)
        sub /= np.linalg.norm(sub, axis=1, keepdims=True)
        s = np.maximum(np.abs(sub).max(axis=1) / 127.0, 1e-9).astype(np.float32)
        parts.append(np.clip(np.round(sub / s[:, None]), -127, 127).astype(np.int8))
        ss.append(s)
    corpus4 = jnp.asarray(np.concatenate(parts))
    scales4 = jnp.asarray(np.concatenate(ss))
    valid4 = jnp.ones((n4,), jnp.float32)
    meta = {
        nm: jnp.asarray(rng.random(n4), jnp.float32)
        for nm in ("importance", "arousal", "credibility", "momentum")
    }
    hours = jnp.asarray(rng.random(n4) * 2000, jnp.float32)
    penalty = jnp.ones((n4,), jnp.float32)
    bw = chunk_b(n4)
    log(f"derated window at 4M: B={bw}")
    H = 64
    key_b = jax.random.PRNGKey(101)
    b_rows = jax.random.randint(jax.random.fold_in(key_b, 1), (bw, H), 0, n4)
    b_vals = jax.random.uniform(jax.random.fold_in(key_b, 2), (bw, H)) * 5.0
    g_rows = jax.random.randint(jax.random.fold_in(key_b, 3), (bw, H), 0, n4)
    g_vals = jax.random.uniform(jax.random.fold_in(key_b, 4), (bw, H))

    @functools.partial(jax.jit, static_argnames=("iters", "bq"))
    def scan_funnel(corpus, scales, valid, seed, iters, bq):
        def body(c, i):
            q = jax.random.normal(jax.random.fold_in(seed, i), (bq, d), jnp.float32)
            q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
            br = (b_rows + i * 9973) % n4
            gr = (g_rows + i * 7919) % n4
            vals, rows = fused_recall_batch(
                q, corpus, scales, valid, br, b_vals, gr, g_vals,
                meta["importance"], hours, meta["arousal"], meta["credibility"],
                meta["momentum"], penalty, jnp.float32(1.2), k=10,
            )
            return c + jnp.sum(vals[:, 0]), None

        total, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
        return total

    it4 = 8
    sink = float(scan_funnel(corpus4, scales4, valid4, seed, it4, bw))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        sink = float(scan_funnel(corpus4, scales4, valid4, seed, it4, bw))
        reps.append((time.perf_counter() - t0) / it4)
    per_batch = sorted(reps)[1]
    row = {"metric": "funnel_4M_derated_window", "batch": bw,
           "ms_per_batch": round(per_batch * 1e3, 2),
           "qps": round(bw / per_batch, 1), "sink": round(sink, 2)}
    results.append(row)
    log(json.dumps(row))

    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
