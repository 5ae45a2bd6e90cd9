"""Batched device-side embedding rate for the ingest path (verdict #4).

Round-3 context: config 5 ("1k memories/s with concurrent queries") is
host-bound — the embed leg was moved to a host-side sparse projection for
compile-churn reasons, and the TPU sits idle during ingest. This tool
measures what the idle TPU could contribute: the 6-layer MiniLM forward
(models/minilm.py CONFIG — random-init weights cost exactly what trained
weights cost) over BUCKETED token batches, scanned over chunks inside one
jitted program so the ~18 ms axon dispatch amortizes.

Prints items/s per (batch, seq-len) bucket in f32 and bf16 compute.
Run as a background task (TPU; never SIGTERM): python tools/bench_device_embed.py
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import functools

    import jax
    import jax.numpy as jnp

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from shodh_tpu.models.minilm import CONFIG, encode_tokens, init_params

    log(f"backend={jax.default_backend()}")
    params = init_params(0, CONFIG)
    params = jax.device_put(params)
    rng = np.random.default_rng(0)

    reps = 3
    chunks = 16  # scan length: one dispatch embeds chunks*B items

    for b, L in ((64, 64), (256, 64), (256, 128), (512, 64)):
        ids = jnp.asarray(
            rng.integers(0, CONFIG["vocab_size"], size=(chunks, b, L)).astype(np.int32)
        )
        mask = jnp.ones((chunks, b, L), jnp.float32)

        for dtype in ("float32", "bfloat16"):

            @functools.partial(jax.jit, static_argnames=("dt",))
            def embed_chunks(params, ids, mask, dt):
                def step(carry, x):
                    i, m = x
                    emb = encode_tokens(params, i, m, compute_dtype=dt)
                    return carry + jnp.sum(emb[:, 0]), None

                total, _ = jax.lax.scan(step, 0.0, (ids, mask))
                return total

            t0 = time.perf_counter()
            float(embed_chunks(params, ids, mask, dtype))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(embed_chunks(params, ids, mask, dtype))
                times.append(time.perf_counter() - t0)
            med = statistics.median(times)
            items_s = chunks * b / med
            row = {
                "bucket": f"B{b}xL{L}", "dtype": dtype,
                "items_per_s": round(items_s, 1),
                "ms_per_item": round(med / (chunks * b) * 1e3, 4),
                "compile_s": round(compile_s, 1),
            }
            log(f"B{b} L{L} {dtype:8s}: {items_s:10,.0f} items/s "
                f"({med/(chunks*b)*1e6:.0f} us/item, compile {compile_s:.1f}s)")
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
