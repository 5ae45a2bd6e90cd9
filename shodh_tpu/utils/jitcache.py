"""Persistent XLA compilation cache for serving processes.

A fresh serving process pays one XLA compile per distinct funnel shape
combo (Q x pool_k x vec_k — four combos on the locomo corpus, 1-2 s each
on CPU; similar one-offs on TPU). With the on-disk cache those compiles
are paid once per machine, not once per process: restart tail == steady
state. Mirrors the reference's warm-restart behavior, where the Rust
engine has no JIT and therefore no cold-process compile tail at all
(reference: memory/mod.rs recall path is AOT-compiled native code).

Enabled by default (``SHODH_JIT_CACHE=0`` disables); cache dir is
``SHODH_JIT_CACHE_DIR`` or ``~/.cache/shodh_tpu/jit``. Only compiles
slower than 0.2 s are persisted, so tiny elementwise dispatches don't
churn the disk. Safe across backends/topologies: XLA keys entries by
computation fingerprint + compile options + platform.

Known cosmetic noise: loading a cached XLA:CPU AOT entry logs an E-level
"machine feature +prefer-no-scatter/+prefer-no-gather not supported"
warning. Those are XLA-internal tuning pseudo-features (not CPU ISA
bits) that the feature-string comparison doesn't special-case; outputs
are byte-identical (verified against uncached runs on both eval gates).
"""

from __future__ import annotations

import os
from pathlib import Path

_enabled = False


def enable_persistent_cache() -> None:
    """Idempotent, process-global. Called from MemorySystem.__init__."""
    global _enabled
    if _enabled or os.environ.get("SHODH_JIT_CACHE", "1") in ("0", "false"):
        return
    cache_dir = os.environ.get("SHODH_JIT_CACHE_DIR") or str(
        Path.home() / ".cache" / "shodh_tpu" / "jit"
    )
    try:
        import jax

        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        return
    _enabled = True
