"""Embedder protocol, MiniLM wrapper, caching, and the default registry.

Mirrors the reference's ``Embedder`` trait (``src/embeddings/mod.rs:51-69``):
``encode`` (document), ``encode_query`` (asymmetric prefix hook),
``encode_batch``, ``dimension`` — plus the SHA-256-keyed LRU embedding
caches from ``mod.rs:216-232`` and the circuit-breaker-style failure
containment from ``circuit_breaker.rs`` (here: encode failures raise after
opening the breaker; recovery is time-based).

Default selection (``default_embedder``): a MiniLM checkpoint directory if
one is configured/present (SHODH_MINILM_DIR, ~/.cache/shodh-tpu/minilm), else
the deterministic hash-projection embedder so the system is fully offline.
"""

from __future__ import annotations

import os
import time
from collections import OrderedDict
from pathlib import Path
from typing import Protocol, runtime_checkable

import numpy as np

from shodh_tpu.constants import EMBED_CACHE_MAX, MAX_TOKENS
from shodh_tpu.utils.hashing import cache_key

ENV_MINILM_DIR = "SHODH_MINILM_DIR"
DEFAULT_MINILM_DIR = Path.home() / ".cache" / "shodh-tpu" / "minilm"

_BATCH_BUCKETS = (1, 8, 32, 128, 256)
_LEN_BUCKETS = (16, 32, 64, 128, 256)


@runtime_checkable
class Embedder(Protocol):
    name: str
    dimension: int

    def encode(self, text: str) -> np.ndarray: ...

    def encode_query(self, text: str) -> np.ndarray: ...

    def encode_batch(self, texts: list[str]) -> np.ndarray: ...


class MiniLMEmbedder:
    """MiniLM-L6-v2 on TPU (models/minilm.py) with bucketed batch shapes.

    Pads (batch, seq) to a small set of static shapes so XLA compiles a
    handful of programs once and reuses them (no dynamic shapes on TPU).
    """

    name = "minilm-l6-v2-jax"

    def __init__(
        self,
        ckpt_dir: str | Path,
        compute_dtype: str = "float32",
        int8_weights: bool | None = None,
    ):
        from shodh_tpu.models.minilm import CONFIG, load_checkpoint, quantize_params_int8
        from shodh_tpu.models.tokenizer import WordPieceTokenizer

        ckpt_dir = Path(ckpt_dir)
        self.params = load_checkpoint(ckpt_dir)
        if int8_weights is None:
            int8_weights = os.environ.get("SHODH_MINILM_INT8", "1") != "0"
        if int8_weights:
            # reference default: the INT8-quantized model (minilm.rs:172-186)
            self.params = quantize_params_int8(self.params)
        self.tokenizer = WordPieceTokenizer.from_vocab_file(ckpt_dir / "vocab.txt")
        self.dimension = int(CONFIG["hidden"])
        self.compute_dtype = compute_dtype

    @staticmethod
    def _bucket(n: int, buckets) -> int:
        for b in buckets:
            if n <= b:
                return b
        return buckets[-1]

    def encode_batch(self, texts: list[str]) -> np.ndarray:
        from shodh_tpu.models.minilm import encode_tokens

        if not texts:
            return np.zeros((0, self.dimension), np.float32)
        ids, mask = self.tokenizer.encode_batch(texts, max_len=MAX_TOKENS)
        b, L = ids.shape
        bp = self._bucket(b, _BATCH_BUCKETS)
        lp = self._bucket(L, _LEN_BUCKETS)
        ids_p = np.zeros((bp, lp), np.int32)
        mask_p = np.zeros((bp, lp), np.float32)
        ids_p[:b, :L] = ids[:, :lp]
        mask_p[:b, :L] = mask[:, :lp]
        out = encode_tokens(
            self.params, ids_p, mask_p, compute_dtype=self.compute_dtype
        )
        return np.asarray(out)[:b]

    def encode(self, text: str) -> np.ndarray:
        return self.encode_batch([text])[0]

    def encode_query(self, text: str) -> np.ndarray:
        # all-MiniLM-L6-v2 is symmetric (no query prefix); prefix-style
        # models (e5/bge) would add their instruction here (minilm.rs:969).
        return self.encode(text)


class CachedEmbedder:
    """SHA-256-keyed LRU cache wrapper (reference: moka caches, 10k entries)."""

    def __init__(self, inner: Embedder, max_entries: int = EMBED_CACHE_MAX):
        self.inner = inner
        self.name = inner.name
        self.dimension = inner.dimension
        self.max_entries = max_entries
        self._cache: OrderedDict[str, np.ndarray] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def refresh_inner(self) -> None:
        """Re-read the inner embedder's identity and drop cached vectors
        (called after the inner model changes, e.g. a semantic-model fit)."""
        self.name = self.inner.name
        self._cache.clear()

    def _get(self, kind: str, text: str) -> np.ndarray | None:
        key = cache_key(self.name, kind, text)
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            self.hits += 1
            return hit
        self.misses += 1
        return None

    def _put(self, kind: str, text: str, vec: np.ndarray) -> None:
        key = cache_key(self.name, kind, text)
        self._cache[key] = vec
        if len(self._cache) > self.max_entries:
            self._cache.popitem(last=False)

    def encode(self, text: str) -> np.ndarray:
        hit = self._get("doc", text)
        if hit is not None:
            return hit
        vec = self.inner.encode(text)
        self._put("doc", text, vec)
        return vec

    def encode_query(self, text: str) -> np.ndarray:
        hit = self._get("query", text)
        if hit is not None:
            return hit
        vec = self.inner.encode_query(text)
        self._put("query", text, vec)
        return vec

    def encode_batch(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dimension), np.float32)
        missing: list[int] = []
        for i, t in enumerate(texts):
            hit = self._get("doc", t)
            if hit is not None:
                out[i] = hit
            else:
                missing.append(i)
        if missing:
            fresh = self.inner.encode_batch([texts[i] for i in missing])
            for j, i in enumerate(missing):
                out[i] = fresh[j]
                self._put("doc", texts[i], fresh[j])
        return out


class CircuitBreakerEmbedder:
    """Closed/Open/HalfOpen breaker around encode calls (circuit_breaker.rs:1-18).

    5 consecutive failures open the breaker for 30 s; 2 successes in
    half-open close it again. While open, calls fail fast.
    """

    FAILURE_THRESHOLD = 5
    OPEN_SECS = 30.0
    CLOSE_SUCCESSES = 2

    def __init__(self, inner: Embedder):
        self.inner = inner
        self.name = inner.name
        self.dimension = inner.dimension
        self._failures = 0
        self._successes = 0
        self._state = "closed"
        self._opened_at = 0.0

    def _pre(self):
        if self._state == "open":
            if time.monotonic() - self._opened_at >= self.OPEN_SECS:
                self._state = "half_open"
                self._successes = 0
            else:
                raise RuntimeError("embedder circuit breaker open")

    def _ok(self):
        if self._state == "half_open":
            self._successes += 1
            if self._successes >= self.CLOSE_SUCCESSES:
                self._state = "closed"
                self._failures = 0
        else:
            self._failures = 0

    def _fail(self, exc: Exception):
        self._failures += 1
        if self._state == "half_open" or self._failures >= self.FAILURE_THRESHOLD:
            self._state = "open"
            self._opened_at = time.monotonic()
        raise exc

    def _call(self, fn, *args):
        self._pre()
        try:
            out = fn(*args)
        except Exception as exc:  # noqa: BLE001 — breaker must see every failure
            self._fail(exc)
            return None  # unreachable; _fail raises
        self._ok()
        return out

    def encode(self, text: str) -> np.ndarray:
        return self._call(self.inner.encode, text)

    def encode_query(self, text: str) -> np.ndarray:
        return self._call(self.inner.encode_query, text)

    def encode_batch(self, texts: list[str]) -> np.ndarray:
        return self._call(self.inner.encode_batch, texts)


def default_embedder(cached: bool = True) -> Embedder:
    """MiniLM if a checkpoint is available, else the offline hash embedder."""
    ckpt = os.environ.get(ENV_MINILM_DIR) or (
        str(DEFAULT_MINILM_DIR) if DEFAULT_MINILM_DIR.exists() else None
    )
    if ckpt and Path(ckpt).exists():
        inner: Embedder = MiniLMEmbedder(ckpt)
    else:
        from shodh_tpu.models.hash_embedder import HashEmbedder

        inner = HashEmbedder()
    return CachedEmbedder(inner) if cached else inner
