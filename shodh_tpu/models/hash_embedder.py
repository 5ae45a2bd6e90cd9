"""Deterministic hashed-projection sentence embedder (offline default).

Role: this build must run fully offline. When no MiniLM checkpoint is on
disk (zero-egress environments), this embedder provides real, deterministic
sentence vectors with lexical-semantic behavior good enough to drive the
whole recall pipeline: tokens (unigrams + bigrams) are hashed into a large
sparse feature space with sublinear TF weighting, then projected to the
384-d target space by a fixed seeded Gaussian matrix and L2-normalized.

Random projection preserves inner products in expectation
(Johnson–Lindenstrauss), so hashed-BoW cosine ≈ lexical-overlap similarity;
stemming folds inflected forms onto shared buckets. This is the same
feature family as spaCy's HashEmbed / Vowpal Wabbit hashing trick —
a standard public technique, implemented fresh.

Execution note: encoding is a HOST-side sparse gather+segment-sum
(~10^2 active buckets/text -> ~40 MFLOP per 1k texts). A device matmul
formulation was measured and rejected: the dense (B, 16384) input costs
16 MB/tile over the remote-TPU tunnel and collapsed bulk ingest
1,063->13 items/s; even on local TPUs this op is too small to pay a
dispatch. The TPU does the work that scales — corpus scoring — not this.

Swap in the real MiniLM checkpoint (models/minilm.py) for semantic parity
with the reference; the Embedder protocol is identical.
"""

from __future__ import annotations

import functools
import hashlib
import re
import struct

import numpy as np

from shodh_tpu.nlp.stemmer import stem

_WORD_RE = re.compile(r"[a-z0-9]+")
_BUCKETS = 16384  # hashed feature space (dense enough for MXU, sparse enough for JL)
_SEED = 0x5301  # fixed project-wide seed (changing it invalidates stored vectors)
_STOP = frozenset(
    """a an the and or but if then else when while of in on at to from by for with
    about into over after before between out against during without within along
    across behind beyond plus except up down off above below we you they he she it
    i me my our your their his her its this that these those is are was were be
    been being have has had do does did will would can could should may might must
    shall am so too very just than as because s t don won""".split()
)
# NB: negation markers (not/no/nor/never) are deliberately NOT stopwords here —
# polar negated-form embeddings (RH-14) must differ from the affirmative form.


@functools.lru_cache(maxsize=262144)
def _hash_token(tok: str) -> int:
    # memoized: natural-language token distributions are Zipfian, so the
    # cache absorbs ~90% of hashes during bulk ingest (profiled: 264k
    # blake2 calls per 3k memories before caching)
    h = hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest()
    return struct.unpack("<Q", h)[0] % _BUCKETS


import os

# Character-trigram feature weight (words >=5 chars only). Swept on
# locomo-gate: 1.0 gives
# r@10 0.438->0.503 and p@1 0.26->0.32 (beating the reference's trained-MiniLM
# 0.31) at a ~3pp smoke-p@1 cost. Changing it invalidates stored vectors.
_CHAR_NGRAM_WEIGHT = float(os.environ.get("SHODH_HASH_CHAR_WEIGHT", "1.0"))


def content_stems(text: str) -> list[str]:
    """Stopword-filtered, abbreviation-folded content stems of ``text``.

    Shared tokenization for the hash features below and the
    corpus-adaptive semantic model (models/semantic_model.py) — both must
    segment identically so distributional stats line up with hash buckets.
    """
    from shodh_tpu.nlp.normalize import fold_abbreviations

    words = _WORD_RE.findall(fold_abbreviations(text).lower())
    return [stem(w) for w in words if w not in _STOP]


def _features(text: str) -> dict[int, float]:
    from shodh_tpu.nlp.normalize import fold_abbreviations

    words = _WORD_RE.findall(fold_abbreviations(text).lower())
    content = [w for w in words if w not in _STOP]
    stems = [stem(w) for w in content]
    feats: dict[int, float] = {}
    for s in stems:
        k = _hash_token(s)
        feats[k] = feats.get(k, 0.0) + 1.0
    for a, b in zip(stems, stems[1:]):
        key = _hash_token(a + "_" + b)
        feats[key] = feats.get(key, 0.0) + 0.8
    # raw (unstemmed) unigrams give exact-form matches extra weight
    for w, s in zip(content, stems):
        if s != w:
            k = _hash_token(w)
            feats[k] = feats.get(k, 0.0) + 0.5
    # character trigrams (subword robustness)
    if _CHAR_NGRAM_WEIGHT > 0:
        for w in content:
            if len(w) < 5:  # short tokens carry no subword signal, only noise
                continue
            padded = f"#{w}#"
            for i in range(len(padded) - 2):
                key = _hash_token("c3:" + padded[i : i + 3])
                feats[key] = feats.get(key, 0.0) + _CHAR_NGRAM_WEIGHT
    # sublinear tf
    return {k: 1.0 + float(np.log(v)) if v > 1.0 else v for k, v in feats.items()}


class HashEmbedder:
    """Embedder-protocol implementation (see models/embedder.py).

    Optionally blends a corpus-adaptive distributional component
    (models/semantic_model.py) into the same 384-d space:
    ``normalize(hash_vec + weight * Q @ sem_vec)`` where Q has orthonormal
    columns (seeded QR), so semantic cosines are preserved exactly and
    hash-vs-semantic cross terms vanish in expectation. With no model set
    the output is byte-identical to the pure hash embedder.
    """

    name = "hash-projection-v1"
    dimension = 384

    def __init__(self, dim: int = 384, seed: int = _SEED, use_device: bool = True):
        self.dimension = dim
        rng = np.random.default_rng(seed)
        # JL projection: N(0, 1/sqrt(dim)); fixed for the life of the format.
        self._proj = (rng.standard_normal((_BUCKETS, dim)) / np.sqrt(dim)).astype(np.float32)
        self._sem_model = None
        self._sem_weight = 0.0
        self._sem_basis: np.ndarray | None = None  # (dim, sem_dim) orthonormal cols
        self._adj_metric = None  # models/adjacency_metric.py learned warp
        self._adj_alpha = 0.0

    def set_adjacency_metric(self, metric, alpha: float) -> None:
        """Attach (or detach with ``metric=None``) a fitted adjacency warp.
        Changes ``name`` so SHA-keyed embedding caches miss stale entries."""
        if metric is None or alpha <= 0.0:
            self._adj_metric = None
            self._adj_alpha = 0.0
        else:
            self._adj_metric = metric
            self._adj_alpha = float(alpha)
        base = self.name.split("+adj")[0]
        self.name = base if self._adj_metric is None else f"{base}+adj{alpha:g}n{metric.fitted_n}"

    def set_semantic_model(self, model, weight: float) -> None:
        """Attach (or detach with ``model=None``) a fitted semantic model.

        Changes ``name`` so SHA-keyed embedding caches miss stale entries.
        """
        if model is None:
            self._sem_model = None
            self._sem_weight = 0.0
            self._sem_basis = None
            self.name = "hash-projection-v1"
            return
        rng = np.random.default_rng(_SEED ^ 0xA5A5)
        g = rng.standard_normal((self.dimension, model.dim)).astype(np.float32)
        q, _ = np.linalg.qr(g)  # (dim, sem_dim) orthonormal columns
        self._sem_basis = np.ascontiguousarray(q[:, : model.dim], np.float32)
        self._sem_model = model
        self._sem_weight = float(weight)
        self.name = (
            f"hash-projection-v1+sem{model.corpus_fingerprint[:8]}w{weight:g}"
        )

    # -- Embedder protocol ----------------------------------------------------

    def encode(self, text: str) -> np.ndarray:
        return self.encode_batch([text])[0]

    def encode_query(self, text: str) -> np.ndarray:
        # Symmetric model: queries and documents share the space.
        return self.encode(text)

    def encode_batch(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dimension), np.float32)
        # Sparse host projection: each text activates ~10^2 of the 16,384
        # buckets, so out[i] = sum_k w_k * proj[row_k] is a gather+segment
        # sum (~40 MFLOP per 1k texts) — cheaper than materializing the
        # dense (B, BUCKETS) matrix, and critically cheaper than shipping
        # 16 MB/tile dense inputs through the remote-TPU tunnel (measured:
        # the dense device path collapsed bulk ingest 1,063->13 items/s).
        out = np.zeros((len(texts), self.dimension), np.float32)
        for i, f in enumerate(map(_features, texts)):
            if not f:
                continue
            idx = np.fromiter(f.keys(), np.int64, len(f))
            w = np.fromiter(f.values(), np.float32, len(f))
            out[i] = w @ self._proj[idx]  # (nnz,) @ (nnz, dim) BLAS matvec
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        out = (out / np.maximum(norms, 1e-12)).astype(np.float32)
        if self._sem_model is not None and self._sem_weight > 0.0:
            sem = np.stack([self._sem_model.text_vec(t) for t in texts])
            out = out + self._sem_weight * (sem @ self._sem_basis.T)
            norms = np.linalg.norm(out, axis=1, keepdims=True)
            out = (out / np.maximum(norms, 1e-12)).astype(np.float32)
        if self._adj_metric is not None and self._adj_alpha > 0.0:
            # learned adjacency warp (models/adjacency_metric.py) — queries
            # and documents both pass through it, so the space stays symmetric
            out = np.atleast_2d(
                self._adj_metric.project(out, self._adj_alpha)
            ).astype(np.float32)
        return out
