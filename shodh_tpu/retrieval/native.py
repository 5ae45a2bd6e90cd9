"""ctypes bindings for the native host-runtime kernels (native/shodh_native.cpp).

Auto-builds the shared library on first use when a compiler is available;
falls back cleanly (callers check ``available()``) to the pure-Python
implementations otherwise. The native BM25 engine is a drop-in for the hot
lexical-scoring loop; the Python BM25Index remains the persistence layer.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libshodh_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    """Run make under an exclusive file lock: concurrently starting
    processes (writer + replicas + bench subprocesses) must not dlopen a
    half-rewritten .so or race two compiler invocations."""
    try:
        import fcntl

        lock_path = _NATIVE_DIR / ".build.lock"
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        return _LIB_PATH.exists()
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # Always invoke make: it no-ops when the .so is fresh and rebuilds it
    # when shodh_native.cpp is newer (a stale lib missing new symbols would
    # otherwise silently disable native acceleration).
    if not _build() and not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.shodh_bm25_new.restype = ctypes.c_void_p
    lib.shodh_bm25_free.argtypes = [ctypes.c_void_p]
    try:
        lib.shodh_bm25_set_params.argtypes = [ctypes.c_float, ctypes.c_float]
    except AttributeError:
        pass  # older prebuilt lib: defaults baked in
    try:
        lib.shodh_bm25_set_class_params.argtypes = [
            ctypes.c_int, ctypes.c_float, ctypes.c_float
        ]
        lib.shodh_bm25_set_doc_class.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int
        ]
    except AttributeError:
        pass  # older prebuilt lib: single-class scoring only
    lib.shodh_bm25_remove.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.shodh_bm25_upsert_text.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p
    ]
    lib.shodh_bm25_upsert_terms.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_char_p]
    lib.shodh_bm25_doc_count.argtypes = [ctypes.c_void_p]
    lib.shodh_bm25_doc_count.restype = ctypes.c_int
    lib.shodh_bm25_search.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.shodh_bm25_search.restype = ctypes.c_int
    lib.shodh_tokenize.argtypes = [ctypes.c_char_p]
    lib.shodh_tokenize.restype = ctypes.c_void_p
    lib.shodh_stem.argtypes = [ctypes.c_char_p]
    lib.shodh_stem.restype = ctypes.c_void_p
    lib.shodh_free.argtypes = [ctypes.c_void_p]
    # Sync the irregular-lemma fold table so native tokenization mirrors
    # nlp/stemmer.py exactly (same pattern as the k1/b param sync).
    from shodh_tpu.nlp.lemmas import LEMMA_EXCEPTIONS

    if LEMMA_EXCEPTIONS:
        try:
            lib.shodh_lemma_load.argtypes = [ctypes.c_char_p]
        except AttributeError:
            # A prebuilt lib without the symbol would tokenize differently
            # from Python — silently-wrong scores. Fall back to pure Python.
            return None
        buf = "".join(f"{f}\t{l}\n" for f, l in LEMMA_EXCEPTIONS.items())
        lib.shodh_lemma_load(buf.encode())
    # Same sync for the norm-fold tables (nlp/norms.py): hash-keyed
    # canonicalization + contraction expansion must match Python exactly
    # or native scores silently diverge from persisted postings.
    from shodh_tpu.nlp.norms import CONTRACTIONS, NORM_BY_HASH

    if NORM_BY_HASH or CONTRACTIONS:
        try:
            lib.shodh_norm_load.argtypes = [ctypes.c_char_p]
        except AttributeError:
            return None  # stale lib: fall back to pure Python
        buf = "".join(f"H\t{h}\t{n}\n" for h, n in NORM_BY_HASH.items())
        buf += "".join(f"C\t{k}\t{' '.join(p)}\n" for k, p in CONTRACTIONS.items())
        lib.shodh_norm_load(buf.encode())
    try:
        lib.shodh_ner_load.argtypes = [ctypes.c_char_p]
        lib.shodh_ner_tag.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int
        ]
        lib.shodh_ner_tag.restype = ctypes.c_int
    except AttributeError:
        pass  # stale lib: the NER binding checks ner_available()
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def ner_available() -> bool:
    lib = load()
    return lib is not None and hasattr(lib, "shodh_ner_load") and hasattr(
        lib, "shodh_ner_tag"
    )


# The C++ model is process-global; this version counter is the ownership
# token. Every ner_load bumps it, and ner_tag refuses a stale expectation —
# so an instance whose weights were later replaced (load_default(path=...),
# retrain + cache_clear) falls back to its own Python rows instead of
# silently tagging with foreign weights.
_ner_version = 0


def ner_load(rows: dict) -> int:
    """Push the distilled-NER dense weight rows (feature -> [9 floats] in
    TAGS order) into the process-global native model. Returns the model
    version token (0 = native unavailable)."""
    global _ner_version
    lib = load()
    if lib is None or not ner_available():
        return 0
    blob = "".join(
        ft + "\t" + " ".join(repr(w) for w in row) + "\n"
        for ft, row in rows.items()
    )
    lib.shodh_ner_load(blob.encode())
    _ner_version += 1
    return _ner_version


def ner_tag(words: list[str], expect_version: int = 0) -> "list[tuple[int, float]] | None":
    """Native greedy BIO decode: [(tag_index, margin), ...] or None when
    the native path is unavailable, the caller's model was replaced
    (version mismatch), or the buffer contract fails."""
    lib = load()
    if lib is None or not hasattr(lib, "shodh_ner_tag"):
        return None
    if expect_version and expect_version != _ner_version:
        return None  # another artifact owns the global model now
    blob = ("\n".join(words) + "\n").encode()
    cap = 40 * len(words) + 64
    out = ctypes.create_string_buffer(cap)
    n = lib.shodh_ner_tag(blob, out, cap)
    if n < 0:
        return None
    pairs = []
    for line in out.value.decode().splitlines():
        idx, margin = line.split(" ", 1)
        pairs.append((int(idx), float(margin)))
    return pairs


def native_stem(word: str) -> str:
    lib = load()
    ptr = lib.shodh_stem(word.encode())
    out = ctypes.string_at(ptr).decode()
    lib.shodh_free(ptr)
    return out


def native_tokenize(text: str) -> list[str]:
    lib = load()
    ptr = lib.shodh_tokenize(text.encode())
    raw = ctypes.string_at(ptr).decode()
    lib.shodh_free(ptr)
    return raw.split("\n") if raw else []


class NativeBM25:
    """Thin OO wrapper over the C BM25 engine. Doc ids are uint64 handles;
    the caller maintains the handle<->string-id mapping."""

    def __init__(self, k1: float = 1.2, b: float = 0.75):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        if (k1, b) != (1.2, 0.75):
            if not hasattr(self._lib, "shodh_bm25_set_params"):
                raise RuntimeError("native library predates shodh_bm25_set_params")
            self._lib.shodh_bm25_set_params(k1, b)
        self._h = self._lib.shodh_bm25_new()

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.shodh_bm25_free(self._h)
            self._h = None

    def upsert(self, doc: int, content: str, tags: str = "", entities: str = "") -> None:
        self._lib.shodh_bm25_upsert_text(
            self._h, doc, content.encode(), tags.encode(), entities.encode()
        )

    def upsert_terms(self, doc: int, weighted_terms: dict[str, float]) -> None:
        lines = "".join(f"{t}\t{w}\n" for t, w in weighted_terms.items())
        self._lib.shodh_bm25_upsert_terms(self._h, doc, lines.encode())

    @property
    def has_classes(self) -> bool:
        return hasattr(self._lib, "shodh_bm25_set_class_params")

    def set_class_params(self, cls: int, k1: float, b: float) -> None:
        self._lib.shodh_bm25_set_class_params(cls, k1, b)

    def set_doc_class(self, doc: int, cls: int) -> None:
        self._lib.shodh_bm25_set_doc_class(self._h, doc, cls)

    def remove(self, doc: int) -> None:
        self._lib.shodh_bm25_remove(self._h, doc)

    def __len__(self) -> int:
        return self._lib.shodh_bm25_doc_count(self._h)

    def search(
        self, query: str, limit: int = 10, term_weights: dict[str, float] | None = None
    ) -> list[tuple[int, float]]:
        docs = (ctypes.c_uint64 * limit)()
        scores = (ctypes.c_float * limit)()
        tw = ""
        if term_weights:
            tw = "".join(f"{t}\t{w}\n" for t, w in term_weights.items())
        n = self._lib.shodh_bm25_search(
            self._h, query.encode(), tw.encode(), docs, scores, limit
        )
        return [(int(docs[i]), float(scores[i])) for i in range(n)]
