"""Build the norm-fold tables: informal/variant spellings -> canonical form.

Dialogue is full of surface variants the stemmer cannot unify: slang
("fave" / "plz" / "thx"), British spellings ("favourite", "realise",
"theatre"), g-dropping ("doin'", "lovin'"), and contractions ("gonna" ->
"going to", "can't" -> "can not"). Each one is a doc/query token mismatch
BM25 silently eats. This tool extracts two tables from a spaCy
``en_core_web_sm`` manifest export (MIT licence, (c) Explosion AI — the
same public normalization data the reference embeds for its parse
pipeline, src/dep_parser/en_core_web_sm/NOTICE):

- ``norm_exceptions``: spaCy StringStore hash (MurmurHash64A, seed 1 —
  hash.rs:13-15 documents the reference's identical choice) -> normalized
  form. Keys arrive pre-hashed in the manifest, so the runtime hashes each
  candidate token and looks it up (nlp/norms.py).
- ``tokenizer.rules``: contraction surface -> NORM token sequence
  ("gonna" -> "going to"). String-keyed; applied at tokenize time where
  one raw word may expand to several tokens.

Filters (ranking-safety, mirroring tools/build_lemma_table.py):

- values normalized to a single lowercase alpha word; ambiguous values
  ("flier / flyer") and empties dropped;
- identity entries dropped (hash(value) == key carries nothing);
- folds INTO a stopword dropped from the hash table ("cuz" -> "because"
  would delete the token; the conservative default keeps today's
  behavior for those — contractions are exempt because their stopword
  pieces expanding to nothing IS the current behavior for e.g. "cannot");
- contraction keys restricted to lowercase alpha+apostrophe; identity
  expansions dropped (stopword KEYS are kept: "don't" is a stopword but
  reaches the fold apostrophe-intact, and expanding it to do+not lets the
  stopword filter delete it cleanly instead of leaving a "don" noise
  token);
- homonym safety (same discipline as the gazetteer's free-text
  extraction): apostrophe-less keys that collide with real tokens are
  dropped — all len<=2 ("id", "em", "ll", "ol", "im" — "user id" must
  not become "i would") plus {"wed", "ima"}.

Output: ``shodh_tpu/nlp/data/norm_folds.tsv.gz`` with rows
``H<TAB>hash<TAB>norm`` and ``C<TAB>surface<TAB>norm1 norm2 ...``.

Usage:
    python tools/build_norm_table.py [model_json] [output_gz]
"""

from __future__ import annotations

import gzip
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT_MANIFEST = "/root/reference/src/dep_parser/en_core_web_sm/model.json"
DEFAULT_OUT = REPO / "shodh_tpu" / "nlp" / "data" / "norm_folds.tsv.gz"

_ALPHA = re.compile(r"[a-z]+\Z")
_CONTR_KEY = re.compile(r"[a-z][a-z']*\Z")


def murmur64a(data: bytes, seed: int = 1) -> int:
    """MurmurHash64A — spaCy StringStore hash (reference hash.rs:13-30)."""
    M = (1 << 64) - 1
    m = 0xC6A4A7935BD1E995
    r = 47
    h = (seed ^ ((len(data) * m) & M)) & M
    nblocks = len(data) // 8
    for i in range(nblocks):
        k = int.from_bytes(data[i * 8 : i * 8 + 8], "little")
        k = (k * m) & M
        k ^= k >> r
        k = (k * m) & M
        h ^= k
        h = (h * m) & M
    tail = data[nblocks * 8 :]
    if tail:
        h ^= int.from_bytes(tail, "little")
        h = (h * m) & M
    h ^= h >> r
    h = (h * m) & M
    h ^= h >> r
    return h


def build(manifest_path: str, out_path: Path) -> dict:
    from shodh_tpu.nlp.stopwords import STOPWORDS

    manifest = json.load(open(manifest_path))

    stats = {"hash_kept": 0, "hash_dropped": 0, "contr_kept": 0, "contr_dropped": 0}
    hash_rows: dict[int, str] = {}
    for key, value in manifest["norm_exceptions"].items():
        h = int(key)
        v = value.strip().lower()
        if not _ALPHA.match(v) or v in STOPWORDS or murmur64a(v.encode()) == h:
            stats["hash_dropped"] += 1
            continue
        hash_rows[h] = v
        stats["hash_kept"] += 1

    homonym_block = {"wed", "ima"}
    contr_rows: dict[str, list[str]] = {}
    for orth, toks in manifest["tokenizer"]["rules"].items():
        # trailing apostrophes are stripped at lookup time too ("doin'"
        # and "doin" must share one row), so fold keys before filtering
        k = orth.lower().rstrip("'")
        if not _CONTR_KEY.match(k):
            stats["contr_dropped"] += 1
            continue
        if "'" not in k and (len(k) <= 2 or k in homonym_block):
            stats["contr_dropped"] += 1
            continue
        # scrub pieces to plain alnum ("'ve" -> "ve") so the runtime can
        # feed them straight to the stopword/length filters
        norms = [re.sub(r"[^a-z0-9]+", "", t.get("NORM", t["ORTH"]).lower()) for t in toks]
        norms = [n for n in norms if n]
        if not norms or norms == [k]:
            stats["contr_dropped"] += 1
            continue
        prev = contr_rows.get(k)
        if prev is not None and prev != norms:
            # case-variant keys disagreeing on norms: keep the first
            # (manifest lists lowercase first; disagreement not observed)
            stats["contr_dropped"] += 1
            continue
        contr_rows[k] = norms
        stats["contr_kept"] += 1

    out_path.parent.mkdir(parents=True, exist_ok=True)
    lines = ["# norm folds from spaCy en_core_web_sm lookups (MIT, (c) Explosion AI)"]
    for h in sorted(hash_rows):
        lines.append(f"H\t{h}\t{hash_rows[h]}")
    for k in sorted(contr_rows):
        lines.append(f"C\t{k}\t{' '.join(contr_rows[k])}")
    payload = ("\n".join(lines) + "\n").encode()
    # mtime=0 + empty filename: byte-reproducible artifact (same discipline
    # as build_lemma_table.py after the gzip-FNAME leak)
    with open(out_path, "wb") as f:
        gz = gzip.GzipFile(fileobj=f, mode="wb", mtime=0)
        gz.write(payload)
        gz.close()
    return stats


if __name__ == "__main__":
    manifest = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_MANIFEST
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_OUT
    stats = build(manifest, out)
    print(json.dumps(stats))
