"""Build the irregular-lemma fold table for token folding.

Porter stemming folds regular inflection ("movies"/"movie" -> "movi") but
not irregular forms: "went" never matches "go", "took" never matches
"take", "children" never matches "child" — real recall misses for dialogue
queries ("Where did X go?" vs "I went to ..."). This tool extracts the
irregular-exception tables from a spaCy ``en_core_web_sm`` manifest export
(MIT licence, (c) Explosion AI — the same public lemmatizer data the
reference embeds for its dependency-parse pipeline,
src/dep_parser/en_core_web_sm/NOTICE) and writes
``shodh_tpu/nlp/data/lemma_exceptions.tsv.gz``: ``form <TAB> lemma`` rows.

Filters (each keeps the fold safe for *ranking*, which is stricter than
linguistics):

- identity entries dropped ("after" -> "after" carries nothing);
- cross-POS conflicts dropped ("best" -> good/well depending on POS — a
  POS-free fold must not guess, so ambiguous forms keep Porter behavior);
- multi-lemma entries dropped (same ambiguity within one POS);
- entries where Porter already unifies form and lemma dropped
  ("abetted"/"abet" both stem to "abet" — redundant);
- entries where form or lemma is a stopword dropped (stopwords never
  reach the stemmer, and folding INTO a stopword stem creates noise);
- multi-word lemmas and non-alpha forms dropped (the tokenizer never
  produces them).

Usage:
    python tools/build_lemma_table.py [model_json] [output_gz]
"""

from __future__ import annotations

import gzip
import json
import sys
from pathlib import Path

_repo = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_repo))

# The redundancy filter below compares RAW Porter stems; with the fold
# table active, stem(form)==stem(lemma) would hold for every entry the
# artifact itself supplies and a rebuild would empty the table.
import os  # noqa: E402

os.environ["SHODH_LEMMA_FOLD"] = "0"

from shodh_tpu.nlp.stopwords import STOPWORDS  # noqa: E402

DEFAULT_INPUT = Path("/root/reference/src/dep_parser/en_core_web_sm/model.json")
DEFAULT_OUTPUT = _repo / "shodh_tpu" / "nlp" / "data" / "lemma_exceptions.tsv.gz"

HEADER = (
    "# Irregular-lemma fold table (form\\tlemma), POS-merged and "
    "conflict-filtered.\n"
    "# Source: spaCy en_core_web_sm lemmatizer exception tables, "
    "MIT licence, (c) Explosion AI.\n"
    "# Regenerate: python tools/build_lemma_table.py\n"
)


def build(model_json: Path, output_gz: Path) -> tuple[int, int]:
    from shodh_tpu.nlp.stemmer import stem

    tables = json.loads(model_json.read_text())["lemmatizer"]["tables"]["lemma_exc"]
    merged: dict[str, str] = {}
    conflicts: set[str] = set()
    for pos in sorted(tables):  # deterministic merge order
        for form, lemmas in tables[pos].items():
            if len(lemmas) != 1:
                conflicts.add(form)
                continue
            # Identity entries ("left" -> "left" as a noun) are lemma
            # CLAIMS for conflict purposes: a form that is its own lemma
            # in one POS and folds in another ("left" -> "leave" as a
            # verb) is POS-ambiguous and must keep Porter behavior.
            lemma = lemmas[0]
            prev = merged.get(form)
            if prev is not None and prev != lemma:
                conflicts.add(form)
            else:
                merged[form] = lemma

    kept: dict[str, str] = {}
    for form, lemma in merged.items():
        if form in conflicts or form == lemma:
            continue
        if not form.isalpha() or not lemma.isalpha():
            continue
        form, lemma = form.lower(), lemma.lower()
        if form in STOPWORDS or lemma in STOPWORDS:
            continue
        if stem(form) == stem(lemma):
            continue
        kept[form] = lemma

    body = HEADER + "".join(f"{f}\t{l}\n" for f, l in sorted(kept.items()))
    # mtime=0 + empty FNAME → byte-reproducible regardless of build time/path
    with open(output_gz, "wb") as fh:
        with gzip.GzipFile(filename="", fileobj=fh, mode="wb", mtime=0) as gz:
            gz.write(body.encode("utf-8"))
    return len(kept), len(conflicts)


def main() -> None:
    model_json = Path(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_INPUT
    output_gz = Path(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_OUTPUT
    if not model_json.exists():
        raise SystemExit(f"model manifest not found: {model_json}")
    n, nc = build(model_json, output_gz)
    print(f"wrote {n} folds ({nc} ambiguous forms dropped) -> {output_gz}")


if __name__ == "__main__":
    main()
