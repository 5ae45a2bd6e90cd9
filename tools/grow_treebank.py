"""Two-view POS self-training for the learned tagger (round-2 verdict #9).

End-to-end parser quality is tag-bound (held-out: UAS .91 with gold tags
vs .72 with predicted — the tagger at .82 is the bottleneck, not the
parser). This tool grows TAGGER training data without new hand
annotation: sentences from the reference's LoCoMo NER fixture (in-domain
dialogue) are tagged by two independent views — the hand-treebank-trained
perceptron and the rule/heuristic POS backend — and kept only on FULL
sentence agreement (co-training-style agreement filter: both views wrong
the same way is rare for POS). Output is a tags-only TSV the tagger
consumes alongside the hand treebank; the PARSER keeps training on hand
trees only, and held-out evaluation stays hand-annotated only.

    python tools/grow_treebank.py [--cap 900]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FIXTURE = Path("/root/reference/tests/recall/locomo_ner_gliner.json")
OUT = REPO / "shodh_tpu" / "nlp" / "data" / "treebank_tags_auto.tsv"

_SPEAKER_RE = re.compile(r"^[A-Za-z][\w .'-]{0,31}?:\s")
_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def candidate_sentences() -> list[list[str]]:
    from shodh_tpu.nlp.dep_parser import _TOKEN_RE

    texts = sorted(json.load(open(FIXTURE)))
    seen: set[str] = set()
    out: list[list[str]] = []
    for text in texts:
        text = _SPEAKER_RE.sub("", text)
        for sent in _SENT_SPLIT.split(text):
            words = _TOKEN_RE.findall(sent)
            if not (4 <= len(words) <= 16):
                continue
            key = " ".join(w.lower() for w in words)
            if key in seen:
                continue
            seen.add(key)
            out.append(words)
    return out


def heuristic_tags(words: list[str]) -> list[str]:
    from shodh_tpu.nlp.dep_parser import _pos_of

    tags, prev = [], None
    for w in words:
        tags.append(_pos_of(w, prev))
        prev = w
    return tags


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=900)
    args = ap.parse_args()

    from shodh_tpu.nlp.learned_parser import (
        PerceptronTagger,
        load_treebank,
    )

    hand = load_treebank()
    cands = candidate_sentences()

    # Single strict round only: a second bootstrap round (retrain on the
    # harvest, re-agree) was measured WORSE — 10-fold CV tag_acc
    # .8812→.8793, uas_e2e .8093→.7939 — the extra sentences are the ones
    # the two views only agree on after the tagger drifted toward the
    # rules, i.e. correlated-error data. Strict independent-view agreement
    # is the value; keep one round.
    tagger = PerceptronTagger()
    tagger.train(hand)
    kept: list[tuple[list[str], list[str]]] = []
    for words in cands:
        a = tagger.tag(words)
        if a == heuristic_tags(words):
            kept.append((words, a))
            if len(kept) >= args.cap:
                break
    print(f"candidates: {len(cands)}, full-agreement kept: {len(kept)}")

    with open(OUT, "w") as f:
        f.write(
            "# Auto-annotated TAGS-ONLY training data (two-view POS agreement\n"
            "# self-training over in-domain dialogue sentences; built by\n"
            "# tools/grow_treebank.py, deterministic). Consumed by the tagger\n"
            "# only — parser trees and held-out evaluation stay hand-annotated\n"
            "# (nlp/data/treebank.tsv).\n"
            "# Format: index<TAB>text<TAB>pos; blank line between sentences.\n"
        )
        for words, tags in kept:
            for i, (w, t) in enumerate(zip(words, tags)):
                f.write(f"{i}\t{w}\t{t}\n")
            f.write("\n")
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
