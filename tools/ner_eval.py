"""Measure NER extractors against the reference's GLiNER annotation fixture.

The reference ships 7,400 GLiNER-annotated texts with typed spans at
``tests/recall/locomo_ner_gliner.json`` (reference gliner.rs is the quality
bar; the fixture is its output on the exact LoCoMo eval corpus). This tool
scores any extractor against those spans so the rule-extractor/distilled-
typer gap is a measured number, not a guess (round-2 verdict item 2).

Usage:
    python tools/ner_eval.py                 # rule extractor, test split
    python tools/ner_eval.py --extractor distilled
    python tools/ner_eval.py --split all

Metrics: exact-span match (start/end/type), relaxed name match (lowercased
text + type, offsets ignored — the engine consumes entity NAMES), and
untyped span detection. Train/test split is deterministic by text hash so
the distilled model never evaluates on its training texts.
"""

from __future__ import annotations

import argparse
import json
import sys
import zlib
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FIXTURE = Path("/root/reference/tests/recall/locomo_ner_gliner.json")

# engine label -> fixture coarse type
LABEL_MAP = {
    "person": "PER",
    "organization": "ORG",
    "location": "LOC",
    "technology": "MISC",
    "concept": "MISC",
    "other": "MISC",
}


def split_of(text: str) -> str:
    """Deterministic 80/20 split keyed on the text itself."""
    return "test" if zlib.crc32(text.encode("utf-8")) % 5 == 0 else "train"


def load_fixture(path: Path = FIXTURE) -> dict[str, list[dict]]:
    with open(path) as f:
        return json.load(f)


def _score(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f1


def evaluate(extract, data: dict[str, list[dict]], split: str = "test") -> dict:
    """extract(text) -> list of (text, coarse_type, start, end)."""
    exact = defaultdict(int)
    name = defaultdict(int)
    untyped = defaultdict(int)
    per_type: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    n_texts = 0
    for text, gold in sorted(data.items()):
        if split != "all" and split_of(text) != split:
            continue
        n_texts += 1
        pred = extract(text)
        gold_exact = {(g["start"], g["end"], g["type"]) for g in gold}
        gold_name = {(g["text"].lower(), g["type"]) for g in gold}
        gold_spans = {(g["start"], g["end"]) for g in gold}
        pred_exact = {(s, e, t) for _, t, s, e in pred}
        pred_name = {(txt.lower(), t) for txt, t, _, _ in pred}
        pred_spans = {(s, e) for _, _, s, e in pred}
        exact["tp"] += len(pred_exact & gold_exact)
        exact["fp"] += len(pred_exact - gold_exact)
        exact["fn"] += len(gold_exact - pred_exact)
        name["tp"] += len(pred_name & gold_name)
        name["fp"] += len(pred_name - gold_name)
        name["fn"] += len(gold_name - pred_name)
        untyped["tp"] += len(pred_spans & gold_spans)
        untyped["fp"] += len(pred_spans - gold_spans)
        untyped["fn"] += len(gold_spans - pred_spans)
        for typ in ("PER", "LOC", "ORG", "MISC"):
            gt = {x for x in gold_name if x[1] == typ}
            pt = {x for x in pred_name if x[1] == typ}
            per_type[typ]["tp"] += len(pt & gt)
            per_type[typ]["fp"] += len(pt - gt)
            per_type[typ]["fn"] += len(gt - pt)

    out = {"n_texts": n_texts}
    for label, c in (("exact", exact), ("name", name), ("untyped", untyped)):
        p, r, f1 = _score(c["tp"], c["fp"], c["fn"])
        out[label] = {"p": round(p, 4), "r": round(r, 4), "f1": round(f1, 4)}
    out["per_type_name"] = {}
    for typ, c in sorted(per_type.items()):
        p, r, f1 = _score(c["tp"], c["fp"], c["fn"])
        out["per_type_name"][typ] = {
            "p": round(p, 4), "r": round(r, 4), "f1": round(f1, 4),
            "support": c["tp"] + c["fn"],
        }
    return out


def rule_extract_fn():
    from shodh_tpu.nlp.ner import RuleBasedExtractor

    rules = RuleBasedExtractor()

    def fn(text: str):
        out = []
        for m in rules.extract(text):
            coarse = LABEL_MAP.get(m.label, "MISC")
            out.append((m.text, coarse, m.start, m.start + len(m.text)))
        return out

    return fn


def distilled_extract_fn():
    from shodh_tpu.nlp.distilled_ner import load_default

    typer = load_default()

    def fn(text: str):
        return [(s.text, s.type, s.start, s.end) for s in typer.extract(text)]

    return fn


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", type=Path, default=FIXTURE)
    ap.add_argument("--split", choices=("train", "test", "all"), default="test")
    ap.add_argument("--extractor", choices=("rules", "distilled"), default="rules")
    args = ap.parse_args()
    data = load_fixture(args.fixture)
    fn = rule_extract_fn() if args.extractor == "rules" else distilled_extract_fn()
    result = evaluate(fn, data, split=args.split)
    result["extractor"] = args.extractor
    result["split"] = args.split
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
