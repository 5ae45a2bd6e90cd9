"""Train the distilled NER tagger on the reference's GLiNER fixture.

Deterministic distillation (round-2 verdict item 2): BIO-encode the
7,400-text fixture's spans, train an averaged perceptron on the 80% split,
evaluate on the held-out 20%, and write the pruned artifact to
shodh_tpu/nlp/data/distilled_ner.json.gz (reproducible bytes).

    python tools/train_ner.py [--epochs 6]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from shodh_tpu.nlp.distilled_ner import (  # noqa: E402
    _DATA,
    DistilledNer,
    TAGS,
    features,
    save,
    tokenize_with_offsets,
)
from shodh_tpu.nlp.learned_parser import AveragedPerceptron, _shuffled  # noqa: E402
from tools.ner_eval import (  # noqa: E402
    FIXTURE,
    distilled_extract_fn,
    evaluate,
    load_fixture,
    split_of,
)


def bio_encode(text: str, spans: list[dict]) -> tuple[list[str], list[str]] | None:
    """Token words + BIO tags; None when a span doesn't align to tokens."""
    toks = tokenize_with_offsets(text)
    if not toks:
        return None
    words = [t[0] for t in toks]
    tags = ["O"] * len(toks)
    starts = {t[1]: i for i, t in enumerate(toks)}
    ends = {t[2]: i for i, t in enumerate(toks)}
    for s in sorted(spans, key=lambda x: (x["start"], x["end"])):
        i = starts.get(s["start"])
        j = ends.get(s["end"])
        if i is None or j is None or j < i:
            continue  # misaligned teacher span: skip span, keep sentence
        if any(t != "O" for t in tags[i : j + 1]):
            continue  # overlap: first (deterministic) span wins
        tags[i] = "B-" + s["type"]
        for k in range(i + 1, j + 1):
            tags[k] = "I-" + s["type"]
    return words, tags


def train(data: dict, epochs: int, seed: int = 11) -> DistilledNer:
    sents = []
    for text in sorted(data):
        if split_of(text) != "train":
            continue
        enc = bio_encode(text, data[text])
        if enc is not None:
            sents.append(enc)
    print(f"training sentences: {len(sents)}")
    model = AveragedPerceptron()
    classes = list(TAGS)
    for ep in range(epochs):
        correct = total = 0
        for words, gold in _shuffled(sents, seed + ep):
            prev, prev2 = "O", "O"
            for i, g in enumerate(gold):
                feats = features(words, i, prev, prev2)
                guess = model.predict(feats, classes)
                model.update(g, guess, feats)
                # teacher forcing on context tags keeps training stable
                prev2, prev = prev, g
                correct += guess == g
                total += 1
        print(f"epoch {ep}: token acc {correct / total:.4f}")
    model.average()
    weights = {}
    for ft, row in model.weights.items():
        weights[ft] = dict(row)
    return DistilledNer(weights)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--fixture", type=Path, default=FIXTURE)
    args = ap.parse_args()
    t0 = time.time()
    data = load_fixture(args.fixture)
    model = train(data, args.epochs)
    save(model)
    print(f"saved {_DATA} ({_DATA.stat().st_size / 1e6:.2f} MB) in {time.time() - t0:.0f}s")

    from shodh_tpu.nlp import distilled_ner

    distilled_ner.load_default.cache_clear()
    result = evaluate(distilled_extract_fn(), data, split="test")
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
