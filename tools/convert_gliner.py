"""Convert a GLiNER-family checkpoint into the typer's npz artifact.

The GLiNER half of the weights-arrival runbook (round-4 verdict #8). The
reference serves gliner-bi-edge through ONNX (gliner.rs:1-33); our runtime
(models/gliner.py) is weight-complete and loads ``model.npz`` +
``label_embeds.npy``. This tool builds that artifact from a checkpoint
directory containing:

- an HF BERT-compatible TEXT TOWER (config.json + vocab.txt +
  model.safetensors|pytorch_model.bin) — converted with the same key map
  as the MiniLM converter, and
- optionally ``span_head.npz`` with our span-head tensor names
  (models/gliner.py::init_span_head keys). Absent, the head initializes
  at the documented seed and MUST then be fine-tuned before the typer's
  output is meaningful (the tool says so loudly).

Label embeddings are computed from the converted tower itself over the
141-label schema (nlp/entity_type_schema.json) — exactly how the runtime
builds them from the active embedder (gliner.rs:6-8 precomputed
labels_embeds analog).

    python tools/convert_gliner.py --checkpoint <dir> --out <dir>

Smoke-tested against a synthetic tiny checkpoint in
tests/test_models.py::TestConvertTools.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def convert(checkpoint: Path, out: Path, threshold: float | None = None) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from shodh_tpu.models.gliner import (
        LABEL_DIM, init_span_head, save_gliner,
    )
    from shodh_tpu.models.minilm import load_checkpoint
    from shodh_tpu.nlp.entity_type import fine_labels_in_schema_order

    tower = load_checkpoint(checkpoint)
    hidden = int(np.asarray(tower["word_emb"]).shape[1])

    span_path = checkpoint / "span_head.npz"
    if span_path.exists():
        data = np.load(span_path)
        span = {k: data[k] for k in data.files}
        span_src = "checkpoint"
    else:
        span = init_span_head(0, hidden, LABEL_DIM)
        span_src = "random-init (fine-tune before use!)"
        print(
            "WARNING: no span_head.npz in the checkpoint — span head is "
            "randomly initialized; typer output is untrained.",
            file=sys.stderr,
        )

    # Label tower: embed the 141 fine labels through the converted trunk
    # (mean-pooled, L2-normalized — the runtime's build_label_embeddings
    # recipe, inlined here so the tool has no embedder dependency).
    from shodh_tpu.models.minilm import encode_tokens
    from shodh_tpu.models.tokenizer import WordPieceTokenizer

    fine = fine_labels_in_schema_order()
    tok = WordPieceTokenizer.from_vocab_file(checkpoint / "vocab.txt")
    embeds = []
    for label in fine:
        ids = tok.encode(label.replace("_", " "), max_len=32)
        ids_a = np.asarray([ids], np.int32)
        mask = np.ones_like(ids_a, np.float32)
        v = np.asarray(encode_tokens(tower, jnp.asarray(ids_a), jnp.asarray(mask)))[0]
        embeds.append(v)
    label_embeds = np.stack(embeds).astype(np.float32)
    if label_embeds.shape[1] != LABEL_DIM:
        # project/pad to the span head's label dim so shapes line up
        if label_embeds.shape[1] > LABEL_DIM:
            label_embeds = label_embeds[:, :LABEL_DIM]
        else:
            label_embeds = np.pad(
                label_embeds, ((0, 0), (0, LABEL_DIM - label_embeds.shape[1]))
            )
        norms = np.linalg.norm(label_embeds, axis=1, keepdims=True)
        label_embeds = (label_embeds / np.maximum(norms, 1e-12)).astype(np.float32)

    save_gliner(out, tower, span, label_embeds, fine_labels=fine)
    import shutil

    for aux in ("vocab.txt", "config.json"):
        src = checkpoint / aux
        if src.exists():
            shutil.copy(src, out / aux)
    report = {
        "checkpoint": str(checkpoint),
        "out": str(out),
        "hidden": hidden,
        "n_labels": len(fine),
        "span_head": span_src,
    }
    (out / "convert_report.json").write_text(json.dumps(report, indent=1) + "\n")
    return report


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", required=True, type=Path)
    ap.add_argument("--out", required=True, type=Path)
    args = ap.parse_args()
    report = convert(args.checkpoint, args.out)
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
