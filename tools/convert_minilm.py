"""Convert an HF MiniLM/BERT checkpoint into the framework's npz artifact.

The weights-arrival runbook (round-4 verdict #8), as one command: the day
egress exists (or a checkpoint arrives by any channel), this converts it,
proves geometry parity against the torch/transformers oracle (the exact
recipe the reference serves through onnxruntime — minilm.rs:598 forward ->
attention-mask mean pool -> L2 norm), and writes the artifact the embedder
loads. No further code changes needed: point SHODH_MINILM_DIR at the
output directory.

    python tools/convert_minilm.py --checkpoint ~/all-MiniLM-L6-v2 \
        --out ~/.shodh/minilm-npz [--int8] [--skip-parity]

Outputs in --out:
    model.npz      flattened param pytree (our layout, f32; + int8 {q,s}
                   pairs when --int8)
    config.json    copied HF config (the loader needs vocab/hidden/layers)
    vocab.txt      copied tokenizer vocabulary
    parity.json    cosine-vs-oracle report (min/mean per dtype; PASS means
                   min f32 cosine >= 0.999 on the probe texts)

Exit 0 on success (parity pass or --skip-parity), 1 on parity failure.
Smoke-tested against a synthetic tiny BertModel checkpoint in
tests/test_models.py::TestConvertTools.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def convert(checkpoint: Path, out: Path, int8: bool = False,
            skip_parity: bool = False) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from shodh_tpu.models.minilm import (
        flatten_params, load_checkpoint, quantize_params_int8,
    )

    out.mkdir(parents=True, exist_ok=True)
    params = load_checkpoint(checkpoint)
    flat = flatten_params(jax.tree.map(np.asarray, params))
    np.savez(out / "model.npz", **flat)
    if int8:
        # Reference artifact (the embedder re-quantizes f32 at load time;
        # this file exists for serving tools that want the 4x-smaller
        # weights on disk, e.g. fleet distribution)
        q = quantize_params_int8(params)
        np.savez(
            out / "model_int8.npz",
            **flatten_params(jax.tree.map(np.asarray, q)),
        )
    for aux in ("config.json", "vocab.txt", "tokenizer_config.json"):
        src = checkpoint / aux
        if src.exists():
            shutil.copy(src, out / aux)

    report: dict = {"checkpoint": str(checkpoint), "int8": int8}
    if not skip_parity:
        from shodh_tpu.models.parity import minilm_geometry_parity

        report["parity"] = minilm_geometry_parity(checkpoint)
        report["pass"] = bool(report["parity"]["pass"])
    else:
        report["pass"] = True
        report["parity"] = "skipped"
    (out / "parity.json").write_text(json.dumps(report, indent=1) + "\n")
    return report


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", required=True, type=Path,
                    help="HF checkpoint dir (config.json + vocab.txt + "
                    "model.safetensors|pytorch_model.bin)")
    ap.add_argument("--out", required=True, type=Path)
    ap.add_argument("--int8", action="store_true",
                    help="also emit per-channel int8 matmul weights")
    ap.add_argument("--skip-parity", action="store_true",
                    help="skip the torch-oracle cosine check")
    args = ap.parse_args()
    report = convert(args.checkpoint, args.out, int8=args.int8,
                     skip_parity=args.skip_parity)
    print(json.dumps(report, indent=1))
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
