"""Export per-candidate fusion features + gold labels over a recall suite.

The training-data half of the learned-fusion loop (ab_testing.rs
LearnedWeights + fusion_features.rs): ingest the suite corpus exactly as
``cli eval`` does, then for each case arm the learned_fusion export sink
and run the readonly recall — ``_rank_pool`` captures the scored pool's
feature matrix (retrieval/learned_fusion.py, the SAME function inference
uses) with gold labels. One JSONL record per case.

Usage:
    python tools/export_fusion_features.py --suite locomo-full \
        --out /tmp/fusion_features.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SUITES = {
    "smoke": ("tests/recall/corpora/shodh-smoke.jsonl", "tests/recall/smoke_cases.jsonl"),
    "locomo-gate": (
        "tests/recall/corpora/locomo-gate.jsonl",
        "tests/recall/locomo-gate-cases.jsonl",
    ),
    "locomo-full": ("tests/recall/corpora/locomo.jsonl", "tests/recall/locomo_cases.jsonl"),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="locomo-full", choices=sorted(SUITES))
    ap.add_argument("--out", required=True)
    ap.add_argument("--eval-now", default="2026-05-01T00:00:00Z")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # quality work never uses the TPU

    from shodh_tpu.constants import ENV_RECALL_READONLY
    from shodh_tpu.engine.memory_system import MemorySystem
    from shodh_tpu.harness.fixtures import load_cases
    from shodh_tpu.harness.runner import ingest_corpus
    from shodh_tpu.retrieval import learned_fusion as lf
    from shodh_tpu.types import LayerMode, Query, parse_ts
    from shodh_tpu.utils import clock

    corpus_path, cases_path = (REPO / p for p in SUITES[args.suite])
    clock.pin_now(parse_ts(args.eval_now))
    os.environ[ENV_RECALL_READONLY] = "1"

    tmp = tempfile.mkdtemp()
    t0 = time.time()
    system = MemorySystem(Path(tmp) / "sys")
    id_map = ingest_corpus(system, corpus_path)
    print(f"ingested in {time.time()-t0:.1f}s", file=sys.stderr)

    cases = load_cases(cases_path)
    n_written = 0
    with open(args.out, "w") as fh:
        header = {
            "feature_names": list(lf.FEATURE_NAMES),
            "suite": args.suite,
            "eval_now": args.eval_now,
            "export_m": lf.EXPORT_M,
        }
        fh.write(json.dumps(header) + "\n")
        for case in cases:
            gold = {id_map[sym] for sym in case.relevance if sym in id_map}
            lf.arm_export(case.case_id, case.category, gold)
            system.recall(
                Query(query_text=case.query, max_results=args.k, layers=LayerMode.FULL)
            )
            sink = lf.disarm_export()
            for rec in sink.records if sink else []:
                fh.write(json.dumps(rec) + "\n")
                n_written += 1
    print(f"wrote {n_written} case records to {args.out} in {time.time()-t0:.1f}s",
          file=sys.stderr)
    system.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
