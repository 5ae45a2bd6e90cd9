"""Live holdout-only A/B for the learned-fusion artifact.

The artifact is fitted on the even-index half of each category
(tools/fit_fusion.py split_cases); headline full-suite numbers therefore
include fit cases. This tool reruns the suite LIVE on the odd-index
(holdout) half only, with the learned rerank off vs on, so the reported
lift is contamination-free. Same ingest/readonly/eval-now discipline as
``cli eval``.

    python tools/eval_holdout.py --suite locomo-full
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SUITES = {
    "locomo-full": ("tests/recall/corpora/locomo.jsonl", "tests/recall/locomo_cases.jsonl"),
}


def holdout_half(cases):
    """Odd-index per category in case_id order — EXACTLY fit_fusion.split_cases'
    holdout side."""
    by_cat = defaultdict(list)
    for c in sorted(cases, key=lambda c: c.case_id):
        by_cat[c.category].append(c)
    hold = []
    for cat in sorted(by_cat):
        hold.extend(c for i, c in enumerate(by_cat[cat]) if i % 2 == 1)
    return hold


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="locomo-full", choices=sorted(SUITES))
    ap.add_argument("--eval-now", default="2026-05-01T00:00:00Z")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from shodh_tpu.constants import ENV_RECALL_READONLY
    from shodh_tpu.engine.memory_system import MemorySystem
    from shodh_tpu.harness.fixtures import load_cases
    from shodh_tpu.harness.runner import ingest_corpus, run_cases
    from shodh_tpu.types import parse_ts
    from shodh_tpu.utils import clock

    corpus_path, cases_path = (REPO / p for p in SUITES[args.suite])
    clock.pin_now(parse_ts(args.eval_now))
    os.environ[ENV_RECALL_READONLY] = "1"

    tmp = tempfile.mkdtemp()
    system = MemorySystem(Path(tmp) / "sys")
    id_map = ingest_corpus(system, corpus_path)
    hold = holdout_half(load_cases(cases_path))
    print(f"holdout cases: {len(hold)}", file=sys.stderr)

    out = {}
    for arm, env in (("base", "0"), ("learned", "1")):
        os.environ["SHODH_LEARNED_FUSION"] = env
        rep = run_cases(system, hold, id_map)
        out[arm] = {
            "metrics": {k: round(v, 4) for k, v in rep.metrics.items()},
            "per_category": {
                cat: {k: round(v, 4) for k, v in m.items()}
                for cat, m in rep.per_category.items()
            },
        }
    system.close()
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
