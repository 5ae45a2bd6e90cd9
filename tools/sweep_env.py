"""One-ingest multi-config sweep over locomo-full.

Builds the eval system ONCE (ingest is the slow part), then evaluates the
full 1,531-case suite repeatedly under different env settings — valid for
knobs that are read at recall time (boost lambdas, weights), NOT for
ingest-time knobs (context indexing, NER defaults).

    python tools/sweep_env.py SHODH_MMR_LAMBDA 0 0.2 0.4
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SHODH_EVAL_NOW", "2026-05-01T00:00:00Z")

import jax

jax.config.update("jax_platforms", "cpu")

from tools.probe_quality import CASES, build_system  # noqa: E402

from shodh_tpu.harness.fixtures import load_cases  # noqa: E402
from shodh_tpu.harness.metrics import Metrics  # noqa: E402
from shodh_tpu.types import LayerMode, Query  # noqa: E402


def evaluate(system, id_map, cases):
    by_cat: dict[str, list] = {}
    allm = []
    for case in cases:
        rel = {id_map[s]: g for s, g in case.relevance.items() if s in id_map}
        r = system.recall(Query(query_text=case.query, max_results=10, layers=LayerMode.FULL))
        m = Metrics.compute(r.ids, rel, 10)
        allm.append(m)
        by_cat.setdefault(case.category, []).append(m)

    def agg(ms):
        n = len(ms)
        return {
            "r@10": round(sum(x.recall_at_k for x in ms) / n, 4),
            "map": round(sum(x.map for x in ms) / n, 4),
            "mrr": round(sum(x.mrr for x in ms) / n, 4),
            "p@1": round(sum(x.p_at_1 for x in ms) / n, 4),
            "ndcg": round(sum(x.ndcg_at_k for x in ms) / n, 4),
        }

    out = {"all": agg(allm)}
    for cat, ms in sorted(by_cat.items()):
        out[cat] = agg(ms)
    return out


def _constants_attr_for(env_name: str):
    """Map an env var to its constants.py module attribute (many tunables
    are read ONCE at import — `X = env_float("ENV", d)` — so sweeping the
    env var alone is a silent no-op; the attribute must be patched too)."""
    import re
    from pathlib import Path

    src = (Path(__file__).parent.parent / "shodh_tpu" / "constants.py").read_text()
    m = re.search(
        rf'^([A-Z_0-9]+)\s*=\s*env_(?:float|int)\("{env_name}"', src, re.M
    )
    return m.group(1) if m else None


def main() -> None:
    knob = sys.argv[1]
    values = sys.argv[2:]
    system, id_map = build_system()
    cases = list(load_cases(CASES))
    from shodh_tpu import constants as C

    attr = _constants_attr_for(knob)
    print(
        f"{len(cases)} cases; sweeping {knob} over {values}"
        + (f" (patching constants.{attr})" if attr else ""),
        file=sys.stderr,
    )
    for v in values:
        os.environ[knob] = v
        if attr is not None:
            cast = int if isinstance(getattr(C, attr), int) else float
            setattr(C, attr, cast(float(v)))
        res = evaluate(system, id_map, cases)
        print(json.dumps({knob: v, **res}), flush=True)


if __name__ == "__main__":
    main()
