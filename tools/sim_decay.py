"""Decay/forgetting simulation: fast-forward the clock and verify the
memory-strength dynamics the engine promises (reference behavior:
decay.rs hybrid power-law + LTP protection; run_maintenance applies it).

Simulated protocol (all CPU, pinned clock via SHODH_EVAL_NOW):
  1. ingest a cohort of memories at t0,
  2. reinforce a subset (recall + helpful feedback -> LTP),
  3. advance the clock in steps (7/30/90 days), running maintenance at
     each step,
  4. report the cohort's mean strength per step and ASSERT the contract:
     - strength decays monotonically for unreinforced memories,
     - reinforced memories retain MORE strength than unreinforced ones,
     - nothing is hard-deleted by decay alone (forgetting is ranked-out,
       not destroyed — mod.rs keeps low-strength memories addressable).

Exit 0 = contract holds; prints one JSON line per step for the trend
artifact. Used by .github/workflows/decay-sim.yml.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from datetime import datetime, timedelta, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

T0 = datetime(2026, 1, 1, 12, 0, tzinfo=timezone.utc)


def mean_strength(system, ids):
    """Mean activation (the quantity run_maintenance decays; decay.rs
    analog) over the cohort, plus how many survive as addressable."""
    vals = []
    for mid in ids:
        m = system.get(mid)
        if m is not None:
            vals.append(float(m.activation))
    return sum(vals) / max(1, len(vals)), len(vals)


def main() -> int:
    os.environ["SHODH_EVAL_NOW"] = T0.isoformat()
    from shodh_tpu.engine.memory_system import MemorySystem
    from shodh_tpu.types import Experience, Query

    with tempfile.TemporaryDirectory() as td:
        system = MemorySystem(td + "/decay")
        plain_ids, boosted_ids = [], []
        for i in range(40):
            m = system.remember(
                Experience(content=f"observation {i}: sensor {i % 5} nominal at site {i % 7}"),
                created_at=T0,
            )
            (boosted_ids if i % 4 == 0 else plain_ids).append(m.id)
        # LTP: reinforce the boosted cohort while the clock is at t0
        system.recall(Query(query_text="sensor nominal site", max_results=10))
        system.reinforce_recall(boosted_ids, helpful=True)
        system.flush()

        prev_plain = None
        ok = True
        for days in (7, 30, 90):
            now = T0 + timedelta(days=days)
            os.environ["SHODH_EVAL_NOW"] = now.isoformat()
            system.run_maintenance()
            plain, n_plain = mean_strength(system, plain_ids)
            boosted, n_boost = mean_strength(system, boosted_ids)
            row = {
                "day": days,
                "plain_mean_strength": round(plain, 4),
                "reinforced_mean_strength": round(boosted, 4),
                "plain_alive": n_plain,
                "reinforced_alive": n_boost,
            }
            print(json.dumps(row), flush=True)
            if n_plain != len(plain_ids) or n_boost != len(boosted_ids):
                print("FAIL: decay hard-deleted memories", file=sys.stderr)
                ok = False
            if prev_plain is not None and plain > prev_plain + 1e-9:
                print("FAIL: unreinforced strength increased over time", file=sys.stderr)
                ok = False
            if boosted + 1e-9 < plain:
                print("FAIL: reinforced cohort decayed below unreinforced", file=sys.stderr)
                ok = False
            prev_plain = plain
        system.close()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
