"""Regenerate the README throughput ladder from the newest driver-captured
BENCH_r*.json — one source of truth, drift impossible by construction
(round-4 verdict #7; same discipline as tools/gen_openapi.py for routes).

The driver runs ``python bench.py`` on real TPU hardware at the end of
every round and stores stdout in ``BENCH_rNN.json``. This tool parses the
per-tier ladder lines out of that artifact's ``tail`` and rewrites the
block between the BENCH_TABLE markers in README.md. A doc-drift test
(tests/test_doc_drift.py) asserts the README block matches this exact
output, so a new BENCH artifact forces the table to update.

    python tools/gen_bench_table.py [--check]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

START = "<!-- BENCH_TABLE_START (tools/gen_bench_table.py) -->"
END = "<!-- BENCH_TABLE_END -->"

REFERENCE_QPS = 1000.0 / 46.0  # bench.py:32 — reference's 46 ms midpoint

_TIER_RE = re.compile(
    r"^(?P<tier>[\d.,]+[kM]?): (?P<ms>[\d.]+) ms/batch \(median of (?P<reps>\d+), "
    r"min (?P<min>[\d.]+) / max (?P<max>[\d.]+)\) -> (?P<qps>[\d,]+) QPS/chip",
    re.M,
)
_CERT_RE = re.compile(r"^(?P<tier>[\d.,]+[kM]?): certificate safe (?P<safe>\d+/\d+) batches, fast==exact (?P<fe>\d+/\d+)", re.M)

_TIER_ROWS = {"65k": 65_536, "262k": 262_144, "1M": 1_048_576, "4M": 4_194_304,
              "8M": 8_388_608, "16M": 16_777_216}


def newest_bench() -> tuple[Path, dict]:
    arts = sorted(REPO.glob("BENCH_r*.json"))
    if not arts:
        raise SystemExit("no BENCH_r*.json artifact found")
    p = arts[-1]
    return p, json.loads(p.read_text())


def build_table() -> str:
    path, art = newest_bench()
    tail = art.get("tail", "")
    certs = {m.group("tier"): (m.group("safe"), m.group("fe"))
             for m in _CERT_RE.finditer(tail)}
    rows = []
    for m in _TIER_RE.finditer(tail):
        tier = m.group("tier")
        n_rows = _TIER_ROWS.get(tier, 0)
        qps = float(m.group("qps").replace(",", ""))
        note = ""
        if tier in certs:
            safe, fe = certs[tier]
            note = f" (certified int8 selection, still exact; fired {safe})"
        rows.append((
            n_rows,
            f"| {n_rows:,} | {m.group('ms')} (min {m.group('min')} / "
            f"max {m.group('max')}){note} | **{qps:,.0f}** | "
            f"{qps / REFERENCE_QPS:,.0f}× |",
        ))
    rows = [r for _, r in sorted(rows)]
    lines = [
        START,
        f"Driver-captured `{path.name}` (median of reps, min/max spread — "
        "regenerate with `python tools/gen_bench_table.py`):",
        "",
        "| corpus rows | ms/batch | QPS/chip | vs reference (~22 QPS) |",
        "|---|---|---|---|",
        *rows,
        END,
    ]
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if README is out of date instead of writing")
    args = ap.parse_args()
    readme = REPO / "README.md"
    text = readme.read_text()
    if START not in text or END not in text:
        raise SystemExit("README.md is missing the BENCH_TABLE markers")
    block = build_table()
    new = re.sub(
        re.escape(START) + r".*?" + re.escape(END), lambda _m: block, text,
        flags=re.S,
    )
    if args.check:
        if new != text:
            print("README bench table is out of date; run tools/gen_bench_table.py")
            return 1
        return 0
    if new != text:
        readme.write_text(new)
        print("README bench table regenerated")
    else:
        print("README bench table already current")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
