"""CLAUDE.md documented defaults must match the code's actual defaults.

Round-2 verdict weak #6: the build's method is "sweep, then trust the recorded
default" — a stale recorded default in CLAUDE.md is an operational hazard.
This test parses every `SHODH_*` flag default claimed in CLAUDE.md's feature
flag section and checks it against the live value in code.
"""

import os
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CLAUDE_MD = (REPO / "CLAUDE.md").read_text()


def _claimed_defaults():
    """Extract (flag, value) pairs from patterns like `SHODH_X` (default 0.8)."""
    out = {}
    for m in re.finditer(r"`(SHODH_[A-Z_]+)`\s*\(default ([0-9.]+)\)", CLAUDE_MD):
        out[m.group(1)] = float(m.group(2))
    return out


def _live_default(flag: str) -> float:
    """Resolve the code's actual default for a flag (env unset)."""
    assert flag not in os.environ, f"{flag} set in test env — drift check invalid"
    from shodh_tpu import constants

    if flag == "SHODH_CONTEXT_INDEX_WEIGHT":
        return constants.context_index_weight()
    if flag == "SHODH_CONTEXT_FWD_WEIGHT":
        return constants.context_forward_weight()
    if flag == "SHODH_CONTEXT_INDEX_WEIGHT2":
        return constants.context_index_weight2()
    if flag == "SHODH_CONTEXT_INDEX_WEIGHT3":
        return constants.context_index_weight3()
    if flag == "SHODH_CONTEXT_FWD_WEIGHT2":
        return constants.context_forward_weight2()
    if flag == "SHODH_PRF":
        return float(os.environ.get("SHODH_PRF", "1"))
    if flag == "SHODH_DISTILLED_NER":
        # ner.py maybe_load_distilled: os.environ.get(..., "1")
        src = (REPO / "shodh_tpu" / "nlp" / "ner.py").read_text()
        m = re.search(r'SHODH_DISTILLED_NER",\s*"([0-9.]+)"', src)
        assert m, "SHODH_DISTILLED_NER read site not found"
        return float(m.group(1))
    if flag == "SHODH_JIT_CACHE":
        src = (REPO / "shodh_tpu" / "utils" / "jitcache.py").read_text()
        m = re.search(r'SHODH_JIT_CACHE",\s*"([0-9.]+)"', src)
        assert m, "SHODH_JIT_CACHE read site not found"
        return float(m.group(1))
    if flag == "SHODH_MEM_CACHE_CAP":
        src = (REPO / "shodh_tpu" / "storage" / "store.py").read_text()
        m = re.search(r'SHODH_MEM_CACHE_CAP",\s*"([0-9.]+)"', src)
        assert m, "SHODH_MEM_CACHE_CAP read site not found"
        return float(m.group(1))
    if flag == "SHODH_INGEST_CHUNK":
        src = (REPO / "shodh_tpu" / "engine" / "memory_system.py").read_text()
        m = re.search(r'SHODH_INGEST_CHUNK",\s*"([0-9.]+)"', src)
        assert m, "SHODH_INGEST_CHUNK read site not found"
        return float(m.group(1))
    if flag == "SHODH_NEIGHBOR_INHERIT":
        # memory_system.py:994 reads this inline with default 0.35
        src = (REPO / "shodh_tpu" / "engine" / "memory_system.py").read_text()
        m = re.search(r'SHODH_NEIGHBOR_INHERIT",\s*"([0-9.]+)"', src)
        assert m, "SHODH_NEIGHBOR_INHERIT read site not found"
        return float(m.group(1))
    # env_flag-backed booleans in constants.py resolve generically
    name = flag.removeprefix("SHODH_")
    if hasattr(constants, name):
        return float(getattr(constants, name))
    raise AssertionError(f"no live-default resolver for {flag} — add one here")


def test_claude_md_flag_defaults_match_code():
    claimed = _claimed_defaults()
    assert claimed, "no (default N) claims parsed from CLAUDE.md — regex drift?"
    mismatches = {}
    for flag, value in claimed.items():
        live = _live_default(flag)
        if abs(live - value) > 1e-9:
            mismatches[flag] = (value, live)
    assert not mismatches, f"CLAUDE.md default drift (claimed, live): {mismatches}"


def test_claude_md_neighbor_inherit_prose():
    """The NEIGHBOR_INHERIT bullet states 'default 0.35' in prose."""
    m = re.search(r"SHODH_NEIGHBOR_INHERIT`[^.]*default\s+([0-9.]+)", CLAUDE_MD)
    assert m, "NEIGHBOR_INHERIT default claim not found in CLAUDE.md"
    assert abs(float(m.group(1)) - _live_default("SHODH_NEIGHBOR_INHERIT")) < 1e-9


def test_claude_md_flat_consensus():
    from shodh_tpu.retrieval import fusion

    m = re.search(r"FLAT_CONSENSUS=([0-9.]+)", CLAUDE_MD)
    assert m, "FLAT_CONSENSUS claim not found in CLAUDE.md"
    assert abs(float(m.group(1)) - fusion.FLAT_CONSENSUS) < 1e-9


def test_readme_bench_table_matches_driver_artifact():
    """The README throughput ladder must be the generator's output over the
    newest BENCH_r*.json (round-4 verdict #7: doc numbers drifted from the
    driver capture; now drift fails CI by construction)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, str(REPO / "tools/gen_bench_table.py"), "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
