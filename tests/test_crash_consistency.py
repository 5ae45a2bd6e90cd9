"""Crash consistency: the kv store commits every batch while the device
index snapshot persists only at save()/close()/compaction. A hard kill
(SIGKILL, power loss) must not silently degrade the vector leg — the
engine heals at open via the text_rows allocation counter (tail losses)
and the index epoch (compaction-window layout mismatches); fsck sees
whatever the engine's targeted recovery doesn't cover.

Reference contrast: vamana.rs mmaps per insert and never faces this; the
deferred-snapshot design is what buys the config-5 streaming ingest rate,
so recovery is the price, paid once at reopen.
"""

import os
import signal
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = str(Path(__file__).resolve().parents[1])

from shodh_tpu.engine.memory_system import MemorySystem
from shodh_tpu.storage.fsck import check_store
from shodh_tpu.types import Experience, ExperienceType, Query

CHILD = """
import jax; jax.config.update("jax_platforms", "cpu")
import sys
from shodh_tpu.engine.memory_system import MemorySystem
from shodh_tpu.types import Experience, ExperienceType
s = MemorySystem(sys.argv[1])
for i in range(100000):
    s.remember(Experience(content=f"crash torture memory {i} about topic{i % 7}",
               tags=[f"t{i % 3}"], experience_type=ExperienceType.CONVERSATION))
    print(i, flush=True)
"""


def _crash_mid_ingest(store, after: int = 25) -> int:
    child = subprocess.Popen(
        [sys.executable, "-u", "-c", CHILD, str(store)],
        stdout=subprocess.PIPE,
        text=True,
        env={**os.environ, "PYTHONPATH": REPO_ROOT},
    )
    seen = 0
    for line in child.stdout:
        seen = int(line.strip())
        if seen >= after:
            os.kill(child.pid, signal.SIGKILL)
            break
    child.wait()
    return seen


class TestSigkillMidIngest:
    def test_reopen_heals_vector_leg(self, tmp_path):
        store = tmp_path / "s"
        n = _crash_mid_ingest(store)
        assert n >= 25
        s = MemorySystem(store)
        try:
            stored = s.stats().total_memories
            assert stored >= n
            # THE invariant this file exists for: every stored memory's
            # vectors are live in the index after reopen (pre-recovery this
            # was 0 — recall silently degraded to the BM25 leg only)
            assert s.index.n_active >= stored
            report = check_store(s)
            # graph ingests since the last maintenance flush are genuinely
            # lost to the kill — fsck must SEE that, and repair must
            # re-derive the structure from the records
            assert report["graph"]["missing_ingests"] >= 1 and not report["ok"]
            from shodh_tpu.storage.fsck import repair_store

            report = repair_store(s, report)
            assert report["ok"], report
            res = s.recall(Query(query_text="crash torture topic3", max_results=5))
            assert len(res.memories) == 5
        finally:
            s.close()

    def test_second_reopen_is_quiet(self, tmp_path):
        from shodh_tpu.storage.fsck import repair_store

        store = tmp_path / "s"
        _crash_mid_ingest(store)
        s = MemorySystem(store)
        healed_rows = s.index.n_active
        repair_store(s)  # graph re-derivation (vectors healed at open)
        s.close()  # clean close persists the snapshot
        s = MemorySystem(store)
        try:
            # nothing left to heal: counts identical, report clean
            assert s.index.n_active == healed_rows
            assert check_store(s)["ok"]
        finally:
            s.close()


class TestCompactionEpochWindow:
    def test_stale_snapshot_after_compaction_rebuilds(self, tmp_path):
        store = tmp_path / "c"
        s = MemorySystem(store)
        mems = [
            s.remember(Experience(content=f"compaction window record {i} subject{i % 5}"))
            for i in range(20)
        ]
        s.close()

        s = MemorySystem(store)
        # Delete enough to cross the 30% compaction threshold, run
        # maintenance (compacts + remaps + saves), then simulate the crash
        # window by restoring the PRE-compaction snapshot: kv says epoch 1,
        # snapshot says epoch 0 — rows would map to the wrong vectors.
        snap = (store / "index" / "text.npz").read_bytes()
        meta = (store / "index" / "text.json").read_bytes()
        for m in mems[:8]:
            s.forget(m.id)
        s.run_maintenance()
        assert s.index.epoch == 1
        s.storage.kv.flush()
        (store / "index" / "text.npz").write_bytes(snap)
        (store / "index" / "text.json").write_bytes(meta)
        s.storage.close()  # close kv only: a real close() would re-save

        s = MemorySystem(store)
        try:
            kv_epoch = int(s.storage.kv.get("meta", "index_epoch").decode())
            assert kv_epoch == s.index.epoch  # recovery synced the pair
            report = check_store(s)
            assert report["index"]["epoch_ok"] and report["ok"], report
            res = s.recall(Query(query_text="compaction window subject2", max_results=3))
            assert len(res.memories) == 3
        finally:
            s.close()


class TestGraphFlushWindow:
    def test_flush_persists_graph_without_close(self, tmp_path):
        # the graph buffers dirty entities/edges in memory; flush() (called
        # by save/backup and every maintenance pass) must persist them so a
        # crash loses at most one maintenance interval of graph mutations
        store = tmp_path / "g"
        s = MemorySystem(store)
        s.remember(Experience(content="Alice met Bob at the Acme robotics lab"))
        s.flush()
        # simulate the crash: drop the process state without close()
        entities_on_disk = sum(1 for _ in s.graph.kv.scan_prefix("gent", ""))
        assert entities_on_disk >= 1  # flushed, not buffered
        s.storage.close()
        s.graph.kv.close()

        s = MemorySystem(store)
        try:
            assert len(s.graph.entities) >= 1
        finally:
            s.close()


class TestTornSnapshot:
    def test_corrupt_index_snapshot_rebuilds_instead_of_crashing(self, tmp_path):
        store = tmp_path / "t"
        s = MemorySystem(store)
        s.remember(Experience(content="record behind a torn snapshot about sailing"))
        s.remember(Experience(content="second record about astronomy"))
        s.close()
        # torn copy / bitrot: npz bytes no longer match the json checksum
        npz = store / "index" / "text.npz"
        npz.write_bytes(npz.read_bytes()[:-7] + b"garbage")

        s = MemorySystem(store)
        try:
            assert s.index.n_active == 2  # rebuilt, not crashed
            report = check_store(s)
            assert report["ok"], report
            res = s.recall(Query(query_text="sailing record", max_results=1))
            assert "sailing" in res.memories[0].memory.experience.content
        finally:
            s.close()


class TestFsckSeesWhatRecoverySkips:
    def test_orphan_active_rows_detected_and_repaired(self, tmp_path):
        from shodh_tpu.storage.fsck import repair_store

        store = tmp_path / "o"
        s = MemorySystem(store)
        kept = s.remember(Experience(content="surviving record about orchestration"))
        s.remember(Experience(content="temporary record to orphan"))
        s.close()

        s = MemorySystem(store)
        # forget deletes kv rows + soft-deletes index rows; dropping the
        # post-forget snapshot (crash before save) leaves the old rows
        # ACTIVE in the reloaded index with no mapping = orphans
        snap = (store / "index" / "text.npz").read_bytes()
        meta = (store / "index" / "text.json").read_bytes()
        victim = [m.id for m in s.storage.iter_memories() if m.id != kept.id][0]
        s.forget(victim)
        s.storage.kv.flush()
        (store / "index" / "text.npz").write_bytes(snap)
        (store / "index" / "text.json").write_bytes(meta)
        s.storage.close()

        s = MemorySystem(store)
        try:
            report = check_store(s)
            assert report["index"]["orphan_active_rows"] >= 1 and not report["ok"]
            report = repair_store(s, report)
            assert report["ok"], report
        finally:
            s.close()
