"""Store integrity check + repair (storage/fsck.py; consolidation.rs
verify/repair analog). Builds a real store, breaks each derived
structure in turn, and asserts check_store sees it and repair_store
restores a clean report with recall still working."""

import json
import subprocess
import sys

import pytest

from shodh_tpu.engine.memory_system import MemorySystem
from shodh_tpu.storage.fsck import check_store, repair_store
from shodh_tpu.storage.store import NS_HASH, NS_IDX, NS_MEM
from shodh_tpu.types import Experience, ExperienceType, Query


@pytest.fixture()
def system(tmp_path):
    s = MemorySystem(tmp_path / "users" / "default")
    s.remember(
        Experience(
            content="Alice will present the roadmap next Friday",
            experience_type=ExperienceType.CONVERSATION,
            tags=["planning"],
        )
    )
    s.remember(
        Experience(
            content="The deployment pipeline broke on the staging cluster",
            tags=["ops"],
        )
    )
    yield s
    s.close()


class TestCheck:
    def test_clean_store_is_ok(self, system):
        report = check_store(system)
        assert report["ok"], report
        assert report["memories"] == 2

    def test_detects_dangling_hash_entry(self, system):
        system.storage.kv.put(NS_HASH, "deadbeef" * 8, b"no-such-memory")
        report = check_store(system)
        assert not report["ok"] and report["hash_index"]["dangling"] == 1

    def test_detects_missing_secondary_index_key(self, system):
        key, _ = next(iter(system.storage.kv.scan_prefix(NS_IDX, "")))
        system.storage.kv.delete(NS_IDX, key)
        report = check_store(system)
        assert not report["ok"] and report["secondary_index"]["missing"] >= 1

    def test_detects_corrupt_record(self, system):
        mid = next(system.storage.iter_ids())
        system.storage.kv.put(NS_MEM, mid + "-junk", b"\x00not-msgpack")
        report = check_store(system)
        assert report["corrupt_records"] == 1 and not report["ok"]

    def test_detects_orphan_bm25_doc(self, system):
        system.bm25.upsert("ghost-doc", "content of a deleted memory")
        report = check_store(system)
        assert not report["ok"] and report["bm25"]["orphans"] == 1

    def test_detects_stale_lexical_stamp(self, system):
        system.storage.kv.put("meta", "lexical_fp", b"stale")
        report = check_store(system)
        assert not report["ok"] and not report["lexical_stamp"]["current"]


class TestRepair:
    def _break_everything(self, system):
        system.storage.kv.put(NS_HASH, "deadbeef" * 8, b"no-such-memory")
        key, _ = next(iter(system.storage.kv.scan_prefix(NS_IDX, "")))
        system.storage.kv.delete(NS_IDX, key)
        system.storage.kv.put(NS_MEM, "junk-id", b"\x00not-msgpack")
        system.bm25.upsert("ghost-doc", "orphan postings")
        system.storage.kv.put("meta", "lexical_fp", b"stale")

    def test_repair_restores_clean_report_and_recall(self, system):
        want = system.recall(Query(query_text="roadmap presentation", max_results=2)).ids
        self._break_everything(system)
        report = repair_store(system)
        assert report["ok"], report
        assert system.recall(Query(query_text="roadmap presentation", max_results=2)).ids == want

    def test_modality_rows_rederive_from_persisted_embeddings(self, system):
        import numpy as np

        system.remember(
            Experience(
                content="robot camera frame of the loading dock",
                image_embeddings=np.arange(1, 9, dtype=np.float32).tolist(),
            )
        )
        # simulate the crash: modality index snapshot never persisted
        system.modality_indexes.clear()
        report = check_store(system)
        assert not report["ok"] and report["index"]["stale_modality_rows"] >= 1
        report = repair_store(system, report)
        assert report["ok"], report
        # the rebuilt modality index serves the vector again
        midx = system.modality_indexes["image"]
        assert midx.n_active == 1

    def test_repair_is_idempotent(self, system):
        self._break_everything(system)
        first = repair_store(system)
        second = repair_store(system)
        assert first["ok"] and second["ok"]

    def test_orphan_only_modality_index_dropped(self, tmp_path):
        # Regression: an orphaned modality index with NO surviving source
        # memories must be dropped (object + snapshot files) or repair
        # never converges to ok
        import numpy as np

        s = MemorySystem(tmp_path / "om")
        try:
            m = s.remember(
                Experience(
                    content="only image memory",
                    image_embeddings=np.arange(1, 9, dtype=np.float32).tolist(),
                )
            )
            s.save()
            s.forget(m.id)
            s.remember(Experience(content="plain survivor"))
            # crash simulation: reload the pre-forget image snapshot
            from shodh_tpu.index.device_index import DeviceVectorIndex

            s.modality_indexes["image"] = DeviceVectorIndex.load(
                (tmp_path / "om") / "index" / "image"
            )
            report = check_store(s)
            assert report["index"]["orphan_active_rows"] >= 1 and not report["ok"]
            report = repair_store(s, report)
            assert report["ok"], report
            assert "image" not in s.modality_indexes
            assert not ((tmp_path / "om") / "index" / "image.json").exists()
        finally:
            s.close()

    def test_fresh_index_repair_with_out_of_order_created_at(self, tmp_path):
        # Regression: replay order is (created_at, id), which diverges from
        # row-allocation order when created_at is caller-supplied (historical
        # import). Stale row ids must never be deleted against the fresh
        # index — they alias rows just assigned to earlier-replayed memories.
        import numpy as np
        from datetime import datetime, timezone

        s = MemorySystem(tmp_path / "ooo")
        try:
            t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
            t1 = datetime(2026, 6, 1, tzinfo=timezone.utc)
            # ingested LATER but created EARLIER -> replays FIRST
            s.remember(Experience(content="newest rows oldest clock"), created_at=t1)
            s.remember(Experience(content="oldest rows newest clock"), created_at=t0)
            s.remember(
                Experience(
                    content="precomputed record",
                    embeddings=np.full(s.embedder.dimension, 0.5, np.float32).tolist(),
                ),
                created_at=t0,
            )
            want = {m.id for m in s.storage.iter_memories()}
            s.storage.kv.put("meta", "lexical_fp", b"stale")
            s.bm25.upsert("ghost", "force a repair-worthy report")
            report = repair_store(s)
            assert report["ok"], report
            # every memory's vectors live and correctly mapped
            for mid in want:
                rows = s.storage.get_vector_map(mid)["text"]
                assert all(s.index.row_active(r) for r in rows), mid
                assert all(s.storage.memory_for_row(r) == mid for r in rows)
        finally:
            s.close()


class TestCli:
    def test_fsck_exit_codes(self, tmp_path):
        store = tmp_path / "users" / "default"
        s = MemorySystem(store)
        s.remember(Experience(content="cli fsck target memory"))
        s.storage.kv.put(NS_HASH, "deadbeef" * 8, b"no-such-memory")
        s.close()

        def run_fsck(*extra):
            return subprocess.run(
                [sys.executable, "-m", "shodh_tpu.cli", "fsck",
                 "--data-dir", str(tmp_path), *extra],
                capture_output=True, text=True, timeout=120,
                env={"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo",
                     "SHODH_OFFLINE": "1"},
            )

        bad = run_fsck()
        assert bad.returncode == 1, bad.stdout + bad.stderr
        assert json.loads(bad.stdout)["hash_index"]["dangling"] == 1

        fixed = run_fsck("--repair")
        assert fixed.returncode == 0, fixed.stdout + fixed.stderr
        assert json.loads(fixed.stdout)["ok"] is True

        clean = run_fsck()
        assert clean.returncode == 0


class TestRowmapRemapRegression:
    def test_fsck_catches_and_repairs_interleaved_remap_loss(self, system):
        """Round-4 storage bug class: remap_rows once interleaved dels and
        puts, so a kept row's NEW key (== a deleted row's OLD key, scanned
        later) was erased — vecmaps pointed at rows with no rowmap entry.
        fsck must see the mismatch and repair must restore recall."""
        from shodh_tpu.storage.fsck import check_store, repair_store
        from shodh_tpu.storage.store import NS_ROWMAP
        from shodh_tpu.types import Query

        # Reproduce the corrupt SHAPE directly: drop the rowmap entry for
        # one live memory's text row (what the del-after-put erased).
        mem = next(system.storage.iter_memories())
        rows = system.storage.get_vector_map(mem.id).get("text", [])
        assert rows
        system.storage.kv.write_batch(
            [("del", NS_ROWMAP, f"text:{rows[0]}", None)]
        )
        report = check_store(system)
        assert not report["ok"]
        assert report["vector_map"]["row_mismatches"] >= 1

        repair_store(system, report)
        report2 = check_store(system)
        assert report2["ok"], report2
        res = system.recall(Query(query_text="roadmap Friday", max_results=3))
        assert mem.id in res.ids
