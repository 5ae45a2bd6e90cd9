"""A/B testing, learning history, compression, MIF interchange tests."""

import json
from datetime import datetime, timedelta, timezone

import pytest

from shodh_tpu.engine.ab_testing import ABTestManager, chi_squared_2x2
from shodh_tpu.engine.compression import (
    COMPRESSED_MARKER,
    CompressionPipeline,
    compress_content,
    decompress_content,
    extractive_summary,
)
from shodh_tpu.engine.learning_history import LearningHistory
from shodh_tpu.storage.kv import KvStore
from shodh_tpu.storage.mif import export_mif, import_mif

NOW = datetime(2025, 7, 1, tzinfo=timezone.utc)


@pytest.fixture()
def kv(tmp_path):
    store = KvStore(tmp_path / "kv.db")
    yield store
    store.close()


class TestABTesting:
    def test_consistent_assignment(self, kv):
        ab = ABTestManager(kv)
        exp = ab.create("weights-v2", {"control": {}, "treatment": {"recency": 0.7}}, NOW)
        a1 = ab.assign(exp, "user-1")
        assert all(ab.assign(exp, "user-1") == a1 for _ in range(5))
        # different subjects spread across variants
        assigns = {ab.assign(exp, f"user-{i}") for i in range(50)}
        assert assigns == {"control", "treatment"}

    def test_chi_squared(self):
        # clearly different proportions -> significant
        assert chi_squared_2x2(90, 1000, 140, 1000) > 3.84
        # identical -> zero
        assert chi_squared_2x2(50, 500, 50, 500) == 0.0

    def test_winner_detection(self, kv):
        ab = ABTestManager(kv)
        exp = ab.create("t", {"a": {}, "b": {}}, NOW)
        for _ in range(500):
            ab.record(exp.id, "a", "impression")
            ab.record(exp.id, "b", "impression")
        for _ in range(60):
            ab.record(exp.id, "a", "click")
        for _ in range(120):
            ab.record(exp.id, "b", "click")
        analysis = ab.analyze(exp.id)
        assert analysis["winner"] == "b"
        assert ab.get(exp.id).status == "complete"

    def test_no_winner_with_few_impressions(self, kv):
        ab = ABTestManager(kv)
        exp = ab.create("t2", {"a": {}, "b": {}}, NOW)
        for _ in range(10):
            ab.record(exp.id, "a", "impression")
            ab.record(exp.id, "b", "impression")
        ab.record(exp.id, "b", "click")
        assert ab.analyze(exp.id)["winner"] is None


class TestLearningHistory:
    def test_record_query_velocity(self, kv):
        lh = LearningHistory(kv)
        lh.record("insight", "WAL mode fixes sqlite lock contention", NOW - timedelta(days=1))
        lh.record("correction", "the cache bug was a TTL issue not memory", NOW)
        hits = lh.query("sqlite lock", NOW)
        assert hits and "WAL" in hits[0][0].summary
        # recency weighting: a fresher event with equal overlap wins
        lh.record("insight", "sqlite lock contention returns under load", NOW)
        hits2 = lh.query("sqlite lock contention", NOW)
        assert hits2[0][0].at == NOW
        assert lh.velocity(NOW, window_days=7) == pytest.approx(3 / 7)


class TestCompression:
    def test_roundtrip(self):
        text = "the quick brown fox jumps over the lazy dog " * 50
        blob = compress_content(text)
        assert len(blob) < len(text.encode())
        assert decompress_content(blob) == text

    def test_extractive_summary(self):
        text = (
            "The payment service failed again. Totally unrelated filler sentence here. "
            "The payment service retry logic needs a circuit breaker. Another filler."
        )
        summary = extractive_summary(text, max_sentences=2)
        assert "payment service" in summary
        assert len(summary) < len(text)

    def test_pipeline_policy(self, tmp_path):
        from shodh_tpu.storage.store import MemoryStorage
        from shodh_tpu.types import Experience, Memory, new_memory_id

        storage = MemoryStorage(tmp_path / "s")
        old = Memory(
            id=new_memory_id(),
            experience=Experience(content="ancient log line detail " * 30),
            created_at=NOW - timedelta(days=90),
            importance=0.1,
        )
        fresh = Memory(
            id=new_memory_id(),
            experience=Experience(content="fresh important detail " * 30),
            created_at=NOW,
            importance=0.9,
        )
        storage.store(old)
        storage.store(fresh)
        pipe = CompressionPipeline(storage)
        assert pipe.run(NOW) == 1
        got = storage.get(old.id)
        assert COMPRESSED_MARKER in got.experience.metadata
        assert "ancient log line detail" in pipe.decompress(got)
        assert COMPRESSED_MARKER not in storage.get(fresh.id).experience.metadata


class TestMIF:
    def test_export_import_roundtrip(self, tmp_path):
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, Query

        src = MemorySystem(tmp_path / "src")
        src.remember(Experience(content="Alice chose Rust at Acme", entities=["Alice", "Acme", "Rust"]))
        src.todos.add("migrate the index", NOW)
        doc = export_mif(src, NOW)
        assert doc["mif_version"] == "2.0"  # STRING, schema.rs:22
        assert doc["generator"]["name"] == "shodh-tpu"
        assert doc["export_meta"]["checksum"]
        assert len(doc["memories"]) == 1
        assert doc["memories"][0]["memory_type"] == "observation"
        assert len(doc["knowledge_graph"]["entities"]) >= 2
        # round-trip through JSON (interchange contract)
        doc = json.loads(json.dumps(doc))
        dst = MemorySystem(tmp_path / "dst")
        counts = import_mif(dst, doc)
        assert counts["memories"] == 1
        res = dst.recall(Query(query_text="who chose rust"))
        assert len(res.ids) == 1
        assert dst.graph.get_edge("Alice", "Acme") is not None
        assert len(dst.todos.list()) == 1
        src.close()
        dst.close()

    def test_import_reference_shaped_document(self, tmp_path):
        """A genuine reference export — string "2.0" version, nested
        knowledge_graph, UUID ids, no vendor extensions — must import
        (mif/schema.rs:21-39). Round 1 crashed on int("2.0")."""
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Query

        doc = {
            "mif_version": "2.0",
            "generator": {"name": "shodh-memory", "version": "0.9.0"},
            "export_meta": {
                "id": "11111111-1111-5111-8111-111111111111",
                "created_at": "2026-01-02T00:00:00Z",
                "user_id": "u1",
                "checksum": "deadbeef",
            },
            "memories": [{
                "id": "22222222-2222-5222-8222-222222222222",
                "content": "Bob deployed the staging cluster",
                "memory_type": "decision",
                "created_at": "2026-01-01T00:00:00Z",
                "tags": ["ops"],
                "entities": [{"name": "Bob", "entity_type": "person", "confidence": 1.0}],
                "metadata": {"k": "v"},
                "version": 1,
            }],
            "knowledge_graph": {
                "entities": [
                    {"id": "33333333-3333-5333-8333-333333333333", "name": "Bob",
                     "types": ["person"], "attributes": {}, "summary": "",
                     "created_at": "2026-01-01T00:00:00Z",
                     "last_seen_at": "2026-01-01T00:00:00Z"},
                    {"id": "44444444-4444-5444-8444-444444444444", "name": "staging cluster",
                     "types": ["technology"], "attributes": {}, "summary": "",
                     "created_at": "2026-01-01T00:00:00Z",
                     "last_seen_at": "2026-01-01T00:00:00Z"},
                ],
                "relationships": [{
                    "id": "55555555-5555-5555-8555-555555555555",
                    "source_entity_id": "33333333-3333-5333-8333-333333333333",
                    "target_entity_id": "44444444-4444-5444-8444-444444444444",
                    "relation_type": "works_with", "context": "", "confidence": 0.8,
                    "created_at": "2026-01-01T00:00:00Z",
                    "valid_at": "2026-01-01T00:00:00Z",
                }],
                "episodes": [],
            },
            "todos": [{
                "id": "66666666-6666-5666-8666-666666666666",
                "content": "rotate certs", "status": "backlog", "priority": "none",
                "created_at": "2026-01-01T00:00:00Z",
                "updated_at": "2026-01-01T00:00:00Z",
            }],
            "projects": [],
            "reminders": [{
                "id": "77777777-7777-5777-8777-777777777777",
                "content": "check backup", "status": "pending", "priority": 3,
                "tags": [], "created_at": "2026-01-01T00:00:00Z",
                "trigger": {"type": "time", "at": "2026-02-01T00:00:00Z"},
            }],
            "vendor_extensions": {},
        }
        dst = MemorySystem(tmp_path / "ref_dst")
        counts = import_mif(dst, doc)
        # "Bob" was already created by the memory ingest itself, so only
        # "staging cluster" is a NEW graph entity (dedup by canonical name)
        assert counts["memories"] == 1 and counts["relationships"] == 1
        assert counts["entities"] == 1 and counts["todos"] == 1
        assert counts["reminders"] == 1
        assert "bob" in dst.graph.entities and "staging cluster" in dst.graph.entities
        res = dst.recall(Query(query_text="staging cluster deploy"))
        assert len(res.ids) == 1
        assert dst.graph.get_edge("Bob", "staging cluster") is not None
        todos = dst.todos.list()
        assert todos[0].status == "pending" and todos[0].priority == "low"
        assert len(dst.prospective.pending()) == 1
        dst.close()

    def test_version_parse_lenient(self):
        from shodh_tpu.storage.mif import parse_mif_version

        assert parse_mif_version("2.0") == 2
        assert parse_mif_version(2) == 2
        assert parse_mif_version("1.3") == 1
        with pytest.raises(ValueError):
            parse_mif_version("banana")


class TestABScoringWiring:
    """A/B experiments that actually swap fusion weights (ab_testing.rs
    LearnedWeights) — the round-1 gap: experiments tracked CTR but never
    touched scoring."""

    def _system(self, tmp_path):
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience

        sys_ = MemorySystem(tmp_path / "abuser")
        sys_.remember(Experience(content="kafka powers the event pipeline"))
        sys_.remember(Experience(content="the pipeline deploy failed yesterday"))
        return sys_

    def test_running_scoring_experiment_changes_fusion(self, tmp_path, monkeypatch):
        from shodh_tpu.retrieval.fusion import flat_fuse

        sem = {"a": 0.9, "b": 0.5}
        bm = {"a": 0.5, "b": 0.9}
        base = flat_fuse(sem, bm, {}, 0.0)
        lo = flat_fuse(sem, bm, {}, 0.0, overrides={"flat_consensus": 0.0})
        hi = flat_fuse(sem, bm, {}, 0.0, overrides={"flat_consensus": 1.0})
        assert lo["a"] < base["a"] < hi["a"]  # consensus term responds

    def test_recall_records_impressions_and_uses_variant(self, tmp_path):
        from shodh_tpu.types import Query

        sys_ = self._system(tmp_path)
        exp = sys_.ab.create(
            "scoring:consensus-sweep",
            {"low": {"flat_consensus": 0.0}, "high": {"flat_consensus": 1.0}},
            NOW,
        )
        sys_.ab.set_status(exp.id, "running")
        variant = sys_.ab.assign(exp, sys_.data_dir.name)
        res = sys_.recall(Query(query_text="pipeline"))
        assert res.ids
        got = sys_.ab.get(exp.id)
        assert got.stats[variant].impressions == 1
        # feedback closes the loop as a click + positive signal
        sys_.reinforce_recall([res.ids[0]], helpful=True)
        got = sys_.ab.get(exp.id)
        assert got.stats[variant].clicks == 1
        assert got.stats[variant].positive_feedback == 1
        sys_.close()

    def test_readonly_harness_never_writes(self, tmp_path, monkeypatch):
        from shodh_tpu.types import Query

        sys_ = self._system(tmp_path)
        exp = sys_.ab.create("scoring:ro", {"a": {}, "b": {"flat_consensus": 0.9}}, NOW)
        sys_.ab.set_status(exp.id, "running")
        monkeypatch.setenv("SHODH_RECALL_READONLY", "1")
        sys_.recall(Query(query_text="pipeline"))
        got = sys_.ab.get(exp.id)
        assert all(v.impressions == 0 for v in got.stats.values())
        sys_.close()

    def test_non_scoring_experiments_ignored(self, tmp_path):
        from shodh_tpu.types import Query

        sys_ = self._system(tmp_path)
        exp = sys_.ab.create("ui-banner-test", {"a": {}, "b": {}}, NOW)
        sys_.ab.set_status(exp.id, "running")
        sys_.recall(Query(query_text="pipeline"))
        got = sys_.ab.get(exp.id)
        assert all(v.impressions == 0 for v in got.stats.values())
        assert sys_._active_scoring_assignment() is None
        sys_.close()

    def test_draft_scoring_experiment_inactive(self, tmp_path):
        sys_ = self._system(tmp_path)
        sys_.ab.create("scoring:draft-only", {"a": {}, "b": {}}, NOW)
        assert sys_._active_scoring_assignment() is None
        sys_.close()
