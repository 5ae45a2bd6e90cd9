"""Recall determinism + stress/SLA tests.

Mirrors the reference's recall_determinism.rs (byte-identical repeats),
brutal_stress_tests (volume + concurrency), and timing_sla_tests.
"""

import concurrent.futures
import time
from datetime import datetime, timezone

import pytest

from shodh_tpu.engine.memory_system import MemorySystem
from shodh_tpu.server.validation import (
    ValidationError,
    validate_batch,
    validate_experience_payload,
    validate_query_payload,
)
from shodh_tpu.types import Experience, Query
from shodh_tpu.utils import clock

NOW = datetime(2025, 7, 1, tzinfo=timezone.utc)


class TestDeterminism:
    def test_repeat_recall_identical(self, tmp_path, monkeypatch):
        """Same system, pinned clock, readonly recall -> identical ranks."""
        monkeypatch.setenv("SHODH_RECALL_READONLY", "1")
        clock.pin_now(NOW)
        try:
            sys_ = MemorySystem(tmp_path / "m")
            for i in range(30):
                sys_.remember(
                    Experience(content=f"note {i} about service {'alpha' if i % 2 else 'beta'} latency"),
                    created_at=NOW,
                )
            q = Query(query_text="alpha service latency issues")
            runs = [sys_.recall(q).ids for _ in range(5)]
            assert all(r == runs[0] for r in runs)
            sys_.close()
        finally:
            clock.pin_now(None)

    def test_fresh_ingest_identical_ranks(self, tmp_path, monkeypatch):
        """Two fresh systems ingesting the same corpus rank identically
        (modulo ids): the reference's repeat contract."""
        monkeypatch.setenv("SHODH_RECALL_READONLY", "1")
        clock.pin_now(NOW)
        try:
            rank_sets = []
            for rep in range(2):
                sys_ = MemorySystem(tmp_path / f"rep{rep}")
                id_to_sym = {}
                for i in range(20):
                    mem = sys_.remember(
                        Experience(content=f"item {i}: database migration step {i % 5}"),
                        created_at=NOW,
                    )
                    id_to_sym[mem.id] = i
                ids = sys_.recall(Query(query_text="database migration steps")).ids
                rank_sets.append([id_to_sym[i] for i in ids])
                sys_.close()
            assert rank_sets[0] == rank_sets[1]
        finally:
            clock.pin_now(None)


class TestStress:
    def test_volume_ingest_and_recall(self, tmp_path):
        sys_ = MemorySystem(tmp_path / "m")
        t0 = time.perf_counter()
        for i in range(300):
            sys_.remember(Experience(content=f"stress item {i} topic{i % 17} detail {i*7 % 31}"))
        ingest_s = time.perf_counter() - t0
        assert sys_.stats().total_memories == 300
        t0 = time.perf_counter()
        res = sys_.recall(Query(query_text="stress topic3 detail"))
        recall_ms = (time.perf_counter() - t0) * 1000
        assert res.ids
        # SLA sanity (loose CI bounds; reference cores: store 55-60ms, recall 34-58ms)
        assert ingest_s / 300 < 0.25, f"ingest too slow: {ingest_s/300*1000:.0f}ms/item"
        assert recall_ms < 500, f"recall too slow: {recall_ms:.0f}ms"
        sys_.close()

    def test_concurrent_recall_threads(self, tmp_path):
        sys_ = MemorySystem(tmp_path / "m")
        for i in range(50):
            sys_.remember(Experience(content=f"concurrent item {i} about caching"))

        def worker(_):
            return sys_.recall(Query(query_text="caching items")).ids

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            results = list(ex.map(worker, range(16)))
        assert all(r == results[0] for r in results)
        sys_.close()

    def test_storage_edge_cases(self, tmp_path):
        sys_ = MemorySystem(tmp_path / "m")
        # unicode, emoji, long content, odd whitespace
        weird = [
            "emoji memo 🚀🔥 with symbols ©®",
            "ünïcödé cöntent with ümläüts",
            "x" * 50_000,
            "tabs\tand\nnewlines\r\nmixed",
            "日本語のメモリー内容",
        ]
        ids = [sys_.remember(Experience(content=c)).id for c in weird]
        for mid, content in zip(ids, weird):
            assert sys_.get(mid).experience.content == content
        sys_.close()


class TestValidation:
    def test_content_required(self):
        with pytest.raises(ValidationError):
            validate_experience_payload({"content": ""})

    def test_content_cap(self):
        with pytest.raises(ValidationError):
            validate_experience_payload({"content": "x" * 200_000})

    def test_geo_range(self):
        with pytest.raises(ValidationError):
            validate_experience_payload({"content": "ok", "geo_location": [999, 0, 0]})

    def test_query_caps(self):
        with pytest.raises(ValidationError):
            validate_query_payload({"query": "q" * 10_000})
        with pytest.raises(ValidationError):
            validate_query_payload({"query": "ok", "max_results": 0})

    def test_batch_cap(self):
        with pytest.raises(ValidationError):
            validate_batch([{"content": "x"}] * 501)
        assert validate_batch([{"content": "x"}]) == [{"content": "x"}]


class TestRateLimit:
    def test_token_bucket(self):
        from shodh_tpu.server.app import TokenBucket

        b = TokenBucket(rate_per_sec=1.0, burst=3.0)
        assert all(b.allow("ip") for _ in range(3))
        assert not b.allow("ip")
        assert b.allow("other-ip")  # per-IP isolation
