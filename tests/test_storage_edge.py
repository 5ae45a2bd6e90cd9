"""Storage edge cases (reference: tests/storage_edge_case_tests.rs):
corruption, oversized records, unicode keys, crash-reopen, index
consistency after churn."""

import pytest

from shodh_tpu.engine.memory_system import MemorySystem
from shodh_tpu.storage.kv import KvStore
from shodh_tpu.storage.serialization import CorruptRecordError, decode, encode
from shodh_tpu.storage.store import MemoryStorage, SearchCriteria
from shodh_tpu.types import Experience, Query


class TestCorruption:
    def test_oversized_record_rejected(self):
        # 10 MB decode cap guards against corrupted length prefixes
        # (reference lib.rs:61-71 bincode_safe_config)
        big = {"blob": b"x" * (11 * 1024 * 1024)}
        blob = encode(big)
        with pytest.raises(CorruptRecordError, match="limit|large"):
            decode(blob)

    def test_corrupted_memory_record_skipped_on_scan(self, tmp_path):
        system = MemorySystem(tmp_path / "s")
        mem = system.remember(Experience(content="healthy record"))
        store = system.storage
        # plant a corrupted record next to it (same namespace, garbage bytes)
        store.kv.put("mem", "zz-corrupt", b"\x00garbage")
        # get on the corrupt record must not raise, must return None
        assert store.get("zz-corrupt") is None
        # healthy record unaffected; recall path tolerates the garbage row
        assert store.get(mem.id) is not None
        res = system.recall(Query(query_text="healthy record", max_results=3))
        assert mem.id in res.ids
        system.close()

    def test_created_date_accessor(self, tmp_path):
        """created_date: matches the record, caches across evictions, and
        invalidates on delete (the enum-day-union bucket reader)."""
        system = MemorySystem(tmp_path / "cd")
        mem = system.remember(Experience(content="dated record"))
        store = system.storage
        want = store.get(mem.id).created_at.date()
        assert store.created_date(mem.id) == want
        # evict from the main LRU; the date cache (or kv fallback) serves
        with store._cache_lock:
            store._cache.clear()
        assert store.created_date(mem.id) == want
        assert store.created_date("no-such-id") is None
        store.delete(mem.id)
        assert store.created_date(mem.id) is None
        system.close()

    def test_unicode_and_hostile_content(self, tmp_path):
        system = MemorySystem(tmp_path / "u")
        hostile = [
            "emoji storm \U0001f600\U0001f680\U0001f9e0 and éèê accents",
            "zero\x00byte and \t tabs \n newlines",
            "ー日本語のメモリーコンテンツー",
            "a" * 9000,  # near the validation cap
            "'; DROP TABLE memories; --",
        ]
        for c in hostile:
            system.remember(Experience(content=c))
        assert system.storage.count() == len(hostile)
        res = system.recall(Query(query_text="日本語", max_results=3))
        assert len(res.ids) >= 1
        system.close()


class TestReopen:
    def test_state_survives_close_reopen(self, tmp_path):
        d = tmp_path / "r"
        s1 = MemorySystem(d)
        ids = [s1.remember(Experience(content=f"durable fact {i} about reopen")).id for i in range(5)]
        s1.forget(ids[0])
        s1.close()

        s2 = MemorySystem(d)
        assert s2.storage.count() == 4
        assert s2.get(ids[0]) is None
        res = s2.recall(Query(query_text="durable fact reopen", max_results=5))
        assert set(res.ids) <= set(ids[1:])
        assert len(res.ids) >= 1
        s2.close()

    def test_reopen_without_save_rebuilds_consistently(self, tmp_path):
        # simulate a crash: write memories, do NOT call close/save, reopen
        d = tmp_path / "crash"
        s1 = MemorySystem(d)
        mid = s1.remember(Experience(content="unsynced write before crash")).id
        # drop the handle without s1.close() — sqlite WAL must still hold it
        del s1

        s2 = MemorySystem(d)
        assert s2.get(mid) is not None
        res = s2.recall(Query(query_text="unsynced write crash", max_results=3))
        assert mid in res.ids
        s2.close()


class TestIndexConsistencyUnderChurn:
    def test_delete_heavy_churn_then_compact(self, tmp_path):
        system = MemorySystem(tmp_path / "churn")
        ids = [
            system.remember(Experience(content=f"churn item {i} in group {i % 3}")).id
            for i in range(60)
        ]
        for mid in ids[:40]:
            assert system.forget(mid)
        # force compaction (30% deleted threshold long passed). Compaction
        # remaps rows, so storage MUST be remapped in the same step — the
        # engine's maintenance path does exactly this (run_maintenance §7);
        # skipping it leaves storage row-maps stale and every row-indexed
        # consumer (vector leg, device funnel) silently resolves deleted
        # memories.
        mapping = system.index.maybe_compact()
        if mapping is not None:
            system.storage.remap_rows(mapping, epoch=system.index.epoch)
        res = system.recall(Query(query_text="churn item group", max_results=20))
        assert set(res.ids) <= set(ids[40:])
        assert len(res.ids) > 0
        # row mapping still bijective
        for mid in ids[40:]:
            vm = system.storage.get_vector_map(mid)
            for row in vm.get("text", []):
                assert system.storage.memory_for_row(row) == mid
        system.close()


class TestKvEdges:
    def test_empty_and_long_keys(self, tmp_path):
        kv = KvStore(tmp_path / "k.db")
        kv.put("ns", "", b"empty-key")
        assert kv.get("ns", "") == b"empty-key"
        long_key = "k" * 2000
        kv.put("ns", long_key, b"long")
        assert kv.get("ns", long_key) == b"long"
        kv.close()

    def test_value_overwrite_and_idempotent_delete(self, tmp_path):
        kv = KvStore(tmp_path / "k2.db")
        kv.put("ns", "x", b"1")
        kv.put("ns", "x", b"2")
        assert kv.get("ns", "x") == b"2"
        kv.delete("ns", "x")
        kv.delete("ns", "x")  # second delete is a no-op, not an error
        assert kv.get("ns", "x") is None
        kv.close()

    def test_geo_criteria_on_empty_store(self, tmp_path):
        store = MemoryStorage(tmp_path / "g")
        assert store.search(SearchCriteria(geo=(37.0, -122.0, 500.0), limit=10)) == []
        store.close()


class TestSerializationFuzz:
    """The codec's contract: corruption RAISES CorruptRecordError — never a
    hang, a crash, or silently deserialized garbage (serialization.rs:1-12
    frame-and-checksum contract)."""

    def test_every_single_bitflip_raises(self):
        # crc32 is linear: any single-bit payload flip changes the checksum,
        # and header flips break magic/version/crc — so EVERY position must
        # raise, exhaustively
        rec = encode({"id": "x", "content": "fuzz target", "n": 7, "v": [1.5, 2.5]})
        for byte in range(len(rec)):
            for bit in range(8):
                mutated = bytearray(rec)
                mutated[byte] ^= 1 << bit
                with pytest.raises(CorruptRecordError):
                    decode(bytes(mutated))

    def test_every_truncation_raises(self):
        rec = encode({"k": "truncation target", "list": list(range(50))})
        for cut in range(len(rec)):
            with pytest.raises(CorruptRecordError):
                decode(rec[:cut])

    def test_random_garbage_never_crashes(self):
        import random

        rng = random.Random(0xC0FFEE)
        for _ in range(300):
            blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 256)))
            with pytest.raises(CorruptRecordError):
                decode(blob)

    def test_roundtrip_property(self):
        import random

        rng = random.Random(1234)

        def gen(depth=0):
            kind = rng.randrange(6 if depth < 3 else 4)
            if kind == 0:
                return rng.randrange(-(2**40), 2**40)
            if kind == 1:
                return rng.random() * 10**rng.randrange(-3, 6)
            if kind == 2:
                return "".join(chr(rng.randrange(32, 0x2FFF)) for _ in range(rng.randrange(20)))
            if kind == 3:
                return bytes(rng.randrange(256) for _ in range(rng.randrange(20)))
            if kind == 4:
                return [gen(depth + 1) for _ in range(rng.randrange(5))]
            return {f"k{i}": gen(depth + 1) for i in range(rng.randrange(5))}

        for _ in range(200):
            obj = {f"f{i}": gen() for i in range(rng.randrange(1, 6))}
            assert decode(encode(obj)) == obj


class TestRowMapCaches:
    """Round-5 vecmap/rowmap read-through caches: every writer mutation
    site must invalidate, and clear_caches() must restore always-fresh kv
    semantics for cross-process readers (follower replay batches)."""

    def test_set_vector_rows_updates_both_caches(self, tmp_path):
        store = MemoryStorage(tmp_path / "c1")
        store.set_vector_rows("m1", [0, 1])
        assert store.get_vector_map("m1")["text"] == [0, 1]
        assert store.memory_for_row(0) == "m1"
        # warm the caches, then remap the SAME memory to new rows
        store.set_vector_rows("m1", [5, 6])
        assert store.get_vector_map("m1")["text"] == [5, 6]
        assert store.memory_for_row(5) == "m1"
        # row 0 still maps in kv (set_vector_rows does not unmap old rows;
        # compaction does) — the cache must agree with kv, stale or not
        raw = store.kv.get("rowmap", "text:0")
        want = raw.decode() if raw else None
        assert store.memory_for_row(0) == want

    def test_remap_rows_clears_caches(self, tmp_path):
        store = MemoryStorage(tmp_path / "c2")
        from shodh_tpu.types import Experience, Memory
        from datetime import datetime, timezone

        mem = Memory(
            id="m1",
            experience=Experience(content="row remap cache probe"),
            created_at=datetime(2026, 1, 1, tzinfo=timezone.utc),
        )
        store.store(mem)
        store.set_vector_rows("m1", [7])
        assert store.memory_for_row(7) == "m1"  # cache warm
        assert store.get_vector_map("m1")["text"] == [7]
        store.remap_rows({7: 0}, epoch=1)
        assert store.memory_for_row(7) is None
        assert store.memory_for_row(0) == "m1"
        assert store.get_vector_map("m1")["text"] == [0]

    def test_delete_invalidates_vecmap(self, tmp_path):
        store = MemoryStorage(tmp_path / "c3")
        from shodh_tpu.types import Experience, Memory
        from datetime import datetime, timezone

        mem = Memory(
            id="m1",
            experience=Experience(content="delete cache probe"),
            created_at=datetime(2026, 1, 1, tzinfo=timezone.utc),
        )
        store.store(mem)
        store.set_vector_rows("m1", [3])
        assert store.get_vector_map("m1")["text"] == [3]  # cache warm
        store.delete("m1")
        assert store.get_vector_map("m1") == {}

    def test_clear_caches_restores_fresh_reads(self, tmp_path):
        store = MemoryStorage(tmp_path / "c4")
        store.set_vector_rows("m1", [2])
        assert store.memory_for_row(2) == "m1"  # cache warm
        # simulate ANOTHER process rewriting kv underneath (follower view)
        store.kv.put("rowmap", "text:2", b"m2")
        store.kv.put("vecmap", "m2", encode({"text": [2]}))
        assert store.memory_for_row(2) == "m1"  # cached (stale by design)
        store.clear_caches()
        assert store.memory_for_row(2) == "m2"  # fresh after batch clear
        assert store.get_vector_map("m2")["text"] == [2]

    def test_returned_vecmap_is_caller_safe(self, tmp_path):
        store = MemoryStorage(tmp_path / "c5")
        store.set_vector_rows("m1", [1])
        vm = store.get_vector_map("m1")
        vm["text"] = [999]  # caller-side mutation must not poison the cache
        assert store.get_vector_map("m1")["text"] == [1]
