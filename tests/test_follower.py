"""Read-replica follower (engine/follower.py): catch-up, parity, isolation.

Config-5 serving architecture: a writer process ingests at full rate while
followers serve recalls over the same data_dir (sqlite WAL one-writer /
many-readers). These tests run writer+follower in ONE process — two
MemorySystem instances over one store — which exercises the identical
storage protocol the cross-process benchmark uses."""

import pytest

from shodh_tpu.engine.follower import FollowerReader
from shodh_tpu.engine.memory_system import MemorySystem
from shodh_tpu.types import Experience, ExperienceType, Query


@pytest.fixture()
def writer(tmp_path):
    w = MemorySystem(tmp_path / "store")
    yield w
    w.close()


def _ingest(writer, texts, **kw):
    return writer.batch_remember([Experience(content=t, **kw) for t in texts])


class TestCatchUp:
    def test_follower_sees_new_memories_after_refresh(self, writer, tmp_path):
        _ingest(writer, [f"bootstrap note {i} about topic{i % 3}" for i in range(12)])
        writer.flush()
        f = FollowerReader(tmp_path / "store")
        assert f.lag() == 0
        r = f.recall(Query(query_text="bootstrap topic1", max_results=5))
        assert r.ids  # serves the bootstrap corpus

        mems = _ingest(writer, ["the reactor scram drill finished ahead of schedule"])
        writer.flush()
        assert f.lag() == 1
        applied = f.refresh()
        assert applied == 1 and f.lag() == 0
        r = f.recall(Query(query_text="reactor scram drill", max_results=3))
        assert r.ids and r.ids[0] == mems[0].id

    def test_row_alignment_matches_writer(self, writer, tmp_path):
        _ingest(writer, [f"row alignment case {i}" for i in range(9)])
        writer.flush()
        f = FollowerReader(tmp_path / "store")
        _ingest(writer, ["alignment addendum entry"])
        writer.flush()
        f.refresh()
        # every memory's writer-assigned rows resolve identically via the
        # follower's local index length (replay order == append order)
        assert len(f.system.index) == len(writer.index)
        for mem in writer.storage.iter_memories():
            rows = writer.storage.get_vector_map(mem.id).get("text", [])
            assert all(r < len(f.system.index) for r in rows)

    def test_ranking_parity_with_writer(self, writer, tmp_path, monkeypatch):
        monkeypatch.setenv("SHODH_RECALL_READONLY", "1")  # freeze writer state too
        _ingest(
            writer,
            [
                "Melanie: pottery painting with the kids was lovely",
                "Caroline: adopted a rescue dog named Biscuit",
                "the deployment finished after the freeze lifted",
                "flights booked through Porto with a layover",
            ],
            tags=["conv-9"],
        )
        writer.flush()
        f = FollowerReader(tmp_path / "store")
        for qt in ("pottery painting kids", "rescue dog adopted", "deployment freeze"):
            a = writer.recall(Query(query_text=qt, max_results=4))
            b = f.recall(Query(query_text=qt, max_results=4))
            assert a.ids == b.ids, qt

    def test_follower_never_writes_usage(self, writer, tmp_path):
        mems = _ingest(writer, ["usage isolation probe entry"])
        writer.flush()
        f = FollowerReader(tmp_path / "store")
        before = writer.storage.get(mems[0].id).access_count
        f.recall(Query(query_text="usage isolation probe", max_results=1))
        f.recall(Query(query_text="usage isolation probe", max_results=1))
        # the writer's durable record is untouched by follower recalls
        raw = writer.storage.kv.get("mem", mems[0].id)
        import shodh_tpu.storage.serialization as ser

        assert ser.decode(raw)["access_count"] == before

    def test_deleted_memory_tolerated(self, writer, tmp_path):
        mems = _ingest(writer, ["ephemeral entry to delete", "durable sibling entry"])
        writer.flush()
        writer.forget(mems[0].id)
        writer.flush()
        f = FollowerReader(tmp_path / "store")
        r = f.recall(Query(query_text="ephemeral entry", max_results=3))
        assert mems[0].id not in r.ids

    def test_forward_context_tail_reload(self, writer, tmp_path):
        from shodh_tpu.types import ExperienceType

        _ingest(
            writer,
            ["Ana: something odd happened at the site yesterday"],
            experience_type=ExperienceType.CONVERSATION,
            tags=["conv-z"],
        )
        writer.flush()
        f = FollowerReader(tmp_path / "store")
        # successor turn folds its terms into the predecessor's BM25 doc
        _ingest(
            writer,
            ["Ana: it was a wildcat wandering the turbine hall"],
            experience_type=ExperienceType.CONVERSATION,
            tags=["conv-z"],
        )
        writer.flush()
        f.refresh()
        r = f.recall(Query(query_text="wildcat turbine", max_results=2))
        assert len(r.ids) == 2  # predecessor found via reloaded fwd-context doc


class TestWriterBulkRederivations:
    """Bulk row remaps (lexical migration, rebuild, compaction) rewrite the
    shared row maps with NO seq entries — the follower must notice via the
    generation pair (lexical_fp, index_epoch) and row-align resync instead
    of serving stale mappings."""

    def test_follower_resyncs_after_writer_rebuild(self, writer, tmp_path):
        _ingest(writer, [f"pre-rebuild record {i} about system{i % 4}" for i in range(8)])
        writer.flush()
        f = FollowerReader(tmp_path / "store")
        want = f.recall(Query(query_text="pre-rebuild system2", max_results=3)).ids

        writer.rebuild_index()  # bulk remap, no seq entries
        writer.flush()
        assert f.refresh() == 1  # generation change detected -> resync
        got = f.recall(Query(query_text="pre-rebuild system2", max_results=3))
        assert got.ids == want
        # and the mapping is genuinely row-aligned, not accidentally right:
        for sm in got.memories:
            rows = writer.storage.get_vector_map(sm.memory.id).get("text", [])
            assert all(f.system.index.row_active(r) for r in rows)

    def test_follower_resyncs_after_writer_lexical_migration(self, writer, tmp_path):
        _ingest(writer, ["the greenhouse sensors went offline at dawn",
                         "irrigation resumed after the valve replacement"])
        writer.flush()
        f = FollowerReader(tmp_path / "store")
        base = f.recall(Query(query_text="greenhouse sensors offline", max_results=1))
        assert base.memories

        writer.migrate_lexical()  # rows move via delete+add; postings rewritten
        writer.flush()
        f.refresh()
        got = f.recall(Query(query_text="greenhouse sensors offline", max_results=1))
        assert got.ids == base.ids

    def test_generation_does_not_advance_on_bailed_resync(self, writer, tmp_path, monkeypatch):
        _ingest(writer, ["record alpha", "record beta"])
        writer.flush()
        f = FollowerReader(tmp_path / "store")
        writer.rebuild_index()
        writer.flush()
        monkeypatch.setattr(FollowerReader, "resync", lambda self: False)
        f.refresh()
        monkeypatch.undo()
        assert f.refresh() == 1  # retried and succeeded this time
        assert f.recall(Query(query_text="record alpha", max_results=1)).memories


    def test_forward_context_reaches_follower_after_resync(self, writer, tmp_path):
        """After a generation-triggered resync the follower must re-seed its
        per-tag tail map: a stale tail makes later refreshes reload the
        WRONG 'old tail' doc and permanently miss the writer's forward-
        context fold into the true tail."""
        _ingest(writer, ["turn one about the reactor", "turn two about coolant"],
                experience_type=ExperienceType.CONVERSATION, tags=["ops"])
        writer.flush()
        f = FollowerReader(tmp_path / "store")
        # writer advances the tail, then bulk-rebuilds (no seq entries)
        (c,) = _ingest(writer, ["turn three mentions the wildcat turbine"],
                       experience_type=ExperienceType.CONVERSATION, tags=["ops"])
        writer.flush()
        writer.rebuild_index()
        writer.flush()
        assert f.refresh() == 1  # generation resync
        # now turn four folds its terms forward into turn THREE's doc
        _ingest(writer, ["turn four says the turbine bearing glowed crimson"],
                experience_type=ExperienceType.CONVERSATION, tags=["ops"])
        writer.flush()
        f.refresh()
        w = writer.recall(Query(query_text="crimson bearing turbine", max_results=2))
        r = f.recall(Query(query_text="crimson bearing turbine", max_results=2))
        assert r.ids == w.ids  # turn three surfaces via the fwd-context fold
        assert c.id in r.ids
