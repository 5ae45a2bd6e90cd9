"""Todos, sessions, file memory, relevance, segmentation, backup tests."""

from datetime import datetime, timedelta, timezone

import pytest

from shodh_tpu.engine.files import FileMemoryStore
from shodh_tpu.engine.sessions import SessionStore
from shodh_tpu.engine.todos import TodoStore
from shodh_tpu.models.hash_embedder import HashEmbedder
from shodh_tpu.nlp.segmentation import classify_sentence, segment_content
from shodh_tpu.storage.kv import KvStore

NOW = datetime(2025, 7, 1, 12, 0, tzinfo=timezone.utc)


@pytest.fixture()
def kv(tmp_path):
    store = KvStore(tmp_path / "kv.db")
    yield store
    store.close()


class TestTodos:
    def test_crud_and_list(self, kv):
        ts = TodoStore(kv)
        t = ts.add("write the report", NOW, priority="high")
        assert ts.get(t.id).title == "write the report"
        todos = ts.list()
        assert len(todos) == 1
        assert ts.delete(t.id)
        assert ts.list() == []

    def test_complete_and_recurrence(self, kv):
        ts = TodoStore(kv)
        t = ts.add("water plants", NOW, recurrence="weekly", due=NOW + timedelta(days=1))
        done = ts.complete(t.id, NOW)
        assert done.status == "done"
        open_todos = ts.list()
        assert len(open_todos) == 1  # recurrence spawned the next one
        assert open_todos[0].due == NOW + timedelta(days=8)

    def test_due_and_subtasks(self, kv):
        ts = TodoStore(kv)
        a = ts.add("parent task", NOW, due=NOW - timedelta(hours=1))
        ts.add("child task", NOW, parent_id=a.id)
        assert [t.id for t in ts.due_before(NOW)] == [a.id]
        assert len(ts.subtasks(a.id)) == 1

    def test_comments_and_reorder(self, kv):
        ts = TodoStore(kv)
        a = ts.add("a", NOW)
        b = ts.add("b", NOW + timedelta(seconds=1))
        ts.comment(a.id, "first note", NOW)
        assert ts.get(a.id).comments[0].text == "first note"
        ts.reorder(a.id, b.order + 1)
        assert [t.title for t in ts.list()] == ["b", "a"]

    def test_embedding_search(self, kv):
        ts = TodoStore(kv, HashEmbedder())
        ts.add("upgrade the kubernetes cluster", NOW)
        ts.add("buy milk and eggs", NOW)
        hits = ts.search("kubernetes upgrade")
        assert hits[0][0].title == "upgrade the kubernetes cluster"

    def test_projects(self, kv):
        ts = TodoStore(kv)
        p = ts.add_project("Infra", NOW)
        ts.add("migrate DNS", NOW, project_id=p.id)
        assert len(ts.list(project_id=p.id)) == 1
        assert ts.list_projects()[0].name == "Infra"
        assert ts.delete_project(p.id)

    def test_stats(self, kv):
        ts = TodoStore(kv)
        ts.add("x", NOW)
        t = ts.add("y", NOW)
        ts.complete(t.id, NOW)
        st = ts.stats()
        assert st["total"] == 2 and st["by_status"]["done"] == 1


class TestSessions:
    def test_gap_based_segmentation(self, kv):
        ss = SessionStore(kv, gap_secs=1800)
        s1 = ss.track("m1", NOW)
        s2 = ss.track("m2", NOW + timedelta(minutes=5))
        assert s1.id == s2.id
        s3 = ss.track("m3", NOW + timedelta(hours=2))
        assert s3.id != s1.id
        # previous session auto-ended
        assert ss.get(s1.id).ended

    def test_history_and_stats(self, kv):
        ss = SessionStore(kv)
        ss.track("m1", NOW)
        ss.end(NOW)
        ss.track("m2", NOW + timedelta(hours=3))
        hist = ss.history()
        assert len(hist) == 2
        st = ss.stats()
        assert st["sessions"] == 2 and st["memories_tracked"] == 2


class TestFileMemory:
    def test_learn_and_search(self, kv):
        fs = FileMemoryStore(kv, HashEmbedder())
        fs.learn("src/auth.py", "handles OAuth token refresh; fragile retry logic", NOW)
        fs.learn("src/db.py", "sqlalchemy session management", NOW)
        hits = fs.search("oauth token handling")
        assert hits[0][0].path == "src/auth.py"
        assert fs.get("src/auth.py").language == "python"
        st = fs.stats()
        assert st["files"] == 2

    def test_forget(self, kv):
        fs = FileMemoryStore(kv)
        fs.learn("a.rs", "note", NOW)
        assert fs.forget("a.rs")
        assert fs.get("a.rs") is None


class TestSegmentation:
    def test_classify(self):
        assert classify_sentence("We decided to use sqlite.") == "decision"
        assert classify_sentence("The deploy failed with a timeout error.") == "error"
        assert classify_sentence("I learned that WAL mode helps.") == "learning"
        assert classify_sentence("The sky is blue.") == "observation"

    def test_segment_multi_topic(self):
        text = (
            "We decided to use sqlite for storage. We also chose WAL mode for it. "
            "The first deploy failed with a permissions error. "
            "Need to add a migration script for the old data."
        )
        segs = segment_content(text)
        types = [s.segment_type for s in segs]
        assert "decision" in types and "error" in types and "task" in types
        # adjacent same-type sentences merged
        assert types.count("decision") == 1

    def test_short_content_single_segment(self):
        segs = segment_content("just one thought")
        assert len(segs) == 1


class TestRelevance:
    def test_proactive_context(self, tmp_path):
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.engine.relevance import RelevanceEngine, WorkingContext
        from shodh_tpu.types import Experience, ExperienceType

        sys_ = MemorySystem(tmp_path / "m")
        target = sys_.remember(
            Experience(
                content="decided to pin the redis client to v4 because v5 breaks pipelining",
                experience_type=ExperienceType.DECISION,
                entities=["redis client"],
            )
        )
        sys_.remember(Experience(content="lunch plans for friday"))
        eng = RelevanceEngine(sys_)
        hits = eng.proactive_context(
            WorkingContext(text="upgrading the redis client", entities=["redis client"])
        )
        assert hits[0][0] == target.id
        # suppression pushes it down
        eng.suppress(target.id)
        hits2 = eng.proactive_context(
            WorkingContext(text="upgrading the redis client", entities=["redis client"])
        )
        assert hits2[0][1] < hits[0][1]
        sys_.close()


class TestBackup:
    def test_backup_verify_restore_purge(self, tmp_path):
        from shodh_tpu.storage.backup import (
            create_backup,
            list_backups,
            purge_backups,
            restore_backup,
            verify_backup,
        )

        data = tmp_path / "data"
        data.mkdir()
        (data / "file.db").write_bytes(b"payload-1")
        b1 = create_backup(data, tmp_path / "backups")
        assert verify_backup(b1)
        (data / "file.db").write_bytes(b"payload-2")
        b2 = create_backup(data, tmp_path / "backups")
        assert len(list_backups(tmp_path / "backups")) == 2
        restore_backup(b1, data)
        assert (data / "file.db").read_bytes() == b"payload-1"
        assert purge_backups(tmp_path / "backups", keep=1) == 1
        # corruption detected
        import pathlib

        (pathlib.Path(b2) / "file.db").write_bytes(b"tampered")
        assert not verify_backup(b2)

    def test_live_backup_captures_unckeckpointed_commits(self, tmp_path):
        # A WAL-mode store with commits still in the -wal file (PASSIVE
        # checkpoints don't drain it under readers): a plain file copy of
        # memories.db would miss them; the sqlite online-backup snapshot
        # must not. The open reader connection pins the WAL like a live
        # follower replica would.
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.storage.backup import create_backup, restore_backup, verify_backup
        from shodh_tpu.types import Experience, Query

        data = tmp_path / "data"
        s = MemorySystem(data)
        s.remember(Experience(content="pre-backup durable record about gardening"))
        import sqlite3

        reader = sqlite3.connect(data / "memories.db")
        reader.execute("BEGIN")
        reader.execute("SELECT 1").fetchone()
        try:
            s.remember(Experience(content="wal-resident record about carpentry"))
            backup = create_backup(data, tmp_path / "backups")
            assert verify_backup(backup)
        finally:
            reader.close()
        s.close()

        restored = tmp_path / "restored"
        restore_backup(backup, restored)
        r = MemorySystem(restored)
        try:
            assert r.stats().total_memories == 2
            hits = r.recall(Query(query_text="carpentry record", max_results=1))
            assert "carpentry" in hits.memories[0].memory.experience.content
        finally:
            r.close()
