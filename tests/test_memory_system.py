"""End-to-end MemorySystem tests: remember/recall/forget/filters/persistence."""

from datetime import datetime, timedelta, timezone

import pytest

from shodh_tpu.types import Experience, ExperienceType, LayerMode, Query
from shodh_tpu.engine.memory_system import MemorySystem


@pytest.fixture()
def system(tmp_path):
    sys_ = MemorySystem(tmp_path / "m")
    yield sys_
    sys_.close()


def _exp(content, **kw):
    return Experience(content=content, **kw)


class TestRemember:
    def test_store_and_get(self, system):
        mem = system.remember(_exp("We chose Rust for the backend because of memory safety."))
        assert system.get(mem.id) is not None
        assert mem.importance > 0.05
        assert mem.vector_row >= 0

    def test_content_hash_dedup(self, system):
        a = system.remember(_exp("identical content"))
        b = system.remember(_exp("identical content"))
        assert a.id == b.id
        assert b.access_count == 1  # reinforcement, not duplication
        assert system.stats().total_memories == 1

    def test_importance_by_type(self, system):
        d = system.remember(_exp("chose the database", experience_type=ExperienceType.DECISION))
        o = system.remember(_exp("saw the database", experience_type=ExperienceType.OBSERVATION))
        assert d.importance > o.importance

    def test_entities_extracted(self, system):
        mem = system.remember(_exp("Alice deployed the RocksDB migration for Acme Corp."))
        ents = [e.lower() for e in mem.experience.entities]
        assert any("alice" in e for e in ents)


class TestRecall:
    def test_semantic_recall_ranks_relevant_first(self, system):
        target = system.remember(
            _exp("We chose Rust for the backend because of memory safety and latency.")
        )
        system.remember(_exp("The marketing report for Q3 shipped two weeks late."))
        system.remember(_exp("Lunch options near the office are terrible on Mondays."))
        res = system.recall(Query(query_text="Why did we pick Rust for the backend?"))
        assert res.ids[0] == target.id
        assert res.memories[0].score > 0

    def test_layer_ladder_vector_only(self, system):
        system.remember(_exp("Rust backend memory safety"))
        res = system.recall(
            Query(query_text="rust backend", layers=LayerMode.VECTOR_ONLY)
        )
        assert len(res.ids) == 1

    def test_filters_experience_type(self, system):
        system.remember(_exp("picked sqlite over rocksdb", experience_type=ExperienceType.DECISION))
        system.remember(_exp("sqlite crashed on startup", experience_type=ExperienceType.ERROR))
        res = system.recall(
            Query(query_text="sqlite", experience_types=[ExperienceType.ERROR])
        )
        assert len(res.ids) == 1
        assert system.get(res.ids[0]).experience.experience_type == ExperienceType.ERROR

    def test_tag_filter(self, system):
        system.remember(_exp("alpha release notes", tags=["release"]))
        system.remember(_exp("alpha test plan", tags=["testing"]))
        res = system.recall(Query(query_text="alpha", tags=["release"]))
        assert len(res.ids) == 1

    def test_time_range_filter(self, system):
        now = datetime.now(timezone.utc)
        old = system.remember(_exp("old deployment event"), created_at=now - timedelta(days=30))
        new = system.remember(_exp("new deployment event"), created_at=now)
        res = system.recall(
            Query(
                query_text="deployment event",
                time_range=(now - timedelta(days=2), now + timedelta(days=1)),
            )
        )
        assert res.ids == [new.id]

    def test_recency_affects_ranking(self, system):
        now = datetime.now(timezone.utc)
        old = system.remember(
            _exp("database migration details here"), created_at=now - timedelta(days=60)
        )
        fresh = system.remember(_exp("database migration details now"), created_at=now)
        res = system.recall(Query(query_text="database migration details"))
        assert set(res.ids[:2]) == {old.id, fresh.id}
        assert res.ids[0] == fresh.id  # recency boost wins on equal relevance

    def test_offset_pagination(self, system):
        for i in range(5):
            system.remember(_exp(f"pagination item number {i} about databases"))
        r1 = system.recall(Query(query_text="pagination databases", max_results=2))
        r2 = system.recall(Query(query_text="pagination databases", max_results=2, offset=2))
        assert set(r1.ids).isdisjoint(r2.ids)

    def test_usage_writes_and_readonly(self, system, monkeypatch):
        mem = system.remember(_exp("usage tracking memo"))
        system.recall(Query(query_text="usage tracking memo"))
        assert system.get(mem.id).access_count == 1
        monkeypatch.setenv("SHODH_RECALL_READONLY", "1")
        system.recall(Query(query_text="usage tracking memo"))
        assert system.get(mem.id).access_count == 1

    def test_empty_query_lists_recent(self, system):
        system.remember(_exp("just an item"))
        res = system.recall(Query(max_results=10))
        assert len(res.ids) == 1


class TestGeoInjection:
    """L0.45/L4.46: in-radius memories join semantic recall additively at
    GEO_INJECT_FLOOR (reference mod.rs:4292-4305) and survive truncation via
    the high-water mark (mod.rs:4682-4700)."""

    @staticmethod
    def _saturated_corpus(system):
        """A pool the in-radius memory can't reach through the normal legs:
        with max_results=3 the vector leg pools k*3=9 candidates, all taken
        by fillers sharing the query's terms; the geo memory shares none."""
        from shodh_tpu.types import GeoFilter

        near = system.remember(
            _exp("battery swap completed", geo_location=(37.7749, -122.4194, 0.0))
        )
        far = system.remember(
            _exp("battery swap elsewhere", geo_location=(40.7128, -74.0060, 0.0))
        )
        for i in range(30):
            system.remember(
                _exp(f"database migration step {i} ran clean on replica {i % 4}")
            )
        gf = GeoFilter(lat=37.7750, lon=-122.4195, radius_m=500)
        return near, far, gf

    def test_in_radius_injected_even_when_textually_silent(self, system):
        near, far, gf = self._saturated_corpus(system)
        res = system.recall(
            Query(query_text="database migration", max_results=3, geo_filter=gf)
        )
        # fillers (no geo_location) fail the hard predicate; the near memory
        # can't reach the pool semantically, so ONLY the L4.46 injection can
        # recover it — the hard predicate "can only shrink, never recover"
        assert near.id in res.ids
        assert far.id not in res.ids

    def test_injection_respects_disable_family(self, system, monkeypatch):
        near, _far, gf = self._saturated_corpus(system)
        monkeypatch.setenv("SHODH_DISABLE_BOOSTS", "geo")
        res = system.recall(
            Query(query_text="database migration", max_results=3, geo_filter=gf)
        )
        assert near.id not in res.ids

    def test_injected_floor_ranks_below_semantic_hits(self, system):
        from shodh_tpu.types import GeoFilter

        silent = system.remember(
            _exp("sensor recalibrated at dock", geo_location=(37.7749, -122.4194, 0.0))
        )
        top = system.remember(
            _exp(
                "incident review: the deploy rollback plan",
                geo_location=(37.7751, -122.4196, 0.0),
            )
        )
        res = system.recall(
            Query(
                query_text="deploy rollback plan",
                max_results=5,
                geo_filter=GeoFilter(lat=37.7750, lon=-122.4195, radius_m=500),
            )
        )
        assert res.ids[0] == top.id
        assert silent.id in res.ids


class TestRoboticsModes:
    def test_spatial_recall(self, system):
        from shodh_tpu.types import GeoFilter, RetrievalMode

        near = system.remember(
            _exp("obstacle at dock A", geo_location=(37.7749, -122.4194, 0.0))
        )
        system.remember(
            _exp("obstacle at warehouse B", geo_location=(40.7128, -74.0060, 0.0))
        )
        res = system.recall(
            Query(
                retrieval_mode=RetrievalMode.SPATIAL,
                geo_filter=GeoFilter(lat=37.7750, lon=-122.4195, radius_m=500),
            )
        )
        assert res.ids == [near.id]

    def test_mission_filter(self, system):
        from shodh_tpu.types import RetrievalMode

        m1 = system.remember(_exp("waypoint reached", mission_id="m-1"))
        system.remember(_exp("waypoint reached again", mission_id="m-2"))
        res = system.recall(Query(retrieval_mode=RetrievalMode.MISSION, mission_id="m-1"))
        assert res.ids == [m1.id]

    def test_reward_range(self, system):
        from shodh_tpu.types import RetrievalMode

        good = system.remember(_exp("grasp succeeded", reward=0.9))
        system.remember(_exp("grasp failed", reward=-0.5))
        res = system.recall(
            Query(retrieval_mode=RetrievalMode.ACTION_OUTCOME, reward_range=(0.5, 1.0))
        )
        assert res.ids == [good.id]


class TestLifecycle:
    def test_forget(self, system):
        mem = system.remember(_exp("to be forgotten"))
        assert system.forget(mem.id)
        assert system.get(mem.id) is None
        res = system.recall(Query(query_text="to be forgotten"))
        assert mem.id not in res.ids

    def test_upsert(self, system):
        a = system.remember(_exp("version one of the note"))
        b = system.upsert(_exp("version two of the note"), memory_id=a.id)
        assert system.get(a.id) is None
        assert system.get(b.id).experience.content == "version two of the note"

    def test_reinforce(self, system):
        mem = system.remember(_exp("reinforcement target"))
        imp0 = mem.importance
        system.reinforce_recall([mem.id], helpful=True)
        assert system.get(mem.id).importance > imp0
        system.reinforce_recall([mem.id], helpful=False)
        assert system.get(mem.id).importance < imp0 + 0.05

    def test_persistence_roundtrip(self, tmp_path):
        s1 = MemorySystem(tmp_path / "p")
        mem = s1.remember(_exp("durable memory about kubernetes upgrades"))
        s1.close()
        s2 = MemorySystem(tmp_path / "p")
        res = s2.recall(Query(query_text="kubernetes upgrades"))
        assert res.ids[0] == mem.id
        s2.close()

    def test_maintenance_runs(self, system):
        system.remember(_exp("maintenance subject", experience_type=ExperienceType.DECISION))
        report = system.run_maintenance()
        assert "promoted" in report and "decayed" in report

    def test_stats(self, system):
        system.remember(_exp("stat one"))
        st = system.stats()
        assert st.total_memories == 1
        assert st.index_rows == 1


class TestLayerLadder:
    def test_ladder_gates_stages(self, system):
        """Each LayerMode step enables strictly more machinery (diagnostics
        prove the gates fire) — the reference's ablation attribution."""
        system.remember(_exp("Alice uses Kafka for the event bus", entities=["Alice", "Kafka"]))
        system.remember(_exp("Kafka consumer lag fixed by rebalance", entities=["Kafka"]))
        q = "how does alice handle events with kafka"
        res_vec = system.recall_with_diagnostics(
            Query(query_text=q, layers=LayerMode.VECTOR_ONLY)
        )
        assert res_vec.diagnostics["bm25_candidates"] == 0
        assert res_vec.diagnostics["graph_candidates"] == 0
        res_spread = system.recall_with_diagnostics(
            Query(query_text=q, layers=LayerMode.PLUS_SPREADING)
        )
        assert res_spread.diagnostics["graph_candidates"] > 0
        assert res_spread.diagnostics["bm25_candidates"] == 0
        res_full = system.recall_with_diagnostics(Query(query_text=q, layers=LayerMode.FULL))
        assert res_full.diagnostics["bm25_candidates"] > 0
        assert res_full.diagnostics["graph_candidates"] > 0


class TestCliEvalContract:
    def test_eval_exit_codes(self, tmp_path, capsys):
        """cli eval returns 0 on pass and 1 on baseline regression."""
        import json

        from shodh_tpu.cli import main

        # a baseline the current engine beats easily
        easy = tmp_path / "easy.json"
        easy.write_text(json.dumps({"layers": {"full": {"recall@10": 0.1, "p@1": 0.1}}}))
        rc = main([
            "eval", "--corpus", "tests/recall/corpora/shodh-smoke.jsonl",
            "--cases", "tests/recall/smoke_cases.jsonl",
            "--eval-now", "2026-05-01T00:00:00Z",
            "--baseline", str(easy),
        ])
        assert rc == 0
        # an impossible baseline forces the regression exit code
        hard = tmp_path / "hard.json"
        hard.write_text(json.dumps({"layers": {"full": {"recall@10": 1.5}}}))
        rc = main([
            "eval", "--corpus", "tests/recall/corpora/shodh-smoke.jsonl",
            "--cases", "tests/recall/smoke_cases.jsonl",
            "--eval-now", "2026-05-01T00:00:00Z",
            "--baseline", str(hard),
        ])
        assert rc == 1


class TestFastIngest:
    """Streaming fast path (BASELINE config 5): embed+index now, enrichment
    deferred to maintenance (enrich_pending)."""

    def test_fast_path_searchable_then_enriched(self, tmp_path):
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, Query

        sys_ = MemorySystem(tmp_path / "fast")
        mems = sys_.batch_remember(
            [Experience(content=f"Alice deployed the billing service batch {i}")
             for i in range(5)],
            enrich=False,
        )
        # searchable immediately (vector + BM25 are synchronous)
        res = sys_.recall(Query(query_text="billing service deploy"))
        assert len(res.ids) == 5
        # but graph/lineage are deferred
        assert all(m.experience.metadata.get("_enrich_pending") == "1" for m in mems)
        assert not sys_.graph.entities
        n = sys_.enrich_pending()
        assert n == 5
        assert sys_.graph.entities  # NER ran, entities landed
        got = sys_.get(mems[0].id)
        assert "_enrich_pending" not in got.experience.metadata
        assert got.experience.entities
        # idempotent: nothing left pending
        assert sys_.enrich_pending() == 0
        sys_.close()

    def test_enrichment_refresh_preserves_context_terms(self, tmp_path):
        """The late BM25 refresh (entities joined after NER) must rebuild
        the doc through the SAME context-augmented path as ingest — a bare
        upsert silently wiped the inherited antecedent terms from
        fast-path conversation docs (and double-folding the forward terms
        into the predecessor is equally wrong)."""
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.storage.serialization import decode
        from shodh_tpu.types import Experience, ExperienceType, Query

        sys_ = MemorySystem(tmp_path / "ctx")
        turns = [
            "Maya moved to Lisbon last spring for the robotics lab",
            "She loved it there from the very first week",
        ]
        mems = sys_.batch_remember(
            [Experience(content=t, experience_type=ExperienceType.CONVERSATION,
                        tags=["thread"]) for t in turns],
            enrich=False,
        )
        def doc(mid):
            return decode(sys_.bm25.kv.get("bm25doc", mid))
        pronoun_doc_before = doc(mems[1].id)
        prev_doc_before = doc(mems[0].id)
        assert any(t.startswith("lisbon") for t in pronoun_doc_before), \
            "ingest-time context inheritance must be present"
        assert sys_.enrich_pending() >= 1
        pronoun_doc_after = doc(mems[1].id)
        prev_doc_after = doc(mems[0].id)
        # inherited antecedent terms survive the entity refresh
        assert any(t.startswith("lisbon") for t in pronoun_doc_after)
        # the forward fold into the predecessor did NOT double
        fwd_terms = [t for t in prev_doc_before if t.startswith("love")]
        for t in fwd_terms:
            assert prev_doc_after[t] == prev_doc_before[t]
        # context-dependent recall still lands
        r = sys_.recall(Query(query_text="How did Maya like Lisbon?", max_results=2))
        assert mems[1].id in r.ids
        sys_.close()

    def test_maintenance_runs_enrichment(self, tmp_path):
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience

        sys_ = MemorySystem(tmp_path / "m")
        sys_.batch_remember(
            [Experience(content="Bob fixed the cache bug in Redis")], enrich=False
        )
        report = sys_.run_maintenance()
        assert report["enriched"] == 1
        sys_.close()

    def test_concurrent_recall_during_batch_ingest(self, tmp_path):
        """The lock-ordering regression test: a recall thread hammering the
        engine during batch_remember must not deadlock (round-2 bug: kv
        chunk transaction + engine lock inverted across threads)."""
        import threading

        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, Query

        sys_ = MemorySystem(tmp_path / "conc")
        sys_.batch_remember([Experience(content=f"warm {i}") for i in range(10)])
        stop = threading.Event()
        errors = []

        def hammer():
            while not stop.is_set():
                try:
                    sys_.recall(Query(query_text="warm case"))
                except Exception as exc:  # noqa: BLE001
                    errors.append(exc)
                    return

        th = threading.Thread(target=hammer, daemon=True)
        th.start()
        done = threading.Event()

        def ingest():
            sys_.batch_remember(
                [Experience(content=f"concurrent case {i} about warm topics")
                 for i in range(120)]
            )
            done.set()

        ti = threading.Thread(target=ingest, daemon=True)
        ti.start()
        assert done.wait(timeout=60), "batch ingest deadlocked under concurrent recall"
        stop.set()
        th.join(timeout=5)
        assert not errors, errors
        sys_.close()


def test_temporal_neighbors_require_shared_context(tmp_path):
    """Wall-clock-coincident turns from a DIFFERENT conversation must not
    join the temporal-neighborhood pool (multi-stream stores)."""
    from datetime import datetime, timezone, timedelta

    from shodh_tpu.engine.memory_system import _temporal_context_match, MemorySystem
    from shodh_tpu.types import Experience, Memory

    def mem(tags, episode=None):
        e = Experience(content="x", tags=tags)
        e.episode_id = episode
        m = Memory(
            id="m", experience=e,
            created_at=datetime(2026, 1, 1, tzinfo=timezone.utc),
            importance=0.5, content_hash="h",
        )
        return m

    assert _temporal_context_match(mem(["conv-a"]), mem(["conv-a", "alice"]))
    assert not _temporal_context_match(mem(["conv-a"]), mem(["conv-b"]))
    assert _temporal_context_match(mem([], episode="e1"), mem([], episode="e1"))
    assert not _temporal_context_match(mem(["x"], episode="e1"), mem(["x"], episode="e2"))
    # no context on either side: keep the pure time-window semantics
    assert _temporal_context_match(mem([]), mem([]))


def test_speaker_match_boost(tmp_path):
    """Utterances by the query's subject outrank other speakers' mentions
    (family speaker_match; measured gold-speaker rate 0.86-0.90 on locomo)."""
    from shodh_tpu.engine.memory_system import MemorySystem, _utterance_speaker
    from shodh_tpu.types import Experience, ExperienceType, Query

    assert _utterance_speaker("Melanie: hi there") == "melanie"
    assert _utterance_speaker("no speaker prefix here") is None

    conv = ExperienceType.CONVERSATION
    system = MemorySystem(tmp_path / "m")
    by_subject = system.remember(
        Experience(content="Melanie: I painted a sunrise over the lake", tags=["c"], experience_type=conv)
    )
    about_subject = system.remember(
        Experience(content="Caroline: your painting of the sunrise is lovely Melanie", tags=["c"], experience_type=conv)
    )
    r = system.recall(Query(query_text="What has Melanie painted", max_results=2))
    assert r.ids[0] == by_subject.id
    assert about_subject.id in r.ids
    system.close()


def test_diversity_rerank_caps_same_window(tmp_path):
    """_diversity_rerank admits at most `cap` per 2h/context group in the
    top-k and keeps the pass a deterministic permutation."""
    from datetime import datetime, timedelta, timezone

    from shodh_tpu.engine.memory_system import _diversity_rerank
    from shodh_tpu.types import Experience, Memory, ScoredMemory

    def sm(score, minute, tag):
        e = Experience(content="x", tags=[tag])
        m = Memory(
            id=f"m{score}", experience=e,
            created_at=datetime(2026, 1, 1, 12, minute, tzinfo=timezone.utc),
            importance=0.5, content_hash=f"h{score}",
        )
        return ScoredMemory(memory=m, score=score)

    scored = [sm(9, 0, "a"), sm(8, 5, "a"), sm(7, 10, "a"), sm(6, 15, "b"), sm(5, 20, "a")]
    out = _diversity_rerank(scored, k=4, cap=2, window=timedelta(hours=2))
    assert sorted(s.score for s in out) == [5, 6, 7, 8, 9]  # permutation
    # third same-window "a" deferred; "b" promoted into the top-k
    assert [s.score for s in out[:4]] == [9, 8, 6, 7]


def test_time_seeking_temporal_refs_boost(tmp_path):
    """'When did X' queries rank temporal-expression-bearing answers up
    (family seek_temporal_refs; gold rate 0.54 vs 0.10 measured)."""
    from shodh_tpu.engine.memory_system import MemorySystem
    from shodh_tpu.types import Experience, ExperienceType, Query

    conv = ExperienceType.CONVERSATION
    system = MemorySystem(tmp_path / "m")
    dated = system.remember(Experience(
        content="Nate: I adopted the turtles three years ago in spring",
        tags=["c"], experience_type=conv))
    undated = system.remember(Experience(
        content="Nate: the turtles love their adopted tank habitat",
        tags=["c"], experience_type=conv))
    assert dated.experience.temporal_refs  # parser extracted the duration
    r = system.recall(Query(query_text="When did Nate adopt the turtles?", max_results=2))
    assert r.ids[0] == dated.id
    system.close()


class TestEnumerationShape:
    def test_enumeration_shape_predicate(self):
        from shodh_tpu.engine.memory_system import _enumeration_shape

        yes = [
            "What activities does Melanie partake in?",
            "What books has Melanie read?",
            "Where has Melanie camped?",
            "What has Melanie painted?",
            "How many times has Melanie gone to the beach in 2023?",
            "Which instruments does Melanie play?",
        ]
        no = [
            "What did Caroline research?",
            "What is Caroline's identity?",
            "What is Caroline's relationship status?",  # 'status' guard
            "Where did Caroline move from 4 years ago?",
            "Why did the cache blow up?",
            "",
            None,
        ]
        for q in yes:
            assert _enumeration_shape(q), q
        for q in no:
            assert not _enumeration_shape(q), q
