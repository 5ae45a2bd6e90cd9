"""Cognitive subsystem tests: facts, temporal facts, feedback momentum,
interference, replay, prospective memory, lineage, introspection."""

from datetime import datetime, timedelta, timezone

import numpy as np
import pytest

from shodh_tpu import constants as C
from shodh_tpu.engine.memory_system import MemorySystem
from shodh_tpu.storage.kv import KvStore
from shodh_tpu.types import Experience, ExperienceType, Query

NOW = datetime(2025, 7, 1, tzinfo=timezone.utc)


@pytest.fixture()
def kv(tmp_path):
    store = KvStore(tmp_path / "kv.db")
    yield store
    store.close()


@pytest.fixture()
def system(tmp_path):
    s = MemorySystem(tmp_path / "m")
    yield s
    s.close()


class TestFacts:
    def test_distillation_clusters_similar_memories(self, system):
        old = NOW - timedelta(days=30)
        for i in range(3):
            system.remember(
                Experience(
                    content=f"standup note {i}: the payment service keeps timing out under load",
                    entities=["payment service"],
                ),
                created_at=old + timedelta(hours=i),
            )
        from shodh_tpu.utils import clock

        clock.pin_now(NOW)
        try:
            created = system.distill_facts()
        finally:
            clock.pin_now(None)
        assert created >= 1
        facts = system.facts.all_facts()
        assert any("payment service" in f.statement for f in facts)
        assert facts[0].support >= 2

    def test_fact_dedup(self, kv):
        from shodh_tpu.engine.facts import SemanticFact, SemanticFactStore

        store = SemanticFactStore(kv)
        f = SemanticFact(
            id="f1", statement="the payment service times out under load",
            entities=["payment"], fact_type="distilled", support=3,
            source_memories=["a"], created_at=NOW, last_reinforced=NOW,
        )
        store.store(f)
        assert store._is_duplicate("the payment service times out under load", None)
        assert not store._is_duplicate("we migrated the frontend to react", None)

    def test_fact_decay_prunes(self, kv):
        from shodh_tpu.engine.facts import SemanticFact, SemanticFactStore

        store = SemanticFactStore(kv)
        stale = SemanticFact(
            id="f2", statement="ancient fact", entities=["x1y"], fact_type="distilled",
            support=1, source_memories=[], created_at=NOW - timedelta(days=2000),
            last_reinforced=NOW - timedelta(days=2000), confidence=0.3,
        )
        store.store(stale)
        assert store.prune(NOW) == 1

    def test_by_entity_index(self, kv):
        from shodh_tpu.engine.facts import SemanticFact, SemanticFactStore

        store = SemanticFactStore(kv)
        store.store(SemanticFact(
            id="f3", statement="rust chosen for safety", entities=["Rust"],
            fact_type="stated", support=1, source_memories=[],
            created_at=NOW, last_reinforced=NOW,
        ))
        assert len(store.by_entity("rust")) == 1


class TestTemporalFacts:
    def test_extract_future_plan(self, system):
        mem = system.remember(
            Experience(
                content="Acme is planning the warehouse migration next month",
                entities=["Acme", "warehouse migration"],
            ),
            created_at=NOW,
        )
        facts = system.temporal_facts.lookup(["Acme"])
        assert len(facts) == 1
        assert facts[0].source_memory == mem.id
        assert facts[0].event_date is not None

    def test_no_fact_without_cue(self, system):
        system.remember(
            Experience(content="Acme office is in Berlin", entities=["Acme", "Berlin"]),
            created_at=NOW,
        )
        assert system.temporal_facts.lookup(["Berlin"]) == []

    def test_prune_expired(self, system):
        system.remember(
            Experience(
                content="team planning the launch next week",
                entities=["launch team"],
            ),
            created_at=NOW - timedelta(days=400),
        )
        assert system.temporal_facts.prune(now=NOW) >= 1


class TestFeedback:
    def test_momentum_ema(self, kv):
        from shodh_tpu.engine.feedback import FeedbackStore

        fb = FeedbackStore(kv)
        for _ in range(5):
            fb.record("m1", 1.0, NOW)
        assert fb.momentum("m1") > 0.5
        fb.record("m1", -1.0, NOW)
        assert fb.momentum("m1") < 0.85

    def test_prediction_error_scales_learning(self, kv):
        from shodh_tpu.engine.feedback import FeedbackStore

        fb = FeedbackStore(kv)
        # expected outcome: small learning step
        fb.predict("a", 1.0)
        fb.record("a", 1.0, NOW)
        expected = fb.momentum("a")
        # surprising outcome: larger learning step
        fb.predict("b", 0.0)
        fb.record("b", 1.0, NOW)
        surprised = fb.momentum("b")
        assert surprised > expected

    def test_persistence(self, tmp_path):
        from shodh_tpu.engine.feedback import FeedbackStore

        kv1 = KvStore(tmp_path / "f.db")
        FeedbackStore(kv1).record("m1", 1.0, NOW)
        kv1.close()
        kv2 = KvStore(tmp_path / "f.db")
        assert FeedbackStore(kv2).momentum("m1") > 0


class TestInterference:
    def test_near_duplicate_suppression(self, system):
        a = system.remember(Experience(content="the deploy failed at 3pm on friday"))
        act0 = system.get(a.id).activation
        # near-identical content (different hash, nearly same embedding)
        system.remember(Experience(content="the deploy failed at 3pm on friday."))
        assert system.get(a.id).activation < act0

    def test_dissimilar_no_interference(self, system):
        a = system.remember(Experience(content="the deploy failed at 3pm"))
        act0 = system.get(a.id).activation
        system.remember(Experience(content="lunch was sushi and miso soup today"))
        assert system.get(a.id).activation == act0

    def test_batched_ingest_matches_sequential(self, tmp_path):
        """batch_remember defers interference to ONE search per chunk; the
        row-order age guard must reproduce the sequential semantics: older
        traces demoted, batch siblings never demoted by earlier siblings."""
        from shodh_tpu.engine.memory_system import MemorySystem

        texts = [
            "the reactor coolant pump failed during the friday night shift",
            "the reactor coolant pump failed during the friday night shift.",
            "the reactor coolant pump failed during that friday night shift",
            "a completely unrelated note about sushi lunch downtown",
        ]
        seq = MemorySystem(tmp_path / "seq")
        seq_mems = [seq.remember(Experience(content=t)) for t in texts]
        seq_acts = [seq.get(m.id).activation for m in seq_mems]
        seq.close()
        bat = MemorySystem(tmp_path / "bat")
        bat_mems = bat.batch_remember([Experience(content=t) for t in texts])
        bat_acts = [bat.get(m.id).activation for m in bat_mems]
        bat.close()
        assert bat_acts == pytest.approx(seq_acts)
        # the near-duplicates really did interfere (test is not vacuous)
        assert bat_acts[0] < 1.0

    def test_crowded_chunk_still_demotes_older_traces(self, tmp_path):
        """Review-verified failure shape: an anchor plus a chunk of
        mutually-near-identical siblings. The siblings crowd the top-k
        window with later-row hits; without the widened-k + per-item
        cutoff emulation the anchor silently escaped demotion (sequential
        demoted it 5x, batched 0x)."""
        from shodh_tpu.engine.memory_system import MemorySystem

        anchor = "the cooling pump gasket failed on unit seven during inspection"
        sibs = [
            f"the cooling pump gasket failed on unit seven during inspection round {i}"
            for i in range(7)
        ]
        seq = MemorySystem(tmp_path / "seq")
        a1 = seq.remember(Experience(content=anchor))
        for t in sibs:
            seq.remember(Experience(content=t))
        seq_anchor = seq.get(a1.id).activation
        seq.close()

        bat = MemorySystem(tmp_path / "bat")
        a2 = bat.remember(Experience(content=anchor))
        bat.batch_remember([Experience(content=t) for t in sibs])
        bat_anchor = bat.get(a2.id).activation
        bat.close()
        assert bat_anchor == pytest.approx(seq_anchor)
        assert bat_anchor < 1.0  # the anchor was genuinely demoted


class TestReplay:
    def test_replay_boosts_activation(self, system):
        mem = system.remember(
            Experience(
                content="critical production incident in the payment pipeline",
                experience_type=ExperienceType.ERROR,
                entities=["payment pipeline"],
            ),
            created_at=NOW,
        )
        act0 = system.get(mem.id).activation
        from shodh_tpu.utils import clock

        clock.pin_now(NOW + timedelta(days=1))
        try:
            report = system.replay.run_cycle(now=NOW + timedelta(days=1))
        finally:
            clock.pin_now(None)
        assert report["replayed"] >= 1
        assert system.get(mem.id).activation > act0


class TestProspective:
    def test_time_triggered_reminder(self, kv):
        from shodh_tpu.engine.prospective import ProspectiveStore

        ps = ProspectiveStore(kv)
        ps.add("submit the report", NOW, trigger_time=NOW + timedelta(hours=1))
        assert ps.due_reminders(NOW) == []
        due = ps.due_reminders(NOW + timedelta(hours=2))
        assert len(due) == 1 and due[0].status == "fired"
        # fired intentions don't fire twice
        assert ps.due_reminders(NOW + timedelta(hours=3)) == []

    def test_context_boost(self, kv):
        from shodh_tpu.engine.prospective import ProspectiveStore

        ps = ProspectiveStore(kv)
        ps.add("review the kubernetes upgrade plan", NOW, context_keywords=["kubernetes"])
        assert ps.context_boost("what about the kubernetes cluster") == C.PROSPECTIVE_BOOST_PER_MATCH
        assert ps.context_boost("completely unrelated") == 0.0


class TestLineage:
    def test_explicit_edges_and_trace(self, kv):
        from shodh_tpu.engine.lineage import LineageStore

        ls = LineageStore(kv)
        ls.add_edge("m1", "m2", "caused", NOW)
        ls.add_edge("m2", "m3", "caused", NOW)
        trace = ls.trace("m3", direction="ancestors")
        assert {e.from_memory for e in trace} == {"m1", "m2"}
        assert ls.find_root_cause("m3") == "m1"

    def test_low_confidence_rejected(self, kv):
        from shodh_tpu.engine.lineage import LineageStore

        ls = LineageStore(kv)
        assert ls.add_edge("a", "b", "related_to", NOW, confidence=0.1) is None

    def test_auto_inference_on_store(self, system):
        err = system.remember(
            Experience(
                content="error: the cache invalidation bug corrupted sessions",
                experience_type=ExperienceType.ERROR,
                entities=["cache invalidation"],
            ),
            created_at=NOW,
        )
        fix = system.remember(
            Experience(
                content="fixed the cache invalidation bug by adding versioned keys",
                experience_type=ExperienceType.TASK,
                entities=["cache invalidation"],
            ),
            created_at=NOW + timedelta(hours=2),
        )
        edges = system.lineage.edges_to(fix.id)
        assert any(e.from_memory == err.id and e.relation == "resolved_by" for e in edges)


class TestLineageBranches:
    """Git-like branches on project pivots (lineage.rs:226-280, :1243)."""

    def test_pivot_signal_gating(self):
        from shodh_tpu.engine.lineage import detect_branch_signal

        assert detect_branch_signal("we should pivot to a managed queue")
        assert detect_branch_signal("scrap this design and start over")
        # two weak signals
        assert detect_branch_signal("rethink the parser — a rewrite is cleaner")
        # one weak signal alone must NOT branch (ordinary discourse)
        assert not detect_branch_signal("use sqlite instead of flat files")
        assert not detect_branch_signal("nothing pivotal here")

    def test_branch_lifecycle_and_edge_attribution(self, kv):
        from shodh_tpu.engine.lineage import LineageStore

        ls = LineageStore(kv)
        ls.ensure_main_branch(NOW)
        ls.add_edge("m1", "m2", "caused", NOW)  # main-branch edge
        branch = ls.create_branch("v2 rewrite", branch_point="m2", now=NOW)
        assert ls.active_branch() == branch.id
        ls.add_edge("m2", "m3", "caused", NOW)  # attributed to the branch
        assert [e.to_memory for e in ls.branch_edges(branch.id)] == ["m3"]
        assert [e.to_memory for e in ls.branch_edges("main")] == ["m2"]
        stats = ls.stats()
        assert stats["total_branches"] == 2 and stats["active_branches"] == 2
        # switch back to main
        ls.set_active_branch(None)
        assert ls.active_branch() is None
        listed = {b.id for b in ls.list_branches()}
        assert listed == {"main", branch.id}

    def test_auto_branch_on_pivot_memory(self, system):
        system.remember(
            Experience(content="kafka consumer lag keeps growing", entities=["Kafka"]),
            created_at=NOW,
        )
        pivot = system.remember(
            Experience(
                content="scrap the kafka design — pivot to a pull-based poller",
                entities=["Kafka"],
            ),
            created_at=NOW + timedelta(hours=1),
        )
        branches = system.lineage.list_branches()
        auto = [b for b in branches if b.branch_point == pivot.id]
        assert len(auto) == 1 and auto[0].parent_branch == "main"
        assert system.lineage.active_branch() == auto[0].id
        # post-pivot edges land on the new branch
        after = system.remember(
            Experience(content="the pull-based poller drained the kafka backlog", entities=["Kafka"]),
            created_at=NOW + timedelta(hours=3),
        )
        edges = system.lineage.edges_to(after.id)
        assert edges and all(e.branch_id == auto[0].id for e in edges)


class TestIntrospection:
    def test_ring_and_report(self):
        from shodh_tpu.engine.introspection import ConsolidationEventBuffer

        buf = ConsolidationEventBuffer(capacity=5)
        for i in range(10):
            buf.record("strengthen", f"e{i}")
        rep = buf.report()
        assert rep["total_events"] == 5
        assert rep["by_kind"] == {"strengthen": 5}
        assert len(buf.events(kind="strengthen", limit=3)) == 3
