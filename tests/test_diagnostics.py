"""Gold funnel, fusion features, decay sim, universe, anomalies tests."""

from datetime import datetime, timezone

import pytest

from shodh_tpu.engine.memory_system import MemorySystem
from shodh_tpu.harness import diagnostics as diag
from shodh_tpu.types import Experience, Query

NOW = datetime(2025, 7, 1, tzinfo=timezone.utc)


@pytest.fixture()
def system(tmp_path):
    s = MemorySystem(tmp_path / "m")
    yield s
    s.close()


class TestGoldFunnel:
    def test_stage_ranks_recorded(self, system):
        gold = system.remember(Experience(content="the gold answer about rust memory safety"))
        system.remember(Experience(content="distractor about lunch"))
        diag.arm("q1", {gold.id})
        system.recall(Query(query_text="rust memory safety"))
        rec = diag.disarm()
        assert rec is not None
        assert rec.stage_ranks.get("vector") == 1
        assert rec.stage_ranks.get("final") == 1

    def test_funnel_report_aggregation(self):
        from shodh_tpu.harness.diagnostics import FunnelRecord, FunnelReport

        rep = FunnelReport()
        rep.add(FunnelRecord("a", frozenset({"x"}), {"vector": 1, "final": 2}))
        rep.add(FunnelRecord("b", frozenset({"y"}), {"vector": None, "final": 15}))
        s = rep.summary()
        assert s["vector"]["present_rate"] == 0.5
        assert s["final"]["top10_rate"] == 0.5

    def test_disarmed_noop(self, system):
        system.remember(Experience(content="no funnel"))
        system.recall(Query(query_text="no funnel"))  # must not raise
        assert diag.disarm() is None


class TestFusionFeatures:
    def test_features(self):
        from shodh_tpu.harness.diagnostics import compute_fusion_features

        f = compute_fusion_features(
            "q", {"gold"},
            semantic={"gold": 0.9, "b": 0.5},
            bm25={"b": 3.0, "gold": 1.0},
            graph={},
        )
        assert f.gold_vec_rank == 1 and f.gold_bm_rank == 2
        assert f.n_graph == 0
        assert 0.0 <= f.agreement_top10 <= 1.0


class TestDecaySim:
    def test_aging_keeps_recall_reasonable(self, system):
        from shodh_tpu.harness.decay_sim import simulate_aging
        from shodh_tpu.harness.fixtures import RecallCase

        mem = system.remember(
            Experience(content="we chose postgres for analytical workloads"),
            created_at=NOW,
        )
        id_map = {"m1": mem.id}
        cases = [
            RecallCase(
                case_id="c1", category="decision",
                query="which database for analytics", corpus_id="",
                relevance={"m1": 3.0},
            )
        ]
        report = simulate_aging(system, cases, id_map, start=NOW, days=2.0)
        s = report.summary()
        assert s["initial_recall@10"] == 1.0
        # two days of aging must not forget the only relevant memory
        assert s["final_recall@10"] == 1.0
        assert len(report.checkpoints) == 3


class TestUniverse:
    def test_universe_projection(self, system):
        from shodh_tpu.engine.visualization import memory_universe

        for i in range(10):
            system.remember(
                Experience(content=f"memory number {i} about topic {i % 3}",
                           entities=[f"topic{i % 3}"])
            )
        uni = memory_universe(system)
        assert len(uni["stars"]) == 10
        star = uni["stars"][0]
        assert len(star["position"]) == 3 and star["size"] > 0

    def test_anomalies(self, system):
        from shodh_tpu.engine.visualization import detect_anomalies

        system.remember(Experience(content="robot collision detected", anomaly=True))
        system.remember(Experience(content="normal operation"))
        out = detect_anomalies(system)
        assert any(a["reason"] == "flagged" for a in out)


class TestAgentLoop:
    def test_loop_closes_learning_and_reverts(self, system):
        from shodh_tpu.harness.agent_loop import AgentLoop

        loop = AgentLoop(system)
        mid = loop.observe("the retry queue backs up when redis restarts",
                           entities=["retry queue", "redis"])
        loop.observe("lunch was fine")
        r1 = loop.turn("what happens to the retry queue when redis restarts?")
        assert r1.recalled and r1.recalled[0]["id"] == mid
        assert "attribution" in r1.recalled[0]
        # follow-up mentioning same entities -> implicit positive feedback
        r2 = loop.turn("so the redis restart is what backs up the retry queue")
        assert r2.feedback_signals >= 1
        assert system.feedback.momentum(mid) > 0
        # explicit feedback + revert restores importance
        imp0 = system.get(mid).importance
        loop.mark_helpful([mid])
        assert system.get(mid).importance > imp0
        loop.revert_last(1)
        assert system.get(mid).importance == pytest.approx(imp0)
        # ledger accounting
        s = loop.ledger_summary()
        assert s["by_kind"]["remember"] == 2
        # full rollback forgets observed memories
        loop.revert_last(10)
        assert system.get(mid) is None
