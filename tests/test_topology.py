"""Topology (curvature/bridges) and companion-rerank tests."""

from datetime import datetime, timezone

from shodh_tpu.graph.topology import find_bridges, forman_curvature, topology_keep_scores

NOW = datetime(2025, 7, 1, tzinfo=timezone.utc)


class TestBridges:
    def test_simple_bridge(self):
        # two triangles joined by one bridge edge c-d
        adj = {
            "a": {"b", "c"}, "b": {"a", "c"}, "c": {"a", "b", "d"},
            "d": {"c", "e", "f"}, "e": {"d", "f"}, "f": {"d", "e"},
        }
        bridges = find_bridges(adj)
        assert bridges == {("c", "d")}

    def test_cycle_has_no_bridges(self):
        adj = {"a": {"b", "c"}, "b": {"a", "c"}, "c": {"a", "b"}}
        assert find_bridges(adj) == set()

    def test_chain_all_bridges(self):
        adj = {"a": {"b"}, "b": {"a", "c"}, "c": {"b"}}
        assert find_bridges(adj) == {("a", "b"), ("b", "c")}

    def test_disconnected_components(self):
        adj = {"a": {"b"}, "b": {"a"}, "x": {"y"}, "y": {"x"}}
        assert find_bridges(adj) == {("a", "b"), ("x", "y")}

    def test_curvature_sign(self):
        # hub-bridge: high degrees -> strongly negative
        assert forman_curvature(10, 8) < forman_curvature(2, 2)

    def test_keep_scores_budget(self):
        adj = {"a": {"b"}, "b": {"a", "c"}, "c": {"b"}}
        scores = topology_keep_scores(adj, lambda u, v: 0.5, rescue_budget_frac=0.5)
        assert 0 < len(scores) <= 2
        assert all(0 < s <= 1 for s in scores.values())


class TestCompanionRerank:
    def test_entity_overlap_lifts_tail(self, tmp_path):
        from shodh_tpu.engine.companion import companion_rerank
        from shodh_tpu.graph.graph_memory import GraphMemory
        from shodh_tpu.types import Experience, Memory, ScoredMemory, new_memory_id

        g = GraphMemory(tmp_path / "g")

        def mem(content, entities):
            return Memory(
                id=new_memory_id(),
                experience=Experience(content=content, entities=entities),
                created_at=NOW,
            )

        m_rel = mem("kafka outage postmortem", ["Kafka", "Outage"])
        m_noise = mem("unrelated note", ["Lunch"])
        g.ingest_experience(m_rel, now=NOW)
        g.ingest_experience(m_noise, now=NOW)
        scored = [
            ScoredMemory(memory=mem("anchor one", []), score=1.0),
            ScoredMemory(memory=mem("anchor two", []), score=0.9),
            ScoredMemory(memory=m_noise, score=0.5),
            ScoredMemory(memory=m_rel, score=0.49),
        ]
        out = companion_rerank(scored, ["Kafka"], g, k=4)
        # anchors frozen
        assert out[0].score == 1.0 and out[1].score == 0.9
        # relevant memory overtakes the noise in the tail
        assert out[2].memory.id == m_rel.id
        g.close()
