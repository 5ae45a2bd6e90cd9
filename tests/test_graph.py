"""Knowledge graph tests: entities, Hebbian plasticity, LTP, decay,
spreading activation, coactivation, maintenance. Mirrors the reference's
hebbian_learning_tests / spreading_activation_tests / graph_memory_tests."""

from datetime import datetime, timedelta, timezone

import pytest

from shodh_tpu import constants as C
from shodh_tpu.graph.graph_memory import GraphMemory, canonical_name
from shodh_tpu.graph.plasticity import (
    Edge,
    decay,
    effective_strength,
    ltp_decay_factor,
    new_edge,
    strengthen,
)
from shodh_tpu.graph.relations import is_causal, predicate_from_cues, spreading_weight
from shodh_tpu.types import Experience, Memory, new_memory_id

NOW = datetime(2025, 7, 1, tzinfo=timezone.utc)


@pytest.fixture()
def graph(tmp_path):
    g = GraphMemory(tmp_path / "g")
    yield g
    g.close()


def _mem(content, entities, mem_id=None, importance=0.5, episode=None):
    return Memory(
        id=mem_id or new_memory_id(),
        experience=Experience(content=content, entities=entities, episode_id=episode),
        created_at=NOW,
        importance=importance,
    )


class TestRelations:
    def test_spreading_weights(self):
        assert spreading_weight("causes") == 1.3
        assert spreading_weight("co_occurs") == 0.5
        assert spreading_weight("unknown_custom") == 1.0

    def test_causal(self):
        assert is_causal("triggers") and not is_causal("works_at")

    def test_cue_extraction(self):
        assert predicate_from_cues("The outage was caused by the migration")[0] == "triggers"
        assert predicate_from_cues("Alice works at Acme")[0] == "works_at"
        assert predicate_from_cues("nothing interesting here") is None


class TestPlasticity:
    def test_strengthen_saturates(self):
        e = new_edge("a", "b", "co_occurs", NOW)
        s0 = e.strength
        for i in range(50):
            strengthen(e, NOW + timedelta(hours=i))
        assert s0 < e.strength <= 1.0

    def test_ltp_full_after_threshold(self):
        e = new_edge("a", "b", "co_occurs", NOW)
        for i in range(C.LTP_THRESHOLD):
            strengthen(e, NOW + timedelta(days=i))
        assert e.ltp == "full"

    def test_ltp_burst(self):
        e = new_edge("a", "b", "co_occurs", NOW)
        for i in range(C.LTP_BURST_THRESHOLD):
            strengthen(e, NOW + timedelta(hours=i))
        assert e.ltp in ("burst", "weekly", "full")
        assert ltp_decay_factor(e, NOW + timedelta(hours=5)) < 1.0

    def test_burst_expires(self):
        e = new_edge("a", "b", "co_occurs", NOW)
        for i in range(C.LTP_BURST_THRESHOLD):
            strengthen(e, NOW + timedelta(hours=i))
        if e.ltp == "burst":
            assert ltp_decay_factor(e, NOW + timedelta(days=10)) == 1.0

    def test_tier_promotion(self):
        e = new_edge("a", "b", "co_occurs", NOW)
        for i in range(30):
            strengthen(e, NOW + timedelta(hours=i))
        assert e.tier >= 1

    def test_decay_and_prune(self):
        e = new_edge("a", "b", "co_occurs", NOW)
        factor, prune = decay(e, NOW + timedelta(hours=100))
        assert factor < 1.0
        assert prune  # L1 edge past 48h max age

    def test_effective_strength_matches_write_path(self):
        e1 = new_edge("a", "b", "co_occurs", NOW)
        e2 = new_edge("a", "b", "co_occurs", NOW)
        later = NOW + timedelta(hours=10)
        virtual = effective_strength(e1, later)
        decay(e2, later)
        assert abs(virtual - e2.strength) < 1e-6

    def test_ltp_slows_decay(self):
        fast = new_edge("a", "b", "co_occurs", NOW)
        slow = new_edge("a", "b", "co_occurs", NOW)
        slow.ltp = "full"
        later = NOW + timedelta(hours=24)
        assert effective_strength(slow, later) > effective_strength(fast, later)


class TestGraphMemory:
    def test_entity_dedup_and_canonical(self, graph):
        a = graph.add_entity("RocksDB", now=NOW)
        b = graph.add_entity("rocksdb", now=NOW)
        assert a == b == canonical_name("RocksDB")
        assert graph.entities[a].mention_count == 2

    def test_blocklist(self, graph):
        assert graph.add_entity("things", now=NOW) is None
        assert graph.add_entity("ab", now=NOW) is None  # too short

    def test_alias(self, graph):
        eid = graph.add_entity("Apple Inc", now=NOW)
        graph.add_alias("the iPhone maker", eid)
        assert graph.find_entity("The iPhone Maker").id == eid

    def test_ingest_builds_edges(self, graph):
        mem = _mem("Alice works at Acme using Rust", ["Alice", "Acme", "Rust"])
        graph.ingest_experience(mem, now=NOW)
        assert graph.get_edge("Alice", "Acme") is not None
        # cue typed the relation
        assert graph.get_edge("Alice", "Acme").rel_type == "works_at"
        assert set(graph.entity_memories[canonical_name("Alice")]) == {mem.id}

    def test_repeat_ingest_strengthens(self, graph):
        m1 = _mem("Alice met Bob", ["Alice", "Bob"])
        graph.ingest_experience(m1, now=NOW)
        s0 = graph.get_edge("Alice", "Bob").strength
        m2 = _mem("Alice emailed Bob", ["Alice", "Bob"])
        graph.ingest_experience(m2, now=NOW + timedelta(hours=1))
        assert graph.get_edge("Alice", "Bob").strength > s0

    def test_spreading_activation_reaches_neighbors(self, graph):
        m1 = _mem("Rust used in backend", ["Rust", "Backend"], mem_id="m1")
        m2 = _mem("Backend deployed to Kubernetes", ["Backend", "Kubernetes"], mem_id="m2")
        m3 = _mem("Lunch menu pizza", ["Pizza"], mem_id="m3")
        for m in (m1, m2, m3):
            graph.ingest_experience(m, now=NOW)
        act = graph.spreading_activation(["Rust"], now=NOW)
        assert act.get("m1", 0) > 0
        assert act.get("m2", 0) > 0  # 2 hops via Backend
        assert act.get("m1", 0) > act.get("m2", 0)  # closer = stronger
        assert "m3" not in act

    def test_ppr_mode(self, graph):
        for m in (
            _mem("Rust backend", ["Rust", "Backend"], mem_id="m1"),
            _mem("Backend Kubernetes", ["Backend", "Kubernetes"], mem_id="m2"),
        ):
            graph.ingest_experience(m, now=NOW)
        act = graph.spreading_activation(["Rust"], now=NOW, mode="ppr")
        assert act.get("m1", 0) > 0

    def test_coactivation(self, graph):
        graph.ingest_experience(_mem("Rust rewrite", ["Rust"], mem_id="m1"), now=NOW)
        graph.ingest_experience(_mem("Kafka queue", ["Kafka"], mem_id="m2"), now=NOW)
        assert graph.get_edge("Rust", "Kafka") is None
        graph.record_memory_coactivation(["m1", "m2"], now=NOW)
        e = graph.get_edge("Rust", "Kafka")
        assert e is not None and e.rel_type == "co_retrieved"

    def test_causal_spine(self, graph):
        graph.add_relationship("migration", "outage", "causes", now=NOW)
        graph.add_relationship("outage", "rollback", "causes", now=NOW)
        chain = graph.trace_causal_origins("rollback")
        assert len(chain) == 2

    def test_traverse(self, graph):
        graph.add_relationship("aaa", "bbb", now=NOW)
        graph.add_relationship("bbb", "ccc", now=NOW)
        out = graph.traverse_from_entity("aaa", hops=2)
        ids = [t[0] for t in out]
        assert "bbb" in ids and "ccc" in ids

    def test_maintenance_prunes_old_edges(self, graph):
        graph.add_relationship("old-x", "old-y", now=NOW - timedelta(days=30))
        report = graph.run_maintenance(now=NOW)
        assert report["pruned"] >= 1
        assert graph.get_edge("old-x", "old-y") is None

    def test_persistence_roundtrip(self, tmp_path):
        g1 = GraphMemory(tmp_path / "g")
        g1.ingest_experience(_mem("Alice at Acme", ["Alice", "Acme"], mem_id="m1"), now=NOW)
        g1.close()
        g2 = GraphMemory(tmp_path / "g")
        assert g2.get_edge("Alice", "Acme") is not None
        assert g2.entity_memories[canonical_name("Alice")] == ["m1"]
        g2.close()

    def test_stats_and_dot(self, graph):
        graph.ingest_experience(_mem("Alice at Acme", ["Alice", "Acme"]), now=NOW)
        st = graph.stats()
        assert st["entities"] == 2 and st["edges"] == 1
        dot = graph.to_dot()
        assert "alice" in dot and "--" in dot


class TestDeviceSpreading:
    def test_matches_host_on_chain(self, tmp_path):
        from shodh_tpu.graph.device_spreading import DeviceSpreader

        g = GraphMemory(tmp_path / "gd")
        for m in (
            _mem("Rust used in backend", ["Rust", "Backend"], mem_id="m1"),
            _mem("Backend deployed to Kubernetes", ["Backend", "Kubernetes"], mem_id="m2"),
            _mem("Pizza lunch", ["Pizza"], mem_id="m3"),
        ):
            g.ingest_experience(m, now=NOW)
        from shodh_tpu.utils import clock

        clock.pin_now(NOW)
        try:
            host = g.spreading_activation(["Rust"], now=NOW)
            dev = DeviceSpreader(g).spreading_activation(["Rust"])
        finally:
            clock.pin_now(None)
        # same reachable set, same ordering
        assert set(dev) == set(host) == {"m1", "m2"}
        assert dev["m1"] > dev["m2"]
        g.close()

    def test_rebuild_on_graph_growth(self, tmp_path):
        from shodh_tpu.graph.device_spreading import DeviceSpreader

        g = GraphMemory(tmp_path / "gd2")
        g.ingest_experience(_mem("a b", ["Alpha", "Beta"], mem_id="m1"), now=NOW)
        sp = DeviceSpreader(g)
        from shodh_tpu.utils import clock

        clock.pin_now(NOW)
        try:
            assert sp.spreading_activation(["Alpha"])
            g.ingest_experience(_mem("b c", ["Beta", "Gamma"], mem_id="m2"), now=NOW)
            out = sp.spreading_activation(["Alpha"])
        finally:
            clock.pin_now(None)
        assert "m2" in out  # new edge visible after rebuild
        g.close()


class _StubEmbedder:
    """Deterministic test embedder: fixed unit vectors per name family."""

    name = "stub"
    dimension = 4

    VECS = {
        "nyc": [1.0, 0.0, 0.0, 0.0],
        "new york city": [0.97, 0.24, 0.0, 0.0],   # cos ~0.97 vs nyc
        "tokyo": [0.0, 1.0, 0.0, 0.0],
        "tokio": [0.0, 0.97, 0.24, 0.0],            # cos ~0.97 vs tokyo
        "acme corp": [0.0, 0.0, 1.0, 0.0],
        "acme corporation": [0.0, 0.0, 0.97, 0.24],
        "mercury person": [0.5, 0.5, 0.5, 0.5],
        "mercury org": [0.5, 0.5, 0.5, 0.49],       # cos ~1 but diff label
    }

    def encode_batch(self, texts):
        import numpy as np

        out = []
        for t in texts:
            v = np.asarray(self.VECS.get(t.lower(), [0.1, 0.2, 0.3, 0.4]), np.float32)
            out.append(v / np.linalg.norm(v))
        return np.stack(out)

    def encode(self, text):
        return self.encode_batch([text])[0]

    def encode_query(self, text):
        return self.encode(text)


class TestEntityEmbeddings:
    """graph_memory.rs:3390 concept dedup + :3777/:3813 embedding-fuzzy find."""

    def _graph(self, tmp_path):
        from shodh_tpu.graph.graph_memory import GraphMemory

        return GraphMemory(tmp_path / "g", embedder=_StubEmbedder())

    def test_concept_dedup_merges_as_alias(self, tmp_path):
        g = self._graph(tmp_path)
        eid1 = g.add_entity("New York City", label="location", now=NOW)
        eid2 = g.add_entity("NYC", label="location", now=NOW)
        assert eid2 == eid1  # merged, no twin node
        assert len(g.entities) == 1
        assert "nyc" in g.entities[eid1].aliases
        assert g.entities[eid1].mention_count == 2

    def test_incompatible_labels_never_merge(self, tmp_path):
        g = self._graph(tmp_path)
        g.add_entity("Mercury person", label="person", now=NOW)
        eid2 = g.add_entity("Mercury org", label="organization", now=NOW)
        assert len(g.entities) == 2
        assert eid2 == "mercury org"

    def test_concept_label_merges_into_typed(self, tmp_path):
        g = self._graph(tmp_path)
        eid1 = g.add_entity("Acme Corporation", label="organization", now=NOW)
        eid2 = g.add_entity("Acme Corp", label="concept", now=NOW)  # untyped mention
        assert eid2 == eid1

    def test_find_entity_embedding_tier(self, tmp_path):
        g = self._graph(tmp_path)
        g.add_entity("Tokyo", label="location", now=NOW)
        # not strict, not alias, not token-subset — only embeddings match
        found = g.find_entity("Tokio")
        assert found is not None and found.id == "tokyo"

    def test_below_threshold_stays_separate(self, tmp_path):
        g = self._graph(tmp_path)
        g.add_entity("Tokyo", label="location", now=NOW)
        eid = g.add_entity("Acme Corp", label="organization", now=NOW)
        assert len(g.entities) == 2 and eid == "acme corp"
        assert g.find_entity("completely unrelated thing") is None

    def test_no_embedder_unchanged_behavior(self, tmp_path):
        from shodh_tpu.graph.graph_memory import GraphMemory

        g = GraphMemory(tmp_path / "g2")  # embedder=None
        g.add_entity("New York City", label="location", now=NOW)
        eid = g.add_entity("NYC", label="location", now=NOW)
        assert eid == "nyc" and len(g.entities) == 2

    def test_deterministic_across_reload(self, tmp_path):
        g = self._graph(tmp_path)
        g.add_entity("New York City", label="location", now=NOW)
        g.add_entity("NYC", label="location", now=NOW)
        g.close()
        from shodh_tpu.graph.graph_memory import GraphMemory

        g2 = GraphMemory(tmp_path / "g", embedder=_StubEmbedder())
        assert set(g2.entities) == {"new york city"}
        assert g2.alias_table.get("nyc") == "new york city"
        # dedup keeps working against the reloaded (lazily re-encoded) matrix
        eid = g2.add_entity("nyc", label="location", now=NOW)
        assert eid == "new york city"
        g2.close()


class TestPmiEdgeGate:
    """PMI² edge gate (state.rs:3477-3499,3586,3790): generic co-occurrence
    edges between already-frequent entities are incidental and never born;
    typed pairs and fresh-entity pairs always survive."""

    def _hubify(self, graph, names, n=12):
        # make each name frequent SEPARATELY (never co-mentioned) so the
        # first joint mention is the gated birth attempt
        for i in range(n):
            for name in names:
                graph.ingest_experience(
                    _mem(f"{name} routine note {i}", [name]), now=NOW
                )

    def test_fresh_pair_is_born(self, graph, monkeypatch):
        monkeypatch.setattr(C, "GRAPH_PMI_GATE", True)
        graph.ingest_experience(_mem("Alice met Bob", ["Alice", "Bob"]), now=NOW)
        assert graph.get_edge("Alice", "Bob") is not None
        assert graph.last_ingest_stats["pmi_gated"] == 0

    def test_hub_pair_is_gated(self, graph, monkeypatch):
        monkeypatch.setattr(C, "GRAPH_PMI_GATE", True)
        self._hubify(graph, ["widget", "gasket"])  # df 12 * 12 >> N 24
        graph.ingest_experience(
            _mem("widget and gasket in one passage", ["widget", "gasket"]), now=NOW
        )
        assert graph.get_edge("widget", "gasket") is None
        assert graph.last_ingest_stats["pmi_gated"] == 1

    def test_typed_pair_between_hubs_survives(self, graph, monkeypatch):
        monkeypatch.setattr(C, "GRAPH_PMI_GATE", True)
        self._hubify(graph, ["outage", "migration"])
        graph.ingest_experience(
            _mem("The outage was caused by the migration",
                 ["outage", "migration"]), now=NOW
        )
        e = graph.get_edge("outage", "migration")
        assert e is not None and e.rel_type == "triggers"

    def test_gate_off_keeps_hub_pair(self, graph):
        # default arm: gate ships OFF (full-suite A/B, BENCHMARKS)
        self._hubify(graph, ["widget", "gasket"])
        graph.ingest_experience(
            _mem("widget and gasket in one passage", ["widget", "gasket"]), now=NOW
        )
        assert graph.get_edge("widget", "gasket") is not None

    def test_typed_only_drops_every_generic_edge(self, graph, monkeypatch):
        monkeypatch.setattr(C, "GRAPH_TYPED_ONLY", True)
        graph.ingest_experience(_mem("Alice met Bob", ["Alice", "Bob"]), now=NOW)
        assert graph.get_edge("Alice", "Bob") is None
        graph.ingest_experience(
            _mem("The outage was caused by the migration",
                 ["outage", "migration"]), now=NOW
        )
        assert graph.get_edge("outage", "migration") is not None

    def test_existing_edge_still_strengthens(self, graph, monkeypatch):
        monkeypatch.setattr(C, "GRAPH_PMI_GATE", True)
        graph.ingest_experience(_mem("Alice met Bob", ["Alice", "Bob"]), now=NOW)
        s0 = graph.get_edge("Alice", "Bob").strength
        self._hubify(graph, ["Alice", "Bob"])  # make both hubs AFTER birth
        graph.ingest_experience(_mem("Alice met Bob again", ["Alice", "Bob"]), now=NOW)
        assert graph.get_edge("Alice", "Bob").strength > s0  # birth-only gate

    def test_total_ingests_persists(self, tmp_path):
        g = GraphMemory(tmp_path / "g2")
        for i in range(5):
            g.ingest_experience(_mem(f"note {i}", ["alpha"]), now=NOW)
        g.close()
        g2 = GraphMemory(tmp_path / "g2")
        assert g2.total_ingests == 5
        g2.close()

    def test_pmi_weighting_births_weak_edges(self, graph, monkeypatch):
        monkeypatch.setattr(C, "GRAPH_PMI_EDGES", True)
        monkeypatch.setattr(C, "GRAPH_PMI_GATE", False)
        # moderately frequent pair: positive-but-small PMI -> born weak
        for i in range(4):
            graph.ingest_experience(_mem(f"widget note {i}", ["widget"]), now=NOW)
            graph.ingest_experience(_mem(f"gasket note {i}", ["gasket"]), now=NOW)
        graph.ingest_experience(
            _mem("widget and gasket together", ["widget", "gasket"]), now=NOW
        )
        e = graph.get_edge("widget", "gasket")
        assert e is not None and e.strength < C.L1_INITIAL_WEIGHT


class TestTypedSalience:
    """Typed base salience + log-frequency growth (graph_memory.rs:8722-8768,
    :3489-3493): label-dependent gravitational wells, proper-noun boost,
    frequency growth capped at 1.0."""

    def test_base_salience_by_label(self, graph, monkeypatch):
        monkeypatch.setattr(C, "TYPED_SALIENCE", True)
        graph.ingest_experience(
            _mem("Alice joined", ["Alice"]), now=NOW,
            entity_labels={"Alice": "person"},
        )
        graph.ingest_experience(_mem("a concept note", ["recursion"]), now=NOW)
        alice = graph.entities[graph.find_entity("Alice").id]
        concept = graph.entities[graph.find_entity("recursion").id]
        # persons start more salient than concepts; Alice is also proper-cased
        assert alice.salience > concept.salience

    def test_proper_noun_boost(self, graph, monkeypatch):
        monkeypatch.setattr(C, "TYPED_SALIENCE", True)
        graph.add_entity("Paris", label="location", now=NOW)
        graph.add_entity("downtown", label="location", now=NOW)
        p = graph.entities[graph.find_entity("Paris").id]
        d = graph.entities[graph.find_entity("downtown").id]
        assert p.is_proper and not d.is_proper
        assert p.salience == pytest.approx(d.salience * 1.2)

    def test_frequency_growth_saturates(self, graph, monkeypatch):
        monkeypatch.setattr(C, "TYPED_SALIENCE", True)
        for i in range(40):
            graph.add_entity("Kafka", label="technology", now=NOW)
        e = graph.entities[graph.find_entity("Kafka").id]
        assert e.mention_count == 40
        assert e.salience == 1.0  # capped

    def test_persists_across_reopen(self, tmp_path, monkeypatch):
        monkeypatch.setattr(C, "TYPED_SALIENCE", True)
        g = GraphMemory(tmp_path / "gs")
        g.add_entity("Berlin", label="location", now=NOW)
        sal = g.entities[g.find_entity("Berlin").id].salience
        g.close()
        g2 = GraphMemory(tmp_path / "gs")
        e = g2.entities[g2.find_entity("Berlin").id]
        assert e.salience == pytest.approx(sal) and e.is_proper
        g2.close()

    def test_legacy_rule_behind_flag(self, graph, monkeypatch):
        monkeypatch.setattr(C, "TYPED_SALIENCE", False)
        graph.add_entity("Widget", label="person", now=NOW)
        e = graph.entities[graph.find_entity("Widget").id]
        # legacy: 0.5 default nudged once by the saturating rule
        assert e.salience == pytest.approx(0.5 + 0.05 * 0.5)

    def test_proper_heuristic_rejects_structural_and_sentence_initial(self, graph, monkeypatch):
        monkeypatch.setattr(C, "TYPED_SALIENCE", True)
        graph.add_entity("Monday", label="date", now=NOW)
        graph.add_entity("Turbines", label="concept", now=NOW)  # sentence-initial
        graph.add_entity("NASA", label="organization", now=NOW)
        assert not graph.entities[graph.find_entity("Monday").id].is_proper
        assert not graph.entities[graph.find_entity("Turbines").id].is_proper
        assert graph.entities[graph.find_entity("NASA").id].is_proper
