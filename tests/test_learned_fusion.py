"""Learned per-bucket fusion re-ranking (retrieval/learned_fusion.py).

Reference loop: ab_testing.rs LearnedWeights + fusion_features.rs —
offline-fitted scoring weights served through the A/B manager. These tests
pin the serve-time contract: artifact loading (stale feature maps
rejected), deterministic re-ranking with the engine tie-break, domain
scoping, A/B-override arming, and export capture.
"""

import json

import numpy as np
import pytest

from shodh_tpu.retrieval import learned_fusion as lf


def _mk_scored(scores, base_ts="2026-01-01T00:00:0"):
    """Minimal ScoredMemory stand-ins honoring the sort key contract."""
    from datetime import datetime, timezone

    from shodh_tpu.engine.memory_system import ScoredMemory
    from shodh_tpu.types import Experience, ExperienceType, Memory

    out = []
    for i, s in enumerate(scores):
        exp = Experience(content=f"memory number {i}", experience_type=ExperienceType.OBSERVATION)
        mem = Memory(
            id=f"m{i}",
            experience=exp,
            created_at=datetime(2026, 1, 1, tzinfo=timezone.utc)
            + __import__("datetime").timedelta(seconds=i),
        )
        mem.content_hash = f"h{i:02d}"
        out.append(ScoredMemory(memory=mem, score=float(s), attribution=None))
    return out


class TestModel:
    def test_shipped_artifact_loads(self):
        model = lf.LearnedFusionModel.load()
        assert model is not None, "shipped learned_fusion.json failed to load"
        assert model.domain == "dialogue"
        for spec in model.buckets.values():
            assert len(spec["w"]) == len(lf.FEATURE_NAMES)
            assert 0.0 < spec["lam"] <= 1.0

    def test_stale_feature_map_rejected(self, tmp_path):
        p = tmp_path / "stale.json"
        p.write_text(json.dumps({"feature_names": ["old_feat"], "buckets": {}}))
        assert lf.LearnedFusionModel.load(p) is None

    def test_rerank_missing_bucket_is_noop(self):
        model = lf.LearnedFusionModel(buckets={})
        scored = _mk_scored([3.0, 2.0, 1.0])
        feats = np.zeros((3, len(lf.FEATURE_NAMES)), np.float32)
        assert model.rerank("factual", scored, feats) is scored

    def test_rerank_deterministic_and_blend(self):
        w = np.zeros(len(lf.FEATURE_NAMES), np.float32)
        w[0] = 10.0  # weight the "vec" feature only
        model = lf.LearnedFusionModel(
            buckets={"factual": {"w": w.tolist(), "b": 0.0, "lam": 1.0}}
        )
        scored = _mk_scored([3.0, 2.0, 1.0])
        feats = np.zeros((3, len(lf.FEATURE_NAMES)), np.float32)
        feats[2, 0] = 1.0  # last (lowest base) candidate has the vec signal
        out = model.rerank("factual", scored, feats)
        assert [s.memory.id for s in out] == ["m2", "m0", "m1"]
        out2 = model.rerank("factual", scored, feats)
        assert [s.memory.id for s in out2] == [s.memory.id for s in out]

    def test_rerank_lam_zero_keeps_base(self):
        w = np.ones(len(lf.FEATURE_NAMES), np.float32)
        model = lf.LearnedFusionModel(
            buckets={"factual": {"w": w.tolist(), "b": 0.0, "lam": 0.0}}
        )
        scored = _mk_scored([3.0, 2.0, 1.0])
        feats = np.random.default_rng(0).random((3, len(lf.FEATURE_NAMES))).astype(np.float32)
        out = model.rerank("factual", scored, feats)
        assert [s.memory.id for s in out] == ["m0", "m1", "m2"]


class TestExport:
    def test_capture_keeps_deep_golds(self):
        scored = _mk_scored(np.linspace(10, 1, lf.EXPORT_M + 50))
        gold_deep = scored[lf.EXPORT_M + 7].memory.id
        lf.arm_export("case-1", "multi_hop", {gold_deep, scored[0].memory.id})
        feats = np.zeros((len(scored), len(lf.FEATURE_NAMES)), np.float32)
        lf.capture(scored, feats, "factual", "q")
        sink = lf.disarm_export()
        rec = sink.records[0]
        assert rec["n_gold_pool"] == 2
        labels = {r[1]: r[0] for r in rec["rows"]}
        assert labels[0] == 1  # top gold kept
        assert labels[lf.EXPORT_M + 7] == 1  # deep gold kept past EXPORT_M
        assert len(rec["rows"]) == lf.EXPORT_M + 1
        assert len(rec["hashes"]) == len(rec["rows"])

    def test_disarm_clears(self):
        lf.arm_export("c", "cat", set())
        assert lf.export_armed()
        lf.disarm_export()
        assert not lf.export_armed()


class TestEngineIntegration:
    @pytest.fixture()
    def system(self, tmp_path):
        from shodh_tpu.engine.memory_system import MemorySystem

        sys_ = MemorySystem(tmp_path / "sys")
        yield sys_
        sys_.close()

    def _ingest_dialogue(self, system, n=12):
        from shodh_tpu.types import Experience, ExperienceType

        for i in range(n):
            system.remember(
                Experience(
                    content=f"Alice: I tried making dessert number {i} yesterday",
                    experience_type=ExperienceType.CONVERSATION,
                )
            )
        system.flush()

    def test_domain_gate_blocks_notes_store(self, system, monkeypatch):
        """A notes-majority store must not apply dialogue-fitted weights:
        recall with LF on == recall with LF off, byte-identical."""
        from shodh_tpu.types import Experience, ExperienceType, Query

        for i in range(12):
            system.remember(
                Experience(
                    content=f"note about topic {i} with details",
                    experience_type=ExperienceType.OBSERVATION,
                )
            )
        system.flush()
        assert system._store_domain() == "notes"
        q = Query(query_text="what topic details", max_results=5)
        base = [r for r in system.recall(q).ids]
        monkeypatch.setenv("SHODH_LEARNED_FUSION", "1")
        assert [r for r in system.recall(q).ids] == base

    def test_dialogue_store_applies_model(self, system, monkeypatch):
        self._ingest_dialogue(system)
        assert system._store_domain() == "dialogue"

    def test_ab_override_arms_without_env(self, system, monkeypatch):
        """A running scoring experiment's learned_fusion override arms the
        rerank (ab_testing.rs LearnedWeights served through the manager)."""
        calls = []
        real = lf.LearnedFusionModel.rerank

        def spy(self, bucket, scored, feats):
            calls.append(bucket)
            return real(self, bucket, scored, feats)

        monkeypatch.setattr(lf.LearnedFusionModel, "rerank", spy)
        monkeypatch.delenv("SHODH_LEARNED_FUSION", raising=False)
        self._ingest_dialogue(system)
        from shodh_tpu.types import Query

        from datetime import datetime, timezone

        system.ab.create(
            name="scoring:learned-fusion",
            # default is ON since round 5, so the control arm must carry an
            # explicit 0.0 to disarm (an empty dict would inherit the env
            # default rather than pin the arm)
            variants={"control": {"learned_fusion": 0.0},
                      "learned": {"learned_fusion": 1.0}},
            now=datetime(2026, 1, 2, tzinfo=timezone.utc),
        )
        exps = [e for e in system.ab.list() if e.name == "scoring:learned-fusion"]
        system.ab.set_status(exps[0].id, "running")
        variant = system.ab.assign(exps[0], system.data_dir.name)
        system.recall_with_diagnostics({"query_text": "what desserts were made", "max_results": 5})
        if variant == "learned":
            assert calls, "override did not arm the learned rerank"
        else:
            assert not calls, "control variant must not rerank"
