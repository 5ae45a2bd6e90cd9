"""BM25 per-document param classes + document-side semantic expansion.

Round-3: the k1=0.6/b=0.3 dialogue retune is scoped per document class
(prose notes keep Okapi 1.2/0.75) and docs can carry idempotent
model-derived expansion terms. Host and native scorers must agree on both.
"""

import math

import pytest

from shodh_tpu.retrieval.bm25 import (
    B,
    B_NOTES,
    CLASS_DIALOGUE,
    CLASS_NOTES,
    K1,
    K1_NOTES,
    BM25Index,
    tokenize,
)

DOCS = [
    ("d1", "the payment service failed with a cascading timeout overnight"),
    ("d2", "payment retries exhausted after the timeout budget was hit"),
    ("d3", "lunch menu rotation for the offsite was finalized yesterday"),
    ("d4", "the search index rebuild finished without a single timeout"),
]


def _build(use_native: bool, classes=None) -> BM25Index:
    idx = BM25Index(use_native=use_native)
    for i, (doc_id, text) in enumerate(DOCS):
        cls = (classes or {}).get(doc_id, CLASS_DIALOGUE)
        idx.upsert(doc_id, text, param_class=cls)
    return idx


class TestParamClasses:
    def test_notes_class_scores_with_okapi_params(self):
        idx = _build(use_native=False, classes={"d3": CLASS_NOTES})
        hits = dict(idx.search("timeout payment", limit=4))
        # manual Okapi check for a dialogue doc
        n_docs = len(DOCS)
        avg_len = idx._total_len / n_docs
        plist = idx._postings[("timeout")]
        assert "d1" in plist
        df = len(plist)
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        tf = plist["d1"]
        dl = idx._doc_len["d1"]
        tf_norm = (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avg_len))
        assert hits["d1"] >= idf * tf_norm - 1e-6  # payment adds more

    def test_class_changes_score(self):
        plain = _build(use_native=False)
        scoped = _build(use_native=False, classes={"d1": CLASS_NOTES})
        s_plain = dict(plain.search("timeout", limit=4))["d1"]
        s_scoped = dict(scoped.search("timeout", limit=4))["d1"]
        assert s_plain != pytest.approx(s_scoped)
        # other docs unaffected
        assert dict(plain.search("timeout", limit=4))["d4"] == pytest.approx(
            dict(scoped.search("timeout", limit=4))["d4"]
        )

    def test_host_native_parity_with_classes(self):
        from shodh_tpu.retrieval.native import available

        if not available():
            pytest.skip("native lib unavailable")
        classes = {"d2": CLASS_NOTES, "d3": CLASS_NOTES}
        host = _build(use_native=False, classes=classes)
        nat = _build(use_native=True, classes=classes)
        assert nat._native is not None, "native scorer should be active"
        for q in ("timeout payment", "search index rebuild", "lunch offsite"):
            hh = host.search(q, limit=4)
            nh = nat.search(q, limit=4)
            assert [d for d, _ in hh] == [d for d, _ in nh]
            for (_, a), (_, b) in zip(hh, nh):
                assert a == pytest.approx(b, rel=1e-5)

    def test_class_persists(self, tmp_path):
        idx = BM25Index(tmp_path / "bm", use_native=False)
        idx.upsert("n1", "prose note about gardens", param_class=CLASS_NOTES)
        idx.upsert("c1", "Mel: chat turn about gardens", param_class=CLASS_DIALOGUE)
        idx.flush()
        re = BM25Index(tmp_path / "bm", use_native=False)
        assert re._doc_class.get("n1") == CLASS_NOTES
        assert "c1" not in re._doc_class
        a = re.search("gardens", limit=2)
        b = idx.search("gardens", limit=2)
        assert [d for d, _ in a] == [d for d, _ in b]
        for (_, x), (_, y) in zip(a, b):
            assert x == pytest.approx(y)


class TestExpansionTerms:
    # expansion terms are STEMS (the engine feeds model.neighbors_of_stem
    # output); tests must store what the query-side tokenizer produces
    CATER = tokenize("catering")[0]
    BANQ = tokenize("banquet")[0]

    def test_expansion_is_idempotent(self):
        idx = _build(use_native=False)
        base_len = idx._doc_len["d3"]
        idx.set_expansion_terms("d3", {self.CATER: 0.4})
        once = idx._doc_len["d3"]
        assert once == pytest.approx(base_len + 0.4)
        # replacing (as refits do) must not stack
        idx.set_expansion_terms("d3", {self.CATER: 0.4})
        assert idx._doc_len["d3"] == pytest.approx(once)
        # and the doc now matches the expansion term
        hits = dict(idx.search("catering", limit=4))
        assert "d3" in hits

    def test_expansion_replacement_removes_old_terms(self):
        idx = _build(use_native=False)
        idx.set_expansion_terms("d3", {self.CATER: 0.4})
        idx.set_expansion_terms("d3", {self.BANQ: 0.3})
        assert "d3" not in dict(idx.search("catering", limit=4))
        assert "d3" in dict(idx.search("banquet", limit=4))

    def test_expansion_persists_base_separation(self, tmp_path):
        idx = BM25Index(tmp_path / "bm", use_native=False)
        idx.upsert("x", "films at the festival were great")
        idx.set_expansion_terms("x", {"movi": 0.5})
        idx.flush()
        re = BM25Index(tmp_path / "bm", use_native=False)
        assert "x" in dict(re.search("movi", limit=2))
        # a refit replacing the expansion still recovers the clean base
        re.set_expansion_terms("x", {"cinema": 0.5})
        assert "x" not in dict(re.search("movi", limit=2))
        assert "x" in dict(re.search("cinema", limit=2))
        assert "x" in dict(re.search("festival films", limit=2))


class TestEngineWiring:
    def test_conversation_vs_note_doc_classes(self, tmp_path):
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, ExperienceType

        s = MemorySystem(tmp_path / "m")
        c = s.remember(Experience(
            content="Mel: let's plan the trip",
            experience_type=ExperienceType.CONVERSATION, tags=["t"],
        ))
        n = s.remember(Experience(content="trip planning checklist drafted"))
        assert s.bm25._doc_class.get(c.id) is None  # dialogue = class 0
        assert s.bm25._doc_class.get(n.id) == CLASS_NOTES
        s.close()
