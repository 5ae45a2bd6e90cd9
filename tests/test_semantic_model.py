"""Corpus-adaptive semantics: model fit/persistence, embedder blend,
BM25 expansion, and MemorySystem integration (models/semantic_model.py).

No reference analog — this subsystem substitutes for the trained-MiniLM
semantic leg (minilm.rs:172-186) in zero-egress deployments; the tests
enforce the same determinism contract as the rest of the recall stack.
"""

import os

import numpy as np
import pytest

from shodh_tpu.models.hash_embedder import HashEmbedder, content_stems
from shodh_tpu.models.semantic_model import CorpusSemanticModel

# A small synthetic corpus with clear co-occurrence structure.
_TOPICS = {
    "film": ["watched a great {x} last night", "the {x} festival screens tonight",
             "that {x} had amazing cinematography"],
    "food": ["cooked a spicy {x} for dinner", "the {x} recipe needs garlic",
             "shared the {x} with friends at lunch"],
    "hike": ["the {x} trail climbs past the waterfall", "went on a long {x} at sunrise",
             "my boots are muddy after the {x}"],
}
_WORDS = {"film": ["movie", "film", "thriller"], "food": ["curry", "stew", "soup"],
          "hike": ["hike", "trek", "walk"]}


_FILLER_WORDS = (
    "budget review planning quarterly meeting agenda deadline milestone sprint "
    "report metric dashboard revenue forecast launch roadmap design prototype "
    "customer interview survey analysis experiment hypothesis result summary "
    "architecture deployment rollout incident postmortem runbook oncall alert "
    "latency throughput capacity storage network compute cluster region zone"
).split()


def _corpus() -> list[str]:
    texts = []
    for topic, templates in _TOPICS.items():
        for w in _WORDS[topic]:
            for t in templates:
                texts.append(t.format(x=w) + f" and everyone talked about the {w} again")
    # pad above the 32-doc / 64-vocab fit floor: rotating filler vocabulary
    # where every word appears at least twice (min_count=2)
    for i in range(20):
        ws = [_FILLER_WORDS[(i * 5 + j) % len(_FILLER_WORDS)] for j in range(10)]
        texts.append("note about " + " ".join(ws))
    return texts


def test_fit_is_deterministic_and_order_independent():
    texts = _corpus()
    m1 = CorpusSemanticModel.fit(texts)
    m2 = CorpusSemanticModel.fit(list(reversed(texts)))
    assert m1 is not None and m2 is not None
    assert m1.corpus_fingerprint == m2.corpus_fingerprint
    assert m1.vocab == m2.vocab
    np.testing.assert_array_equal(m1.vectors, m2.vectors)


def test_fit_returns_none_below_floor():
    assert CorpusSemanticModel.fit(["tiny corpus"] * 5) is None


def test_cooccurrence_neighbors_capture_topics():
    m = CorpusSemanticModel.fit(_corpus())
    near = dict(m.neighbors("movie", 8))
    # "movie" and "film" share contexts (watched/festival/cinematography)
    assert "film" in near or "thriller" in near


def test_save_load_roundtrip(tmp_path):
    m = CorpusSemanticModel.fit(_corpus())
    m.fitted_n = 77
    m.save(tmp_path / "sem")
    loaded = CorpusSemanticModel.load(tmp_path / "sem")
    assert loaded is not None
    assert loaded.vocab == m.vocab
    assert loaded.fitted_n == 77
    assert loaded.corpus_fingerprint == m.corpus_fingerprint
    np.testing.assert_array_equal(loaded.vectors, m.vectors)
    q = "watched a thriller movie"
    np.testing.assert_allclose(loaded.text_vec(q), m.text_vec(q), atol=1e-6)


def test_load_missing_returns_none(tmp_path):
    assert CorpusSemanticModel.load(tmp_path / "absent") is None


def test_text_vec_oov_is_zero():
    m = CorpusSemanticModel.fit(_corpus())
    assert float(np.linalg.norm(m.text_vec("zzz qqq xyzzy"))) == 0.0


def test_expansion_terms_deterministic_and_filtered():
    m = CorpusSemanticModel.fit(_corpus())
    stems = list(dict.fromkeys(content_stems("watched a movie")))
    e1 = m.expansion_terms(stems, min_sim=0.1)
    e2 = m.expansion_terms(stems, min_sim=0.1)
    assert e1 == e2
    assert all(t not in set(stems) for t, _ in e1)
    assert all(s >= 0.1 for _, s in e1)
    # higher floor yields a subset
    hi = {t for t, _ in m.expansion_terms(stems, min_sim=0.5)}
    assert hi <= {t for t, _ in e1}


def test_hash_embedder_unchanged_without_model():
    texts = ["the quick brown fox", "jumps over the lazy dog"]
    a = HashEmbedder().encode_batch(texts)
    e = HashEmbedder()
    m = CorpusSemanticModel.fit(_corpus())
    e.set_semantic_model(m, weight=0.5)
    e.set_semantic_model(None, weight=0.0)
    assert e.name == "hash-projection-v1"
    np.testing.assert_array_equal(e.encode_batch(texts), a)


def test_hash_embedder_blend_changes_name_and_stays_normalized():
    e = HashEmbedder()
    m = CorpusSemanticModel.fit(_corpus())
    base = e.encode("watched a movie last night")
    e.set_semantic_model(m, weight=0.5)
    assert "sem" in e.name and m.corpus_fingerprint[:8] in e.name
    v = e.encode("watched a movie last night")
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5
    assert not np.array_equal(v, base)
    # weight 0: model attached but vectors identical to pure hash
    e.set_semantic_model(m, weight=0.0)
    np.testing.assert_array_equal(e.encode("watched a movie last night"), base)


def test_blend_preserves_semantic_cosine():
    """The orthonormal basis keeps semantic cosines exact in the 384-d space."""
    m = CorpusSemanticModel.fit(_corpus())
    e = HashEmbedder()
    e.set_semantic_model(m, weight=1.0)
    s1 = m.text_vec("watched the movie")
    s2 = m.text_vec("the film festival")
    p1 = s1 @ e._sem_basis.T
    p2 = s2 @ e._sem_basis.T
    assert abs(float(p1 @ p2) - float(s1 @ s2)) < 1e-5


@pytest.fixture()
def sem_env(monkeypatch):
    monkeypatch.setenv("SHODH_ADAPTIVE_SEMANTICS", "1")
    monkeypatch.setenv("SHODH_SEM_WEIGHT", "0")


def _ingest(system, n=40):
    from shodh_tpu.types import Experience

    texts = _corpus()[:n]
    for i, t in enumerate(texts):
        system.remember(Experience(content=f"{t} ({i})"))
    return texts


def test_memory_system_fits_on_flush(tmp_path, sem_env):
    from shodh_tpu.engine.memory_system import MemorySystem

    system = MemorySystem(tmp_path / "m")
    _ingest(system)
    assert system.adapt_semantics() is True
    base = system._base_embedder()
    assert base._sem_model is not None
    assert (tmp_path / "m" / "semantic_model.json").exists()
    # same corpus set: no refit churn
    assert system.adapt_semantics(force=True) is False
    system.close()

    # reopen: model reattaches so queries embed in the stored space
    reopened = MemorySystem(tmp_path / "m")
    assert reopened._base_embedder()._sem_model is not None
    reopened.close()


def test_memory_system_flag_off_no_fit(tmp_path, monkeypatch):
    monkeypatch.setenv("SHODH_ADAPTIVE_SEMANTICS", "0")
    from shodh_tpu.engine.memory_system import MemorySystem

    system = MemorySystem(tmp_path / "m")
    _ingest(system)
    assert system.adapt_semantics(force=True) is False
    assert system._base_embedder()._sem_model is None
    system.close()


def test_recall_with_expansion_is_deterministic(tmp_path, sem_env):
    from shodh_tpu.engine.memory_system import MemorySystem
    from shodh_tpu.types import Query

    system = MemorySystem(tmp_path / "m")
    _ingest(system)
    system.flush()  # triggers the fit
    q = Query(query_text="what thriller did we watch", max_results=5)
    r1 = system.recall(q)
    r2 = system.recall(q)
    assert r1.ids == r2.ids and len(r1.ids) > 0
    system.close()


def test_zero_weight_skips_rebuild(tmp_path, sem_env):
    from shodh_tpu.engine.memory_system import MemorySystem

    system = MemorySystem(tmp_path / "m")
    _ingest(system)
    rows_before = len(system.index)
    assert system.adapt_semantics() is True
    assert len(system.index) == rows_before  # no re-embed at weight 0
    system.close()


class TestPRF:
    """RM3-lite pseudo-relevance feedback (boost family "prf")."""

    def _system(self, tmp_path, monkeypatch):
        monkeypatch.setenv("SHODH_PRF", "1")
        from shodh_tpu.engine.memory_system import MemorySystem

        system = MemorySystem(tmp_path / "m")
        _ingest(system)
        system.flush()
        return system

    def test_feedback_terms_deterministic_and_exclude_query(self, tmp_path, monkeypatch):
        system = self._system(tmp_path, monkeypatch)
        from shodh_tpu.types import Query

        q = Query(query_text="how does the movie compare", max_results=5)
        r = system.recall(q)
        fused = {sm.memory.id: sm.score for sm in r.memories}
        t1 = system._prf_feedback_terms(fused, "how does the movie compare")
        t2 = system._prf_feedback_terms(fused, "how does the movie compare")
        assert t1 == t2
        qstems = set(content_stems("how does the movie compare"))
        assert all(t not in qstems for t, _ in t1)
        if t1:
            assert t1[0][1] == 1.0  # normalized to the top term
        system.close()

    def test_prf_recall_deterministic(self, tmp_path, monkeypatch):
        system = self._system(tmp_path, monkeypatch)
        from shodh_tpu.types import Query

        # The determinism contract holds under the harness conditions:
        # readonly recalls (else Hebbian coactivation legitimately
        # strengthens edges between the calls) AND a pinned clock (else
        # wall-time advancing between the calls moves recency decay and
        # flips near-tie candidates — observed as load-dependent flakes).
        monkeypatch.setenv("SHODH_RECALL_READONLY", "1")
        from shodh_tpu.utils import clock

        clock.pin_now(clock.scoring_now())
        try:
            q = Query(
                query_text="why was the festival screening so popular", max_results=5
            )
            r1 = system.recall(q)
            r2 = system.recall(q)
            assert r1.ids == r2.ids
        finally:
            clock.pin_now(None)
        system.close()

    def test_open_ended_predicate(self):
        from shodh_tpu.nlp.query_parser import QueryParser

        p = QueryParser()
        def armed(q):
            a = p.analyze(q)
            lo = q.lower().lstrip()
            oe = a.is_polar or lo.startswith("why ") or (
                lo.startswith("how ")
                and not lo.startswith(("how many", "how much", "how long",
                                       "how often", "how old", "how far"))
            )
            return oe and a.date_range is None and not a.is_temporal_seeking and not a.multihop

        assert armed("Why does Nate like turtles as pets?")
        assert armed("How does Nate describe the process?")
        assert not armed("How many times has Joanna been hiking?")
        assert not armed("How long did the book take?")
        assert not armed("What flavor of ice cream did Nate make on 25 February, 2022?")


class TestContextIndexing:
    """Context-augmented lexical indexing (CONTEXT_INDEX_WEIGHT)."""

    def test_pronoun_turn_findable_via_antecedent(self, tmp_path, monkeypatch):
        monkeypatch.setenv("SHODH_CONTEXT_INDEX_WEIGHT", "0.42")
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, ExperienceType, Query

        conv = ExperienceType.CONVERSATION
        system = MemorySystem(tmp_path / "m")
        system.remember(Experience(content="I adopted two turtles last spring", tags=["conv-a"], experience_type=conv))
        follow = system.remember(
            Experience(content="I have had them for three years and they bring joy", tags=["conv-a"], experience_type=conv)
        )
        # distractors from another conversation
        for i in range(10):
            system.remember(Experience(content=f"meeting note {i} about budget planning", tags=["conv-b"]))
        r = system.recall(Query(query_text="how long turtles", max_results=5))
        assert follow.id in r.ids  # "them" turn carries "turtle" from its antecedent
        system.close()

    def test_antecedent_requires_shared_tag(self, tmp_path, monkeypatch):
        monkeypatch.setenv("SHODH_CONTEXT_INDEX_WEIGHT", "0.42")
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, ExperienceType, Query

        conv = ExperienceType.CONVERSATION
        system = MemorySystem(tmp_path / "m")
        system.remember(Experience(content="I adopted two turtles last spring", tags=["conv-a"], experience_type=conv))
        other = system.remember(
            Experience(content="I have had them for three years", tags=["conv-b"], experience_type=conv)
        )
        # different conversation: the BM25 doc must NOT inherit "turtle"
        bm_hits = {d for d, _ in system.bm25.search("turtles", limit=10)}
        assert other.id not in bm_hits
        system.close()

    def test_context_tail_survives_reopen(self, tmp_path, monkeypatch):
        monkeypatch.setenv("SHODH_CONTEXT_INDEX_WEIGHT", "0.42")
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, ExperienceType, Query

        conv = ExperienceType.CONVERSATION
        system = MemorySystem(tmp_path / "m")
        system.remember(Experience(content="I adopted two turtles last spring", tags=["conv-a"], experience_type=conv))
        system.close()
        reopened = MemorySystem(tmp_path / "m")
        follow = reopened.remember(
            Experience(content="I have had them for three years", tags=["conv-a"],
                       experience_type=ExperienceType.CONVERSATION)
        )
        r = reopened.recall(Query(query_text="turtles", max_results=5))
        assert follow.id in r.ids
        reopened.close()

    def test_weight_zero_is_noop(self, tmp_path, monkeypatch):
        monkeypatch.setenv("SHODH_CONTEXT_INDEX_WEIGHT", "0")
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, ExperienceType, Query

        conv = ExperienceType.CONVERSATION
        system = MemorySystem(tmp_path / "m")
        system.remember(Experience(content="I adopted two turtles last spring", tags=["conv-a"], experience_type=conv))
        follow = system.remember(
            Experience(content="completely unrelated sentence about gardening", tags=["conv-a"], experience_type=conv)
        )
        bm_hits = {d for d, _ in system.bm25.search("turtles", limit=10)}
        assert follow.id not in bm_hits  # weight 0: no term inheritance
        system.close()

    def test_forward_context_reaches_predecessor(self, tmp_path, monkeypatch):
        monkeypatch.setenv("SHODH_CONTEXT_INDEX_WEIGHT", "0.42")
        monkeypatch.setenv("SHODH_CONTEXT_FWD_WEIGHT", "0.6")
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, ExperienceType

        conv = ExperienceType.CONVERSATION
        system = MemorySystem(tmp_path / "m")
        vague = system.remember(
            Experience(content="something bad happened to me yesterday", tags=["conv-a"], experience_type=conv)
        )
        system.remember(
            Experience(content="the car accident left my bumper dented", tags=["conv-a"], experience_type=conv)
        )
        # the vague turn is findable by the successor's terms
        bm_hits = {d for d, _ in system.bm25.search("car accident", limit=10)}
        assert vague.id in bm_hits
        system.close()

    def test_forward_context_applies_once(self, tmp_path, monkeypatch):
        monkeypatch.setenv("SHODH_CONTEXT_INDEX_WEIGHT", "0.42")
        monkeypatch.setenv("SHODH_CONTEXT_FWD_WEIGHT", "0.6")
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, ExperienceType

        conv = ExperienceType.CONVERSATION
        system = MemorySystem(tmp_path / "m")
        first = system.remember(Experience(content="alpha event", tags=["conv-a"], experience_type=conv))
        system.remember(Experience(content="beta follows quickly", tags=["conv-a"], experience_type=conv))
        len_after_one = system.bm25._doc_len[first.id]
        system.remember(Experience(content="gamma concludes things", tags=["conv-a"], experience_type=conv))
        # only the immediate successor's terms folded into `first`
        assert system.bm25._doc_len[first.id] == len_after_one
        system.close()
