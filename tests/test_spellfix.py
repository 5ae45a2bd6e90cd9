"""OOV query spell correction (retrieval/spellfix.py): a typoed query
term with zero postings recovers its Damerau-Levenshtein-1 vocabulary
neighbor; clean queries are untouched by construction (correction is
gated on posting-list emptiness)."""

import pytest

from shodh_tpu.retrieval.bm25 import BM25Index
from shodh_tpu.retrieval.spellfix import SpellFix, damerau1


class TestDamerau1:
    def test_identity_and_basic_edits(self):
        assert damerau1("package", "package")
        assert damerau1("pacage", "package")  # delete
        assert damerau1("packagee", "package")  # insert
        assert damerau1("packade", "package")  # substitute
        assert damerau1("pacakge", "package")  # adjacent transposition

    def test_distance_two_rejected(self):
        assert not damerau1("pckage", "packages")  # delete + insert
        assert not damerau1("pakkade", "package")  # two substitutions
        assert not damerau1("pacakg", "package")  # transpose + delete
        assert not damerau1("abc", "abcde")  # length gap 2

    def test_non_adjacent_swap_rejected(self):
        assert not damerau1("eackagp", "package")


class TestSpellFix:
    def _postings(self, **df):
        # term -> fake posting list with the requested document frequency
        return {t: {f"d{i}": 1.0 for i in range(n)} for t, n in df.items()}

    def test_recovers_ed1_neighbor(self):
        sf = SpellFix()
        p = self._postings(receiv=3, ship=2)
        assert sf.fix("reciev", p) == "receiv"  # transposition

    def test_highest_df_then_lexicographic(self):
        sf = SpellFix()
        p = self._postings(brand=5, braid=2)
        assert sf.fix("brald", p) == "brand"  # df 5 beats df 2
        sf2 = SpellFix()  # fresh index: same-size vocab would not re-trigger a build
        p2 = self._postings(store=3, story=3)
        assert sf2.fix("stors", p2) == "store"  # tie -> lexicographic

    def test_guards(self):
        sf = SpellFix()
        p = self._postings(wood=4, item=4, good=9)
        assert sf.fix("woo", p) is None  # len < 4
        assert sf.fix("wo0d", p) is None  # non-alphabetic input
        p["f-16"] = {"d0": 1.0}
        assert sf.fix("food", p) == "good"  # non-alpha vocab never proposed

    def test_rebuild_on_vocab_drift(self):
        sf = SpellFix()
        p = self._postings(alpha=2)
        assert sf.fix("alpma", p) == "alpha"
        # grow vocabulary well past the 5% drift threshold
        p.update(self._postings(**{f"term{i:03d}": 1 for i in range(50)}))
        p["gamma"] = {"d0": 1.0}
        assert sf.fix("gamna", p) == "gamma"


class TestBM25Integration:
    def _index(self):
        ix = BM25Index()
        ix.upsert("d1", "Alice received the package from the warehouse yesterday")
        ix.upsert("d2", "Bob shipped a package with tracking enabled")
        return ix

    def test_typo_query_matches_clean_ranking(self):
        ix = self._index()
        clean = [d for d, _ in ix.search("received package")]
        typo = [d for d, _ in ix.search("recieved pacakge")]
        assert clean == typo == ["d1", "d2"]

    def test_clean_queries_never_rewritten(self):
        # every query term has postings -> the fix path cannot fire, and
        # the native fast path (when present) is taken unchanged
        ix = self._index()
        r1 = ix.search("package warehouse")
        r2 = ix.search("package warehouse")
        assert r1 == r2 and r1[0][0] == "d1"

    def test_unfixable_term_still_drops(self):
        ix = self._index()
        assert ix.search("zzzzqqq") == []

    def test_term_weights_follow_the_fix(self):
        # the engine keys term_weights by stemmed query terms; a corrected
        # term must keep its IC weight or typo queries rank differently
        # from clean ones (the documented contract)
        from shodh_tpu.retrieval.bm25 import tokenize

        ix = self._index()
        clean_terms = tokenize("received warehouse")
        weights = dict(zip(clean_terms, (2.5, 1.3)))
        clean = ix.search("received warehouse", term_weights=dict(weights))
        typo_terms = tokenize("received warehouze")  # stem 'warehouz', ED1
        assert typo_terms != clean_terms  # the fix genuinely fires below
        typo_weights = dict(zip(typo_terms, (2.5, 1.3)))
        typo = ix.search("received warehouze", term_weights=typo_weights)
        assert [d for d, _ in clean] == [d for d, _ in typo]
        for (_, s1), (_, s2) in zip(clean, typo):
            assert s1 == pytest.approx(s2)

    def test_flag_off_restores_token_loss(self, monkeypatch):
        from shodh_tpu import constants as C

        ix = self._index()
        monkeypatch.setattr(C, "SPELLFIX", False)
        assert ix.search("pacakge") == []
        monkeypatch.setattr(C, "SPELLFIX", True)
        assert ix.search("pacakge")[0][0] in ("d1", "d2")
