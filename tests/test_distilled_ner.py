"""Distilled NER: artifact loads, extraction quality, facade wiring.

The tagger is distilled from the reference's GLiNER output fixture
(7,400 annotated LoCoMo texts); training is tools/train_ner.py, the
held-out measurement lives in tools/ner_eval.py / BENCHMARKS.md. These
tests pin the runtime contract, not the training numbers.
"""

import pytest

from shodh_tpu.nlp import distilled_ner
from shodh_tpu.nlp.ner import NeuralNer


@pytest.fixture(scope="module")
def typer():
    if not distilled_ner.available():
        pytest.skip("distilled artifact not built")
    return distilled_ner.load_default()


class TestDistilledTagger:
    def test_dialogue_speakers_are_people(self, typer):
        spans = typer.extract("Melanie: I went pottery painting with my kids")
        by_type = {s.type: s.text for s in spans}
        assert by_type.get("PER") == "Melanie"

    def test_mid_sentence_names(self, typer):
        spans = typer.extract("According to Evan, what matters to Sam is consistency")
        pers = sorted(s.text for s in spans if s.type == "PER")
        assert pers == ["Evan", "Sam"]

    def test_offsets_slice_source_text(self, typer):
        text = "Caroline: We hiked near Lake Tahoe with Joanna last June"
        for s in typer.extract(text):
            assert text[s.start : s.end] == s.text

    def test_deterministic(self, typer):
        text = "John: Capturing that view in Yosemite was amazing"
        a = [(s.text, s.type, s.start) for s in typer.extract(text)]
        b = [(s.text, s.type, s.start) for s in typer.extract(text)]
        assert a == b

    def test_empty_and_degenerate_inputs(self, typer):
        assert typer.extract("") == []
        assert typer.extract("   ") == []
        typer.extract("?!?!")  # must not raise


class TestArtifactProvenance:
    def test_artifact_regenerates_byte_exact(self, tmp_path):
        """The committed weights are the deterministic product of
        tools/train_ner.py on the reference fixture — retraining must
        reproduce them byte-for-byte (proves the artifact is derived,
        not hand-tuned). Skipped where the fixture isn't available."""
        import pathlib

        fixture = pathlib.Path("/root/reference/tests/recall/locomo_ner_gliner.json")
        if not fixture.exists():
            pytest.skip("annotation fixture not available in this environment")
        from shodh_tpu.nlp.distilled_ner import _DATA, save
        from tools.ner_eval import load_fixture
        from tools.train_ner import train

        model = train(load_fixture(fixture), epochs=6)
        out = tmp_path / "retrained.json.gz"
        save(model, out)
        assert out.read_bytes() == _DATA.read_bytes()


class TestFacadeWiring:
    def test_facade_uses_distilled_by_default(self):
        ner = NeuralNer()
        assert not ner.degraded  # distilled model plugged
        out = ner.extract("Melanie: I adopted a rescue dog named Biscuit")
        labels = {m.text: m.label for m in out}
        assert labels.get("Melanie") == "person"

    def test_env_kill_switch(self, monkeypatch):
        monkeypatch.setenv("SHODH_DISTILLED_NER", "0")
        ner = NeuralNer()
        assert ner.degraded  # rules only

    def test_rule_union_out_of_domain(self):
        """Dialogue-distilled tagger + rule union must keep entities for
        out-of-domain shapes (no speaker colon, unseen names)."""
        ner = NeuralNer()
        out = {m.text.lower() for m in ner.extract(
            "Alice deployed the RocksDB migration for Acme Corp."
        )}
        assert any("alice" in t for t in out)

    def test_pronoun_misc_spans_filtered(self):
        ner = NeuralNer()
        out = {m.text.lower() for m in ner.extract(
            "Caroline: I told them that people should stretch before running"
        )}
        assert "them" not in out and "people" not in out


class TestNativeParity:
    """The C++ tagger (native/shodh_native.cpp shodh_ner_tag) must be
    byte-exact with the Python loop on ASCII inputs — same tags, same
    margins (same double accumulation order)."""

    def test_tags_and_margins_match_python(self):
        from shodh_tpu.nlp.distilled_ner import TAGS, load_default, tokenize_with_offsets
        from shodh_tpu.retrieval import native

        if not native.ner_available():
            import pytest

            pytest.skip("native lib unavailable")
        ner = load_default()
        texts = [
            "Caroline met Melanie at the Brooklyn Museum on Friday.",
            "According to Dr. Smith, NASA's rover reached Jezero Crater.",
            "alice: i'll bring the O'Brien files to ACME corp tomorrow",
            "The quick brown fox? Nothing to tag here!",
        ]
        for t in texts:
            words = [w for w, _, _ in tokenize_with_offsets(t)]
            pairs = native.ner_tag(words)
            assert pairs is not None and len(pairs) == len(words)
            saved = ner._native
            ner._native = False
            try:
                py_tags, py_margins = ner._tag(words)
            finally:
                ner._native = saved
            assert [TAGS[i] for i, _ in pairs] == py_tags
            for (_, m), pm in zip(pairs, py_margins):
                assert abs(m - pm) < 1e-12

    def test_non_ascii_falls_back_to_python(self):
        from shodh_tpu.nlp.distilled_ner import load_default

        ner = load_default()
        text = "Zoë visited São Paulo with François"
        spans = ner.extract(text)
        saved = ner._native
        ner._native = 0
        try:
            py_spans = ner.extract(text)
        finally:
            ner._native = saved
        # identical to the pure-Python path (the native tagger never sees
        # non-ASCII words — Unicode case predicates would diverge)
        assert [(s.text, s.type, s.start) for s in spans] == [
            (s.text, s.type, s.start) for s in py_spans
        ]

    def test_replaced_global_model_is_refused(self):
        """Ownership token: after ANOTHER artifact loads into the process-
        global C++ model, a stale instance must fall back to its own
        Python rows — never tag with foreign weights."""
        from shodh_tpu.nlp.distilled_ner import load_default
        from shodh_tpu.retrieval import native

        if not native.ner_available():
            import pytest

            pytest.skip("native lib unavailable")
        ner = load_default()
        text = "Caroline met Melanie at the Brooklyn Museum"
        before = [(s.text, s.type) for s in ner.extract(text)]
        old_token = ner._native
        assert old_token
        # a different (garbage) model takes the global slot
        native.ner_load({"w=caroline": [0.0] * 9})
        try:
            assert native.ner_tag(["Caroline"], expect_version=old_token) is None
            after = [(s.text, s.type) for s in ner.extract(text)]
            assert after == before  # python fallback, same output
        finally:
            ner._enable_native()  # restore ownership for other tests

    def test_nul_byte_content_falls_back_safely(self):
        """A NUL inside content truncates the C string at the boundary; the
        length-mismatch guard must route the text to the Python path
        instead of mis-aligning tags."""
        from shodh_tpu.nlp.distilled_ner import load_default

        ner = load_default()
        text = "Caroline visited\x00Berlin with Melanie"
        spans = ner.extract(text)
        saved = ner._native
        ner._native = False
        try:
            py_spans = ner.extract(text)
        finally:
            ner._native = saved
        assert [(s.text, s.type) for s in spans] == [
            (s.text, s.type) for s in py_spans
        ]
