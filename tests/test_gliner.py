"""GLiNER-shape span typer tests: decode semantics, forward shapes,
checkpoint round-trip, facade activation. Reference contract:
src/embeddings/gliner.rs:16-33 (7-input construction + SpanDecoder)."""

import numpy as np
import pytest

from shodh_tpu.models.gliner import (
    MAX_WIDTH,
    GlinerTyper,
    build_label_embeddings,
    decode_spans,
    init_span_head,
    load_gliner,
    save_gliner,
)


class TestDecode:
    def test_threshold_and_range(self):
        probs = np.zeros((4, MAX_WIDTH, 3), np.float32)
        probs[1, 0, 2] = 0.9  # word 1, width 1, class 2
        probs[3, 2, 0] = 0.8  # words 3..5 but n_words=4 -> out of range
        out = decode_spans(probs, n_words=4, threshold=0.3)
        assert out == [(1, 1, 2, pytest.approx(0.9))]

    def test_greedy_non_overlap_by_score(self):
        probs = np.zeros((6, MAX_WIDTH, 2), np.float32)
        probs[0, 2, 0] = 0.95  # words 0-2, wins
        probs[2, 1, 1] = 0.80  # words 2-3, overlaps the winner -> dropped
        probs[4, 0, 1] = 0.70  # word 4, kept
        out = decode_spans(probs, 6, 0.3)
        assert [(s, e, li) for s, e, li, _ in out] == [(0, 2, 0), (4, 4, 1)]

    def test_deterministic_tie_break(self):
        """Equal scores: earlier start wins, then narrower width."""
        probs = np.zeros((5, MAX_WIDTH, 1), np.float32)
        probs[1, 1, 0] = 0.6
        probs[1, 0, 0] = 0.6
        probs[3, 0, 0] = 0.6
        out = decode_spans(probs, 5, 0.3)
        assert [(s, e) for s, e, _, _ in out] == [(1, 1), (3, 3)]


def _tiny_typer(tmp_path, threshold=0.3):
    """Random-weight typer over a 2-layer trunk + 5 fine labels."""
    from shodh_tpu.models.minilm import CONFIG, init_params
    from shodh_tpu.models.tokenizer import WordPieceTokenizer

    words = (
        "[PAD] [UNK] [CLS] [SEP] [MASK] alice visited the tokyo office in "
        "april and filed a report ##s ##ed"
    ).split()
    tmp_path.mkdir(parents=True, exist_ok=True)
    (tmp_path / "vocab.txt").write_text("\n".join(words) + "\n")
    cfg = dict(CONFIG, vocab_size=len(words), layers=2, max_position=64)
    tower = init_params(0, cfg)
    span = init_span_head(1, cfg["hidden"])
    fine = ["person", "city", "organization", "date", "document"]
    rng = np.random.default_rng(2)
    labels = rng.standard_normal((len(fine), 384)).astype(np.float32)
    labels /= np.linalg.norm(labels, axis=1, keepdims=True)
    tok = WordPieceTokenizer.from_vocab_file(tmp_path / "vocab.txt")
    return GlinerTyper(tower, span, labels, tok, fine, threshold=threshold), (
        tower, span, labels,
    )


class TestTyper:
    def test_extract_shapes_and_offsets(self, tmp_path):
        typer, _ = _tiny_typer(tmp_path, threshold=-1.0)  # accept everything
        text = "alice visited the tokyo office"
        spans = typer.extract(text)
        assert spans, "threshold=-1 must yield at least one span"
        for s in spans:
            assert text[s.start : s.end] == s.text
            assert s.fine_label in typer.fine_labels
            assert 0.0 <= s.score <= 1.0
        # greedy flat NER: no overlapping char ranges
        ranges = sorted((s.start, s.end) for s in spans)
        assert all(a[1] <= b[0] for a, b in zip(ranges, ranges[1:]))

    def test_deterministic_repeat(self, tmp_path):
        typer, _ = _tiny_typer(tmp_path, threshold=-1.0)
        a = typer.extract("alice filed a report in april")
        b = typer.extract("alice filed a report in april")
        assert [(s.text, s.fine_label, s.score) for s in a] == [
            (s.text, s.fine_label, s.score) for s in b
        ]

    def test_empty_text(self, tmp_path):
        typer, _ = _tiny_typer(tmp_path)
        assert typer.extract("") == []


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        _, (tower, span, labels) = _tiny_typer(tmp_path / "mk")
        save_gliner(tmp_path / "ck", tower, span, labels,
                    fine_labels=["a", "b", "c", "d", "e"])
        t2, s2, l2 = load_gliner(tmp_path / "ck")
        np.testing.assert_array_equal(l2, labels)
        np.testing.assert_array_equal(s2["in_w"], span["in_w"])
        assert len(t2["layers"]) == len(tower["layers"])
        np.testing.assert_array_equal(
            np.asarray(t2["layers"][1]["q_w"]), np.asarray(tower["layers"][1]["q_w"])
        )

    def test_roundtrip_int8_tower(self, tmp_path):
        from shodh_tpu.models.minilm import CONFIG, init_params, quantize_params_int8

        cfg = dict(CONFIG, vocab_size=32, layers=1, max_position=32)
        tower = quantize_params_int8(init_params(0, cfg))
        span = init_span_head(1, cfg["hidden"])
        labels = np.eye(3, 384, dtype=np.float32)
        save_gliner(tmp_path / "ck8", tower, span, labels)
        t2, _, _ = load_gliner(tmp_path / "ck8")
        np.testing.assert_array_equal(
            np.asarray(t2["layers"][0]["q_w"]["q"]),
            np.asarray(tower["layers"][0]["q_w"]["q"]),
        )


class TestFacade:
    def test_activates_from_env(self, tmp_path, monkeypatch):
        (tmp_path / "mk").mkdir()
        typer, (tower, span, labels) = _tiny_typer(tmp_path / "mk")
        save_gliner(tmp_path / "ck", tower, span, labels,
                    fine_labels=["person", "city", "organization", "date", "document"])
        import shutil

        shutil.copy(tmp_path / "mk" / "vocab.txt", tmp_path / "ck" / "vocab.txt")
        monkeypatch.setenv("SHODH_GLINER_DIR", str(tmp_path / "ck"))
        from shodh_tpu.nlp.ner import NeuralNer

        ner = NeuralNer()
        assert not ner.degraded  # neural path armed
        out = ner.extract("alice visited tokyo")
        assert isinstance(out, list)

    def test_absent_dir_stays_rules(self, monkeypatch):
        monkeypatch.setenv("SHODH_GLINER_DIR", "/nonexistent/gliner")
        # distilled tagger off too: this test pins the rules-only
        # degradation floor (the distilled default path is covered in
        # test_distilled_ner.py)
        monkeypatch.setenv("SHODH_DISTILLED_NER", "0")
        from shodh_tpu.nlp.ner import NeuralNer

        ner = NeuralNer()
        assert ner.degraded
        assert ner.extract("Alice met Dr. Bob at Acme Corp")  # rules still fire

    def test_label_tower_from_embedder(self):
        from shodh_tpu.models.hash_embedder import HashEmbedder

        embs = build_label_embeddings(["person", "cargo_ship"], HashEmbedder())
        assert embs.shape[0] == 2
        np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, rtol=1e-5)