"""Embedding-layer tests: tokenizer, MiniLM architecture parity vs
transformers' BertModel (random weights, no network), hash embedder,
chunking, cache + circuit breaker."""

import numpy as np
import pytest

from shodh_tpu.models.chunking import chunk_content, fixed_chunks, needs_chunking
from shodh_tpu.models.hash_embedder import HashEmbedder
from shodh_tpu.models.tokenizer import WordPieceTokenizer


def _tiny_vocab():
    words = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
        "the", "rust", "back", "##end", "memory", "safe", "##ty",
        "we", "chose", "for", "team", "go", ",", ".", "un", "##want", "##ed",
    ]
    return {w: i for i, w in enumerate(words)}


class TestTokenizer:
    def test_basic_wordpiece(self):
        tok = WordPieceTokenizer(_tiny_vocab())
        ids = tok.encode("We chose Rust for the backend.")
        # [CLS] we chose rust for the back ##end . [SEP]
        v = _tiny_vocab()
        assert ids == [
            v["[CLS]"], v["we"], v["chose"], v["rust"], v["for"], v["the"],
            v["back"], v["##end"], v["."], v["[SEP]"],
        ]

    def test_unknown_token(self):
        tok = WordPieceTokenizer(_tiny_vocab())
        ids = tok.encode("zzzzqqq")
        assert ids == [tok.cls_id, tok.unk_id, tok.sep_id]

    def test_batch_padding(self):
        tok = WordPieceTokenizer(_tiny_vocab())
        ids, mask = tok.encode_batch(["the rust", "we chose the rust backend"])
        assert ids.shape == mask.shape
        assert mask[0].sum() < mask[1].sum()
        assert (ids[0][int(mask[0].sum()):] == tok.pad_id).all()

    def test_truncation(self):
        tok = WordPieceTokenizer(_tiny_vocab())
        ids = tok.encode("the " * 500, max_len=16)
        assert len(ids) == 16
        assert ids[-1] == tok.sep_id


class TestMiniLMRealWeights:
    """SURVEY §7 step 2 acceptance: cosine >= 0.999 vs the reference
    geometry on a REAL all-MiniLM-L6-v2 checkpoint. Skips when no
    checkpoint is on disk (this build environment has zero egress; run
    `shodh-tpu setup-models` on a networked host to activate)."""

    @pytest.mark.slow
    def test_parity_machinery_on_synthetic_checkpoint(self, tmp_path):
        """End-to-end setup-models parity path against a saved HF checkpoint
        (random weights): exercises safetensors loading, config adaptation,
        tokenizer agreement with BertTokenizerFast, and the oracle recipe."""
        torch = pytest.importorskip("torch")
        from transformers import BertConfig, BertModel

        from shodh_tpu.models.minilm import CONFIG
        from shodh_tpu.models.parity import minilm_geometry_parity

        cfg = BertConfig(
            vocab_size=None,
            hidden_size=CONFIG["hidden"],
            num_hidden_layers=2,
            num_attention_heads=CONFIG["heads"],
            intermediate_size=CONFIG["ffn"],
            max_position_embeddings=128,
        )
        words = (
            "[PAD] [UNK] [CLS] [SEP] [MASK] the we to for a of on with use "
            "decided sqlite storage layer first deploy failed permissions "
            "error socket alice prefers reviewing pull requests in morning "
            "quarterly numbers revenue grew while churn stayed flat remind "
            "me rotate api credentials before friday robot lidar flagged an "
            "obstacle near waypoint seven how do transformers handle long "
            "range dependencies migration vector index finished without "
            "data loss ##s ##ed ##ing ##er 14 % . : ' ?"
        ).split()
        cfg.vocab_size = len(words)
        (tmp_path / "vocab.txt").write_text("\n".join(words) + "\n")
        torch.manual_seed(0)
        BertModel(cfg).eval().save_pretrained(tmp_path)

        report = minilm_geometry_parity(tmp_path)
        assert report["pass"], report

    def test_geometry_parity_real_checkpoint(self):
        from shodh_tpu.models.parity import checkpoint_available, minilm_geometry_parity

        if not checkpoint_available():
            pytest.skip("no MiniLM checkpoint on disk (zero-egress host); see setup-models")
        from shodh_tpu.models.embedder import DEFAULT_MINILM_DIR

        report = minilm_geometry_parity(DEFAULT_MINILM_DIR)
        assert report["pass"], report
        # int8 weight-only quant: sub-percent geometry loss expected
        assert report["int8"]["min_cosine"] > 0.99, report


class TestMiniLMArchitecture:
    @pytest.mark.slow
    def test_parity_with_transformers_bert(self):
        """Our JAX forward must match HF BertModel (random weights) to ~1e-5.

        This pins the architecture so that a real all-MiniLM-L6-v2 checkpoint
        loads correctly when available (no network needed for the test).
        """
        torch = pytest.importorskip("torch")
        from transformers import BertConfig, BertModel

        from shodh_tpu.models.minilm import CONFIG, encode_tokens, params_from_state_dict

        cfg = BertConfig(
            vocab_size=200,
            hidden_size=CONFIG["hidden"],
            num_hidden_layers=CONFIG["layers"],
            num_attention_heads=CONFIG["heads"],
            intermediate_size=CONFIG["ffn"],
            max_position_embeddings=64,
        )
        torch.manual_seed(0)
        model = BertModel(cfg).eval()
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        our_cfg = dict(CONFIG, vocab_size=200, max_position=64)
        params = params_from_state_dict(state, our_cfg)

        rng = np.random.default_rng(0)
        ids = rng.integers(0, 200, size=(2, 12)).astype(np.int32)
        mask = np.ones((2, 12), np.float32)
        mask[1, 8:] = 0.0

        with torch.no_grad():
            hf_out = model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).last_hidden_state.numpy()
        # HF mean pool + L2 norm (sentence-transformers recipe)
        denom = mask.sum(axis=1, keepdims=True)
        pooled = (hf_out * mask[:, :, None]).sum(axis=1) / denom
        want = pooled / np.linalg.norm(pooled, axis=1, keepdims=True)

        got = np.asarray(encode_tokens(params, ids, mask))
        cos = (got * want).sum(axis=1)
        assert cos.min() > 0.99999, f"architecture divergence, cos={cos}"

    def test_forward_shape_and_norm(self):
        from shodh_tpu.models.minilm import CONFIG, encode_tokens, init_params

        cfg = dict(CONFIG, vocab_size=100, max_position=32)
        params = init_params(0, cfg)
        ids = np.array([[2, 5, 6, 3, 0, 0]], np.int32)
        mask = np.array([[1, 1, 1, 1, 0, 0]], np.float32)
        out = np.asarray(encode_tokens(params, ids, mask))
        assert out.shape == (1, cfg["hidden"])
        assert np.isclose(np.linalg.norm(out[0]), 1.0, atol=1e-5)

    def test_int8_weight_quantization(self):
        """Weight-only int8 must keep the embedding geometry (cos > 0.99)."""
        from shodh_tpu.models.minilm import (
            CONFIG,
            encode_tokens,
            init_params,
            quantize_params_int8,
        )

        cfg = dict(CONFIG, vocab_size=100, max_position=32)
        params = init_params(0, cfg)
        qparams = quantize_params_int8(params)
        ids = np.array([[2, 5, 6, 3, 7, 8]], np.int32)
        mask = np.ones((1, 6), np.float32)
        full = np.asarray(encode_tokens(params, ids, mask))
        quant = np.asarray(encode_tokens(qparams, ids, mask))
        cos = float((full * quant).sum())
        assert cos > 0.99, f"int8 quantization broke geometry: cos={cos}"

    def test_padding_invariance(self):
        """Extra padding must not change the embedding (mask correctness)."""
        from shodh_tpu.models.minilm import CONFIG, encode_tokens, init_params

        cfg = dict(CONFIG, vocab_size=100, max_position=32)
        params = init_params(0, cfg)
        ids1 = np.array([[2, 5, 6, 3]], np.int32)
        mask1 = np.ones((1, 4), np.float32)
        ids2 = np.array([[2, 5, 6, 3, 0, 0, 0, 0]], np.int32)
        mask2 = np.array([[1, 1, 1, 1, 0, 0, 0, 0]], np.float32)
        a = np.asarray(encode_tokens(params, ids1, mask1))
        b = np.asarray(encode_tokens(params, ids2, mask2))
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestHashEmbedder:
    def test_deterministic(self):
        e1, e2 = HashEmbedder(), HashEmbedder()
        a = e1.encode("we chose rust for the backend")
        b = e2.encode("we chose rust for the backend")
        np.testing.assert_array_equal(a, b)
        assert np.isclose(np.linalg.norm(a), 1.0, atol=1e-5)

    def test_lexical_similarity_ordering(self):
        e = HashEmbedder()
        q = e.encode_query("Why did we pick Rust over Go for the backend?")
        pos = e.encode("We chose Rust for the backend because of memory safety.")
        neg = e.encode("The quarterly marketing report shipped late again.")
        assert float(q @ pos) > float(q @ neg) + 0.05

    def test_inflection_folding(self):
        e = HashEmbedder()
        a = e.encode("deploying the services")
        b = e.encode("deployed the service")
        assert float(a @ b) > 0.5

    def test_batch_matches_single(self):
        e = HashEmbedder(use_device=False)
        texts = ["alpha beta gamma", "rust memory safety", "spatial geohash index"]
        batch = e.encode_batch(texts)
        singles = np.stack([e.encode(t) for t in texts])
        np.testing.assert_allclose(batch, singles, atol=1e-5)


class TestChunking:
    def test_short_content_single_chunk(self):
        assert chunk_content("short text") == ["short text"]
        assert not needs_chunking("short text")

    def test_fixed_chunks_overlap(self):
        words = " ".join(f"w{i}" for i in range(500))
        chunks = fixed_chunks(words, size=200, overlap=50)
        assert all(len(c.split()) <= 200 for c in chunks)
        # overlap: chunk 2 starts 150 words in
        assert chunks[1].split()[0] == "w150"
        # full coverage
        assert chunks[-1].split()[-1] == "w499"

    def test_semantic_chunking_on_paragraphs(self):
        paras = "\n\n".join(" ".join(f"p{i}w{j}" for j in range(80)) for i in range(5))
        chunks = chunk_content(paras)
        assert len(chunks) >= 2
        assert all(len(c.split()) <= 256 for c in chunks)


class TestWrappers:
    def test_cache_hits(self):
        from shodh_tpu.models.embedder import CachedEmbedder

        e = CachedEmbedder(HashEmbedder())
        e.encode("hello world")
        e.encode("hello world")
        assert e.hits == 1 and e.misses == 1
        out = e.encode_batch(["hello world", "new text"])
        assert out.shape == (2, 384)
        assert e.hits == 2

    def test_circuit_breaker(self):
        from shodh_tpu.models.embedder import CircuitBreakerEmbedder

        class Failing:
            name = "fail"
            dimension = 4

            def encode(self, text):
                raise RuntimeError("boom")

            def encode_query(self, text):
                raise RuntimeError("boom")

            def encode_batch(self, texts):
                raise RuntimeError("boom")

        b = CircuitBreakerEmbedder(Failing())
        for _ in range(5):
            with pytest.raises(RuntimeError, match="boom"):
                b.encode("x")
        with pytest.raises(RuntimeError, match="circuit breaker open"):
            b.encode("x")

    def test_default_embedder_offline(self):
        from shodh_tpu.models.embedder import default_embedder

        e = default_embedder()
        assert e.dimension == 384
        assert e.encode("test").shape == (384,)


class TestConvertTools:
    """Weights-arrival runbook (tools/convert_minilm.py, convert_gliner.py):
    synthetic tiny HF checkpoint -> converted npz artifact -> loads and
    serves identically. The day a real checkpoint arrives, the same two
    commands close the trained-embedder gap."""

    def _synthetic_checkpoint(self, tmp_path):
        torch = pytest.importorskip("torch")
        from transformers import BertConfig, BertModel

        from shodh_tpu.models.minilm import CONFIG

        cfg = BertConfig(
            vocab_size=None,
            hidden_size=CONFIG["hidden"],
            num_hidden_layers=2,
            num_attention_heads=CONFIG["heads"],
            intermediate_size=CONFIG["ffn"],
            max_position_embeddings=128,
        )
        words = (
            "[PAD] [UNK] [CLS] [SEP] [MASK] the we to for a of on with use "
            "decided sqlite storage layer first deploy failed permissions "
            "error socket alice prefers reviewing pull requests in morning "
            "quarterly numbers revenue grew while churn stayed flat remind "
            "me rotate api credentials before friday robot lidar flagged an "
            "obstacle near waypoint seven how do transformers handle long "
            "range dependencies migration vector index finished without "
            "data loss ##s ##ed ##ing ##er 14 % . : ' ?"
        ).split()
        cfg.vocab_size = len(words)
        tmp_path.mkdir(parents=True, exist_ok=True)
        (tmp_path / "vocab.txt").write_text("\n".join(words) + "\n")
        torch.manual_seed(0)
        BertModel(cfg).eval().save_pretrained(tmp_path)
        return tmp_path

    @pytest.mark.slow
    def test_convert_minilm_roundtrip(self, tmp_path):
        """convert() writes model.npz + parity report; the npz artifact
        loads through load_checkpoint and encodes bit-identically to the
        safetensors-loaded params."""
        import sys
        from pathlib import Path as _P

        sys.path.insert(0, str(_P(__file__).resolve().parent.parent))
        from tools.convert_minilm import convert

        ckpt = self._synthetic_checkpoint(tmp_path / "hf")
        out = tmp_path / "npz"
        report = convert(ckpt, out, int8=True)
        assert report["pass"], report
        assert (out / "model.npz").exists() and (out / "vocab.txt").exists()

        import jax

        from shodh_tpu.models.minilm import load_checkpoint

        p_hf = load_checkpoint(ckpt)
        p_npz = load_checkpoint(out)
        for a, b in zip(jax.tree.leaves(p_hf), jax.tree.leaves(p_npz)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_convert_gliner_synthetic(self, tmp_path):
        """convert() builds a loadable typer artifact (141-label embeds from
        the converted tower, random-init span head flagged in the report)."""
        import sys
        from pathlib import Path as _P

        sys.path.insert(0, str(_P(__file__).resolve().parent.parent))
        from tools.convert_gliner import convert

        ckpt = self._synthetic_checkpoint(tmp_path / "hf")
        out = tmp_path / "gliner"
        report = convert(ckpt, out)
        assert report["n_labels"] == 141
        assert "random-init" in report["span_head"]

        from shodh_tpu.models.gliner import load_typer

        typer = load_typer(out)
        spans_a = typer.extract("alice reviewed the pull requests")
        spans_b = typer.extract("alice reviewed the pull requests")
        assert [(s.text, s.fine_label) for s in spans_a] == [
            (s.text, s.fine_label) for s in spans_b
        ]
