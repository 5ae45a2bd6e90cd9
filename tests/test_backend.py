"""Backend selector, downloader offline gate, KB linking, ablation switches."""

import numpy as np
import pytest

from shodh_tpu.index.backend import VectorIndexBackend
from shodh_tpu.models.hash_embedder import HashEmbedder
from shodh_tpu.nlp.kb import KBEntity, KnowledgeBase


def _unit(n, d, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


class TestBackendSelector:
    def test_small_uses_exact(self):
        v = _unit(100, 32)
        b = VectorIndexBackend.auto(v)
        assert b.kind == "exact"
        _, rows = b.search(v[:2], k=1)
        np.testing.assert_array_equal(rows[:, 0], [0, 1])

    def test_large_uses_ivf(self):
        v = _unit(600, 32)
        b = VectorIndexBackend.auto(v, threshold=500)
        assert b.kind == "ivf"
        _, rows = b.search(v[:2], k=1, nprobe=8)
        np.testing.assert_array_equal(rows[:, 0], [0, 1])

    def test_mesh_uses_sharded(self):
        from shodh_tpu.parallel.mesh import make_mesh

        v = _unit(64, 32)
        b = VectorIndexBackend.auto(v, mesh=make_mesh(8))
        assert b.kind == "sharded"
        _, rows = b.search(v[:2], k=1)
        np.testing.assert_array_equal(rows[:, 0], [0, 1])


class TestDownloader:
    def test_offline_gate(self, tmp_path, monkeypatch):
        from shodh_tpu.models.downloader import OfflineError, ensure_minilm

        monkeypatch.setenv("SHODH_OFFLINE", "1")
        with pytest.raises(OfflineError):
            ensure_minilm(tmp_path / "nothing-here")

    def test_existing_checkpoint_passes(self, tmp_path, monkeypatch):
        from shodh_tpu.models.downloader import ensure_minilm

        monkeypatch.setenv("SHODH_OFFLINE", "1")
        ck = tmp_path / "ck"
        ck.mkdir()
        for f in ("config.json", "vocab.txt", "model.safetensors"):
            (ck / f).write_bytes(b"stub")
        assert ensure_minilm(ck) == ck

    def test_digest_verification(self, tmp_path, monkeypatch):
        from shodh_tpu.models.downloader import ensure_minilm

        monkeypatch.setenv("SHODH_OFFLINE", "1")
        ck = tmp_path / "ck"
        ck.mkdir()
        for f in ("config.json", "vocab.txt", "model.safetensors"):
            (ck / f).write_bytes(b"stub")
        with pytest.raises(ValueError, match="digest mismatch"):
            ensure_minilm(ck, expected_sha256={"vocab.txt": "0" * 64})


class TestKnowledgeBase:
    def test_exact_alias_with_type_block(self):
        kb = KnowledgeBase()
        kb.add(KBEntity(id="Q1", name="Apple", entity_type="company", aliases=["apple inc"]))
        kb.add(KBEntity(id="Q2", name="Apple", entity_type="other", aliases=["apple fruit"]))
        hit = kb.link("Apple", label="organization")
        assert hit is not None and hit.id == "Q1"

    def test_cosine_linking(self):
        kb = KnowledgeBase(HashEmbedder())
        kb.add(KBEntity(id="Q1", name="Kubernetes container orchestration", entity_type="software"))
        kb.add(KBEntity(id="Q2", name="Gardening tips for spring", entity_type="other"))
        hit = kb.link("kubernetes cluster", label="technology", threshold=0.1)
        assert hit is not None and hit.id == "Q1"

    def test_jsonl_roundtrip(self, tmp_path):
        p = tmp_path / "kb.jsonl"
        p.write_text('{"id": "Q5", "name": "Berlin", "type": "city"}\n')
        kb = KnowledgeBase.load_jsonl(p)
        assert kb.link("berlin", label="location").id == "Q5"
