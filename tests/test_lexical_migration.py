"""Lexical fold-table drift migration (memory_system.migrate_lexical).

Persisted BM25 postings and hash-embedder vectors keep the stems they
were written with; an upgrade that changes stem() (new fold-table
entries, backend flip) would silently split old documents from new
queries. The store stamps a lexical fingerprint at open; a mismatch
triggers a one-time replay that re-derives postings/vectors from stored
content. The replay shares _index_lexical with remember(), so with
unchanged tables it must reproduce the live index BIT-FOR-BIT —
including ingest-order context inheritance — which these tests assert.
"""

import copy

import numpy as np
import pytest

from shodh_tpu.engine.memory_system import MemorySystem
from shodh_tpu.retrieval.bm25 import lexical_fingerprint
from shodh_tpu.types import Experience, ExperienceType, Query


def _fill(sys_):
    """Conversation turns w/ shared tags (context inheritance fires),
    a notes doc (param class 1), and a caller-embedded record."""
    sys_.remember(
        Experience(
            content="Alice booked the flight to Lisbon for the robotics conference",
            experience_type=ExperienceType.CONVERSATION,
            tags=["travel"],
        )
    )
    sys_.remember(
        Experience(
            content="She also reserved the hotel near the venue",
            experience_type=ExperienceType.CONVERSATION,
            tags=["travel"],
        )
    )
    sys_.remember(
        Experience(
            content="Quarterly budget review: infra spend increased eight percent",
            experience_type=ExperienceType.OBSERVATION,
            tags=["finance"],
        )
    )
    sys_.remember(
        Experience(
            content="precomputed vector record",
            embeddings=np.ones(sys_.embedder.dimension, np.float32).tolist(),
        )
    )


def _snapshot(sys_):
    return (
        copy.deepcopy(dict(sys_.bm25._postings)),
        dict(sys_.bm25._doc_len),
        dict(sys_.bm25._doc_class),
    )


def _recall_ids(sys_, text):
    return sys_.recall(Query(query_text=text, max_results=5)).ids


class TestFingerprintStamp:
    def test_fresh_store_is_stamped(self, tmp_path):
        sys_ = MemorySystem(tmp_path / "m")
        try:
            stamp = sys_.storage.kv.get("meta", "lexical_fp")
            assert stamp is not None and stamp.decode() == lexical_fingerprint()
        finally:
            sys_.close()

    def test_clean_reopen_does_not_migrate(self, tmp_path, monkeypatch):
        sys_ = MemorySystem(tmp_path / "m")
        _fill(sys_)
        sys_.close()
        calls = []
        monkeypatch.setattr(
            MemorySystem, "migrate_lexical", lambda self, fp=None: calls.append(1)
        )
        sys_ = MemorySystem(tmp_path / "m")
        try:
            assert calls == []
        finally:
            sys_.close()


class TestMigrationReplay:
    def test_stale_stamp_replays_postings_exactly(self, tmp_path):
        sys_ = MemorySystem(tmp_path / "m")
        _fill(sys_)
        want = _snapshot(sys_)
        # context inheritance materialized: the pronoun-heavy second turn
        # carries its antecedent's terms ("lisbon" via ctx fold)
        want_ctx = _recall_ids(sys_, "Where is the hotel Alice reserved?")
        want_vec = _recall_ids(sys_, "conference travel booking")
        sys_.storage.kv.put("meta", "lexical_fp", b"stale-fingerprint")
        sys_.close()

        sys_ = MemorySystem(tmp_path / "m")
        try:
            assert _snapshot(sys_) == want  # replay == original ingest, bit-for-bit
            stamp = sys_.storage.kv.get("meta", "lexical_fp")
            assert stamp.decode() == lexical_fingerprint()
            assert _recall_ids(sys_, "Where is the hotel Alice reserved?") == want_ctx
            assert _recall_ids(sys_, "conference travel booking") == want_vec
        finally:
            sys_.close()

    def test_caller_embeddings_not_reembedded(self, tmp_path):
        sys_ = MemorySystem(tmp_path / "m")
        _fill(sys_)
        pre_id = next(
            m.id for m in sys_.storage.iter_memories()
            if m.experience.embeddings is not None
        )
        rows_before = sys_.storage.get_vector_map(pre_id).get("text")
        sys_.storage.kv.put("meta", "lexical_fp", b"stale-fingerprint")
        sys_.close()
        sys_ = MemorySystem(tmp_path / "m")
        try:
            # precomputed vectors are not stem-derived: rows stay put
            assert sys_.storage.get_vector_map(pre_id).get("text") == rows_before
        finally:
            sys_.close()

    def test_readonly_open_never_migrates(self, tmp_path):
        sys_ = MemorySystem(tmp_path / "m")
        _fill(sys_)
        sys_.storage.kv.put("meta", "lexical_fp", b"stale-fingerprint")
        sys_.close()
        sys_ = MemorySystem(tmp_path / "m", readonly=True)
        try:
            stamp = sys_.storage.kv.get("meta", "lexical_fp")
            assert stamp == b"stale-fingerprint"  # untouched: one writer only
        finally:
            sys_.close()


class TestNormFoldStrictParse:
    def test_unrecognized_mode_warns_and_defaults_to_hash(self):
        # A typo'd SHODH_NORM_FOLD must NOT fail open into folds-off: the
        # fold feeds persisted postings, so a silent tokenization change
        # splits old documents from new queries (the migration this file
        # tests exists precisely because that split is costly).
        import subprocess
        import sys as _sys

        proc = subprocess.run(
            [
                _sys.executable,
                "-c",
                "import warnings\n"
                "with warnings.catch_warnings(record=True) as w:\n"
                "    warnings.simplefilter('always')\n"
                "    from shodh_tpu import constants as C\n"
                "    assert C.NORM_FOLD_MODE == 'hash', C.NORM_FOLD_MODE\n"
                "    assert C.NORM_FOLD is True\n"
                "    assert any('SHODH_NORM_FOLD' in str(x.message) for x in w)\n"
                "print('ok')",
            ],
            env={"SHODH_NORM_FOLD": "both", "PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo"},
            capture_output=True,
            text=True,
            timeout=60,
        )
        assert proc.returncode == 0 and "ok" in proc.stdout, proc.stderr


class TestFingerprintSensitivity:
    def test_fingerprint_tracks_fold_tables(self, monkeypatch):
        base = lexical_fingerprint()
        from shodh_tpu.nlp import lemmas

        monkeypatch.setitem(lemmas.LEMMA_EXCEPTIONS, "zzztest", "zzz")
        assert lexical_fingerprint() != base

    def test_fingerprint_stable_across_calls(self):
        assert lexical_fingerprint() == lexical_fingerprint()


class TestChainPointerHealing:
    def test_migration_repopulates_ctxprev_chain(self, tmp_path):
        """A pre-2-back store has no ctxprev pointers; the fold-drift
        replay must rebuild them (and the 2-back doc terms) so post-
        migration live ingests can walk the chain."""
        sys_ = MemorySystem(tmp_path / "m")
        _fill(sys_)
        want = _snapshot(sys_)
        chain = {
            k: v for k, v in sys_.storage.kv.scan_prefix("ctxprev", "")
        }
        assert chain, "conversation turns with shared tags must chain"
        # simulate the pre-upgrade store: drop every chain pointer + stamp
        for k in chain:
            sys_.storage.kv.delete("ctxprev", k)
        sys_.storage.kv.put("meta", "lexical_fp", b"pre-chain-build")
        sys_.close()

        sys_ = MemorySystem(tmp_path / "m")
        try:
            healed = {
                k: v for k, v in sys_.storage.kv.scan_prefix("ctxprev", "")
            }
            assert healed == chain  # replay rebuilt the identical chain
            assert _snapshot(sys_) == want
        finally:
            sys_.close()
