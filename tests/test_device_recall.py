"""Fused device recall: parity with the host funnel math."""

import numpy as np

import jax.numpy as jnp

from shodh_tpu import constants as C
from shodh_tpu.engine.scoring import ScoreInputs, unified_score
from shodh_tpu.ops.device_recall import fused_recall
from shodh_tpu.retrieval.fusion import flat_fuse


def _host_reference(query, corpus, bm25, graph, meta, density, k):
    """The host funnel composed from its real pieces on the same inputs."""
    cos = corpus @ query
    semantic = {str(i): float(cos[i]) for i in range(len(corpus)) if cos[i] > -2}
    bm = {str(i): float(bm25[i]) for i in range(len(corpus)) if bm25[i] > 0}
    gr = {str(i): float(graph[i]) for i in range(len(corpus)) if graph[i] > 0}
    fused = flat_fuse(semantic, bm, gr, density)
    n = len(corpus)
    s = ScoreInputs.zeros(n)
    for i in range(n):
        s.base[i] = fused.get(str(i), 0.0)
        s.importance[i] = meta["importance"][i]
        s.hours_old[i] = meta["hours_old"][i]
        s.arousal[i] = meta["arousal"][i]
        s.credibility[i] = meta["credibility"][i]
        s.momentum[i] = meta["momentum"][i]
        s.tag_penalty[i] = meta["tag_penalty"][i]
    finals = unified_score(s)
    order = np.argsort(-finals, kind="stable")[:k]
    return finals, order


def test_fused_recall_matches_host_funnel():
    rng = np.random.default_rng(0)
    n, d, k = 256, 64, 10
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    query = corpus[7] * 0.9 + 0.1 * rng.standard_normal(d).astype(np.float32)
    query /= np.linalg.norm(query)
    bm25 = np.where(rng.random(n) < 0.3, rng.random(n) * 5, 0.0).astype(np.float32)
    graph = np.where(rng.random(n) < 0.2, rng.random(n), 0.0).astype(np.float32)
    meta = {
        "importance": rng.random(n).astype(np.float32),
        "hours_old": (rng.random(n) * 500).astype(np.float32),
        "arousal": rng.random(n).astype(np.float32) * 0.5,
        "credibility": (0.5 + rng.random(n) * 0.5).astype(np.float32),
        "momentum": (rng.random(n) - 0.5).astype(np.float32),
        "tag_penalty": np.where(rng.random(n) < 0.1, 0.85, 1.0).astype(np.float32),
    }
    density = 1.2
    host_scores, host_order = _host_reference(query, corpus, bm25, graph, meta, density, k)

    vals, rows = fused_recall(
        jnp.asarray(query), jnp.asarray(corpus), jnp.ones(n, jnp.float32),
        jnp.ones(n, jnp.float32), jnp.asarray(bm25), jnp.asarray(graph),
        jnp.asarray(meta["importance"]), jnp.asarray(meta["hours_old"]),
        jnp.asarray(meta["arousal"]), jnp.asarray(meta["credibility"]),
        jnp.asarray(meta["momentum"]), jnp.asarray(meta["tag_penalty"]),
        jnp.float32(density), k=k,
    )
    np.testing.assert_array_equal(np.asarray(rows), host_order)
    np.testing.assert_allclose(np.asarray(vals), host_scores[host_order], rtol=2e-4)


def test_fused_recall_masks_invalid():
    rng = np.random.default_rng(1)
    n, d = 64, 32
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    valid = np.ones(n, np.float32)
    valid[:32] = 0.0
    zeros = np.zeros(n, np.float32)
    vals, rows = fused_recall(
        jnp.asarray(corpus[0]), jnp.asarray(corpus), jnp.ones(n, jnp.float32),
        jnp.asarray(valid), zeros, zeros,
        np.full(n, 0.5, np.float32), zeros, zeros,
        np.full(n, 0.5, np.float32), zeros, np.ones(n, np.float32),
        jnp.float32(0.0), k=8,
    )
    assert (np.asarray(rows) >= 32).all()


def test_int8_corpus_path():
    from shodh_tpu.ops.quant import quantize_int8

    rng = np.random.default_rng(2)
    n, d = 128, 32
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    q8, scales = quantize_int8(jnp.asarray(corpus))
    zeros = np.zeros(n, np.float32)
    vals, rows = fused_recall(
        jnp.asarray(corpus[5]), q8, scales, jnp.ones(n, jnp.float32),
        zeros, zeros, np.full(n, 0.5, np.float32), zeros, zeros,
        np.full(n, 0.5, np.float32), zeros, np.ones(n, np.float32),
        jnp.float32(0.0), k=1,
    )
    assert int(np.asarray(rows)[0]) == 5


class TestDeviceRecallEngine:
    def test_end_to_end_against_host_funnel(self, tmp_path):
        import jax
        from shodh_tpu.engine.device_funnel import DeviceRecallEngine
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, Query

        sys_ = MemorySystem(tmp_path / "m")
        target = sys_.remember(Experience(
            content="we chose rust for the backend because of memory safety",
            entities=["Rust", "Backend"],
        ))
        for i in range(20):
            sys_.remember(Experience(content=f"filler note {i} about topic{i % 5}"))
        engine = DeviceRecallEngine(sys_)
        hits = engine.recall("why rust backend memory safety", k=5)
        assert hits and hits[0][0] == target.id
        # host funnel agrees on the winner
        host = sys_.recall(Query(query_text="why rust backend memory safety", max_results=5))
        assert host.ids[0] == target.id
        # mirrors rebuild when the corpus grows
        sys_.remember(Experience(content="new memory about rust tooling", entities=["Rust"]))
        hits2 = engine.recall("rust tooling", k=3)
        assert hits2
        sys_.close()


class TestDeviceFunnelFastPath:
    """SHODH_DEVICE_FUNNEL=1 routes eligible recalls through the fused
    device program inside MemorySystem.recall itself."""

    def test_fast_path_agrees_with_host_winner(self, tmp_path, monkeypatch):
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, Query

        sys_ = MemorySystem(tmp_path / "fp")
        target = sys_.remember(Experience(
            content="switched the cache eviction policy to w-tinylfu",
            entities=["cache"],
        ))
        for i in range(15):
            sys_.remember(Experience(content=f"unrelated standup note {i}"))

        monkeypatch.setenv("SHODH_DEVICE_FUNNEL", "0")
        host = sys_.recall(Query(query_text="cache eviction policy", max_results=5))
        monkeypatch.setenv("SHODH_DEVICE_FUNNEL", "1")
        fast = sys_.recall(Query(query_text="cache eviction policy", max_results=5))
        assert fast.ids[0] == host.ids[0] == target.id
        assert fast.memories[0].attribution.get("device_funnel") == 1.0
        sys_.close()

    def test_filtered_queries_fall_through_to_host_funnel(self, tmp_path, monkeypatch):
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, Query

        sys_ = MemorySystem(tmp_path / "ft")
        tagged = sys_.remember(Experience(content="release checklist drafted", tags=["release"]))
        sys_.remember(Experience(content="release party planned", tags=["social"]))
        monkeypatch.setenv("SHODH_DEVICE_FUNNEL", "1")
        res = sys_.recall(Query(query_text="release", tags=["release"], max_results=5))
        # tag filter is not modeled by the fused program -> host funnel served it
        assert res.ids == [tagged.id]
        assert all(sm.attribution.get("device_funnel") is None for sm in res.memories)
        sys_.close()

    def test_mirrors_upload_once_per_index_version(self, tmp_path, monkeypatch):
        """Round-4 serving fix: the ~36 MB/1M-row metadata mirrors are
        device-resident, shipped once per index version — NOT re-uploaded
        per recall (that upload cost ~35 ms/query through the tunnel)."""
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, Query

        monkeypatch.setenv("SHODH_DEVICE_FUNNEL", "1")
        sys_ = MemorySystem(tmp_path / "res")
        sys_.remember(Experience(content="resident mirror check alpha"))
        sys_.remember(Experience(content="resident mirror check beta"))
        sys_.recall(Query(query_text="resident mirror", max_results=2))
        eng = sys_._device_funnel
        assert eng is not None and eng._meta_dev
        first = {k: id(v) for k, v in eng._meta_dev.items()}
        import jax.numpy as jnp

        assert all(isinstance(v, jnp.ndarray) for v in eng._meta_dev.values())
        sys_.recall(Query(query_text="resident mirror beta", max_results=2))
        # same device arrays object-for-object: no rebuild, no re-upload
        assert {k: id(v) for k, v in eng._meta_dev.items()} == first
        # a write invalidates; the next recall rebuilds to NEW arrays
        sys_.remember(Experience(content="resident mirror check gamma"))
        sys_.recall(Query(query_text="resident mirror gamma", max_results=2))
        assert {k: id(v) for k, v in eng._meta_dev.items()} != first
        sys_.close()

    def test_reinforce_invalidates_mirrors(self, tmp_path, monkeypatch):
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, Query

        monkeypatch.setenv("SHODH_DEVICE_FUNNEL", "1")
        sys_ = MemorySystem(tmp_path / "inv")
        a = sys_.remember(Experience(content="option alpha for the migration plan"))
        b = sys_.remember(Experience(content="option beta for the migration plan"))
        sys_.recall(Query(query_text="migration plan option", max_results=2))
        assert sys_._device_funnel is not None and sys_._device_funnel._built_rows >= 0
        sys_.reinforce_recall([b.id], helpful=True)
        assert sys_._device_funnel._built_rows == -1  # mirrors marked stale
        res = sys_.recall(Query(query_text="migration plan option", max_results=2))
        assert set(res.ids) == {a.id, b.id}
        sys_.close()


class TestReunifiedFunnelParity:
    """Round-2 verdict #1: SHODH_DEVICE_FUNNEL=1 must serve the SAME
    ranking as the staged host funnel — the device program proposes the
    pool, the shared _rank_pool epilogue applies the full round-2 boost
    stack (speaker match, temporal refs, answer type, PRF, temporal
    neighborhood, companion) identically on both paths."""

    @staticmethod
    def _build_corpus(sys_):
        from datetime import datetime, timedelta, timezone

        from shodh_tpu.types import Experience

        base = datetime(2023, 5, 10, 9, 0, tzinfo=timezone.utc)
        rows = [
            # dialogue turns with speakers + tags (speaker/neighborhood boosts)
            ("Melanie: I went pottery painting with my kids last weekend", ["conv-1"], 0),
            ("Caroline: That sounds lovely, I adopted a rescue dog named Biscuit", ["conv-1"], 1),
            ("Melanie: We painted mugs and my daughter made a tiny vase", ["conv-1"], 2),
            ("Caroline: Biscuit chewed through my running shoes because he was anxious", ["conv-1"], 26),
            # temporal_refs-bearing answers (seek_temporal_refs boost)
            ("The deployment finished on March 3rd 2023 after the freeze lifted", ["ops"], 50),
            ("We migrated the database last Tuesday evening", ["ops"], 51),
            # toponym answers (answer_type where-boost)
            ("The offsite happened in Lisbon near the waterfront", ["travel"], 80),
            ("Flights booked through Porto with a layover", ["travel"], 81),
            # causal answers (answer_type why-boost)
            ("The cache blew up because the eviction policy ignored TTLs", ["incident"], 100),
            ("Latency dropped since we enabled request coalescing", ["incident"], 101),
        ] + [(f"filler standup note {i} about sprint {i % 7}", ["standup"], 200 + i) for i in range(30)]
        for content, tags, hours in rows:
            sys_.remember(
                Experience(content=content, tags=tags),
                created_at=base + timedelta(hours=hours),
            )
        sys_.flush()

    def test_ranking_matches_host_across_query_shapes(self, tmp_path, monkeypatch):
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Query

        monkeypatch.setenv("SHODH_EVAL_NOW", "2023-06-01T12:00:00+00:00")
        # Readonly recalls: usage/coactivation writes would otherwise mutate
        # graph state between the two runs and mask true path parity.
        monkeypatch.setenv("SHODH_RECALL_READONLY", "1")
        sys_ = MemorySystem(tmp_path / "par")
        self._build_corpus(sys_)

        queries = [
            "What did Melanie paint with her kids?",          # speaker match
            "When did the deployment finish?",                # temporal seeking
            "where was the offsite held?",                    # answer-type where
            "why did the cache blow up?",                     # answer-type causal + PRF
            "Did Caroline adopt a dog?",                      # polar (negated form)
            "What did Melanie and Caroline both do outdoors?",  # multihop/companion
            "pottery painting mugs",                          # plain lexical
        ]
        for qt in queries:
            monkeypatch.setenv("SHODH_DEVICE_FUNNEL", "0")
            host = sys_.recall(Query(query_text=qt, max_results=8))
            monkeypatch.setenv("SHODH_DEVICE_FUNNEL", "1")
            fast = sys_.recall(Query(query_text=qt, max_results=8))
            assert fast.ids == host.ids, f"ranking drift for {qt!r}"
            assert fast.memories and fast.memories[0].attribution.get("device_funnel") == 1.0
            for a, b in zip(fast.memories, host.memories):
                np.testing.assert_allclose(a.score, b.score, rtol=5e-5)
        sys_.close()

    def test_fusion_variant_envs_fall_through(self, tmp_path, monkeypatch):
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, Query

        sys_ = MemorySystem(tmp_path / "var")
        sys_.remember(Experience(content="alpha migration plan drafted"))
        sys_.remember(Experience(content="beta rollout scheduled"))
        monkeypatch.setenv("SHODH_DEVICE_FUNNEL", "1")
        monkeypatch.setenv("SHODH_FUSION_RRF", "1")
        res = sys_.recall(Query(query_text="migration plan", max_results=2))
        # RRF fusion isn't modeled by the fused program -> host funnel served
        assert all(sm.attribution.get("device_funnel") is None for sm in res.memories)
        sys_.close()


class TestBatchedFunnel:
    """fused_recall_batch: the (B, k) serving configuration must agree with
    the single-query program per row (round-2; VERDICT item 8)."""

    def test_batch_matches_single(self):
        rng = np.random.default_rng(3)
        n, d, b, k = 512, 64, 6, 8
        corpus = rng.standard_normal((n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        queries = rng.standard_normal((b, d)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        scales = np.ones(n, np.float32)
        valid = np.ones(n, np.float32)
        valid[100:120] = 0.0
        meta = {
            "importance": rng.uniform(0, 1, n).astype(np.float32),
            "hours_old": rng.uniform(0, 500, n).astype(np.float32),
            "arousal": rng.uniform(0, 1, n).astype(np.float32),
            "credibility": rng.uniform(0, 1, n).astype(np.float32),
            "momentum": rng.uniform(-1, 1, n).astype(np.float32),
            "tag_penalty": np.ones(n, np.float32),
        }
        # sparse legs, different hits per query
        H = 8
        b_rows = rng.integers(0, n, (b, H)).astype(np.int32)
        b_vals = rng.uniform(0, 5, (b, H)).astype(np.float32)
        g_rows = rng.integers(0, n, (b, H)).astype(np.int32)
        g_vals = rng.uniform(0, 1, (b, H)).astype(np.float32)
        density = 1.3

        from shodh_tpu.ops.device_recall import fused_recall, fused_recall_batch

        bv, br = fused_recall_batch(
            jnp.asarray(queries), jnp.asarray(corpus), jnp.asarray(scales),
            jnp.asarray(valid), jnp.asarray(b_rows), jnp.asarray(b_vals),
            jnp.asarray(g_rows), jnp.asarray(g_vals),
            jnp.asarray(meta["importance"]), jnp.asarray(meta["hours_old"]),
            jnp.asarray(meta["arousal"]), jnp.asarray(meta["credibility"]),
            jnp.asarray(meta["momentum"]), jnp.asarray(meta["tag_penalty"]),
            jnp.float32(density), k=k,
        )
        for i in range(b):
            bm25 = np.zeros(n, np.float32)
            np.maximum.at(bm25, b_rows[i], b_vals[i])
            graph = np.zeros(n, np.float32)
            np.maximum.at(graph, g_rows[i], g_vals[i])
            sv, sr = fused_recall(
                jnp.asarray(queries[i]), jnp.asarray(corpus), jnp.asarray(scales),
                jnp.asarray(valid), jnp.asarray(bm25), jnp.asarray(graph),
                jnp.asarray(meta["importance"]), jnp.asarray(meta["hours_old"]),
                jnp.asarray(meta["arousal"]), jnp.asarray(meta["credibility"]),
                jnp.asarray(meta["momentum"]), jnp.asarray(meta["tag_penalty"]),
                jnp.float32(density), k=k,
            )
            np.testing.assert_array_equal(np.asarray(sr), np.asarray(br[i]))
            np.testing.assert_allclose(np.asarray(sv), np.asarray(bv[i]), rtol=2e-6)

    def test_batch_funnel_sparse_parity(self):
        """The sparse-correction form must be BIT-identical to the dense
        scatter-plane oracle on adversarial fixtures: pad entries colliding
        with a real row 0, rows hit by both legs, duplicate rows inside one
        leg (dense takes scatter-max; sparse relies on monotonicity in the
        leg value), invalid hit rows, queries with no hits at all, and
        score ties (same two-level tie-break)."""
        from shodh_tpu.ops.device_recall import (
            fused_recall_batch,
            fused_recall_batch_dense,
        )

        rng = np.random.default_rng(11)
        n, d, b, k = 1024, 32, 5, 16
        corpus = rng.standard_normal((n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        # force score ties: duplicate a block of rows exactly
        corpus[200:210] = corpus[100:110]
        queries = rng.standard_normal((b, d)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        scales = np.ones(n, np.float32)
        valid = np.ones(n, np.float32)
        valid[50:70] = 0.0
        meta = [rng.uniform(0, 1, n).astype(np.float32) for _ in range(4)]
        momentum = rng.uniform(-1, 1, n).astype(np.float32)
        tag_penalty = np.ones(n, np.float32)
        tag_penalty[100:110] = tag_penalty[200:210] = 0.8  # tied rows stay tied
        hours = rng.uniform(0, 300, n).astype(np.float32)
        hours[200:210] = hours[100:110]  # keep the duplicates fully tied
        for m in meta:
            m[200:210] = m[100:110]
        momentum[200:210] = momentum[100:110]

        Hb, Hg = 16, 8
        b_rows = rng.integers(0, n, (b, Hb)).astype(np.int32)
        b_vals = rng.uniform(0.1, 5, (b, Hb)).astype(np.float32)
        g_rows = rng.integers(0, n, (b, Hg)).astype(np.int32)
        g_vals = rng.uniform(0.1, 1, (b, Hg)).astype(np.float32)
        # duplicate rows inside one leg with different values
        b_rows[0, 1] = b_rows[0, 0]
        b_vals[0, 1] = b_vals[0, 0] * 2.0
        # a row hit by BOTH legs
        g_rows[0, 0] = b_rows[0, 2]
        # hits on invalid rows
        b_rows[1, 0] = 55
        g_rows[1, 0] = 60
        # a REAL hit on row 0 (the pad row) in one leg only
        g_rows[2, 0] = 0
        g_vals[2, 0] = 0.9
        # query 3: no hits at all (all pad)
        b_rows[3, :] = 0
        b_vals[3, :] = 0.0
        g_rows[3, :] = 0
        g_vals[3, :] = 0.0
        # query 4: graph leg empty -> graph_on False (hybrid_w = 1)
        g_rows[4, :] = 0
        g_vals[4, :] = 0.0

        argv = [
            jnp.asarray(queries), jnp.asarray(corpus), jnp.asarray(scales),
            jnp.asarray(valid), jnp.asarray(b_rows), jnp.asarray(b_vals),
            jnp.asarray(g_rows), jnp.asarray(g_vals),
            jnp.asarray(meta[0]), jnp.asarray(hours),
            jnp.asarray(meta[1]), jnp.asarray(meta[2]),
            jnp.asarray(momentum), jnp.asarray(tag_penalty),
            jnp.float32(1.7),
        ]
        sv, sr = fused_recall_batch(*argv, k=k)
        dv, dr = fused_recall_batch_dense(*argv, k=k)
        np.testing.assert_array_equal(np.asarray(sr), np.asarray(dr))
        np.testing.assert_array_equal(np.asarray(sv), np.asarray(dv))

    def test_engine_windows_large_batches(self, tmp_path):
        """B > CHUNK_B is windowed into CHUNK_B-query dispatches at the
        engine layer (device-side chunking measured and rejected — see
        ops/device_recall.py); results must match the small-batch path."""
        from shodh_tpu.engine.device_funnel import DeviceRecallEngine
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.ops.device_recall import CHUNK_B
        from shodh_tpu.types import Experience

        sys_ = MemorySystem(tmp_path / "win")
        for i in range(40):
            sys_.remember(Experience(content=f"case {i}: service {i % 5} "
                                             f"{'failed' if i % 2 else 'recovered'}"))
        eng = DeviceRecallEngine(sys_)
        queries = [f"service {i % 5} status" for i in range(CHUNK_B + 8)]
        windowed = eng.recall_batch(queries, k=3)
        assert len(windowed) == len(queries)
        small = eng.recall_batch(queries[:4], k=3)
        for got, want in zip(windowed[:4], small):
            assert [m for m, _ in got] == [m for m, _ in want]
        sys_.close()

    def test_engine_recall_batch_matches_single(self, tmp_path):
        from shodh_tpu.engine.device_funnel import DeviceRecallEngine
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience

        sys_ = MemorySystem(tmp_path / "bf")
        for i in range(30):
            sys_.remember(Experience(
                content=f"note {i}: the {'kafka' if i % 3 else 'redis'} cluster "
                        f"handled case {i}",
                entities=["kafka" if i % 3 else "redis"],
            ))
        eng = DeviceRecallEngine(sys_)
        queries = ["kafka cluster case", "redis cluster case", "unrelated topic"]
        batched = eng.recall_batch(queries, k=5)
        for text, hits in zip(queries, batched):
            single = eng.recall(text, k=5)
            assert [m for m, _ in hits] == [m for m, _ in single]
            # ids above ARE the determinism contract; scores come from two
            # separately jitted programs whose CPU matmul reduction order
            # differs in the last bits under thread scheduling (observed
            # 1.3e-5 relative at file scope) — keep a thread-safe margin
            np.testing.assert_allclose(
                [s for _, s in hits], [s for _, s in single], rtol=5e-5
            )
        sys_.close()


class TestShardedPool:
    """Round-5 verdict #3: fused_recall_pool under shard_map must be
    bit-equal to the single-device pool program — rows, finals, and the
    epilogue's fused/cos carries — on a mixed-domain corpus."""

    def _inputs(self, n, d=32, seed=7):
        rng = np.random.default_rng(seed)
        corpus = rng.standard_normal((n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        queries = rng.standard_normal((2, d)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        bm25 = np.where(rng.random(n) < 0.1, rng.random(n) * 8, 0).astype(np.float32)
        graph = np.where(rng.random(n) < 0.08, rng.random(n), 0).astype(np.float32)
        meta = dict(
            importance=rng.random(n).astype(np.float32),
            hours_old=(rng.random(n) * 2000).astype(np.float32),
            arousal=rng.random(n).astype(np.float32),
            credibility=rng.random(n).astype(np.float32),
            momentum=(rng.random(n) * 2 - 1).astype(np.float32),
            tag_penalty=np.ones(n, np.float32),
        )
        valid = (rng.random(n) > 0.03).astype(np.float32)
        speaker = rng.integers(0, 5, n).astype(np.int32) * 1000
        row_flags = (rng.random((n, 3)) < 0.2).astype(np.float32)
        q_ents = np.asarray([1000, 3000, -1, -1], np.int32)
        q_flags = np.asarray([1.0, 0.0, 1.0, 1.0], np.float32)
        q_age = np.asarray([100.0, 900.0], np.float32)
        q_scalars = np.asarray([0.15, C.RECENCY_BOOST_SCALE, 0.4], np.float32)
        return (queries, corpus, np.ones(n, np.float32), valid, bm25, graph,
                meta, speaker, row_flags, q_ents, q_flags, q_age, q_scalars)

    def test_sharded_pool_bit_equal(self):
        import jax

        from shodh_tpu.ops.device_recall import (
            fused_recall_pool, fused_recall_pool_sharded,
        )
        from shodh_tpu.parallel.mesh import make_mesh

        n, k, vec_k = 8 * 128, 64, 50
        (queries, corpus, scales, valid, bm25, graph, meta, speaker,
         row_flags, q_ents, q_flags, q_age, q_scalars) = self._inputs(n)
        args = (
            jnp.asarray(queries), jnp.asarray(corpus), jnp.asarray(scales),
            jnp.asarray(valid), jnp.asarray(bm25), jnp.asarray(graph),
            jnp.asarray(meta["importance"]), jnp.asarray(meta["hours_old"]),
            jnp.asarray(meta["arousal"]), jnp.asarray(meta["credibility"]),
            jnp.asarray(meta["momentum"]), jnp.asarray(meta["tag_penalty"]),
            jnp.float32(1.7), jnp.asarray(speaker), jnp.asarray(row_flags),
            jnp.asarray(q_ents), jnp.asarray(q_flags), jnp.asarray(q_age),
            jnp.asarray(q_scalars),
        )
        want = fused_recall_pool(*args, k=k, vec_k=vec_k)
        mesh = make_mesh(8)
        fn = fused_recall_pool_sharded(mesh, "shard", k=k, vec_k=vec_k)
        got = fn(*args)
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
        for gi, wi, name in ((0, 0, "final"), (2, 2, "fused"), (3, 3, "cos")):
            np.testing.assert_array_equal(
                np.asarray(got[gi]), np.asarray(want[wi]), err_msg=name
            )

    def test_sharded_pool_no_graph_leg(self):
        """graph_on must stay globally consistent when only ONE shard has
        any activation (the pmax'd flag decides graph_w everywhere)."""
        import jax

        from shodh_tpu.ops.device_recall import (
            fused_recall_pool, fused_recall_pool_sharded,
        )
        from shodh_tpu.parallel.mesh import make_mesh

        n, k, vec_k = 8 * 64, 32, 20
        (queries, corpus, scales, valid, bm25, graph, meta, speaker,
         row_flags, q_ents, q_flags, q_age, q_scalars) = self._inputs(n, seed=9)
        graph[:] = 0.0
        graph[n - 3] = 0.7  # activation only in the LAST shard
        args = (
            jnp.asarray(queries), jnp.asarray(corpus), jnp.asarray(scales),
            jnp.asarray(valid), jnp.asarray(bm25), jnp.asarray(graph),
            jnp.asarray(meta["importance"]), jnp.asarray(meta["hours_old"]),
            jnp.asarray(meta["arousal"]), jnp.asarray(meta["credibility"]),
            jnp.asarray(meta["momentum"]), jnp.asarray(meta["tag_penalty"]),
            jnp.float32(1.7), jnp.asarray(speaker), jnp.asarray(row_flags),
            jnp.asarray(q_ents), jnp.asarray(q_flags), jnp.asarray(q_age),
            jnp.asarray(q_scalars),
        )
        want = fused_recall_pool(*args, k=k, vec_k=vec_k)
        fn = fused_recall_pool_sharded(make_mesh(8), "shard", k=k, vec_k=vec_k)
        got = fn(*args)
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))


class TestIncrementalMirrors:
    """Round-5 concurrent-serving fix: append-only index growth updates
    the mirrors incrementally (scatter of the new rows) instead of
    re-scanning the whole store — and the result must be byte-identical
    to a full rebuild."""

    def _snap(self, eng):
        import numpy as np

        return {k: np.asarray(v) for k, v in eng._meta_dev.items()}

    def test_incremental_equals_full_rebuild(self, tmp_path, monkeypatch):
        import numpy as np

        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, Query

        monkeypatch.setenv("SHODH_DEVICE_FUNNEL", "1")
        sys_ = MemorySystem(tmp_path / "inc")
        for i in range(6):
            sys_.remember(Experience(
                content=f"Alice: incremental mirror corpus item {i} because reasons",
                tags=["t1"],
            ))
        sys_.recall(Query(query_text="incremental mirror corpus", max_results=3))
        eng = sys_._device_funnel
        assert eng._built_rows >= 0 and eng._meta_host is not None
        # append-only growth: new memories, then a recall triggers the
        # incremental path (same epoch, more rows)
        for i in range(4):
            sys_.remember(Experience(
                content=f"Bob went to Paris on trip {i}", tags=["t2"],
            ))
        sys_.recall(Query(query_text="Paris trip", max_results=3))
        incremental = self._snap(eng)
        # force the full scan and compare byte-for-byte
        eng.invalidate()
        sys_.recall(Query(query_text="Paris trip", max_results=3))
        full = self._snap(eng)
        for k in full:
            np.testing.assert_array_equal(incremental[k], full[k], err_msg=k)
        sys_.close()

    def test_incremental_after_delete_then_growth(self, tmp_path, monkeypatch):
        """Soft deletes mask rows; net growth afterwards must still take a
        correct path (deleted rows' metadata is irrelevant — they can
        never be selected — but live rows must match the full scan)."""
        import numpy as np

        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience, Query

        monkeypatch.setenv("SHODH_DEVICE_FUNNEL", "1")
        sys_ = MemorySystem(tmp_path / "incdel")
        kept = [
            sys_.remember(Experience(content=f"delta corpus row {i} stays", tags=["k"]))
            for i in range(5)
        ]
        victim = sys_.remember(Experience(content="delta corpus row victim", tags=["k"]))
        sys_.recall(Query(query_text="delta corpus row", max_results=3))
        eng = sys_._device_funnel
        sys_.forget(victim.id)
        for i in range(3):
            sys_.remember(Experience(content=f"delta corpus addition {i}", tags=["k"]))
        res = sys_.recall(Query(query_text="delta corpus addition", max_results=5))
        assert victim.id not in res.ids
        incremental = self._snap(eng)
        eng.invalidate()
        sys_.recall(Query(query_text="delta corpus addition", max_results=5))
        full = self._snap(eng)
        index = sys_.index
        valid = np.asarray(index._device_arrays()[2]) if index._device_arrays() else None
        for k in full:
            a, b = incremental[k], full[k]
            if valid is not None and a.shape[:1] == valid.shape:
                live = valid > 0  # masked rows may legitimately differ
                np.testing.assert_array_equal(a[live], b[live], err_msg=k)
            else:
                np.testing.assert_array_equal(a, b, err_msg=k)
        assert kept[0].id in sys_.recall(
            Query(query_text="delta corpus row stays", max_results=5)
        ).ids
        sys_.close()
