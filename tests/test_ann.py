"""ANN-scale components: k-means, IVF index, PQ, sharded mesh index."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shodh_tpu.index.ivf import IVFIndex
from shodh_tpu.index.kmeans import kmeans
from shodh_tpu.index.pq import ProductQuantizer
from shodh_tpu.parallel.mesh import make_mesh
from shodh_tpu.parallel.sharded_index import ShardedVectorIndex


def _clustered_data(n_clusters=16, per_cluster=64, d=64, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 3
    pts = np.concatenate(
        [c + rng.standard_normal((per_cluster, d)).astype(np.float32) * 0.3 for c in centers]
    )
    return pts / np.linalg.norm(pts, axis=1, keepdims=True)


class TestKMeans:
    def test_separates_clusters(self):
        v = _clustered_data(n_clusters=8, per_cluster=32)
        centroids, assign = kmeans(v, k=8, iters=15)
        assert centroids.shape == (8, 64)
        # points from the same true cluster should mostly share an assignment
        agreement = 0
        for c in range(8):
            block = assign[c * 32 : (c + 1) * 32]
            agreement += np.bincount(block, minlength=8).max() / 32
        assert agreement / 8 > 0.8

    def test_deterministic(self):
        v = _clustered_data()
        c1, a1 = kmeans(v, k=8)
        c2, a2 = kmeans(v, k=8)
        np.testing.assert_array_equal(a1, a2)


class TestIVF:
    def test_high_recall_with_modest_nprobe(self):
        v = _clustered_data(n_clusters=32, per_cluster=64)  # 2048 vecs
        idx = IVFIndex(v)
        recall = idx.estimate_recall(n_samples=32, k=10, nprobe=8)
        assert recall > 0.9

    def test_tune_nprobe(self):
        v = _clustered_data(n_clusters=16, per_cluster=32)
        idx = IVFIndex(v)
        nprobe = idx.tune_nprobe(target_recall=0.9, k=5)
        assert 1 <= nprobe <= idx.n_clusters
        assert idx.estimate_recall(k=5, nprobe=nprobe) >= 0.9

    def test_exact_self_match(self):
        v = _clustered_data(n_clusters=8, per_cluster=16)
        idx = IVFIndex(v)
        vals, rows = idx.search(v[:4], k=1, nprobe=4)
        np.testing.assert_array_equal(rows[:, 0], np.arange(4))

    def test_soft_delete(self):
        v = _clustered_data(n_clusters=4, per_cluster=16)
        idx = IVFIndex(v)
        idx.delete_rows([0])
        _, rows = idx.search(v[:1], k=1, nprobe=4)
        assert rows[0, 0] != 0

    def test_int8_mode(self):
        v = _clustered_data(n_clusters=8, per_cluster=16)
        idx = IVFIndex(v, dtype="int8")
        _, rows = idx.search(v[:4], k=1, nprobe=4)
        np.testing.assert_array_equal(rows[:, 0], np.arange(4))


class TestPQ:
    def test_roundtrip_preserves_geometry(self):
        v = _clustered_data(n_clusters=8, per_cluster=64, d=64)
        pq = ProductQuantizer(dim=64, sub_dim=8, n_centroids=32)
        pq.train(v)
        codes = pq.encode(v)
        assert codes.shape == (len(v), 8) and codes.dtype == np.uint8
        back = pq.decode(codes)
        cos = (back * v).sum(1) / (np.linalg.norm(back, axis=1) * np.linalg.norm(v, axis=1))
        assert cos.mean() > 0.85

    def test_adc_search_recall(self):
        v = _clustered_data(n_clusters=8, per_cluster=32, d=64)
        pq = ProductQuantizer(dim=64, sub_dim=8, n_centroids=32)
        pq.train(v)
        codes = pq.encode(v)
        queries = v[:8]
        exact = np.argsort(-(queries @ v.T), axis=1)[:, :10]
        _, got = pq.search(queries, codes, k=10)
        recall = np.mean([
            len(set(got[i].tolist()) & set(exact[i].tolist())) / 10 for i in range(8)
        ])
        assert recall > 0.6  # PQ is lossy; ADC should still find most


class TestShardedIndex:
    def test_matches_single_device_exact(self):
        assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
        v = _clustered_data(n_clusters=16, per_cluster=16, d=64)  # 256 rows
        mesh = make_mesh(8)
        sharded = ShardedVectorIndex(v, mesh)
        queries = _clustered_data(n_clusters=2, per_cluster=2, d=64, seed=9)
        vals, rows = sharded.search(queries, k=10)
        ref = queries @ v.T
        for b in range(len(queries)):
            want = np.argsort(-ref[b], kind="stable")[:10]
            np.testing.assert_array_equal(rows[b], want)
            np.testing.assert_allclose(vals[b], ref[b][want], rtol=1e-4)

    def test_padding_rows_never_returned(self):
        v = _clustered_data(n_clusters=3, per_cluster=7, d=32)  # 21 rows, pads to 24
        mesh = make_mesh(8)
        sharded = ShardedVectorIndex(v, mesh)
        _, rows = sharded.search(v[:2], k=21)
        assert rows.max() < 21

    def test_int8_sharded(self):
        v = _clustered_data(n_clusters=8, per_cluster=8, d=32)
        mesh = make_mesh(8)
        sharded = ShardedVectorIndex(v, mesh, dtype="int8")
        _, rows = sharded.search(v[:3], k=1)
        np.testing.assert_array_equal(rows[:, 0], np.arange(3))

    def test_cross_shard_tie_determinism(self):
        """Equal-score rows in DIFFERENT shards must break ties exactly like
        the single-chip index: lowest global row wins (round-2 verdict #8 —
        mesh merges are exactly where tie discipline breaks)."""
        rng = np.random.default_rng(4)
        d = 32
        base = rng.standard_normal((64, d)).astype(np.float32)
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        # duplicate one vector into rows scattered across many shards
        dup = base[5].copy()
        for r in (13, 21, 37, 55, 62):  # 8 shards x 8 rows: shards 1,2,4,6,7
            base[r] = dup
        mesh = make_mesh(8)
        sharded = ShardedVectorIndex(base, mesh)
        vals, rows = sharded.search(dup[None, :], k=6)
        # the 6 tied copies must come back in ascending global row order
        tied = [5, 13, 21, 37, 55, 62]
        np.testing.assert_array_equal(rows[0], tied)
        # and identically to the single-chip reference
        ref = jax.lax.top_k(jnp.asarray(base @ dup), 6)[1]
        np.testing.assert_array_equal(rows[0], np.asarray(ref))

    def test_sharded_ingest_delete_compact(self):
        rng = np.random.default_rng(7)
        d = 16
        v = rng.standard_normal((20, d)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        mesh = make_mesh(8)
        idx = ShardedVectorIndex(v, mesh, spare_capacity=8)
        assert len(idx) == 20
        # delta append lands in spare capacity with stable global rows
        extra = rng.standard_normal((3, d)).astype(np.float32)
        extra /= np.linalg.norm(extra, axis=1, keepdims=True)
        new_rows = idx.add(extra)
        assert new_rows == [20, 21, 22]
        _, rows = idx.search(extra, k=1)
        np.testing.assert_array_equal(rows[:, 0], new_rows)
        # soft delete: the row stops matching immediately
        idx.delete([21])
        assert len(idx) == 22
        _, rows = idx.search(extra[1][None, :], k=1)
        assert rows[0, 0] != 21
        # append past capacity grows the mesh allocation
        more = rng.standard_normal((40, d)).astype(np.float32)
        more /= np.linalg.norm(more, axis=1, keepdims=True)
        grown = idx.add(more)
        assert grown[0] == 23 and idx.capacity % 8 == 0
        _, rows = idx.search(more[:2], k=1)
        np.testing.assert_array_equal(rows[:, 0], grown[:2])
        # compaction drops the deleted row and remaps survivors
        mapping = idx.compact()
        assert 21 not in mapping and mapping[22] == 21
        assert len(idx) == 62
        _, rows = idx.search(extra[2][None, :], k=1)
        assert rows[0, 0] == mapping[22]

    def test_int8_delta_append_matches_rebuild(self):
        """Incremental int8 append (per-row quantization) must rank
        identically to a from-scratch build of the same corpus."""
        rng = np.random.default_rng(21)
        d = 24
        base = rng.standard_normal((12, d)).astype(np.float32)
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        extra = rng.standard_normal((5, d)).astype(np.float32)
        extra /= np.linalg.norm(extra, axis=1, keepdims=True)
        mesh = make_mesh(8)
        inc = ShardedVectorIndex(base, mesh, dtype="int8", spare_capacity=8)
        inc.add(extra)
        full = ShardedVectorIndex(np.vstack([base, extra]), mesh, dtype="int8",
                                  spare_capacity=8 - 5)
        q = extra[:3]
        vi, ri = inc.search(q, k=5)
        vf, rf = full.search(q, k=5)
        np.testing.assert_array_equal(ri, rf)
        np.testing.assert_allclose(vi, vf, rtol=1e-5)

    def test_int8_certified_inside_shard_map(self, monkeypatch):
        """Force the certified int8-MXU v3 selection to fire INSIDE the
        per-shard shard_map body (round-5 verdict #2): results must be
        bit-equal to the flat single-device certified path on the same
        quantized corpus, and the certified trace must actually be taken
        (not the masked-scores fallthrough)."""
        import shodh_tpu.ops.fused_topk as ft

        monkeypatch.setenv("SHODH_TOPK_INT8_MIN_ROWS", "4096")
        fired = []
        real = ft._certified_fast_topk_int8

        def spy(*a, **kw):
            fired.append(True)
            return real(*a, **kw)

        monkeypatch.setattr(ft, "_certified_fast_topk_int8", spy)

        rng = np.random.default_rng(33)
        d, k, n = 32, 10, 8 * 4096
        v = rng.standard_normal((n, d)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        q = v[rng.integers(0, n, 4)] + 0.03 * rng.standard_normal((4, d)).astype(
            np.float32
        )
        q /= np.linalg.norm(q, axis=1, keepdims=True)

        mesh = make_mesh(8)
        sharded = ShardedVectorIndex(v, mesh, dtype="int8")
        vals_s, rows_s = sharded.search(q, k)
        assert fired, "certified int8 path was not traced inside shard_map"

        # flat single-device certified reference over the SAME quantized rows
        from shodh_tpu.ops.fused_topk import corpus_cert_pack_default, two_level_topk

        c8 = np.asarray(jax.device_get(sharded._corpus))
        scales = np.asarray(jax.device_get(sharded._scales))
        valid = np.asarray(jax.device_get(sharded._valid))
        pack = corpus_cert_pack_default(
            jnp.asarray(c8), jnp.asarray(scales), jnp.asarray(valid)
        )
        vals_f, rows_f = two_level_topk(
            jnp.asarray(q), jnp.asarray(c8), jnp.asarray(valid), k,
            scales=jnp.asarray(scales), int8_pack=pack,
        )
        np.testing.assert_array_equal(rows_s, np.asarray(rows_f))
        np.testing.assert_allclose(vals_s, np.asarray(vals_f), rtol=1e-6)

    def test_int8_pack_maintenance_matches_rebuild(self, monkeypatch):
        """After delete + delta-append the incrementally-maintained device
        certificate pack (sv, cn, cg) must equal a from-scratch
        corpus_cert_pack over the index's own device arrays — bitwise —
        and certified search must stay parity with the flat path."""
        monkeypatch.setenv("SHODH_TOPK_INT8_MIN_ROWS", "4096")
        rng = np.random.default_rng(55)
        d, k, n = 24, 6, 8 * 4096
        v = rng.standard_normal((n, d)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        mesh = make_mesh(8)
        idx = ShardedVectorIndex(v, mesh, dtype="int8", spare_capacity=1024)
        # mutate: soft-delete scattered rows, then delta-append new rows
        idx.delete([0, 5000, 17001, 32767])
        extra = rng.standard_normal((64, d)).astype(np.float32)
        extra /= np.linalg.norm(extra, axis=1, keepdims=True)
        idx.add(extra)

        from shodh_tpu.ops.fused_topk import corpus_cert_pack_default, two_level_topk

        c8 = np.asarray(jax.device_get(idx._corpus))
        scales = np.asarray(jax.device_get(idx._scales))
        valid = np.asarray(jax.device_get(idx._valid))
        fresh = corpus_cert_pack_default(
            jnp.asarray(c8), jnp.asarray(scales), jnp.asarray(valid)
        )
        for maintained, scratch, name in zip(
            (idx._sv, idx._cn, idx._cg), fresh, ("sv", "cn", "cg")
        ):
            np.testing.assert_array_equal(
                np.asarray(jax.device_get(maintained)), np.asarray(scratch),
                err_msg=f"maintained {name} diverged from from-scratch pack",
            )
        q = extra[:3]
        vals_s, rows_s = idx.search(q, k)
        vals_f, rows_f = two_level_topk(
            jnp.asarray(q), jnp.asarray(c8), jnp.asarray(valid), k,
            scales=jnp.asarray(scales), int8_pack=fresh,
        )
        np.testing.assert_array_equal(rows_s, np.asarray(rows_f))
        assert 0 not in rows_s and 32767 not in rows_s

    def test_sharded_eval_suite_parity(self):
        """Mini retrieval suite through the mesh index: every query's full
        ranking must equal the single-chip reference ranking (the 8-device
        eval the round-2 verdict asked for, in miniature)."""
        rng = np.random.default_rng(11)
        d, n, q, k = 48, 160, 24, 10
        corpus = rng.standard_normal((n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        queries = corpus[rng.integers(0, n, q)] + 0.05 * rng.standard_normal(
            (q, d)
        ).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        mesh = make_mesh(8)
        sharded = ShardedVectorIndex(corpus, mesh)
        vals, rows = sharded.search(queries, k=k)
        ref = queries @ corpus.T
        agree = 0
        for b in range(q):
            want_v, want_r = jax.lax.top_k(jnp.asarray(ref[b]), k)
            np.testing.assert_array_equal(rows[b], np.asarray(want_r))
            np.testing.assert_allclose(vals[b], np.asarray(want_v), rtol=1e-4)
            agree += 1
        assert agree == q


class TestIVFPersistence:
    def test_save_load_health(self, tmp_path):
        v = _clustered_data(n_clusters=8, per_cluster=16)
        idx = IVFIndex(v)
        idx.save(tmp_path / "ivf")
        idx2 = IVFIndex.load(tmp_path / "ivf")
        _, a = idx.search(v[:3], k=2, nprobe=4)
        _, b = idx2.search(v[:3], k=2, nprobe=4)
        np.testing.assert_array_equal(a, b)
        h = idx2.health()
        assert h["vectors"] == len(v) and h["sampled_recall@10"] > 0.5

    def test_checksum(self, tmp_path):
        v = _clustered_data(n_clusters=4, per_cluster=8)
        idx = IVFIndex(v)
        idx.save(tmp_path / "ivf")
        (tmp_path / "ivf.npz").write_bytes(b"junk")
        with pytest.raises(ValueError, match="checksum"):
            IVFIndex.load(tmp_path / "ivf")


class TestShardedSuiteParity:
    """Verdict follow-through: drive a REAL suite's corpus + queries through
    the 8-device sharded index and require bit-equal rows vs the production
    single-device index — the mesh merge must preserve scores AND the
    ascending-global-row tie discipline on real (not synthetic) data."""

    def test_smoke_corpus_queries_match_device_index(self):
        import json
        from pathlib import Path

        from shodh_tpu.index.device_index import DeviceVectorIndex
        from shodh_tpu.models.embedder import default_embedder

        root = Path(__file__).resolve().parents[1]
        corpus = [
            json.loads(l)["content"]
            for l in (root / "tests/recall/corpora/shodh-smoke.jsonl").read_text().splitlines()
            if l.strip()
        ]
        queries = [
            json.loads(l)["query"]
            for l in (root / "tests/recall/smoke_cases.jsonl").read_text().splitlines()
            if l.strip()
        ]
        emb = default_embedder(cached=False)
        cv = np.asarray(emb.encode_batch(corpus), np.float32)
        qv = np.asarray(emb.encode_batch(queries), np.float32)

        dv = DeviceVectorIndex(dim=cv.shape[1])
        dv.add(cv)
        dvals, drows = dv.search(qv, k=10)

        mesh = make_mesh(8)
        sh = ShardedVectorIndex(cv, mesh)
        svals, srows = sh.search(qv, k=10)

        np.testing.assert_array_equal(np.asarray(drows), np.asarray(srows))
        np.testing.assert_allclose(np.asarray(dvals), np.asarray(svals), rtol=1e-4)


class TestChunkedKMeans:
    """8M-build machinery: the chunked forms must agree with the flat fit."""

    def test_single_chunk_matches_flat(self):
        from shodh_tpu.index.kmeans import kmeans_fit, kmeans_fit_chunked

        v = _clustered_data(n_clusters=8, per_cluster=32, d=16, seed=3)
        n = len(v)
        w = np.ones(n, np.float32)
        idx = (np.arange(8) * (n // 8)).clip(0, n - 1)
        c_flat, a_flat = kmeans_fit(jnp.asarray(v), k=8, iters=5)
        c_ch, a_ch = kmeans_fit_chunked(
            jnp.asarray(v), jnp.asarray(w), jnp.asarray(v[idx]), k=8, iters=5,
            chunk=n,
        )
        np.testing.assert_array_equal(np.asarray(a_flat), np.asarray(a_ch))
        np.testing.assert_allclose(np.asarray(c_flat), np.asarray(c_ch), rtol=1e-6)

    def test_pad_rows_never_move_centroids(self):
        from shodh_tpu.index.kmeans import kmeans_fit_chunked

        v = _clustered_data(n_clusters=4, per_cluster=32, d=16, seed=5)
        n = len(v)
        idx = (np.arange(4) * (n // 4)).clip(0, n - 1)
        # no pad
        c0, a0 = kmeans_fit_chunked(
            jnp.asarray(v), jnp.asarray(np.ones(n, np.float32)),
            jnp.asarray(v[idx]), k=4, iters=5, chunk=n,
        )
        # zero-pad to 2n with weight 0
        vp = np.concatenate([v, np.zeros_like(v)])
        wp = np.concatenate([np.ones(n, np.float32), np.zeros(n, np.float32)])
        c1, a1 = kmeans_fit_chunked(
            jnp.asarray(vp), jnp.asarray(wp), jnp.asarray(v[idx]), k=4, iters=5,
            chunk=n,
        )
        np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1)[:n])

    def test_int8_form_matches_dequantized(self):
        from shodh_tpu.index.device_index import _quantize_int8_np
        from shodh_tpu.index.kmeans import kmeans_fit_chunked, kmeans_fit_int8

        v = _clustered_data(n_clusters=4, per_cluster=32, d=16, seed=7)
        n = len(v)
        q, s = _quantize_int8_np(v)
        deq = q.astype(np.float32) * s[:, None]
        idx = (np.arange(4) * (n // 4)).clip(0, n - 1)
        c_f, a_f = kmeans_fit_chunked(
            jnp.asarray(deq), jnp.asarray(np.ones(n, np.float32)),
            jnp.asarray(deq[idx]), k=4, iters=5, chunk=n // 2,
        )
        c_i, a_i = kmeans_fit_int8(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(deq[idx]), k=4, iters=5,
            chunk=n // 2,
        )
        np.testing.assert_array_equal(np.asarray(a_f), np.asarray(a_i))
        np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_i), rtol=1e-5)
