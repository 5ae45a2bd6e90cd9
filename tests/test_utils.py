"""Utility coverage: geohash, clock pinning, serialization, KV store."""

from datetime import datetime, timezone

import pytest

from shodh_tpu.storage.serialization import CorruptRecordError, decode, encode
from shodh_tpu.utils import geohash
from shodh_tpu.utils.clock import days_between, hours_between, pin_now, scoring_now


class TestGeohash:
    def test_encode_decode_roundtrip(self):
        lat, lon = 37.7749, -122.4194
        gh = geohash.encode(lat, lon, precision=10)
        assert len(gh) == 10
        dlat, dlon = geohash.decode(gh)
        assert abs(dlat - lat) < 0.001 and abs(dlon - lon) < 0.001

    def test_known_value(self):
        # well-known geohash test vector
        assert geohash.encode(57.64911, 10.40744, 11) == "u4pruydqqvj"

    def test_haversine(self):
        # SF -> LA ~ 559 km
        d = geohash.haversine_m(37.7749, -122.4194, 34.0522, -118.2437)
        assert 540_000 < d < 580_000
        assert geohash.haversine_m(0, 0, 0, 0) == 0.0

    def test_cover_includes_center(self):
        prefixes = geohash.cover(37.7749, -122.4194, 500)
        full = geohash.encode(37.7749, -122.4194, 10)
        assert any(full.startswith(p) for p in prefixes)
        assert 1 <= len(prefixes) <= 9

    def test_precision_for_radius(self):
        assert geohash.precision_for_radius(1.0) == 10
        assert geohash.precision_for_radius(100_000) <= 4


class TestClock:
    def test_pin_and_unpin(self):
        t = datetime(2025, 1, 1, tzinfo=timezone.utc)
        pin_now(t)
        try:
            assert scoring_now() == t
        finally:
            pin_now(None)
        assert scoring_now() != t

    def test_env_pin(self, monkeypatch):
        monkeypatch.setenv("SHODH_EVAL_NOW", "2025-06-15T12:00:00Z")
        assert scoring_now() == datetime(2025, 6, 15, 12, tzinfo=timezone.utc)

    def test_between_clamps_negative(self):
        a = datetime(2025, 1, 2, tzinfo=timezone.utc)
        b = datetime(2025, 1, 1, tzinfo=timezone.utc)
        assert hours_between(a, b) == 0.0
        assert days_between(b, a) == 1.0


class TestSerialization:
    def test_roundtrip(self):
        obj = {"a": [1, 2.5, "x"], "b": {"nested": True}, "bin": b"\x00\x01"}
        assert decode(encode(obj)) == obj

    def test_magic_rejected(self):
        with pytest.raises(CorruptRecordError, match="magic"):
            decode(b"XXXX" + b"\x01" + b"\x00" * 8 + b"payload")

    def test_checksum_rejected(self):
        blob = bytearray(encode({"x": 1}))
        blob[-1] ^= 0xFF
        with pytest.raises(CorruptRecordError, match="checksum"):
            decode(bytes(blob))

    def test_short_record(self):
        with pytest.raises(CorruptRecordError, match="short"):
            decode(b"ab")


class TestKvStore:
    def test_prefix_and_range_scans(self, tmp_path):
        from shodh_tpu.storage.kv import KvStore

        kv = KvStore(tmp_path / "t.db")
        for k in ("a:1", "a:2", "b:1"):
            kv.put("ns", k, k.encode())
        assert kv.keys("ns", "a:") == ["a:1", "a:2"]
        assert [k for k, _ in kv.scan_range("ns", "a:2", "b:2")] == ["a:2", "b:1"]
        assert kv.count("ns") == 3
        assert kv.count("ns", "a:") == 2
        kv.delete("ns", "a:1")
        assert not kv.exists("ns", "a:1")
        kv.close()

    def test_batch_atomicity(self, tmp_path):
        from shodh_tpu.storage.kv import KvStore

        kv = KvStore(tmp_path / "t2.db")
        kv.write_batch([("put", "ns", "x", b"1"), ("put", "ns", "y", b"2"),
                        ("del", "ns", "x", None)])
        assert kv.get("ns", "x") is None
        assert kv.get("ns", "y") == b"2"
        kv.close()
