"""Fleet transport, migration, gazetteer, entity types, NER, integrations."""

import json
from datetime import datetime, timezone

import pytest

from shodh_tpu.nlp.entity_type import coarse_of, is_compatible, register_fine_type
from shodh_tpu.nlp.gazetteer import Gazetteer
from shodh_tpu.nlp.ner import NeuralNer, RuleBasedExtractor

NOW = datetime(2025, 7, 1, tzinfo=timezone.utc)


class TestNer:
    def test_rule_extractor_labels(self):
        ext = RuleBasedExtractor()
        mentions = {m.text.lower(): m.label for m in ext.extract(
            "Dr. Alice Chen from Acme Corp deployed rust in Berlin"
        )}
        assert mentions.get("alice chen") == "person"
        assert mentions.get("acme corp") == "organization"
        assert mentions.get("rust") == "technology"

    def test_neural_fallback_on_error(self):
        ner = NeuralNer()

        def broken(text):
            raise RuntimeError("model died")

        ner.set_model(broken)
        out = ner.extract("Alice works at Acme Corp")
        assert out  # degraded to rules, never empty-on-error
        assert ner.degraded

    def test_model_path_used_when_healthy(self):
        from shodh_tpu.nlp.ner import EntityMention

        ner = NeuralNer()
        ner.set_model(lambda text: [EntityMention(text="X9", label="product", confidence=0.99)])
        assert ner.extract_names("anything") == ["X9"]


class TestEntityTypes:
    def test_coarse_rollup(self):
        assert coarse_of("programming_language") == "technology"
        assert coarse_of("city") == "location"
        assert coarse_of("unknown_thing") == "other"

    def test_register(self):
        register_fine_type("llm", "technology")
        assert coarse_of("llm") == "technology"

    def test_compat(self):
        assert is_compatible("company", "startup")
        assert not is_compatible("city", "scientist")


class TestGazetteer:
    def test_resolve_and_extract(self):
        g = Gazetteer()
        top = g.resolve("Berlin")
        assert top is not None and abs(top.lat - 52.52) < 0.1
        tops = g.extract_toponyms("The team met in Berlin and then flew to New York")
        names = {t.name for t in tops}
        assert names == {"berlin", "new york"}

    def test_longest_match_wins(self):
        g = Gazetteer()
        tops = g.extract_toponyms("landing in new york tonight")
        assert {t.name for t in tops} == {"new york"}

    def test_tsv_load(self, tmp_path):
        tsv = tmp_path / "cities.tsv"
        # synthetic name so the shipped GeoNames artifact can't outrank it
        tsv.write_text("zorgburg\t39.8\t-89.6\t110000\nzorgburg\t42.1\t-72.6\t155000\n")
        g = Gazetteer(tsv)
        top = g.resolve("zorgburg")
        assert top.population == 155000  # population-weighted homonym pick

    def test_tsv_load_geonames_layout(self, tmp_path):
        # 6-column cities15000 layout: name, asciiname, lat, lon, country, pop
        tsv = tmp_path / "cities6.tsv"
        tsv.write_text("Zürgville\tZurgville\t47.0\t8.0\tCH\t50000\n")
        g = Gazetteer(tsv)
        for form in ("zürgville", "Zurgville"):
            top = g.resolve(form)
            assert top is not None and top.country == "CH" and top.population == 50000

    def test_full_artifact_resolution(self):
        # gazetteer/mod.rs:210-215 — Baltimore's source-row coordinates
        g = Gazetteer()
        top = g.resolve("Baltimore")
        assert top is not None and top.country == "US"
        assert abs(top.lat - 39.29038) < 1e-5 and abs(top.lon - -76.61219) < 1e-5
        # case-insensitive + trimmed (mod.rs:218-226)
        assert g.resolve("  bAlTiMoRe  ").canonical == top.canonical
        # homonym argmax: London, England (8.9M) over London, Ontario
        assert g.resolve("london").population > 8_000_000

    def test_extract_guards_common_word_cities(self):
        g = Gazetteer()
        # "split" (Split, HR), "nice" (Nice, FR), "mobile" (Mobile, AL) are
        # all cities15000 rows; lowercase common-word usage must not match
        assert g.extract_toponyms("we should split the bill") == []
        assert g.extract_toponyms("Nice to meet you!") == []
        assert g.extract_toponyms("most of my mobile photos") == []
        # capitalized mid-sentence is place evidence
        assert [t.name for t in g.extract_toponyms("the ferry to Split departs")] == ["split"]
        # metropolis-scale population reads unambiguously even lowercase
        assert [t.name for t in g.extract_toponyms("my flight to mumbai")] == ["mumbai"]

    def test_build_tool_reproducible(self, tmp_path):
        # tools/build_gazetteer.py: byte-stable output (mtime=0 gzip,
        # sorted rows) regardless of input ordering
        import importlib

        bg = importlib.import_module("tools.build_gazetteer")
        a = tmp_path / "a.tsv"
        b = tmp_path / "b.tsv"
        rows = ["Xville\t\t1.0\t2.0\tAA\t20000\n", "Yville\tYvil\t3.0\t4.0\tBB\t30000\n"]
        a.write_text("".join(rows))
        b.write_text("".join(reversed(rows)))
        out_a, out_b = tmp_path / "a.gz", tmp_path / "b.gz"
        assert bg.build(a, out_a) == bg.build(b, out_b) == 3  # Yville+yvil forms
        assert out_a.read_bytes() == out_b.read_bytes()

    def test_resolve_ner_locations(self):
        # mod.rs:166-206 — resolve LOC mentions, drop unresolved, dedup
        g = Gazetteer()
        tops = g.resolve_ner_locations(["Baltimore", "baltimore", "the dog park", "Kyoto"])
        assert [t.canonical for t in tops] == ["Baltimore", "Kyoto"]
        assert tops[0].mention == "Baltimore"


class TestFleet:
    def test_remember_recall_over_bus(self, tmp_path):
        from shodh_tpu.server.fleet import FleetTransport, InProcessBus, KEY_PREFIX
        from shodh_tpu.server.state import MultiUserMemoryManager

        manager = MultiUserMemoryManager(tmp_path / "fleet")
        bus = InProcessBus()
        transport = FleetTransport(manager, bus)
        acks = []
        bus.subscribe(f"{KEY_PREFIX}/*/remember/ack", lambda k, p: acks.append(json.loads(p)))
        results = []
        bus.subscribe(f"{KEY_PREFIX}/*/recall/result", lambda k, p: results.append(json.loads(p)))

        bus.publish(
            f"{KEY_PREFIX}/robot1/remember",
            json.dumps({"content": "obstacle at dock A", "robot_id": "r1"}).encode(),
        )
        assert acks and "memory_id" in acks[0]
        bus.publish(
            f"{KEY_PREFIX}/robot1/recall",
            json.dumps({"query": "obstacle dock"}).encode(),
        )
        assert results and results[0]["memories"]
        manager.close()

    def test_auth_rejects_bad_mac(self, tmp_path, monkeypatch):
        from shodh_tpu.server.fleet import FleetTransport, InProcessBus, KEY_PREFIX
        from shodh_tpu.server.state import MultiUserMemoryManager

        manager = MultiUserMemoryManager(tmp_path / "fleet2")
        bus = InProcessBus()
        transport = FleetTransport(manager, bus, auth_key="secret")
        acks = []
        bus.subscribe(f"{KEY_PREFIX}/*/remember/ack", lambda k, p: acks.append(p))
        bus.publish(
            f"{KEY_PREFIX}/r/remember",
            json.dumps({"content": "spoofed", "auth": "bad"}).encode(),
        )
        assert not acks
        # signed payload accepted
        signed = transport.sign({"content": "legit"})
        bus.publish(f"{KEY_PREFIX}/r/remember", json.dumps(signed).encode())
        assert acks
        manager.close()

    def test_liveliness(self, tmp_path):
        from shodh_tpu.server.fleet import FleetTransport, InProcessBus
        from shodh_tpu.server.state import MultiUserMemoryManager

        manager = MultiUserMemoryManager(tmp_path / "fleet3")
        t = FleetTransport(manager, InProcessBus())
        t.announce("spot-1")
        t.announce("spot-2")
        assert t.fleet_members() == ["spot-1", "spot-2"]
        manager.close()

    def test_sensor_stream_flushes_to_memories(self, tmp_path):
        """shodh/{user}/stream/sensor — auto-remember via the extraction
        pipeline (reference README key-expr table)."""
        from shodh_tpu.server.fleet import FleetTransport, InProcessBus, KEY_PREFIX
        from shodh_tpu.server.state import MultiUserMemoryManager
        from shodh_tpu.server.streaming import FLUSH_EVENTS

        manager = MultiUserMemoryManager(tmp_path / "fleet4")
        bus = InProcessBus()
        FleetTransport(manager, bus)
        flushed = []
        bus.subscribe(f"{KEY_PREFIX}/*/stream/flushed",
                      lambda k, p: flushed.append(json.loads(p)))
        for i in range(FLUSH_EVENTS):
            bus.publish(
                f"{KEY_PREFIX}/drone1/stream/sensor",
                json.dumps({"content": f"battery reading {i}",
                            "data": {"battery": 0.9 - i * 0.01}}).encode(),
            )
        assert flushed and len(flushed[0]["memory_ids"]) == FLUSH_EVENTS
        system = manager.get_user_memory("drone1")
        mems = system.get_all(limit=50)
        assert any(m.experience.sensor_data for m in mems)
        manager.close()

    def test_mission_boundaries_stamp_memories(self, tmp_path):
        """mission/start opens a mission; streamed items inherit its id;
        mission/end drains the buffer and stores a summary memory."""
        from shodh_tpu.server.fleet import FleetTransport, InProcessBus, KEY_PREFIX
        from shodh_tpu.server.state import MultiUserMemoryManager

        manager = MultiUserMemoryManager(tmp_path / "fleet5")
        bus = InProcessBus()
        FleetTransport(manager, bus)
        acks = []
        bus.subscribe(f"{KEY_PREFIX}/*/mission/ack", lambda k, p: acks.append(json.loads(p)))
        bus.publish(f"{KEY_PREFIX}/spot1/mission/start",
                    json.dumps({"mission_id": "inspection-7",
                                "description": "bridge inspection run"}).encode())
        assert acks and acks[0] == {"mission_id": "inspection-7", "active": True}
        bus.publish(f"{KEY_PREFIX}/spot1/stream/sensor",
                    json.dumps({"content": "crack at waypoint alpha",
                                "data": {"depth_mm": 3.0}}).encode())
        bus.publish(f"{KEY_PREFIX}/spot1/mission/end",
                    json.dumps({"summary": "inspection complete, one defect"}).encode())
        assert acks[-1]["active"] is False
        system = manager.get_user_memory("spot1")
        mems = system.get_all(limit=50)
        mission_ids = {m.experience.mission_id for m in mems}
        assert "inspection-7" in mission_ids
        # the buffered sensor item was drained at mission end with the id
        assert any(m.experience.mission_id == "inspection-7"
                   and "crack" in m.experience.content for m in mems)
        assert any("mission-end" in m.experience.tags for m in mems)
        manager.close()

    def test_auto_topics_env(self, tmp_path, monkeypatch):
        """SHODH_FLEET_AUTO_TOPICS maps arbitrary key expressions into a
        user's stream (the ROS2-bridge auto-subscribe pattern)."""
        from shodh_tpu.server.fleet import FleetTransport, InProcessBus
        from shodh_tpu.server.state import MultiUserMemoryManager
        from shodh_tpu.server.streaming import FLUSH_EVENTS

        monkeypatch.setenv(
            "SHODH_FLEET_AUTO_TOPICS",
            json.dumps([{"key_expr": "rt/spot1/status", "user_id": "spot-1",
                         "mode": "sensor"}]),
        )
        manager = MultiUserMemoryManager(tmp_path / "fleet6")
        bus = InProcessBus()
        FleetTransport(manager, bus)
        for i in range(FLUSH_EVENTS):
            bus.publish("rt/spot1/status",
                        json.dumps({"content": f"status {i}",
                                    "data": {"temp": 20.0 + i}}).encode())
        system = manager.get_user_memory("spot-1")
        assert len(system.get_all(limit=50)) >= FLUSH_EVENTS
        manager.close()


class TestMigration:
    def test_legacy_records_upgraded(self, tmp_path):
        import msgpack

        from shodh_tpu.storage.kv import KvStore
        from shodh_tpu.storage.migration import migrate_kv
        from shodh_tpu.storage.serialization import decode, encode

        kv = KvStore(tmp_path / "old.db")
        kv.put("ns", "modern", encode({"v": 1}))
        kv.put("ns", "legacy_msgpack", msgpack.packb({"v": 2}))
        kv.put("ns", "legacy_json", json.dumps({"v": 3}).encode())
        kv.put("ns", "garbage", b"\x00\xff\x00corrupt")
        kv.close()
        report = migrate_kv(tmp_path / "old.db")
        assert report["ns"]["ok"] == 1
        assert report["ns"]["migrated"] == 2
        assert report["ns"]["corrupt"] == 1
        kv2 = KvStore(tmp_path / "old.db")
        assert decode(kv2.get("ns", "legacy_msgpack")) == {"v": 2}
        kv2.close()


class TestIntegrations:
    def test_store_adapter(self, tmp_path):
        from shodh_tpu.clients.client import Memory
        from shodh_tpu.clients.integrations import ShodhMemoryStore, openai_agent_tools

        m = Memory(embedded=True, data_dir=str(tmp_path / "int"))
        store = ShodhMemoryStore(m)
        store.save("the deploy pipeline uses blue-green", {"tags": ["ci"]})
        hits = store.query("deploy pipeline")
        assert hits and "blue-green" in hits[0]["experience"]["content"]
        tools = openai_agent_tools(m)[0]
        out = tools["dispatch"]("recall", {"query": "deploy"})
        assert "blue-green" in out
        m.close()
