"""HTTP API tests — real router over temp storage (the reference's
TestHarness pattern, src/handlers/test_helpers.rs: no engine mocks)."""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from shodh_tpu.server.app import DEV_KEY, make_app
from shodh_tpu.server.state import MultiUserMemoryManager

HEADERS = {"X-API-Key": DEV_KEY, "X-User-ID": "tester"}


@pytest.fixture()
def client(tmp_path):
    loop = asyncio.new_event_loop()
    manager = MultiUserMemoryManager(tmp_path / "srv")
    app = make_app(manager)
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())

    class Sync:
        def request(self, method, path, body=None, headers=HEADERS):
            async def go():
                resp = await client.request(
                    method, path, json=body, headers=headers
                )
                text = await resp.text()
                try:
                    return resp.status, json.loads(text)
                except json.JSONDecodeError:
                    return resp.status, text

            return loop.run_until_complete(go())

    yield Sync()
    loop.run_until_complete(client.close())
    manager.close()
    loop.close()


class TestAuth:
    def test_probe_unauthenticated(self, client):
        status, body = client.request("GET", "/health", headers={})
        assert status == 200 and body["status"] == "ok"

    def test_api_requires_key(self, client):
        status, body = client.request("GET", "/api/stats", headers={})
        assert status == 401

    def test_metrics_gated(self, client):
        status, _ = client.request("GET", "/metrics", headers={})
        assert status == 401
        status, text = client.request("GET", "/metrics")
        assert status == 200 and "shodh_uptime_seconds" in text


class TestMemoryRoutes:
    def test_remember_recall_roundtrip(self, client):
        status, body = client.request(
            "POST", "/api/remember",
            {"content": "We chose Rust for the backend because of memory safety"},
        )
        assert status == 200
        mem_id = body["memory_id"]
        status, body = client.request(
            "POST", "/api/recall", {"query": "why rust backend"}
        )
        assert status == 200
        assert body["memories"][0]["id"] == mem_id
        assert body["memories"][0]["score"] > 0

    def test_debug_recall_returns_timings(self, client):
        client.request("POST", "/api/remember", {"content": "observability memo"})
        status, body = client.request(
            "POST", "/api/recall", {"query": "observability", "debug": True}
        )
        assert status == 200
        assert "stage_timings_ms" in body and "diagnostics" in body

    def test_get_and_list_and_forget(self, client):
        _, body = client.request("POST", "/api/remember", {"content": "fetchable item"})
        mem_id = body["memory_id"]
        status, body = client.request("GET", f"/api/memory/{mem_id}")
        assert status == 200 and body["id"] == mem_id
        status, body = client.request("GET", "/api/memories")
        assert body["count"] == 1
        status, body = client.request("POST", "/api/forget", {"memory_id": mem_id})
        assert body["forgotten"]
        status, _ = client.request("GET", f"/api/memory/{mem_id}")
        assert status == 404

    def test_batch_remember(self, client):
        status, body = client.request(
            "POST", "/api/batch_remember",
            {"memories": [{"content": f"batch item {i}"} for i in range(3)]},
        )
        assert body["count"] == 3

    def test_forget_by_tags(self, client):
        client.request("POST", "/api/remember", {"content": "tagged a", "tags": ["junk"]})
        client.request("POST", "/api/remember", {"content": "tagged b", "tags": ["keep"]})
        status, body = client.request("POST", "/api/forget/tags", {"tags": ["junk"]})
        assert body["forgotten"] == 1

    def test_user_isolation(self, client):
        client.request("POST", "/api/remember", {"content": "secret of user A"})
        other = {**HEADERS, "X-User-ID": "other"}
        status, body = client.request(
            "POST", "/api/recall", {"query": "secret"}, headers=other
        )
        assert body["count"] == 0

    def test_reinforce(self, client):
        _, body = client.request("POST", "/api/remember", {"content": "reinforce me"})
        status, body = client.request(
            "POST", "/api/reinforce", {"memory_ids": [body["memory_id"]], "helpful": True}
        )
        assert body["reinforced"] == 1


class TestGraphRoutes:
    def test_entity_and_traverse(self, client):
        client.request(
            "POST", "/api/remember",
            {"content": "Alice works at Acme", "entities": ["Alice", "Acme"]},
        )
        status, body = client.request("POST", "/api/graph/entity/find", {"name": "Alice"})
        assert status == 200 and body["id"] == "alice"
        status, body = client.request("POST", "/api/graph/traverse", {"entity": "Alice"})
        assert any(r["entity"] == "acme" for r in body["results"])

    def test_graph_stats_and_dot(self, client):
        client.request(
            "POST", "/api/remember",
            {"content": "Bob uses Kafka", "entities": ["Bob", "Kafka"]},
        )
        status, body = client.request("GET", "/api/graph/tester/stats")
        assert body["entities"] >= 2
        status, text = client.request("GET", "/api/graph/tester/export")
        assert "bob" in text


class TestAuxRoutes:
    def test_reminders(self, client):
        status, body = client.request(
            "POST", "/api/reminders/set",
            {"content": "check the deploy", "context_keywords": ["deploy"]},
        )
        assert status == 200
        status, body = client.request("GET", "/api/reminders")
        assert len(body["pending"]) == 1

    def test_stats_and_users(self, client):
        client.request("POST", "/api/remember", {"content": "stat seed"})
        status, body = client.request("GET", "/api/stats")
        assert body["total_memories"] == 1
        status, body = client.request("GET", "/api/users")
        assert "tester" in body["users"]

    def test_consolidate(self, client):
        client.request("POST", "/api/remember", {"content": "maintain me"})
        status, body = client.request("POST", "/api/consolidate", {})
        assert status == 200 and "promoted" in body

    def test_backup_create_verify(self, client):
        client.request("POST", "/api/remember", {"content": "backup payload"})
        status, body = client.request("POST", "/api/backup/create", {})
        assert status == 200
        path = body["backup"]
        status, body = client.request("POST", "/api/backup/verify", {"path": path})
        assert body["valid"]

    def test_lineage_routes(self, client):
        _, a = client.request("POST", "/api/remember", {"content": "error: cache bug", "experience_type": "error", "entities": ["cache bug"]})
        _, b = client.request("POST", "/api/remember", {"content": "fixed the cache bug", "entities": ["cache bug"]})
        status, body = client.request(
            "POST", "/api/lineage/trace", {"memory_id": b["memory_id"]}
        )
        assert status == 200


class TestClientSDK:
    def test_embedded_mode(self, tmp_path):
        from shodh_tpu.clients.client import Memory

        with Memory(embedded=True, data_dir=str(tmp_path / "emb")) as m:
            mid = m.add("embedded mode memory about testing", memory_type="learning")
            hits = m.search("embedded testing")
            assert hits[0]["id"] == mid
            assert m.stats()["total_memories"] == 1
            assert m.delete(mid)

    def test_embedded_fsck(self, tmp_path):
        from shodh_tpu.clients.client import Memory

        with Memory(embedded=True, data_dir=str(tmp_path / "f")) as m:
            m.add("memory behind the fsck SDK surface")
            rep = m.fsck()
            assert rep["ok"] is True and rep["memories"] == 1
            assert not any(k.startswith("_") for k in rep)

    def test_embedded_store_layout_matches_server(self, tmp_path):
        # Memory(embedded=True, data_dir=X) and `serve --data-dir X` must
        # resolve the same store (state.py: data_dir/users/<id>); a layout
        # fork silently serves an empty store when switching transports.
        from shodh_tpu.clients.client import Memory
        from shodh_tpu.server.state import MultiUserMemoryManager

        d = tmp_path / "shared"
        with Memory(embedded=True, data_dir=str(d)) as m:
            m.add("written through the embedded client", tags=["interop"])
        manager = MultiUserMemoryManager(d)
        sys_ = manager.get_user_memory("default")
        assert sys_.stats().total_memories == 1
        manager.close()

    def test_embedded_legacy_layout_still_opens(self, tmp_path):
        # stores created by the pre-harmonized embedded layout
        # (data_dir/<id>) keep working
        from shodh_tpu.clients.client import Memory
        from shodh_tpu.engine.memory_system import MemorySystem

        legacy = tmp_path / "old" / "default"
        s = MemorySystem(legacy)
        s.remember({"content": "legacy layout data"})
        s.close()
        with Memory(embedded=True, data_dir=str(tmp_path / "old")) as m:
            hits = m.search("legacy layout data", limit=1)
            assert hits and "legacy" in hits[0]["experience"]["content"]


class TestMultiUserManager:
    def test_lru_user_eviction(self, tmp_path):
        from shodh_tpu.server.state import MultiUserMemoryManager

        manager = MultiUserMemoryManager(tmp_path / "lru", max_users=2)
        a = manager.get_user_memory("user-a")
        a.remember({"content": "durable across eviction"})
        manager.get_user_memory("user-b")
        manager.get_user_memory("user-c")  # evicts user-a (LRU)
        assert set(manager._systems.keys()) == {"user-b", "user-c"}
        # re-open: state survived eviction on disk
        a2 = manager.get_user_memory("user-a")
        hits = a2.recall({"query": "durable eviction"})
        assert len(hits.ids) == 1
        manager.close()

    def test_shared_embedder_singleton(self, tmp_path):
        from shodh_tpu.server.state import MultiUserMemoryManager

        manager = MultiUserMemoryManager(tmp_path / "shared")
        a = manager.get_user_memory("u1")
        b = manager.get_user_memory("u2")
        assert a.embedder is b.embedder  # weights load once
        manager.close()

    def test_user_id_validation(self):
        from shodh_tpu.server.state import validate_user_id

        assert validate_user_id("ok-user_1.x") == "ok-user_1.x"
        for bad in ("../etc", "a b", "", "x" * 200):
            with pytest.raises(ValueError):
                validate_user_id(bad)

    def test_maintenance_all_users_isolates_failures(self, tmp_path):
        from shodh_tpu.server.state import MultiUserMemoryManager

        manager = MultiUserMemoryManager(tmp_path / "maint")
        good = manager.get_user_memory("good")
        good.remember({"content": "maintain me"})
        bad = manager.get_user_memory("bad")
        bad.run_maintenance = lambda: (_ for _ in ()).throw(RuntimeError("boom"))
        report = manager.run_maintenance_all_users()
        assert "error" in report["bad"]
        assert "promoted" in report["good"]
        manager.close()


class TestSuppressAndReminderRoutes:
    def test_suppress_route(self, client):
        _, body = client.request("POST", "/api/remember", {"content": "surface me"})
        status, out = client.request(
            "POST", "/api/context/suppress", {"memory_id": body["memory_id"]}
        )
        assert status == 200 and out["suppressed"]

    def test_reminder_dismiss_delete(self, client):
        _, body = client.request(
            "POST", "/api/reminders/set", {"content": "temp reminder"}
        )
        rid = body["reminder_id"]
        status, out = client.request("POST", f"/api/reminders/{rid}/dismiss", {})
        assert out["dismissed"]
        _, pending = client.request("GET", "/api/reminders")
        assert pending["pending"] == []
        status, out = client.request("POST", f"/api/reminders/{rid}/delete", {})
        assert out["deleted"]

    def test_lineage_branch_routes(self, client):
        _, a = client.request("POST", "/api/remember", {"content": "seed memory", "entities": ["seed"]})
        status, body = client.request(
            "POST", "/api/lineage/branch",
            {"name": "experiment", "branch_point": a["memory_id"]},
        )
        assert status == 200
        bid = body["branch"]["id"]
        status, body = client.request("GET", "/api/lineage/branches")
        assert status == 200 and body["active"] == bid
        assert {b["id"] for b in body["branches"]} >= {"main", bid}
        status, body = client.request("POST", "/api/lineage/branch/switch", {"branch_id": "main"})
        assert body["active"] == "main"
        status, _ = client.request("POST", "/api/lineage/branch/switch", {"branch_id": "nope"})
        assert status == 404


class TestSchedulers:
    """server.rs:142-156 scheduler loops: reminder (already present),
    backup, telemetry. Driven against a real subprocess server."""

    def test_backup_scheduler_produces_verified_backups(self, tmp_path):
        import os
        import subprocess
        import sys as _sys
        import time
        import urllib.request

        port = 18931
        env = {
            **os.environ,
            "SHODH_DEV_API_KEY": "sk",
            "SHODH_BACKUP_INTERVAL_SECS": "2",
            "PYTHONPATH": str(tmp_path.parents[0]),
        }
        code = (
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from shodh_tpu.cli import main;"
            f"main(['serve','--data-dir','{tmp_path}/srv','--port','{port}'])"
        )
        proc = subprocess.Popen([_sys.executable, "-c", code], env=env,
                                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        try:
            deadline = time.time() + 30
            while time.time() < deadline:
                try:
                    urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=1)
                    break
                except OSError:
                    time.sleep(0.5)
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/remember",
                data=b'{"content": "scheduled backup subject"}',
                headers={"X-API-Key": "sk", "Content-Type": "application/json"},
            )
            urllib.request.urlopen(req, timeout=10)
            backup_root = tmp_path / "srv" / "backups" / "default"
            deadline = time.time() + 20
            while time.time() < deadline and not list(backup_root.glob("*")):
                time.sleep(0.5)
            backups = list(backup_root.glob("*"))
            assert backups, "backup scheduler produced no backup within 20s"
            from shodh_tpu.storage.backup import verify_backup

            assert verify_backup(backups[0])
        finally:
            proc.terminate()
            proc.wait(timeout=10)
