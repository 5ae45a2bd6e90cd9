"""Streaming ingest, local IPC, webhooks tests."""

import asyncio
import hashlib
import hmac
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from shodh_tpu.server.app import DEV_KEY, make_app
from shodh_tpu.server.state import MultiUserMemoryManager

HEADERS = {"X-API-Key": DEV_KEY, "X-User-ID": "tester"}


@pytest.fixture()
def harness(tmp_path):
    loop = asyncio.new_event_loop()
    manager = MultiUserMemoryManager(tmp_path / "srv")
    app = make_app(manager)
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())
    yield loop, client, manager, app
    loop.run_until_complete(client.close())
    manager.close()
    loop.close()


class TestStreaming:
    def test_buffer_flush_policy(self):
        from shodh_tpu.server.streaming import FLUSH_EVENTS, StreamBuffer

        buf = StreamBuffer()
        assert not buf.should_flush()
        for i in range(FLUSH_EVENTS):
            buf.add({"content": f"msg {i}"})
        assert buf.should_flush()
        assert len(buf.drain()) == FLUSH_EVENTS
        assert not buf.items

    def test_flush_segments_conversation(self, tmp_path):
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.server.streaming import StreamBuffer, flush_to_memory

        sys_ = MemorySystem(tmp_path / "m")
        buf = StreamBuffer()
        buf.add({"content": "We decided to use sqlite.", "role": "user"})
        buf.add({"content": "The first deploy failed with a permissions error.", "role": "user"})
        ids = flush_to_memory(sys_, buf)
        assert len(ids) == 2  # decision + error segments
        types = {sys_.get(i).experience.experience_type.value for i in ids}
        assert types == {"decision", "error"}
        # auto-captured tag penalty applied downstream
        assert all("auto-captured" in sys_.get(i).experience.tags for i in ids)
        sys_.close()

    def test_sensor_mode(self, tmp_path):
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.server.streaming import StreamBuffer, flush_to_memory

        sys_ = MemorySystem(tmp_path / "m")
        buf = StreamBuffer(mode="sensor")
        buf.add({"content": "lidar ping", "data": {"range_m": 4.2}, "robot_id": "r2"})
        ids = flush_to_memory(sys_, buf)
        mem = sys_.get(ids[0])
        assert mem.experience.sensor_data == {"range_m": 4.2}
        assert mem.experience.robot_id == "r2"
        sys_.close()

    def test_websocket_roundtrip(self, harness):
        loop, client, manager, app = harness

        async def go():
            ws = await client.ws_connect("/api/stream", headers=HEADERS)
            await ws.send_json({"type": "message", "content": "We chose Kafka for events.", "role": "user"})
            ack = await ws.receive_json()
            assert ack["type"] == "ack"
            await ws.send_json({"type": "flush"})
            flushed = await ws.receive_json()
            assert flushed["type"] == "flushed" and flushed["memory_ids"]
            await ws.close()

        loop.run_until_complete(go())
        sys_ = manager.get_user_memory("tester")
        assert sys_.stats().total_memories >= 1


class TestLocalIpc:
    def test_handshake_and_dispatch(self, harness, tmp_path, monkeypatch):
        loop, client, manager, app = harness
        from shodh_tpu.server.local_ipc import LocalIpcClient, LocalIpcServer

        monkeypatch.delenv("SHODH_IPC_SECRET", raising=False)
        sock = tmp_path / "ipc.sock"
        server = LocalIpcServer(app, sock)
        loop.run_until_complete(server.start())

        def client_work():
            ipc = LocalIpcClient(sock)
            out = ipc.exchange(
                [
                    {"method": "POST", "path": "/api/remember",
                     "body": {"content": "ipc memory"}, "user_id": "ipcuser"},
                    {"method": "GET", "path": "/api/stats", "user_id": "ipcuser"},
                ]
            )
            return out

        out = loop.run_until_complete(asyncio.to_thread(client_work))
        assert out[0]["status"] == 200 and "memory_id" in out[0]["body"]
        assert out[1]["body"]["total_memories"] == 1
        loop.run_until_complete(server.stop())

    def test_sdk_ipc_transport(self, harness, tmp_path, monkeypatch):
        """Memory(ipc=...) routes the whole SDK over the UDS (the reference
        client's SHODH_IPC_ENDPOINT mode) — no API key involved."""
        loop, client, manager, app = harness
        from shodh_tpu.clients.client import Memory, ShodhError
        from shodh_tpu.server.local_ipc import LocalIpcServer

        monkeypatch.delenv("SHODH_IPC_SECRET", raising=False)
        sock = tmp_path / "sdk.sock"
        server = LocalIpcServer(app, sock)
        loop.run_until_complete(server.start())

        def client_work():
            m = Memory(ipc=str(sock), user_id="sdkuser")
            mid = m.add("sdk ipc transport memory")
            hits = m.search("sdk transport")
            stats = m.stats()
            err = None
            try:
                m._request("GET", "/api/definitely-not-a-route")
            except ShodhError as exc:
                err = str(exc)
            return mid, hits, stats, err

        mid, hits, stats, err = loop.run_until_complete(asyncio.to_thread(client_work))
        assert mid and hits and hits[0]["experience"]["content"].startswith("sdk ipc")
        assert stats["total_memories"] == 1
        assert err and err.startswith("404")
        loop.run_until_complete(server.stop())

    def test_bad_mac_rejected(self, harness, tmp_path, monkeypatch):
        loop, client, manager, app = harness
        from shodh_tpu.server.local_ipc import LocalIpcClient, LocalIpcServer

        monkeypatch.delenv("SHODH_IPC_SECRET", raising=False)
        sock = tmp_path / "ipc2.sock"
        server = LocalIpcServer(app, sock)
        loop.run_until_complete(server.start())

        def client_work():
            ipc = LocalIpcClient(sock, secret=b"wrong-secret")
            with pytest.raises(PermissionError):
                ipc.exchange([{"method": "GET", "path": "/health"}])

        loop.run_until_complete(asyncio.to_thread(client_work))
        loop.run_until_complete(server.stop())


class TestAuthFailClosed:
    def test_no_keys_configured_503(self, harness, monkeypatch):
        """auth.rs contract: with no keys configured, authenticated routes
        reject with AUTH_NOT_CONFIGURED — never an implicit dev key."""
        loop, client, manager, app = harness
        monkeypatch.delenv("SHODH_API_KEYS", raising=False)
        monkeypatch.delenv("SHODH_DEV_API_KEY", raising=False)

        async def go():
            resp = await client.post("/api/remember", json={"content": "x"}, headers=HEADERS)
            health = await client.get("/health")
            return resp.status, (await resp.json())["error"]["code"], health.status

        status, code, health = loop.run_until_complete(go())
        assert status == 503 and code == "AUTH_NOT_CONFIGURED"
        assert health == 200  # probes stay open

    def test_dev_key_only_when_explicit(self, harness, monkeypatch):
        loop, client, manager, app = harness
        monkeypatch.delenv("SHODH_API_KEYS", raising=False)
        monkeypatch.setenv("SHODH_DEV_API_KEY", "my-dev-key")

        async def go():
            ok = await client.get("/api/stats", headers={"X-API-Key": "my-dev-key", "X-User-ID": "t"})
            bad = await client.get("/api/stats", headers={"X-API-Key": DEV_KEY, "X-User-ID": "t"})
            return ok.status, bad.status

        ok, bad = loop.run_until_complete(go())
        assert ok == 200 and bad == 401


class TestIpcLargeFrames:
    def test_frame_between_64k_and_8m(self, harness, tmp_path, monkeypatch):
        """Frames above asyncio's 64 KiB default readline limit must work
        (local_ipc.rs supports full 8 MiB frames)."""
        loop, client, manager, app = harness
        from shodh_tpu.server.local_ipc import LocalIpcClient, LocalIpcServer

        monkeypatch.delenv("SHODH_IPC_SECRET", raising=False)
        sock = tmp_path / "big.sock"
        server = LocalIpcServer(app, sock)
        loop.run_until_complete(server.start())

        big = "y" * (300 * 1024)  # 300 KiB frame — killed the conn in round 1

        def client_work():
            ipc = LocalIpcClient(sock)
            return ipc.exchange([
                {"method": "POST", "path": "/api/remember",
                 "body": {"content": big[:9000]}, "user_id": "big",
                 "padding": big},
                {"method": "GET", "path": "/api/stats", "user_id": "big"},
            ])

        out = loop.run_until_complete(asyncio.to_thread(client_work))
        assert out[0]["status"] == 200
        assert out[1]["body"]["total_memories"] == 1
        loop.run_until_complete(server.stop())

    def test_oversized_frame_reports_and_survives(self, harness, tmp_path, monkeypatch):
        loop, client, manager, app = harness
        from shodh_tpu.server.local_ipc import LocalIpcClient, LocalIpcServer, MAX_FRAME

        monkeypatch.delenv("SHODH_IPC_SECRET", raising=False)
        sock = tmp_path / "huge.sock"
        server = LocalIpcServer(app, sock)
        loop.run_until_complete(server.start())

        def client_work():
            ipc = LocalIpcClient(sock)
            return ipc.exchange([
                {"method": "GET", "path": "/health", "padding": "z" * (MAX_FRAME + 100)},
                {"method": "GET", "path": "/health"},  # conn must still work
            ])

        out = loop.run_until_complete(asyncio.to_thread(client_work))
        assert out[0] == {"error": "frame too large"}
        assert out[1]["status"] == 200
        loop.run_until_complete(server.stop())


class TestWebhooks:
    """Webhook receivers are PUBLIC (deliveries can't attach API keys) with
    MANDATORY HMAC: unset secret -> 503, bad signature -> 401."""

    def test_github_pr_merged(self, harness, monkeypatch):
        loop, client, manager, app = harness
        monkeypatch.setenv("SHODH_GITHUB_WEBHOOK_SECRET", "topsecret")
        payload = {
            "action": "closed",
            "pull_request": {"merged": True, "title": "Add retries", "body": "adds retry logic",
                             "html_url": "https://github.com/x/y/pull/1", "user": {"login": "alice"}},
            "repository": {"full_name": "acme/backend"},
        }
        raw = json.dumps(payload).encode()
        sig = "sha256=" + hmac.new(b"topsecret", raw, hashlib.sha256).hexdigest()

        async def go():
            # NO API key header: the route is public, HMAC is the auth
            resp = await client.post(
                "/webhook/github?user_id=tester",
                data=raw,
                headers={"X-GitHub-Event": "pull_request",
                         "X-Hub-Signature-256": sig,
                         "Content-Type": "application/json"},
            )
            return resp.status, await resp.json()

        status, body = loop.run_until_complete(go())
        assert status == 200 and body["stored"]
        mem = manager.get_user_memory("tester").get(body["memory_id"])
        assert mem.experience.experience_type.value == "decision"

    def test_github_secret_mandatory(self, harness, monkeypatch):
        loop, client, manager, app = harness
        monkeypatch.delenv("SHODH_GITHUB_WEBHOOK_SECRET", raising=False)

        async def go():
            resp = await client.post(
                "/webhook/github", data=b"{}",
                headers={"X-GitHub-Event": "push", "Content-Type": "application/json"},
            )
            return resp.status

        assert loop.run_until_complete(go()) == 503

    def test_github_signature_enforced(self, harness, monkeypatch):
        loop, client, manager, app = harness
        monkeypatch.setenv("SHODH_GITHUB_WEBHOOK_SECRET", "topsecret")
        body = json.dumps({"action": "opened", "repository": {}}).encode()

        async def go(sig):
            resp = await client.post(
                "/webhook/github",
                data=body,
                headers={"X-GitHub-Event": "issues",
                         "X-Hub-Signature-256": sig, "Content-Type": "application/json"},
            )
            return resp.status

        bad = loop.run_until_complete(go("sha256=deadbeef"))
        assert bad == 401
        good_sig = "sha256=" + hmac.new(b"topsecret", body, hashlib.sha256).hexdigest()
        ok = loop.run_until_complete(go(good_sig))
        assert ok == 200

    def test_linear_issue(self, harness, monkeypatch):
        loop, client, manager, app = harness
        monkeypatch.setenv("SHODH_LINEAR_WEBHOOK_SECRET", "linsecret")
        payload = {"type": "Issue", "action": "create",
                   "data": {"title": "Fix login", "state": {"name": "Todo"}, "url": "https://linear.app/x"}}
        raw = json.dumps(payload).encode()
        sig = hmac.new(b"linsecret", raw, hashlib.sha256).hexdigest()

        async def go():
            resp = await client.post(
                "/webhook/linear?user_id=tester",
                data=raw,
                headers={"Linear-Signature": sig, "Content-Type": "application/json"},
            )
            return await resp.json()

        body = loop.run_until_complete(go())
        assert body["stored"]


class TestMifRoutes:
    def test_export_import_over_http(self, harness):
        loop, client, manager, app = harness

        async def go():
            await client.post("/api/remember", json={"content": "mif payload"}, headers=HEADERS)
            resp = await client.get("/api/export/mif", headers=HEADERS)
            doc = await resp.json()
            other = {**HEADERS, "X-User-ID": "importer"}
            resp2 = await client.post("/api/import/mif", json={"document": doc}, headers=other)
            return doc, await resp2.json()

        doc, counts = loop.run_until_complete(go())
        assert doc["mif_version"] == "2.0"
        assert counts["memories"] == 1
