"""Replica HTTP server (server/replica.py): recall-only surface + status."""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from shodh_tpu.engine.follower import FollowerReader
from shodh_tpu.engine.memory_system import MemorySystem
from shodh_tpu.server.replica import make_replica_app
from shodh_tpu.types import Experience

HEADERS = {"X-API-Key": "k1"}


@pytest.fixture()
def rig(tmp_path):
    loop = asyncio.new_event_loop()
    writer = MemorySystem(tmp_path / "store")
    writer.batch_remember(
        [Experience(content=f"replica probe note {i} about topic{i % 2}") for i in range(8)]
    )
    writer.flush()
    follower = FollowerReader(tmp_path / "store")
    app = make_replica_app(follower, ["k1"])
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())

    class Sync:
        def request(self, method, path, body=None, headers=HEADERS):
            async def go():
                resp = await client.request(method, path, json=body, headers=headers)
                text = await resp.text()
                try:
                    return resp.status, json.loads(text)
                except json.JSONDecodeError:
                    return resp.status, text

            return loop.run_until_complete(go())

    yield Sync(), writer, follower
    loop.run_until_complete(client.close())
    writer.close()
    loop.close()


def test_health_and_status(rig):
    client, _, _ = rig
    status, body = client.request("GET", "/health", headers={})
    assert status == 200 and body["role"] == "replica"
    status, body = client.request("GET", "/api/replica/status")
    assert status == 200 and body["lag"] == 0 and body["indexed_rows"] >= 8


def test_recall_roundtrip_and_auth(rig):
    client, _, _ = rig
    status, body = client.request(
        "POST", "/api/recall", {"query_text": "replica probe topic1", "max_results": 3}
    )
    assert status == 200 and body["memories"]
    assert "score" in body["memories"][0]
    status, _ = client.request(
        "POST", "/api/recall", {"query_text": "x"}, headers={"X-API-Key": "nope"}
    )
    assert status == 401


def test_refresh_surfaces_new_writes(rig):
    client, writer, follower = rig
    writer.batch_remember([Experience(content="replica hot new entry about volcanoes")])
    writer.flush()
    follower.refresh()
    status, body = client.request(
        "POST", "/api/recall", {"query_text": "volcanoes hot entry", "max_results": 2}
    )
    assert status == 200
    assert any("volcanoes" in m["experience"]["content"] for m in body["memories"])
