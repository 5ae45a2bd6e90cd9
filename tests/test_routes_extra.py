"""Extra route families: A/B, universe, anomalies, multimodal, index ops."""

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
                resp = await client.request(method, path, json=body, headers=headers)
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


class TestABRoutes:
    def test_experiment_lifecycle(self, client):
        status, body = client.request(
            "POST", "/api/ab/tests", {"name": "w1", "variants": {"a": {}, "b": {}}}
        )
        test_id = body["experiment"]["id"]
        client.request("POST", f"/api/ab/tests/{test_id}/start", {})
        client.request("POST", f"/api/ab/tests/{test_id}/impression", {"variant": "a"})
        client.request("POST", f"/api/ab/tests/{test_id}/click", {"variant": "a"})
        status, analysis = client.request("GET", f"/api/ab/tests/{test_id}/analyze")
        assert analysis["stats"]["a"]["impressions"] == 1
        status, body = client.request("GET", "/api/ab/tests")
        assert len(body["experiments"]) == 1


class TestVisualizationRoutes:
    def test_universe(self, client):
        for i in range(5):
            client.request("POST", "/api/remember", {"content": f"star memory {i} about testing"})
        status, body = client.request("GET", "/api/graph/tester/universe")
        assert status == 200 and len(body["stars"]) == 5

    def test_anomalies(self, client):
        client.request("POST", "/api/remember", {"content": "robot crash", "anomaly": True})
        status, body = client.request("GET", "/api/anomalies")
        assert any(a["reason"] == "flagged" for a in body["anomalies"])


class TestMultimodal:
    def test_multimodal_store_and_search(self, client):
        emb = [0.1] * 64
        status, body = client.request(
            "POST", "/api/remember",
            {"content": "a photo of the warehouse", "image_embeddings": emb},
        )
        assert status == 200
        status, body = client.request(
            "POST", "/api/search/multimodal", {"embedding": emb, "modality": "image"}
        )
        assert status == 200 and body["memories"]
        assert body["memories"][0]["experience"]["content"] == "a photo of the warehouse"


class TestIndexOps:
    def test_verify_and_rebuild(self, client):
        client.request("POST", "/api/remember", {"content": "index subject"})
        status, body = client.request("GET", "/api/index/verify")
        assert body["ok"]
        status, body = client.request("POST", "/api/index/rebuild", {})
        assert body["rebuilt"] == 1
        status, body = client.request("POST", "/api/recall", {"query": "index subject"})
        assert body["count"] == 1

    def test_storage_and_clear(self, client):
        client.request("POST", "/api/remember", {"content": "to be cleared"})
        status, body = client.request("GET", "/api/storage/stats")
        assert body["memories"] == 1 and body["disk_bytes"] > 0
        status, body = client.request("POST", "/api/memories/clear", {})
        assert status == 400  # confirmation required
        status, body = client.request("POST", "/api/memories/clear", {"confirm": True})
        assert body["cleared"] == 1

    def test_context_summary(self, client):
        client.request("POST", "/api/remember", {"content": "summary fodder"})
        status, body = client.request("GET", "/api/context_summary")
        assert body["recent"] and "stats" in body


class TestDashboardAndGraphOps:
    def test_dashboard_served_unauthenticated(self, client):
        status, text = client.request("GET", "/dashboard", headers={})
        assert status == 200 and "shodh-tpu" in text

    def test_graph_invalidate_and_census(self, client):
        client.request(
            "POST", "/api/remember",
            {"content": "Alice met Bob at the office", "entities": ["Alice", "Bob"]},
        )
        status, body = client.request("GET", "/api/graph/tester/tier-census")
        assert body["edges"] >= 1
        status, body = client.request(
            "POST", "/api/graph/relationship/invalidate", {"from": "Alice", "to": "Bob"}
        )
        assert body["invalidated"]
        status, body = client.request("GET", "/api/graph/tester/tier-census")
        assert body["edges"] == 0

    def test_graph_canonicalize(self, client):
        client.request(
            "POST", "/api/remember",
            {"content": "note one", "entities": ["payment service", "the payment service"]},
        )
        status, body = client.request("POST", "/api/graph/tester/canonicalize", {})
        assert status == 200 and body["merged"] >= 1

    def test_graph_clear_requires_confirm(self, client):
        client.request("POST", "/api/remember", {"content": "graph fodder", "entities": ["Zed"]})
        status, _ = client.request("POST", "/api/graph/tester/clear", {})
        assert status == 400
        status, body = client.request("POST", "/api/graph/tester/clear", {"confirm": True})
        assert body["cleared"]


class TestRecallTracked:
    def test_tracking_id_and_attribution(self, client):
        client.request("POST", "/api/remember", {"content": "tracked recall target"})
        status, body = client.request(
            "POST", "/api/recall/tracked", {"query": "tracked recall"}
        )
        assert status == 200 and body["tracking_id"]
        assert body["memories"][0]["attribution"]
        assert "stage_timings_ms" in body


def test_openapi_matches_router():
    """openapi.yaml must be regenerable byte-for-byte from the live router
    (tools/gen_openapi.py) — the router is the single op catalog."""
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(root / "tools"))
    try:
        import gen_openapi
    finally:
        sys.path.pop(0)
    regenerated = gen_openapi.emit(gen_openapi.collect_routes())
    checked_in = (root / "openapi.yaml").read_text()
    assert checked_in == regenerated, "openapi.yaml drifted — run python tools/gen_openapi.py"


def test_bad_layer_mode_is_422_not_500(client):
    status, body = client.request(
        "POST", "/api/recall", {"query": "x", "layers": "bogus-rung"}
    )
    assert status == 422
    assert body["error"]["code"] == "bad_query"
