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

    def test_dashboard_spa_views_present(self, client):
        # the SPA (reference front/: recall/graph/anomalies/tasks views)
        status, text = client.request("GET", "/dashboard", headers={})
        for view in ("#/recall", "#/graph", "#/tasks", "#/anomalies", "#/activity"):
            assert view in text, f"dashboard missing view {view}"
        assert "EventSource" in text and "X-API-Key" in text

    def test_sse_accepts_query_key_only_on_events_routes(self, client):
        # EventSource cannot set headers: /api/events/sse takes ?key=
        status, _ = client.request("GET", "/api/stats?key=" + HEADERS["X-API-Key"],
                                   headers={})
        assert status == 401  # query key must NOT authenticate other routes


class TestProductionKnobs:
    def test_cors_headers_and_preflight(self, client, monkeypatch):
        import shodh_tpu.server.app as appmod

        monkeypatch.setattr(appmod, "_CORS_ORIGINS", ["https://app.example.com"])
        status, _, = client.request(
            "OPTIONS", "/api/stats",
            headers={"Origin": "https://app.example.com"})
        assert status == 204
        # disallowed origin: no preflight grant
        status, _ = client.request(
            "OPTIONS", "/api/stats", headers={"Origin": "https://evil.example"})
        assert status != 204

    def test_request_timeout_returns_504(self, client, monkeypatch):
        import shodh_tpu.server.app as appmod

        monkeypatch.setattr(appmod, "_REQUEST_TIMEOUT", 0.05)
        # recall with a query is comfortably slower than 50 ms on first call
        status, body = client.request("POST", "/api/recall",
                                      {"query": "anything at all"})
        assert status in (200, 504)  # warm caches may beat 50 ms
        monkeypatch.setattr(appmod, "_REQUEST_TIMEOUT", 0.0001)
        status, body = client.request("POST", "/api/recall", {"query": "again"})
        assert status == 504
        assert body["error"]["code"] == "timeout"

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
        # Ingest-time embedding dedup (round 2) already folds near-duplicate
        # names at add_entity, so variants never coexist after /api/remember:
        client.request(
            "POST", "/api/remember",
            {"content": "note one", "entities": ["payment service", "the payment service"]},
        )
        status, body = client.request("POST", "/api/graph/entities/all", {})
        assert len(body["entities"]) == 1  # merged at ingest
        # canonicalize still covers graphs built WITHOUT add_entity (imports):
        doc = {
            "mif_version": 2,
            "memories": [],
            "entities": [
                {"id": "billing engine", "name": "billing engine", "label": "technology"},
                {"id": "the billing engine", "name": "the billing engine", "label": "technology"},
            ],
            "relationships": [],
        }
        client.request("POST", "/api/import/mif", {"document": doc})
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


class TestRound2Routes:
    """The round-2 surface expansion (router.rs tail parity)."""

    def test_mif_adapters_and_auto_import(self, client):
        status, body = client.request("GET", "/api/mif/adapters")
        assert status == 200
        assert {a["format"] for a in body["adapters"]} == {"shodh", "mem0", "markdown", "generic"}
        # mem0-format auto-import
        mem0 = [{"id": "m1", "memory": "user prefers dark mode",
                 "metadata": {"category": "preference"},
                 "created_at": "2026-01-01T00:00:00Z", "user_id": "u"}]
        status, body = client.request("POST", "/api/import/auto", mem0)
        assert status == 200 and body["adapter"] == "mem0" and body["memories"] == 1

    def test_context_status_board(self, client):
        status, body = client.request("GET", "/api/context_status")
        assert body["status"] == "unknown"
        status, body = client.request(
            "POST", "/api/context/status", {"status": "compacting", "tokens": 150000}
        )
        assert status == 200
        status, body = client.request("GET", "/api/context/status")
        assert body["status"] == "compacting" and body["updated_at"]

    def test_facts_tail(self, client):
        # distill needs old memories; stats/search/narratives/purge work empty
        status, body = client.request("POST", "/api/facts/search", {"query": "anything"})
        assert status == 200 and body["facts"] == []
        status, body = client.request("GET", "/api/facts/stats")
        assert body["total_facts"] == 0
        status, body = client.request("POST", "/api/facts/narratives", {})
        assert body["total_clusters"] == 0
        status, body = client.request("POST", "/api/facts/purge", {})
        assert body["purged"] == 0

    def test_lineage_edges_confirm_reject(self, client):
        client.request("POST", "/api/remember", {"content": "the deploy failed"})
        client.request("POST", "/api/remember", {"content": "we rolled back the deploy"})
        status, mems = client.request("GET", "/api/memories")
        ids = [m["id"] for m in mems["memories"]]
        status, body = client.request(
            "POST", "/api/lineage/link",
            {"from": ids[0], "to": ids[1], "relation": "caused"},
        )
        status, body = client.request("POST", "/api/lineage/edges", {})
        assert status == 200 and len(body["edges"]) >= 1
        eid = body["edges"][0]["id"]
        status, edge = client.request("POST", "/api/lineage/confirm", {"edge_id": eid})
        assert edge["confidence"] >= 0.95 and edge["inferred"] is False
        status, body = client.request("POST", "/api/lineage/reject", {"edge_id": eid})
        assert body["rejected"] is True
        status, body = client.request("POST", "/api/lineage/reject", {"edge_id": eid})
        assert status == 404

    def test_compress_decompress_roundtrip(self, client):
        long_text = "We investigated the incident thoroughly. " * 20
        status, body = client.request("POST", "/api/remember", {"content": long_text})
        mid = body["memory_id"]
        status, body = client.request("POST", "/api/memory/compress", {"memory_id": mid})
        assert body["compressed"] is True
        status, body = client.request("POST", "/api/memory/decompress", {"memory_id": mid})
        assert body["content"].startswith("We investigated")
        # double-compress reports already compressed
        status, body = client.request("POST", "/api/memory/compress", {"memory_id": mid})
        assert body["compressed"] is False

    def test_storage_uncompressed_and_migrate(self, client):
        status, body = client.request("POST", "/api/storage/uncompressed", {"age_days": 0})
        assert status == 200 and "memories" in body
        status, body = client.request("POST", "/api/storage/migrate", {})
        assert status == 200

    def test_bulk_delete_and_tui_list(self, client):
        ids = []
        for i in range(3):
            _, body = client.request("POST", "/api/remember", {"content": f"bulk item {i}"})
            ids.append(body["memory_id"])
        status, body = client.request("GET", "/api/list/tester")
        assert len(body["memories"]) == 3
        status, body = client.request("POST", "/api/memories/bulk", {"memory_ids": ids[:2]})
        assert body["deleted"] == 2
        status, body = client.request("GET", "/api/list/tester")
        assert len(body["memories"]) == 1

    def test_graph_tail(self, client):
        client.request("POST", "/api/remember",
                       {"content": "Alice met Bob at Acme Corp in Tokyo",
                        "entities": ["Alice", "Bob", "Acme Corp"]})
        status, body = client.request("POST", "/api/graph/entities/all", {})
        assert status == 200 and len(body["entities"]) >= 2
        status, body = client.request("GET", "/api/graph/tester/curvature")
        assert status == 200 and body["edges"]
        status, body = client.request("POST", "/api/graph/tester/rebuild")
        assert body["rebuilt"] is True and body["entities"] >= 2
        status, body = client.request("GET", "/api/graph/data/tester")
        assert body["nodes"] and body["edges"]
        status, body = client.request("GET", "/api/brain/tester")
        assert body["total_neurons"] >= 1 and body["working_memory"]
        status, body = client.request("POST", "/api/visualization/build", {})
        assert body["built"] is True
        status, body = client.request("GET", "/api/visualization/tester/stats")
        assert body["entities"] >= 2
        status, page = client.request("GET", "/graph/view", headers={})
        assert status == 200 and "entity graph" in page

    def test_reminders_check_and_context(self, client):
        client.request("POST", "/api/reminders/set",
                       {"content": "review the budget", "context_keywords": ["budget"]})
        status, body = client.request("GET", "/api/reminders/context")
        assert len(body["reminders"]) == 1
        status, body = client.request("POST", "/api/reminders/check",
                                      {"context": "quarterly budget planning"})
        assert len(body["fired"]) == 1
        status, body = client.request("GET", "/api/reminders/context")
        assert body["reminders"] == []  # fired, no longer pending

    def test_sessions_tail(self, client):
        client.request("POST", "/api/remember", {"content": "session work item"})
        status, body = client.request("POST", "/api/sessions/digest", {})
        assert status == 200
        status, body = client.request(
            "POST", "/api/sessions/context-compressed",
            {"tokens_before": 180000, "tokens_after": 40000},
        )
        assert body["recorded"] is True
        status, sess = client.request("GET", "/api/sessions")
        if sess.get("sessions"):
            sid = sess["sessions"][0]["id"]
            status, body = client.request("GET", f"/api/sessions/{sid}")
            assert body["id"] == sid
        status, body = client.request("GET", "/api/sessions/nonexistent-id")
        assert status == 404

    def test_todos_tail(self, client):
        _, t = client.request("POST", "/api/todos", {"title": "parent task"})
        tid = t["todo"]["id"] if "todo" in t else t["id"]
        _, sub = client.request("POST", "/api/todos",
                                {"title": "child task", "parent_id": tid})
        status, body = client.request("GET", f"/api/todos/{tid}/subtasks")
        assert len(body["subtasks"]) == 1
        status, body = client.request("GET", f"/api/todos/{tid}")
        assert body["title"] == "parent task"
        _, c = client.request("POST", f"/api/todos/{tid}/comments", {"text": "note 1"})
        cid = c["comment"]["id"]
        status, body = client.request(
            "POST", f"/api/todos/{tid}/comments/{cid}/update", {"text": "edited"}
        )
        assert body["text"] == "edited"
        status, body = client.request("DELETE", f"/api/todos/{tid}/comments/{cid}")
        assert body["deleted"] is True
        client.request("POST", "/api/todos/reorder", {"todo_id": tid, "order": 5.0})
        status, body = client.request("GET", f"/api/todos/{tid}")
        assert body["order"] == 5.0
        status, body = client.request("DELETE", f"/api/todos/{tid}")
        assert body["deleted"] is True

    def test_projects_tail(self, client):
        _, p = client.request("POST", "/api/projects", {"name": "apollo"})
        pid = p["project"]["id"] if "project" in p else p["id"]
        status, body = client.request("GET", f"/api/projects/{pid}")
        assert body["name"] == "apollo"
        status, body = client.request(
            "POST", f"/api/projects/{pid}/update", {"description": "moon program"}
        )
        assert body["description"] == "moon program"
        status, body = client.request(
            "POST", f"/api/projects/{pid}/files/search", {"query": "anything"}
        )
        assert status == 200
        status, body = client.request("DELETE", f"/api/projects/{pid}")
        assert body["deleted"] is True

    def test_users_admin_delete(self, client):
        other = {"X-API-Key": DEV_KEY, "X-User-ID": "victim"}
        client.request("POST", "/api/remember", {"content": "victim data"}, headers=other)
        status, body = client.request("DELETE", "/api/users/victim")
        assert status == 200 and body["deleted"] == "victim"
        status, body = client.request("DELETE", "/api/users/victim")
        assert status == 404

    def test_ab_detail(self, client):
        _, body = client.request("POST", "/api/ab/tests", {"name": "d1"})
        tid = body["experiment"]["id"]
        status, body = client.request("GET", f"/api/ab/tests/{tid}")
        assert body["name"] == "d1"
        status, _ = client.request("GET", "/api/ab/tests/nope")
        assert status == 404

    def test_backup_purge_restore_guard(self, client):
        status, body = client.request("POST", "/api/backup/purge", {"keep": 3})
        assert status == 200
        # restore outside the backups root must be rejected
        status, body = client.request(
            "POST", "/api/backup/restore", {"backup_dir": "/etc"}
        )
        assert status == 400

    def test_index_repair(self, client):
        client.request("POST", "/api/remember", {"content": "index repair subject"})
        status, body = client.request("POST", "/api/index/repair", {})
        assert status == 200 and body["was_healthy"] is True

    def test_store_fsck(self, client):
        client.request("POST", "/api/remember", {"content": "fsck route subject"})
        status, body = client.request("POST", "/api/store/fsck", {})
        assert status == 200 and body["ok"] is True and body["memories"] >= 1
        # repair=true on a clean store is a no-op report
        status, body = client.request("POST", "/api/store/fsck", {"repair": True})
        assert status == 200 and body["ok"] is True and "repaired" not in body

    def test_pull_sync_with_injected_transport(self, client, monkeypatch):
        from shodh_tpu.server import integrations_sync as isync

        def fake_fetch(url, headers, data=None):
            if "api.github.com" in url:
                return [{"id": 1, "number": 7, "title": "Fix race", "state": "open",
                         "body": "details", "labels": [{"name": "bug"}],
                         "user": {"login": "alice"}, "html_url": "https://x"}]
            return {"data": {"issues": {"nodes": [
                {"identifier": "ENG-1", "title": "Ship it", "description": "",
                 "url": "https://l", "state": {"name": "Todo"}}]}}}

        monkeypatch.setattr(isync, "fetch_json", fake_fetch)
        status, body = client.request(
            "POST", "/api/sync/github",
            {"token": "t", "owner": "acme", "repo": "backend"},
        )
        assert status == 200 and body["issues_synced"] == 1
        status, body = client.request("POST", "/api/sync/linear", {"token": "t"})
        assert status == 200 and body["issues_synced"] == 1
        # missing token -> 400
        status, _ = client.request("POST", "/api/sync/github", {"owner": "a", "repo": "b"})
        assert status == 400

    def test_pull_sync_unreachable_is_502(self, client, monkeypatch):
        from shodh_tpu.server import integrations_sync as isync

        def dead(url, headers, data=None):
            raise OSError("no route to host")

        monkeypatch.setattr(isync, "fetch_json", dead)
        status, body = client.request(
            "POST", "/api/sync/github", {"token": "t", "owner": "a", "repo": "b"}
        )
        assert status == 502 and body["error"]["code"] == "upstream_unreachable"


class TestSemanticsRoutes:
    def test_status_unfitted(self, client):
        status, body = client.request("GET", "/api/semantics/status")
        assert status == 200 and body == {"fitted": False}

    def test_neighbors_requires_word(self, client):
        status, body = client.request("GET", "/api/semantics/neighbors")
        assert status == 422

    def test_neighbors_unfitted_empty(self, client):
        status, body = client.request("GET", "/api/semantics/neighbors?word=movie")
        assert status == 200 and body["neighbors"] == []

    def test_refit_lifecycle(self, client, monkeypatch):
        monkeypatch.setenv("SHODH_ADAPTIVE_SEMANTICS", "1")
        monkeypatch.setenv("SHODH_SEM_WEIGHT", "0")
        words = ("budget review planning quarterly meeting agenda deadline "
                 "milestone sprint report metric dashboard revenue forecast "
                 "launch roadmap design prototype customer interview survey "
                 "analysis experiment hypothesis result summary architecture "
                 "deployment rollout incident postmortem runbook oncall "
                 "alert latency throughput capacity storage network compute "
                 "cluster region zone vendor contract invoice payroll audit "
                 "hiring onboarding training mentor workshop conference keynote "
                 "panel poster abstract journal citation dataset pipeline model "
                 "feature label training validation inference serving cache "
                 "queue broker stream batch window trigger schedule backlog").split()
        for i in range(40):
            ws = [words[(i * 5 + j) % len(words)] for j in range(10)]
            status, _ = client.request(
                "POST", "/api/remember", {"content": f"note {i} about " + " ".join(ws)}
            )
            assert status == 200
        status, body = client.request("POST", "/api/semantics/refit", {})
        assert status == 200 and body["refit"] is True
        status, body = client.request("GET", "/api/semantics/status")
        assert status == 200 and body["fitted"] is True and body["vocab_size"] >= 64
        status, body = client.request("GET", "/api/semantics/neighbors?word=budget&k=5")
        assert status == 200 and len(body["neighbors"]) == 5
