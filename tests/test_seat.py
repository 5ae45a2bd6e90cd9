"""Seat conversation-harness tests (reference: seat/ — conversation.ts
learning loops, ledger.ts revert semantics, models-registry.ts catalog,
server.ts HTTP+SSE surface)."""

import json

import pytest

from shodh_tpu.seat import (
    Conversation,
    LearningLedger,
    ModelRegistry,
    ScriptedProvider,
    SeatState,
    make_seat_app,
    token_overlap,
)
from shodh_tpu.types import Experience


@pytest.fixture()
def state(tmp_path):
    s = SeatState(tmp_path / "seat")
    yield s
    s.close()


def make_conv(state, script, user="alice"):
    state.registry._scripted = ScriptedProvider(script)
    return Conversation(
        conversation_id=None, user_id=user,
        system=state.system_for(user),
        harness_system=state.system_for(user + ".seat-harness"),
        registry=state.registry, ledger=state.ledger,
    )


def seed(system, *contents):
    return [system.remember(Experience(content=c)) for c in contents]


# -- token overlap + providers -----------------------------------------------------


def test_token_overlap():
    assert token_overlap("jax sharding mesh", "we use a jax sharding mesh here") == 1.0
    assert token_overlap("alpha beta gamma delta", "alpha only") == 0.25
    assert token_overlap("", "anything") == 0.0


def test_scripted_provider_exhaustion():
    p = ScriptedProvider([{"text": "first"}])
    r1 = p.complete([{"role": "user", "content": "hi"}], [], "m")
    assert r1.text == "first"
    r2 = p.complete([{"role": "user", "content": "hello again"}], [], "m")
    assert "acknowledged" in r2.text
    assert r2.usage["input_tokens"] > 0


def test_model_registry_catalog_and_credentials(tmp_path):
    reg = ModelRegistry(tmp_path)
    models = reg.models()  # local endpoints unreachable -> only scripted
    assert any(m["provider"] == "scripted" for m in models)
    status = {p["id"]: p for p in reg.provider_status()}
    assert status["ollama"]["local"] and status["ollama"]["configured"]
    assert not status["openai"]["configured"]
    # stored key beats env; never leaks through status
    reg.credentials.put("openai", "sk-secret")
    key, source = reg.resolve_key("openai")
    assert (key, source) == ("sk-secret", "stored")
    status = {p["id"]: p for p in reg.provider_status()}
    assert status["openai"]["configured"] and status["openai"]["source"] == "stored"
    assert "sk-secret" not in json.dumps(status)
    perms = (tmp_path / "provider-credentials.json").stat().st_mode & 0o777
    assert perms == 0o600
    assert reg.credentials.delete("openai")
    assert reg.resolve_key("openai") == ("", "none")


# -- conversation turns + events -------------------------------------------------------


def test_turn_emits_event_stream_and_usage(state):
    conv = make_conv(state, [{"text": "hello there"}])
    turn = conv.send("hi")
    types = [e["type"] for e in turn.events]
    assert types[0] == "turn_start"
    assert "proactive_context" in types
    assert "text_delta" in types and "usage" in types
    assert types[-2:] == ["turn_end", "agent_end"]
    assert conv.totals["input_tokens"] > 0


def test_recall_tool_carries_attribution(state):
    sys_ = state.system_for("alice")
    seed(sys_, "the deploy pipeline uses bazel remote cache",
         "lunch options near the office")
    conv = make_conv(state, [
        {"tool": "recall_memory", "args": {"query": "deploy pipeline bazel"}},
        {"text": "The pipeline uses bazel [mem:dummy]."},
    ])
    turn = conv.send("how do we deploy?")
    recall_evs = [e for e in turn.events if e["type"] == "memory_recall"]
    assert len(recall_evs) == 1
    results = recall_evs[0]["results"]
    assert results and "bazel" in results[0]["content"]
    assert isinstance(results[0]["attribution"], dict) and results[0]["attribution"]
    assert turn.tool_recalled_ids


def test_memory_write_is_ledgered_and_revertible(state):
    conv = make_conv(state, [
        {"tool": "remember_memory", "args": {"content": "the API key rotates monthly"}},
        {"text": "Stored."},
    ])
    conv.send("remember that the API key rotates monthly")
    events = state.ledger.events()
    writes = [e for e in events if e["kind"] == "memory_write"]
    assert len(writes) == 1
    mid = writes[0]["detail"]["memory_id"]
    assert state.system_for("alice").get(mid) is not None
    # revert: exact forget
    rev = state.ledger.revert(writes[0]["event_id"], state.system_for("alice"))
    assert rev["detail"]["exact"] is True
    assert state.system_for("alice").get(mid) is None
    # double revert refused
    with pytest.raises(ValueError):
        state.ledger.revert(writes[0]["event_id"], state.system_for("alice"))


def test_explicit_leg_helpful_vs_neutral(state):
    sys_ = state.system_for("alice")
    mems = seed(sys_, "postgres connection pool is capped at 40",
                "the office plant needs watering")
    conv = make_conv(state, [
        {"tool": "recall_memory", "args": {"query": "postgres pool size"}},
        {"text": f"The pool is capped at 40 [mem:{mems[0].id[:8]}]."},
        {"text": "great, thanks — follow-up turn"},
    ])
    # vague user text: the memory is found by the recall TOOL, not surfaced
    # proactively (injection floor), so the explicit leg owns it
    conv.send("hm, remind me again?")
    prev = conv.turns[-1]
    assert prev.tool_recalled_ids
    assert mems[0].id not in prev.proactive_ids
    conv.send("thanks, and next topic")  # settles turn 1
    reinforces = [e for e in state.ledger.events() if e["kind"] == "reinforce"
                  and e["detail"]["leg"] == "explicit"]
    assert reinforces, "explicit leg produced no ledger events"
    outcomes = {e["detail"]["outcome"]: e["detail"]["memory_ids"] for e in reinforces}
    assert mems[0].id in outcomes.get("helpful", [])


def test_explicit_leg_negative_followup_marks_misleading(state):
    sys_ = state.system_for("alice")
    mems = seed(sys_, "the standup is at 9am")
    conv = make_conv(state, [
        {"tool": "recall_memory", "args": {"query": "standup time"}},
        {"text": "Standup is at 9am."},
        {"text": "noted"},
    ])
    conv.send("quick check on the schedule?")
    conv.send("no, that is wrong and irrelevant")
    reinforces = [e for e in state.ledger.events() if e["kind"] == "reinforce"
                  and e["detail"]["leg"] == "explicit"]
    assert any(e["detail"]["outcome"] == "misleading" and
               mems[0].id in e["detail"]["memory_ids"] for e in reinforces)


def test_ownership_split_no_double_count(state):
    """A memory surfaced by BOTH proactive and the recall tool is settled
    exactly once — by the implicit leg (seat/README ownership rule)."""
    sys_ = state.system_for("alice")
    mems = seed(sys_, "kubernetes cluster autoscaler flaps on spot nodes")
    conv = make_conv(state, [
        {"tool": "recall_memory", "args": {"query": "kubernetes autoscaler spot"}},
        {"text": "It flaps on spot nodes."},
        {"text": "ok"},
    ])
    conv.send("why does the kubernetes autoscaler flap on spot nodes?")
    turn = conv.turns[-1]
    # engine must have surfaced it proactively too for the test to be meaningful
    assert mems[0].id in turn.proactive_ids
    assert mems[0].id in turn.tool_recalled_ids
    conv.send("makes sense, continue")
    explicit = [e for e in state.ledger.events() if e["kind"] == "reinforce"
                and e["detail"]["leg"] == "explicit"]
    for e in explicit:
        assert mems[0].id not in e["detail"]["memory_ids"], "double-counted"
    implicit = [e for e in state.ledger.events() if e["kind"] == "reinforce"
                and e["detail"]["leg"] == "implicit"]
    assert any(mems[0].id in e["detail"]["memory_ids"] for e in implicit)


def test_reinforce_revert_is_compensating(state):
    sys_ = state.system_for("alice")
    seed(sys_, "redis eviction policy is allkeys-lru")
    conv = make_conv(state, [
        {"tool": "recall_memory", "args": {"query": "redis eviction policy"}},
        {"text": "allkeys-lru, with heavy token overlap: redis eviction policy is allkeys-lru"},
        {"text": "ok"},
    ])
    conv.send("what did we set there?")
    conv.send("cool")
    helpful = [e for e in state.ledger.events()
               if e["kind"] == "reinforce" and e["detail"]["outcome"] == "helpful"
               and e["detail"]["leg"] == "explicit"]
    assert helpful
    rev = state.ledger.revert(helpful[0]["event_id"], sys_)
    assert rev["detail"]["compensating"] is True and rev["detail"]["exact"] is False
    # neutral reinforcements refuse reverts
    neutral = [e for e in state.ledger.events()
               if e["kind"] == "reinforce" and e["detail"]["outcome"] == "neutral"]
    if neutral:
        with pytest.raises(ValueError, match="neutral"):
            state.ledger.revert(neutral[0]["event_id"], sys_)


def test_harness_scope_capture_and_injection(state):
    conv = make_conv(state, [
        {"tool": "recall_memory", "args": {"query": "zyzzyva nonexistent topic"}},
        {"text": "nothing found"},
    ])
    conv.send("tell me about zyzzyva")
    harness = state.system_for("alice.seat-harness")
    lessons = harness.get_all(limit=10)
    assert lessons, "empty recall was not captured to the harness scope"
    assert "rephrase" in lessons[0].experience.content
    # user scope must NOT contain the lesson (scope isolation)
    user_mems = state.system_for("alice").get_all(limit=10)
    assert all("rephrase" not in m.experience.content for m in user_mems)
    # a later related turn injects the lesson
    conv2 = make_conv(state, [{"text": "answer"}])
    turn = conv2.send("zyzzyva nonexistent topic again")
    applied = [e for e in turn.events if e["type"] == "harness_learning_applied"]
    assert applied and any("rephrase" in l for l in applied[0]["lessons"])


def test_tool_failure_captured(state):
    conv = make_conv(state, [
        {"tool": "recall_memory", "args": {"query": "", "limit": "not-a-number"}},
        {"text": "oops"},
    ])
    turn = conv.send("break the tool")
    ends = [e for e in turn.events if e["type"] == "tool_call_end"]
    assert ends and ends[0]["ok"] is False
    harness = state.system_for("alice.seat-harness")
    assert any("tool recall_memory failed" in m.experience.content
               for m in harness.get_all(limit=10))


def test_record_seat_learning_tool(state):
    conv = make_conv(state, [
        {"tool": "record_seat_learning",
         "args": {"lesson": "always pass limit as an integer"}},
        {"text": "done"},
    ])
    conv.send("note that down")
    harness = state.system_for("alice.seat-harness")
    assert any("limit as an integer" in m.experience.content
               for m in harness.get_all(limit=10))


def test_model_swap_mid_conversation(state):
    conv = make_conv(state, [{"text": "a"}])
    conv.send("one")
    ev = conv.set_model("scripted", "scripted-v2")
    assert ev["type"] == "model_changed" and conv.model == "scripted-v2"
    assert len(conv.turns) == 1  # transcript unchanged


# -- HTTP server ------------------------------------------------------------------------


@pytest.fixture()
def http(tmp_path):
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    loop = asyncio.new_event_loop()
    state = SeatState(tmp_path / "seat",
                      script=[{"text": "scripted reply one"},
                              {"text": "scripted reply two"}])
    app = make_seat_app(state)
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())

    class Sync:
        def request(self, method, path, body=None, headers=None):
            async def go():
                resp = await client.request(method, path, json=body,
                                            headers=headers or {})
                text = await resp.text()
                try:
                    return resp.status, json.loads(text), resp.headers
                except json.JSONDecodeError:
                    return resp.status, text, resp.headers

            return loop.run_until_complete(go())

    yield Sync()
    loop.run_until_complete(client.close())
    state.close()
    loop.close()


def test_seat_server_end_to_end(http):
    status, _, _ = http.request("GET", "/healthz")
    assert status == 200

    status, doc, _ = http.request("GET", "/v1/models")
    assert any(m["provider"] == "scripted" for m in doc["models"])

    status, doc, _ = http.request("GET", "/v1/providers")
    assert {p["id"] for p in doc["providers"]} >= {"scripted", "ollama"}

    status, doc, _ = http.request(
        "POST", "/v1/conversations",
        body={"user_id": "bob", "provider": "scripted", "model": "scripted-v1"})
    assert status == 201
    cid = doc["id"]

    # SSE message stream
    status, body, headers = http.request(
        "POST", f"/v1/conversations/{cid}/messages", body={"text": "hello seat"})
    assert status == 200
    assert headers["Content-Type"].startswith("text/event-stream")
    assert "event: turn_start" in body
    assert "event: text_delta" in body
    assert "scripted reply one" in body
    assert "event: agent_end" in body

    # transcript + evidence replay
    status, doc, _ = http.request("GET", f"/v1/conversations/{cid}")
    assert doc["turns"][0]["assistant"] == "scripted reply one"
    assert any(e["type"] == "proactive_context" for e in doc["turns"][0]["events"])

    # rename, list, model swap
    status, doc, _ = http.request("PATCH", f"/v1/conversations/{cid}",
                                  body={"title": "demo"})
    assert doc["title"] == "demo"
    status, doc, _ = http.request("GET", "/v1/conversations?user_id=bob")
    assert doc["conversations"] and doc["conversations"][0]["turns"] == 1
    status, doc, _ = http.request("PATCH", f"/v1/conversations/{cid}/model",
                                  body={"provider": "scripted", "model": "v2"})
    assert doc["model"] == "v2"

    # ledger endpoints
    status, _, _ = http.request("GET", "/v1/learning/events")
    assert status == 200
    status, _, _ = http.request("POST", "/v1/learning/revert",
                                body={"event_id": "nope"})
    assert status == 404

    # delete
    status, doc, _ = http.request("DELETE", f"/v1/conversations/{cid}")
    assert doc["deleted"] is True
    status, _, _ = http.request("GET", f"/v1/conversations/{cid}")
    assert status == 404


def test_seat_server_auth(tmp_path):
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    loop = asyncio.new_event_loop()
    state = SeatState(tmp_path / "seat2")
    app = make_seat_app(state, auth_token="tok123")
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())
    try:
        async def statuses():
            a = (await client.get("/healthz")).status
            b = (await client.get("/v1/models")).status
            c = (await client.get("/v1/models",
                                  headers={"Authorization": "Bearer tok123"})).status
            return a, b, c

        a, b, c = loop.run_until_complete(statuses())
        assert (a, b, c) == (200, 401, 200)
    finally:
        loop.run_until_complete(client.close())
        state.close()
        loop.close()


def test_non_loopback_requires_token(tmp_path):
    state = SeatState(tmp_path / "seat3")
    try:
        with pytest.raises(ValueError, match="SEAT_AUTH_TOKEN"):
            make_seat_app(state, auth_token="", loopback_only=False)
    finally:
        state.close()


def test_provider_key_routes(http):
    status, _, _ = http.request("PUT", "/v1/providers/ollama/key",
                                body={"api_key": "x"})
    assert status == 400  # keyless by LOCAL_PROVIDER_IDS membership
    status, doc, _ = http.request("PUT", "/v1/providers/openai/key",
                                  body={"api_key": "sk-1"})
    assert doc["stored"] is True
    status, doc, _ = http.request("DELETE", "/v1/providers/openai/key")
    assert doc["deleted"] is True
