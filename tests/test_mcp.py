"""MCP server tests: protocol handshake + tool surface."""

import pytest

from shodh_tpu.clients.mcp_server import McpMemoryServer


@pytest.fixture()
def server(tmp_path):
    return McpMemoryServer(tmp_path / "mcp", "tester")


def call(server, name, args=None, rid=1):
    return server.handle(
        {"jsonrpc": "2.0", "id": rid, "method": "tools/call",
         "params": {"name": name, "arguments": args or {}}}
    )


class TestProtocol:
    def test_initialize(self, server):
        resp = server.handle({"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}})
        assert resp["result"]["serverInfo"]["name"] == "shodh-tpu-memory"

    def test_tools_list(self, server):
        resp = server.handle({"jsonrpc": "2.0", "id": 2, "method": "tools/list"})
        names = {t["name"] for t in resp["result"]["tools"]}
        expected = {
            "remember", "recall", "quick_recall", "recall_by_tags", "read_memory",
            "forget", "memory_stats", "what_i_know", "proactive_context",
            "add_todo", "list_todos", "complete_todo", "set_reminder",
            "session_history", "fact_narratives", "backup_create", "verify_index",
        }
        assert expected <= names
        assert len(names) >= 25

    def test_unknown_tool(self, server):
        resp = call(server, "nonexistent")
        assert "error" in resp

    def test_notification_no_response(self, server):
        assert server.handle({"jsonrpc": "2.0", "method": "notifications/initialized"}) is None


class TestTools:
    def test_remember_recall_cycle(self, server):
        out = call(server, "remember", {"content": "We chose Rust for the backend", "memory_type": "decision"})
        assert "Stored memory" in out["result"]["content"][0]["text"]
        out = call(server, "recall", {"query": "why rust backend"})
        assert "Rust" in out["result"]["content"][0]["text"]

    def test_what_i_know(self, server):
        call(server, "remember", {"content": "Kafka handles our event streaming", "entities": ["Kafka"]})
        out = call(server, "what_i_know", {"topic": "Kafka"})
        assert "Kafka" in out["result"]["content"][0]["text"]

    def test_todo_cycle(self, server):
        out = call(server, "add_todo", {"title": "ship the release"})
        todo_id = out["result"]["content"][0]["text"].split()[-1]
        out = call(server, "list_todos")
        assert "ship the release" in out["result"]["content"][0]["text"]
        out = call(server, "complete_todo", {"todo_id": todo_id})
        assert "Done" in out["result"]["content"][0]["text"]

    def test_pending_work_and_reminders(self, server):
        call(server, "add_todo", {"title": "review PR"})
        call(server, "set_reminder", {"content": "check CI", "context_keywords": ["ci"]})
        out = call(server, "pending_work")
        assert "review PR" in out["result"]["content"][0]["text"]
        out = call(server, "list_reminders")
        assert "check CI" in out["result"]["content"][0]["text"]

    def test_verify_index(self, server):
        call(server, "remember", {"content": "index check payload"})
        out = call(server, "verify_index")
        assert '"ok": true' in out["result"]["content"][0]["text"]

    def test_tool_error_contained(self, server):
        out = call(server, "read_memory", {"memory_id": "nope"})
        assert "not found" in out["result"]["content"][0]["text"]


class TestCliScaffolding:
    def test_init_idempotent(self, tmp_path, capsys):
        from shodh_tpu.cli import main

        assert main(["init", "--data-dir", str(tmp_path / "d")]) == 0
        out1 = capsys.readouterr().out
        assert "api key: sk-shodh-" in out1
        assert main(["init", "--data-dir", str(tmp_path / "d")]) == 0
        out2 = capsys.readouterr().out
        assert "already initialized" in out2
        # same key both times
        assert out1.split("api key: ")[1].split()[0] == out2.split("api key: ")[1].split()[0]

    def test_setup_hooks_merges_settings(self, tmp_path):
        import json

        from shodh_tpu.cli import main

        proj = tmp_path / "proj"
        (proj / ".claude").mkdir(parents=True)
        (proj / ".claude" / "settings.json").write_text(
            json.dumps({"hooks": {"PreToolUse": [{"hooks": []}]}, "other": 1})
        )
        assert main(["setup-hooks", "--project", str(proj)]) == 0
        settings = json.loads((proj / ".claude" / "settings.json").read_text())
        assert "SessionStart" in settings["hooks"]
        assert "PreToolUse" in settings["hooks"]  # pre-existing preserved
        assert settings["other"] == 1
        assert (proj / "hooks" / "stop.sh").exists()
