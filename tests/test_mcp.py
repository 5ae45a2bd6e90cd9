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


class TestRound2Tools:
    """The 51-tool catalog tail (/root/reference/README.md:190-234)."""

    def test_catalog_complete_51(self, server):
        resp = server.handle({"jsonrpc": "2.0", "id": 9, "method": "tools/list"})
        names = {t["name"] for t in resp["result"]["tools"]}
        reference_51 = set("""remember recall recall_by_tags proactive_context
          context_summary list_memories read_memory forget quick_recall query
          topic what_i_know recent_memories pending_work count memory_health
          session_summary session_digest session_history fact_narratives
          purge_facts add_todo list_todos update_todo complete_todo delete_todo
          reorder_todo list_subtasks add_todo_comment list_todo_comments
          update_todo_comment delete_todo_comment todo_stats add_project
          list_projects archive_project delete_project set_reminder
          list_reminders dismiss_reminder memory_stats verify_index repair_index
          token_status reset_token_session consolidation_report backup_create
          backup_list backup_verify backup_restore backup_purge""".split())
        missing = reference_51 - names
        assert not missing, f"missing reference tools: {sorted(missing)}"

    def _text(self, resp):
        return resp["result"]["content"][0]["text"]

    def test_query_topic_count(self, server):
        call(server, "remember", {"content": "Kafka handles the event stream",
                                  "entities": ["Kafka"]})
        assert "Kafka" in self._text(call(server, "query", {"query": "event stream"}))
        assert "Kafka" in self._text(call(server, "topic", {"topic": "Kafka"}))
        import json as _json

        counts = _json.loads(self._text(call(server, "count", {})))
        assert counts["total"] == 1

    def test_token_accounting(self, server):
        import json as _json

        call(server, "remember", {"content": "token accounting probe"})
        st = _json.loads(self._text(call(server, "token_status")))
        assert st["tokens"] > 0 and st["remaining"] < st["budget"]
        call(server, "reset_token_session")
        st = _json.loads(self._text(call(server, "token_status")))
        assert st["tokens"] == 0
        summary = _json.loads(self._text(call(server, "session_summary")))
        assert summary["tools_used"]["remember"] == 1
        assert summary["memories_created"] == 1

    def test_todo_comment_lifecycle(self, server):
        out = self._text(call(server, "add_todo", {"title": "write the report"}))
        tid = out.split()[-1].strip(".")  # "Added todo <id>"
        call(server, "add_todo_comment", {"todo_id": tid, "text": "first draft"})
        comments = self._text(call(server, "list_todo_comments", {"todo_id": tid}))
        assert "first draft" in comments
        cid = comments.split("]")[0].strip("[")
        # ids are truncated to 8 chars in display; fetch full id via store
        full_cid = server.system.todos.list_comments(tid)[0].id
        assert full_cid.startswith(cid)
        out = self._text(call(server, "update_todo_comment",
                              {"todo_id": tid, "comment_id": full_cid, "text": "v2"}))
        assert out == "Updated."
        assert "v2" in self._text(call(server, "list_todo_comments", {"todo_id": tid}))
        assert self._text(call(server, "delete_todo_comment",
                               {"todo_id": tid, "comment_id": full_cid})) == "Deleted."
        call(server, "reorder_todo", {"todo_id": tid, "order": 2.5})
        assert server.system.todos.get(tid).order == 2.5

    def test_project_archive_delete(self, server):
        out = self._text(call(server, "add_project", {"name": "orion"}))
        pid = out.split()[-1].strip(".")
        assert "archived" in self._text(call(server, "archive_project", {"project_id": pid}))
        assert self._text(call(server, "delete_project", {"project_id": pid})) == "Deleted."
        assert self._text(call(server, "delete_project", {"project_id": pid})) == "Not found."

    def test_repair_and_backups(self, server, tmp_path):
        import json as _json

        call(server, "remember", {"content": "repair subject"})
        rep = _json.loads(self._text(call(server, "repair_index")))
        assert rep["was_healthy"] is True
        out = self._text(call(server, "backup_create"))
        assert "Backup created" in out
        backup_dir = out.split("at ", 1)[1]
        ok = _json.loads(self._text(call(server, "backup_verify", {"backup_dir": backup_dir})))
        assert ok["ok"] is True
        assert "Purged" in self._text(call(server, "backup_purge", {"keep": 1}))
        out = self._text(call(server, "backup_restore", {"backup_dir": backup_dir}))
        assert "Restored" in out
        # post-restore, the rebound engine still answers
        assert "repair subject" in self._text(call(server, "recall", {"query": "repair subject"}))

    def test_purge_facts_and_summaries(self, server):
        call(server, "remember", {"content": "summary probe alpha"})
        assert "Purged 0 facts" in self._text(call(server, "purge_facts"))
        assert "alpha" in self._text(call(server, "context_summary"))
        assert self._text(call(server, "session_digest"))  # non-empty
