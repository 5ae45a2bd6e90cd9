"""Hook-script tests (reference: hooks/tests/hook-scripts.test.sh) — run the
real shell scripts against a live server on an ephemeral port."""

import json
import socket
import subprocess
import threading
import time
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
HOOKS = ROOT / "hooks"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def live_server(tmp_path_factory):
    """Real aiohttp server in a daemon thread (hooks shell out to curl)."""
    import asyncio

    from aiohttp import web

    from shodh_tpu.server.app import DEV_KEY, make_app
    from shodh_tpu.server.state import MultiUserMemoryManager

    port = _free_port()
    data_dir = tmp_path_factory.mktemp("hooks-srv")
    manager = MultiUserMemoryManager(data_dir)
    loop = asyncio.new_event_loop()
    started = threading.Event()

    async def _serve():
        runner = web.AppRunner(make_app(manager))
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", port)
        await site.start()
        started.set()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(_serve())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(timeout=30)
    env = {
        "SHODH_URL": f"http://127.0.0.1:{port}",
        "SHODH_API_KEY": DEV_KEY,
        "SHODH_USER": "hook-tester",
        "PATH": "/usr/bin:/bin:/usr/local/bin:/opt/venv/bin",
    }
    yield env, manager
    loop.call_soon_threadsafe(loop.stop)


def _run(script: str, env: dict, stdin: str = "") -> subprocess.CompletedProcess:
    return subprocess.run(
        ["bash", str(HOOKS / script)],
        input=stdin,
        env=env,
        capture_output=True,
        text=True,
        timeout=30,
    )


class TestStopHook:
    def test_captures_last_message(self, live_server):
        env, manager = live_server
        payload = json.dumps({"last_assistant_message": "Refactored the parser to use a state machine."})
        proc = _run("stop.sh", env, stdin=payload)
        assert proc.returncode == 0, proc.stderr
        time.sleep(0.2)
        sys_ = manager.get_user_memory("hook-tester")
        from shodh_tpu.types import Query

        res = sys_.recall(Query(query_text="parser state machine", max_results=3))
        assert len(res.ids) == 1
        mem = sys_.get(res.ids[0])
        assert "auto-captured" in mem.experience.tags

    def test_empty_payload_is_noop(self, live_server):
        env, _ = live_server
        proc = _run("stop.sh", env, stdin="{}")
        assert proc.returncode == 0


class TestUserPromptHook:
    def test_injects_relevant_context(self, live_server):
        env, manager = live_server
        sys_ = manager.get_user_memory("hook-tester")
        from shodh_tpu.types import Experience

        sys_.remember(
            Experience(content="The auth service rate limit is 40 req/s per key",
                       entities=["auth service"])
        )
        proc = _run("user_prompt.sh", env,
                    stdin=json.dumps({"prompt": "why is the auth service throttling requests?"}))
        assert proc.returncode == 0, proc.stderr
        # relevance-gated: output either empty (below 0.3) or tagged lines
        for line in proc.stdout.splitlines():
            assert line.startswith("[shodh-memory]")

    def test_malformed_stdin_is_noop(self, live_server):
        env, _ = live_server
        proc = _run("user_prompt.sh", env, stdin="this is not json")
        assert proc.returncode == 0
        assert proc.stdout == ""


class TestSessionStartHook:
    def test_emits_summary_or_nothing(self, live_server):
        env, manager = live_server
        sys_ = manager.get_user_memory("hook-tester")
        from shodh_tpu.utils.clock import scoring_now

        sys_.todos.add("ship the hook tests", scoring_now())
        proc = _run("session_start.sh", env)
        assert proc.returncode == 0, proc.stderr
        for line in proc.stdout.splitlines():
            assert line.startswith("[shodh-memory]")

    def test_server_down_is_silent_noop(self):
        env = {
            "SHODH_URL": "http://127.0.0.1:1",  # nothing listens here
            "SHODH_API_KEY": "k",
            "SHODH_USER": "u",
            "PATH": "/usr/bin:/bin:/usr/local/bin",
        }
        proc = _run("session_start.sh", env)
        assert proc.returncode == 0
        assert proc.stdout == ""
