"""Telemetry heartbeat, system-memory diagnostics, trace-span export, and
the eval CLI's suite/tolerance/dump contract (reference: telemetry.rs,
system_memory.rs, tracing_setup.rs, recall.yml exit-code contract)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]


class TestSystemMemory:
    def test_report_has_rss(self):
        from shodh_tpu.server.telemetry import system_memory_report

        rep = system_memory_report()
        assert rep["pid"] > 0
        assert rep.get("vmrss_kb", 0) > 0  # Linux CI


class TestTelemetryHeartbeat:
    def test_disabled_by_default(self, tmp_path, monkeypatch):
        from shodh_tpu.server.telemetry import TelemetryHeartbeat

        monkeypatch.delenv("SHODH_TELEMETRY", raising=False)
        hb = TelemetryHeartbeat(tmp_path)
        hb.start()
        assert not hb.enabled and hb._thread is None

    def test_payload_is_anonymous_and_coarse(self, tmp_path, monkeypatch):
        from shodh_tpu.server.telemetry import TelemetryHeartbeat

        monkeypatch.setenv("SHODH_TELEMETRY", "1")
        hb = TelemetryHeartbeat(
            tmp_path, stats_fn=lambda: {"users": 3, "secret": "leak-me"}
        )
        hb._t0 = 0.0
        payload = hb.payload()
        assert set(payload) == {"install_id", "version", "uptime_s", "counts"}
        assert payload["counts"] == {"users": 3}  # strings never leak
        # install id is random + persistent, not machine-derived
        assert payload["install_id"] == hb.payload()["install_id"]
        hb.stop()

    def test_stats_failure_never_breaks_heartbeat(self, tmp_path, monkeypatch):
        from shodh_tpu.server.telemetry import TelemetryHeartbeat

        monkeypatch.setenv("SHODH_TELEMETRY", "1")
        hb = TelemetryHeartbeat(tmp_path, stats_fn=lambda: 1 / 0)
        hb._t0 = 0.0
        assert hb.payload()["counts"] == {}


class TestTracing:
    def test_disabled_is_free(self, monkeypatch, tmp_path):
        from shodh_tpu.utils import tracing

        monkeypatch.delenv("SHODH_TRACE", raising=False)
        trace_file = tmp_path / "t.jsonl"
        monkeypatch.setenv("SHODH_TRACE_FILE", str(trace_file))
        with tracing.span("noop") as rec:
            assert rec == {}
        assert not trace_file.exists()

    def test_nested_spans_share_trace(self, monkeypatch, tmp_path):
        from shodh_tpu.utils import tracing

        monkeypatch.setenv("SHODH_TRACE", "1")
        trace_file = tmp_path / "t.jsonl"
        monkeypatch.setenv("SHODH_TRACE_FILE", str(trace_file))
        tracing.new_trace()
        with tracing.span("outer", route="/api/recall"):
            with tracing.span("inner"):
                pass
        records = [json.loads(l) for l in trace_file.read_text().splitlines()]
        assert len(records) == 2
        inner, outer = records  # inner closes (writes) first
        assert inner["traceId"] == outer["traceId"]
        assert inner["parentSpanId"] == outer["spanId"]
        assert outer["attributes"]["route"] == "/api/recall"
        assert outer["endTimeUnixNano"] >= outer["startTimeUnixNano"]


class TestObservabilityRoutes:
    @pytest.fixture()
    def client(self, tmp_path):
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from shodh_tpu.server.app import DEV_KEY, make_app
        from shodh_tpu.server.state import MultiUserMemoryManager

        loop = asyncio.new_event_loop()
        manager = MultiUserMemoryManager(tmp_path / "obs")
        client = TestClient(TestServer(make_app(manager)), loop=loop)
        loop.run_until_complete(client.start_server())

        def get(path):
            async def go():
                resp = await client.request(
                    "GET", path, headers={"X-API-Key": DEV_KEY, "X-User-ID": "t"}
                )
                return resp.status, await resp.json()

            return loop.run_until_complete(go())

        yield get
        loop.run_until_complete(client.close())
        manager.close()
        loop.close()

    def test_system_memory_route(self, client):
        status, body = client("/api/system/memory")
        assert status == 200 and body.get("vmrss_kb", 0) > 0

    def test_telemetry_route_reports_disabled(self, client):
        status, body = client("/api/telemetry")
        assert status == 200
        assert body["enabled"] is False and body["last_payload"] is None


class TestEvalCliContract:
    """--suite/--tolerance/--dump as recall.yml uses them (subset suite via
    a trimmed cases file so the test stays fast)."""

    def _run_eval(self, tmp_path, extra):
        cases = tmp_path / "cases.jsonl"
        src = (ROOT / "tests/recall/smoke_cases.jsonl").read_text().splitlines()
        cases.write_text("\n".join(src[:6]) + "\n")
        cmd = [
            sys.executable, "-m", "shodh_tpu.cli", "eval",
            "--corpus", "tests/recall/corpora/shodh-smoke.jsonl",
            "--cases", str(cases),
        ] + extra
        return subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True, timeout=600)

    def test_dump_determinism_and_gate_exit_codes(self, tmp_path):
        # run 1: dump + a baseline the subset easily beats -> exit 0
        easy = tmp_path / "easy.json"
        easy.write_text(json.dumps({"layers": {"full": {"recall@10": 0.0, "p@1": 0.0}}}))
        p1 = self._run_eval(
            tmp_path, ["--dump", str(tmp_path / "r1.json"), "--baseline", str(easy)]
        )
        assert p1.returncode == 0, p1.stderr[-2000:]
        # run 2: dump + an impossible baseline -> exit 1 (gate fires);
        # the dump itself must still be byte-identical to run 1
        hard = tmp_path / "hard.json"
        hard.write_text(json.dumps({"layers": {"full": {"recall@10": 2.0, "p@1": 2.0}}}))
        p2 = self._run_eval(
            tmp_path, ["--dump", str(tmp_path / "r2.json"), "--baseline", str(hard)]
        )
        assert p2.returncode == 1
        r1 = (tmp_path / "r1.json").read_text()
        assert r1 == (tmp_path / "r2.json").read_text()  # byte-identical
        assert "latency_" not in r1
        assert "latency_" in p1.stdout  # stdout report keeps timings
