"""Keep the npm MCP package (mcp-server/) in sync with the Python MCP server.

The container has no node toolchain, so the TS/JS can't be executed here;
instead these tests statically verify the parts that would break silently:
the tool catalog matches the Python server's, dist/index.js is a faithful
type-strip of src/index.ts, and every HTTP route the package calls exists
in the live aiohttp router.
"""

import json
import re
import sys
from pathlib import Path

import pytest

PKG = Path(__file__).resolve().parents[1] / "mcp-server"
if not (PKG / "dist" / "index.js").exists():  # fresh checkout: build it
    sys.path.insert(0, str(PKG.parent / "tools"))
    import build_mcp_dist

    build_mcp_dist.build()
JS = (PKG / "dist" / "index.js").read_text()
TS = (PKG / "src" / "index.ts").read_text()

TOOL_RE = re.compile(r'reg\(\s*"([a-z_]+)"')
ROUTE_RE = re.compile(r'http\.call\("(GET|POST)", `?"?(/[a-zA-Z0-9_/${}.?=&-]+)')


def _python_tool_names() -> set[str]:
    from shodh_tpu.clients.mcp_server import McpMemoryServer

    server = McpMemoryServer.__new__(McpMemoryServer)
    server._tools = {}
    # _register_tools touches self.system lazily only inside handlers, but a
    # few handler closures capture it at registration time — give it a stub.
    class _Stub:
        def __getattr__(self, _):
            return _Stub()

        def __call__(self, *a, **k):
            return _Stub()

    server.system = _Stub()
    server.user_id = "t"
    server._register_tools()
    return set(server._tools)


def test_tool_catalog_matches_python_server():
    js_tools = set(TOOL_RE.findall(JS))
    py_tools = _python_tool_names()
    assert js_tools == py_tools, (
        f"npm package drifted: only-in-js={sorted(js_tools - py_tools)} "
        f"only-in-python={sorted(py_tools - js_tools)}"
    )


def test_dist_matches_src_tools_and_routes():
    # dist/index.js must expose exactly the tools and routes of src/index.ts
    assert set(TOOL_RE.findall(JS)) == set(TOOL_RE.findall(TS))
    assert sorted(ROUTE_RE.findall(JS)) == sorted(ROUTE_RE.findall(TS))


def test_called_routes_exist_in_router():
    from shodh_tpu.server.app import make_app
    from shodh_tpu.server.state import MultiUserMemoryManager

    app = make_app(MultiUserMemoryManager.__new__(MultiUserMemoryManager))
    registered = set()
    for route in app.router.routes():
        info = route.resource.get_info() if route.resource else {}
        path = info.get("path") or info.get("formatter")
        if path:
            registered.add((route.method, path))

    def normalize(method: str, raw: str) -> tuple[str, str]:
        path = raw.split("?")[0]
        # template params in the JS (`${a.todo_id}`) → aiohttp placeholders
        path = re.sub(r"\$\{[^}]+\}", "{param}", path)
        return method, path

    def matches(method: str, path: str) -> bool:
        for m, p in registered:
            if m != method:
                continue
            pat = re.sub(r"\{[^}]+\}", "[^/]+", p) + "$"
            if re.match(pat, path.replace("{param}", "x")):
                return True
        return False

    for method, raw in set(ROUTE_RE.findall(JS)):
        m, path = normalize(method, raw)
        assert matches(m, path), f"npm package calls unregistered route {m} {path}"


def test_package_json_shape():
    meta = json.loads((PKG / "package.json").read_text())
    assert meta["bin"]["shodh-tpu-mcp"] == "dist/index.js"
    assert meta.get("dependencies", {}) == {}  # dependency-free by design
    assert meta["type"] == "module"


def test_dist_regenerates_byte_exact():
    # dist/index.js must be exactly what tools/build_mcp_dist.py produces —
    # hand edits to the artifact are drift (edit src/index.ts and rebuild).
    sys.path.insert(0, str(PKG.parent / "tools"))
    import build_mcp_dist

    header = "// Generated from src/index.ts by tools/build_mcp_dist.py — do not edit.\n"
    assert JS == header + build_mcp_dist.strip_types(TS)


def test_no_stray_typescript_in_dist():
    # dist must run under bare node: no TS-only syntax may survive the strip
    for needle in (": string", ": number", ": void", "interface ", "private ",
                   " as const", "import { spawn, type"):
        assert needle not in JS, f"TS syntax leaked into dist/index.js: {needle!r}"
