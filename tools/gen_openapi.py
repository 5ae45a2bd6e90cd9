"""Regenerate openapi.yaml from the live aiohttp router.

The router is the single op catalog (reference: router.rs feeds both HTTP
and IPC); this walks every registered route so the spec can never drift
from the code. Run: ``python tools/gen_openapi.py``.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

OPEN_PATHS = {"/", "/health", "/health/live", "/health/ready", "/health/index", "/version", "/dashboard"}

HEADER = """openapi: 3.0.3
info:
  title: shodh-tpu memory engine API
  version: {version}
  description: TPU-native cognitive memory engine. Auth via X-API-Key header
    (probe routes and /dashboard are open). Users isolated via X-User-ID.
security:
  - ApiKeyAuth: []
components:
  securitySchemes:
    ApiKeyAuth:
      type: apiKey
      in: header
      name: X-API-Key
paths:
"""


def collect_routes():
    from shodh_tpu.server.app import make_app
    from shodh_tpu.server.state import MultiUserMemoryManager

    app = make_app(MultiUserMemoryManager.__new__(MultiUserMemoryManager))
    routes: dict[str, list[tuple[str, str]]] = {}
    for route in app.router.routes():
        if route.method in ("HEAD", "OPTIONS") or route.resource is None:
            continue
        info = route.resource.get_info()
        path = info.get("path") or info.get("formatter")
        if not path:
            continue
        name = getattr(route.handler, "__name__", "handler")
        routes.setdefault(path, []).append((route.method, name))
    return routes


def emit(routes) -> str:
    from shodh_tpu import __version__

    out = [HEADER.format(version=__version__)]
    for path in sorted(routes):
        # normalize aiohttp regex path params {x:(a|b)} -> {x}
        clean = re.sub(r"\{(\w+):[^}]*\}", r"{\1}", path)
        out.append(f"  {clean}:\n")
        params = re.findall(r"\{(\w+)\}", clean)
        for method, name in sorted(set(routes[path])):
            summary = name.replace("_", " ")
            out.append(f"    {method.lower()}:\n")
            out.append(f"      operationId: {method.lower()}_{name}\n")
            out.append(f"      summary: {summary}\n")
            if clean in OPEN_PATHS or clean.startswith("/health"):
                out.append("      security: []\n")
            if params:
                out.append("      parameters:\n")
                for p in params:
                    out.append(
                        f"        - name: {p}\n          in: path\n"
                        "          required: true\n          schema: {type: string}\n"
                    )
            if method in ("POST", "PUT"):
                out.append(
                    "      requestBody:\n        content:\n"
                    "          application/json:\n            schema: {type: object}\n"
                )
            out.append(
                "      responses:\n        '200':\n          description: OK\n"
            )
    return "".join(out)


def main() -> None:
    routes = collect_routes()
    spec = emit(routes)
    (ROOT / "openapi.yaml").write_text(spec)
    print(f"openapi.yaml: {len(routes)} paths")


if __name__ == "__main__":
    main()
