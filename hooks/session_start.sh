#!/usr/bin/env bash
# Claude Code SessionStart hook: surface relevant memory at session start.
# Reference: hooks/ (session-start script). Requires a running shodh-tpu
# server (SHODH_URL) or falls back to no-op.
set -euo pipefail
SHODH_URL="${SHODH_URL:-http://127.0.0.1:8900}"
SHODH_API_KEY="${SHODH_API_KEY:-dev-key-shodh-tpu}"
SHODH_USER="${SHODH_USER:-claude}"
summary=$(curl -sf -m 3 -H "X-API-Key: $SHODH_API_KEY" -H "X-User-ID: $SHODH_USER" \
  "$SHODH_URL/api/context_summary" 2>/dev/null) || exit 0
python3 - "$summary" <<'PY'
import json, sys
d = json.loads(sys.argv[1])
lines = []
if d.get("open_todos"):
    lines.append("Open todos: " + "; ".join(d["open_todos"]))
if d.get("facts"):
    lines.append("Known facts: " + " | ".join(d["facts"][:3]))
if lines:
    print("[shodh-memory] " + "\n[shodh-memory] ".join(lines))
PY
