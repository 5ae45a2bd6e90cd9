#!/usr/bin/env bash
# Claude Code Stop hook: capture the session's last exchange into memory.
set -euo pipefail
SHODH_URL="${SHODH_URL:-http://127.0.0.1:8900}"
SHODH_API_KEY="${SHODH_API_KEY:-dev-key-shodh-tpu}"
SHODH_USER="${SHODH_USER:-claude}"
payload=$(cat)
text=$(printf '%s' "$payload" | python3 -c "
import json, sys
d = json.load(sys.stdin)
t = d.get('last_assistant_message') or d.get('transcript_summary') or ''
print(t[:2000])
" 2>/dev/null) || exit 0
[ -z "$text" ] && exit 0
curl -sf -m 3 -X POST -H "X-API-Key: $SHODH_API_KEY" -H "X-User-ID: $SHODH_USER" \
  -H "Content-Type: application/json" \
  -d "$(python3 -c "import json,sys; print(json.dumps({'content': sys.argv[1], 'tags': ['auto-captured','assistant-response'], 'experience_type': 'conversation'}))" "$text")" \
  "$SHODH_URL/api/remember" > /dev/null 2>&1 || true
