#!/usr/bin/env bash
# Claude Code UserPromptSubmit hook: inject proactive context for the prompt.
set -euo pipefail
SHODH_URL="${SHODH_URL:-http://127.0.0.1:8900}"
SHODH_API_KEY="${SHODH_API_KEY:-dev-key-shodh-tpu}"
SHODH_USER="${SHODH_USER:-claude}"
prompt=$(cat | python3 -c "import json,sys; print(json.load(sys.stdin).get('prompt',''))" 2>/dev/null) || exit 0
[ -z "$prompt" ] && exit 0
curl -sf -m 3 -X POST -H "X-API-Key: $SHODH_API_KEY" -H "X-User-ID: $SHODH_USER" \
  -H "Content-Type: application/json" \
  -d "$(python3 -c "import json,sys; print(json.dumps({'text': sys.argv[1], 'limit': 3}))" "$prompt")" \
  "$SHODH_URL/api/proactive_context" 2>/dev/null \
| python3 -c "
import json, sys
d = json.load(sys.stdin)
for m in d.get('memories', []):
    if m.get('relevance', 0) > 0.3:
        print('[shodh-memory]', m['experience']['content'][:200])
" || true
