// Generated from src/index.ts by tools/build_mcp_dist.py — do not edit.
/**
 * shodh-tpu MCP server — npm packaging of the memory tool catalog.
 *
 * Reference: mcp-server/index.ts (51 tools over stdio; spawns + supervises
 * the backend, API-key store, token tracking, drain controller, memory
 * formatting). This implementation is dependency-free (node builtins only):
 * the MCP protocol is JSON-RPC 2.0 over newline-delimited stdio, which
 * needs no SDK. Tools are forwarded to the shodh-tpu HTTP server
 * (shodh_tpu/server/app.py); if no server is running this process spawns
 * `python -m shodh_tpu.cli serve` and supervises it.
 *
 * The in-repo, test-covered MCP server is the Python one
 * (shodh_tpu/clients/mcp_server.py) — this package exists so npm-ecosystem
 * MCP clients (Claude Desktop et al.) get the same tools with
 * `npx @shodh-tpu/mcp-server`.
 */

import { spawn } from "node:child_process";
import { createInterface } from "node:readline";
import { mkdirSync, readFileSync, writeFileSync } from "node:fs";
import { homedir } from "node:os";
import { join } from "node:path";
import { randomBytes } from "node:crypto";

const PROTOCOL_VERSION = "2024-11-05";
const SERVER_VERSION = "0.1.0";

// ---------------------------------------------------------------------------
// API-key store (reference: mcp-server/api-key-store.ts behavior)
// ---------------------------------------------------------------------------

class ApiKeyStore {
  path;

  constructor() {
    const dir = join(homedir(), ".shodh-tpu");
    mkdirSync(dir, { recursive: true });
    this.path = join(dir, "credentials.json");
  }

  get() {
    if (process.env.SHODH_API_KEY) return process.env.SHODH_API_KEY;
    try {
      const creds = JSON.parse(readFileSync(this.path, "utf8"));
      if (typeof creds.api_key === "string") return creds.api_key;
    } catch {
      /* first run */
    }
    const key = "sk-shodh-" + randomBytes(24).toString("hex");
    writeFileSync(this.path, JSON.stringify({ api_key: key }, null, 2), {
      mode: 0o600,
    });
    return key;
  }
}

// ---------------------------------------------------------------------------
// Backend lifecycle: connect to SHODH_BACKEND_URL or spawn + supervise
// (reference: mcp-server/backend-lifecycle.ts behavior)
// ---------------------------------------------------------------------------

class BackendLifecycle {
  url;
  child = null;
  restarts = 0;
  shuttingDown = false;

  constructor(apiKey) { this.apiKey = apiKey;
    this.url = process.env.SHODH_BACKEND_URL ?? "";
  }

  async ensure() {
    if (this.url) {
      if (await this.healthy()) return;
      throw new Error(`backend at ${this.url} is not healthy`);
    }
    const port = Number(process.env.SHODH_PORT ?? 8787);
    this.url = `http://127.0.0.1:${port}`;
    if (await this.healthy()) return; // already running (another client)
    this.spawnBackend(port);
    const deadline = Date.now() + 60_000;
    while (Date.now() < deadline) {
      if (await this.healthy()) return;
      await new Promise((r) => setTimeout(r, 500));
    }
    throw new Error("backend failed to become healthy within 60s");
  }

  spawnBackend(port) {
    const python = process.env.SHODH_PYTHON ?? "python3";
    this.child = spawn(
      python,
      ["-m", "shodh_tpu.cli", "serve", "--port", String(port)],
      {
        stdio: ["ignore", "ignore", "inherit"],
        env: { ...process.env, SHODH_API_KEYS: this.apiKey },
      },
    );
    this.child.on("exit", (code) => {
      if (this.shuttingDown) return;
      if (this.restarts < 3) {
        this.restarts += 1;
        const backoff = 1000 * 2 ** this.restarts;
        process.stderr.write(
          `backend exited (code ${code}); restart ${this.restarts}/3 in ${backoff}ms\n`,
        );
        setTimeout(() => this.spawnBackend(port), backoff);
      } else {
        process.stderr.write("backend exceeded restart budget; giving up\n");
      }
    });
  }

  async healthy() {
    try {
      const resp = await fetch(`${this.url}/health/ready`, {
        signal: AbortSignal.timeout(2000),
      });
      return resp.ok;
    } catch {
      return false;
    }
  }

  shutdown() {
    this.shuttingDown = true;
    if (this.child && !this.child.killed) this.child.kill("SIGTERM");
  }
}

// ---------------------------------------------------------------------------
// Drain controller: finish in-flight tool calls before exiting
// (reference: mcp-server/drain.ts behavior)
// ---------------------------------------------------------------------------

class DrainController {
  inFlight = 0;
  draining = false;
  onIdle = null;

  enter() {
    this.inFlight += 1;
  }

  exit() {
    this.inFlight -= 1;
    if (this.draining && this.inFlight === 0 && this.onIdle) this.onIdle();
  }

  drain(timeoutMs) {
    this.draining = true;
    if (this.inFlight === 0) return Promise.resolve();
    return new Promise((resolve) => {
      this.onIdle = resolve;
      setTimeout(resolve, timeoutMs);
    });
  }
}

// ---------------------------------------------------------------------------
// Token tracking (approximate — chars/4) + result budget
// ---------------------------------------------------------------------------

class TokenTracker {
  total = 0;
  perTool = {};

  reset() {
    this.total = 0;
    this.perTool = {};
  }

  record(tool, text) {
    const budget = Number(process.env.SHODH_MCP_RESULT_TOKEN_BUDGET ?? 2000);
    let out = text;
    if (out.length > budget * 4) {
      out = out.slice(0, budget * 4) + `\n… (truncated at ~${budget} tokens)`;
    }
    const tokens = Math.ceil(out.length / 4);
    this.total += tokens;
    this.perTool[tool] = (this.perTool[tool] ?? 0) + tokens;
    return out;
  }
}

// ---------------------------------------------------------------------------
// HTTP client
// ---------------------------------------------------------------------------

class HttpClient {
  constructor(backend, apiKey, userId) { this.backend = backend; this.apiKey = apiKey; this.userId = userId;}

  async call(method, path, body) {
    await this.backend.ensure();
    const resp = await fetch(this.backend.url + path, {
      method,
      headers: {
        "Content-Type": "application/json",
        "X-API-Key": this.apiKey,
        "X-User-ID": this.userId,
      },
      body: body === undefined ? undefined : JSON.stringify(body),
      signal: AbortSignal.timeout(30_000),
    });
    const text = await resp.text();
    let parsed;
    try {
      parsed = JSON.parse(text);
    } catch {
      parsed = text;
    }
    if (!resp.ok) {
      const msg =
        typeof parsed === "object" && parsed?.error ? parsed.error : text;
      throw new Error(`${resp.status}: ${msg}`);
    }
    return parsed;
  }
}

// ---------------------------------------------------------------------------
// Memory formatting (reference: mcp-server/memory-format.ts behavior)
// ---------------------------------------------------------------------------

function formatMemories(memories) {
  if (!memories?.length) return "No memories found.";
  return memories
    .map((m) => {
      const id = String(m.id ?? "").slice(0, 8);
      const type = m.experience?.experience_type ?? m.experience_type ?? "observation";
      const score =
        typeof m.score === "number" ? `, score ${m.score.toFixed(3)}` : "";
      return `[${id}] (${type}${score}) ${m.experience?.content ?? m.content ?? ""}`;
    })
    .join("\n");
}

function formatList(items, line, empty) {
  return items?.length ? items.map(line).join("\n") : empty;
}

// ---------------------------------------------------------------------------
// Tool catalog — same names as shodh_tpu/clients/mcp_server.py, forwarded
// to the HTTP routes in shodh_tpu/server/app.py
// ---------------------------------------------------------------------------

const S = { type: "string" };
const N = { type: "number" };
const B = { type: "boolean" };
const ARR_S = { type: "array", items: { type: "string" } };

function buildTools(http, userId, tracker) {
  const tools = new Map();
  const reg = (
    name,
    description,
    properties,
    required,
    fn,
  ) =>
    tools.set(name, [
      { name, description, inputSchema: { type: "object", properties, required } },
      fn,
    ]);

  // -- memories -------------------------------------------------------------
  reg(
    "remember",
    "Store a memory (experience) in persistent memory.",
    { content: S, memory_type: S, tags: ARR_S, entities: ARR_S },
    ["content"],
    async (a) => {
      const r = await http.call("POST", "/api/remember", {
        content: a.content,
        experience_type: a.memory_type,
        tags: a.tags,
        entities: a.entities,
      });
      return `Stored memory ${r.memory_id}`;
    },
  );
  reg(
    "recall",
    "Semantic recall: find memories relevant to a query.",
    { query: S, limit: N, tags: ARR_S },
    ["query"],
    async (a) => {
      const r = await http.call("POST", "/api/recall", {
        query: a.query,
        max_results: a.limit ?? 10,
        tags: a.tags,
      });
      return formatMemories(r.memories);
    },
  );
  reg("quick_recall", "Fast top-3 recall for inline context.", { query: S }, ["query"], async (a) => {
    const r = await http.call("POST", "/api/recall", { query: a.query, max_results: 3 });
    return formatMemories(r.memories);
  });
  reg("recall_by_tags", "List memories carrying all given tags.", { tags: ARR_S }, ["tags"], async (a) => {
    const r = await http.call("POST", "/api/recall/by-tags", { tags: a.tags, max_results: 20 });
    return formatMemories(r.memories);
  });
  reg("read_memory", "Fetch one memory by id.", { memory_id: S }, ["memory_id"], async (a) =>
    JSON.stringify(await http.call("GET", `/api/memory/${a.memory_id}`)),
  );
  reg("recent_memories", "List the most recent memories.", { limit: N }, [], async (a) => {
    const r = await http.call("GET", `/api/memories?limit=${a.limit ?? 10}`);
    return formatList(r.memories, (m) => `[${String(m.id).slice(0, 8)}] ${String(m.experience?.content ?? m.content ?? "").slice(0, 120)}`, "No memories.");
  });
  reg("list_memories", "Page through stored memories.", { limit: N, offset: N }, [], async (a) => {
    const r = await http.call("GET", `/api/memories?limit=${a.limit ?? 20}&offset=${a.offset ?? 0}`);
    return formatList(r.memories, (m) => `[${String(m.id).slice(0, 8)}] ${String(m.experience?.content ?? m.content ?? "").slice(0, 120)}`, "No memories.");
  });
  reg("forget", "Delete a memory by id.", { memory_id: S }, ["memory_id"], async (a) => {
    const r = await http.call("POST", "/api/forget", { memory_id: a.memory_id });
    return r.forgotten ? "Forgotten." : "Not found.";
  });
  reg("memory_stats", "Engine statistics.", {}, [], async () =>
    JSON.stringify(await http.call("GET", "/api/stats")),
  );
  reg("memory_health", "Index/storage health check.", {}, [], async () =>
    JSON.stringify(await http.call("GET", "/health/index")),
  );
  reg("reinforce", "Mark recalled memories as helpful or misleading.", { memory_ids: ARR_S, helpful: B }, ["memory_ids"], async (a) => {
    const r = await http.call("POST", "/api/reinforce", { memory_ids: a.memory_ids, helpful: a.helpful ?? true });
    return `Reinforced ${r.reinforced}.`;
  });
  reg("what_i_know", "Summarize knowledge about a topic (facts + memories).", { topic: S }, ["topic"], async (a) => {
    const parts = [];
    const facts = await http.call("GET", `/api/facts/by-entity?entity=${encodeURIComponent(a.topic)}`).catch(() => null);
    if (facts?.facts?.length) parts.push("Facts:\n" + facts.facts.map((f) => `- ${f.statement}`).join("\n"));
    const r = await http.call("POST", "/api/recall", { query: a.topic, max_results: 5 });
    if (r.memories?.length) parts.push("Memories:\n" + r.memories.map((m) => `- ${String(m.experience?.content ?? m.content ?? "").slice(0, 150)}`).join("\n"));
    const g = await http.call("POST", "/api/graph/traverse", { entity: a.topic }).catch(() => null);
    if (g?.results?.length) parts.push("Related: " + g.results.map((x) => x.entity).join(", "));
    return parts.length ? parts.join("\n\n") : `Nothing known about '${a.topic}' yet.`;
  });
  reg("proactive_context", "Memories relevant to the current working context.", { text: S, entities: ARR_S, current_file: S }, ["text"], async (a) => {
    const r = await http.call("POST", "/api/proactive_context", a);
    return formatList(r.memories ?? r.relevant ?? [], (m) => `[${(m.relevance ?? m.score ?? 0).toFixed(2)}] ${String(m.experience?.content ?? m.content ?? "").slice(0, 150)}`, "Nothing relevant.");
  });

  // -- todos ------------------------------------------------------------------
  reg("add_todo", "Create a todo.", { title: S, description: S, priority: S, due: S, project_id: S }, ["title"], async (a) => {
    const r = await http.call("POST", "/api/todos/add", a);
    return `Created todo ${r.todo?.id ?? r.todo_id ?? r.id}`;
  });
  reg("list_todos", "List open todos.", { status: S }, [], async (a) => {
    const q = a.status ? `?status=${encodeURIComponent(a.status)}` : "";
    const r = await http.call("GET", "/api/todos/list" + q);
    return formatList(r.todos, (t) => `[${String(t.id).slice(0, 8)}] (${t.status}/${t.priority}) ${t.title}`, "No todos.");
  });
  reg("complete_todo", "Mark a todo done.", { todo_id: S }, ["todo_id"], async (a) => {
    const r = await http.call("POST", "/api/todos/complete", a);
    return r.todo ? "Done." : "Not found.";
  });
  reg("update_todo", "Update todo fields.", { todo_id: S, title: S, status: S, priority: S }, ["todo_id"], async (a) => {
    await http.call("POST", "/api/todos/update", a);
    return "Updated.";
  });
  reg("delete_todo", "Delete a todo.", { todo_id: S }, ["todo_id"], async (a) => {
    const r = await http.call("POST", "/api/todos/delete", a);
    return r.deleted ? "Deleted." : "Not found.";
  });
  reg("add_todo_comment", "Comment on a todo.", { todo_id: S, text: S }, ["todo_id", "text"], async (a) => {
    await http.call("POST", `/api/todos/${a.todo_id}/comments`, { text: a.text });
    return "Added.";
  });
  reg("todo_stats", "Todo statistics.", {}, [], async () =>
    JSON.stringify(await http.call("GET", "/api/todos/stats")),
  );
  reg("pending_work", "Open todos + due reminders digest.", {}, [], async () => {
    const parts = [];
    const todos = await http.call("GET", "/api/todos/list");
    if (todos.todos?.length) parts.push("Open todos:\n" + todos.todos.slice(0, 10).map((t) => `- (${t.priority}) ${t.title}`).join("\n"));
    const due = await http.call("GET", "/api/reminders/due").catch(() => null);
    if (due?.due?.length) parts.push("Due reminders:\n" + due.due.map((r) => `- ${r.content}`).join("\n"));
    return parts.length ? parts.join("\n\n") : "Nothing pending.";
  });
  reg("add_project", "Create a project.", { name: S, description: S }, ["name"], async (a) => {
    const r = await http.call("POST", "/api/projects/add", a);
    return `Created project ${r.project?.id ?? r.project_id ?? r.id}`;
  });
  reg("list_projects", "List projects.", {}, [], async () => {
    const r = await http.call("GET", "/api/projects/list");
    return formatList(r.projects, (p) => `[${String(p.id).slice(0, 8)}] ${p.name}`, "No projects.");
  });

  // -- reminders ---------------------------------------------------------------
  reg("set_reminder", "Set a time- or context-triggered reminder.", { content: S, trigger_time: S, context_keywords: ARR_S }, ["content"], async (a) => {
    const r = await http.call("POST", "/api/reminders/set", a);
    return `Reminder ${r.reminder_id}`;
  });
  reg("list_reminders", "List pending reminders.", {}, [], async () => {
    const r = await http.call("GET", "/api/reminders");
    return formatList(r.pending, (x) => `[${String(x.id).slice(0, 8)}] ${x.content}`, "None.");
  });
  reg("dismiss_reminder", "Dismiss a reminder.", { reminder_id: S }, ["reminder_id"], async (a) => {
    const r = await http.call("POST", `/api/reminders/${a.reminder_id}/dismiss`, {});
    return r.dismissed ? "Dismissed." : "Not found.";
  });

  // -- sessions / facts / ops ----------------------------------------------------
  reg("session_history", "Recent session timeline.", {}, [], async () => {
    const r = await http.call("GET", "/api/sessions/history");
    return formatList(r.sessions, (s) => `[${String(s.id).slice(0, 8)}] ${s.started_at} (${s.memory_count ?? s.memories ?? 0} memories) ${s.digest ?? ""}`, "No sessions.");
  });
  reg("session_digest", "End the current session and produce a digest.", {}, [], async () => {
    const r = await http.call("POST", "/api/sessions/end", {});
    return r.session?.digest ?? "No active session.";
  });
  reg("fact_narratives", "Distilled semantic facts.", {}, [], async () => {
    const r = await http.call("GET", "/api/facts/list");
    return formatList(r.facts, (f) => `- ${f.statement} (support ${f.support})`, "No facts distilled yet.");
  });
  reg("consolidation_report", "What the memory consolidation did recently.", {}, [], async () =>
    JSON.stringify(await http.call("GET", "/api/consolidation/report")),
  );
  reg("backup_create", "Create a verified backup.", {}, [], async () => {
    const r = await http.call("POST", "/api/backup/create", {});
    return `Backup created at ${r.backup}`;
  });
  reg("backup_list", "List backups.", {}, [], async () => {
    const r = await http.call("GET", "/api/backup/list");
    return formatList(r.backups, (b) => `${b.created} (${b.files} files)`, "No backups.");
  });
  reg("verify_index", "Verify index/storage consistency.", {}, [], async () =>
    JSON.stringify(await http.call("GET", "/api/index/verify")),
  );

  // -- lineage / maintenance / bulk ops -----------------------------------------
  reg("upsert", "Update a memory's content in place (re-embeds and re-indexes).", { memory_id: S, content: S }, ["memory_id", "content"], async (a) => {
    const r = await http.call("POST", "/api/upsert", a);
    return `Upserted ${r.memory_id}`;
  });
  reg("forget_by_tags", "Delete every memory carrying any of the given tags.", { tags: ARR_S }, ["tags"], async (a) => {
    const r = await http.call("POST", "/api/forget/tags", { tags: a.tags });
    return `Forgot ${r.forgotten} memories.`;
  });
  reg("recall_by_date", "Memories created inside a date range.", { start: S, end: S, limit: N }, ["start", "end"], async (a) => {
    const r = await http.call("POST", "/api/recall/date", { start: a.start, end: a.end, max_results: a.limit ?? 20 });
    return formatMemories(r.memories);
  });
  reg("distill_facts", "Consolidate episodic clusters into semantic facts now.", {}, [], async () => {
    const r = await http.call("POST", "/api/facts/distill", {});
    return `Distilled ${r.distilled} facts.`;
  });
  reg("trace_lineage", "Causal ancestry/descendants of a memory.", { memory_id: S, direction: S }, ["memory_id"], async (a) => {
    const r = await http.call("POST", "/api/lineage/trace", a);
    return formatList(r.edges, (e) => `${String(e.from_memory).slice(0, 8)} -[${e.relation}]-> ${String(e.to_memory).slice(0, 8)} (conf ${e.confidence.toFixed(2)})`, "No lineage edges.");
  });
  reg("find_root_cause", "Deepest causal ancestor of a memory.", { memory_id: S }, ["memory_id"], async (a) => {
    const r = await http.call("POST", "/api/lineage/root-cause", a);
    return r.root_cause ?? "No causal ancestry.";
  });
  reg("visualize_graph", "Knowledge graph as DOT (render with graphviz).", {}, [], async () => {
    const r = await http.call("GET", `/api/graph/${userId}/export`);
    return String(r).slice(0, 8000);
  });

  // -- round-2 tail: remaining tools in the 51-tool catalog ----------------------
  reg("query", "Natural-language memory query (full parsed funnel).", { query: S, limit: N }, ["query"], async (a) => {
    const r = await http.call("POST", "/api/recall", { query: a.query, max_results: a.limit ?? 10 });
    return formatMemories(r.memories);
  });
  reg("topic", "Everything stored about a topic: memories + facts.", { topic: S }, ["topic"], async (a) => {
    const mems = await http.call("POST", "/api/recall", { query: a.topic, max_results: 5 });
    const facts = await http.call("GET", `/api/facts/by-entity?entity=${encodeURIComponent(a.topic)}`);
    const parts = [];
    if (facts.facts?.length) parts.push("Facts:\n" + facts.facts.map((f) => `- ${f.statement}`).join("\n"));
    if (mems.memories?.length) parts.push("Memories:\n" + mems.memories.map((m) => `- ${String(m.experience?.content ?? "").slice(0, 150)}`).join("\n"));
    return parts.join("\n\n") || "Nothing known about this topic.";
  });
  reg("count", "Count memories (optionally matching a query or tags).", { query: S, tags: ARR_S }, [], async (a) => {
    const stats = await http.call("GET", "/api/stats");
    if (a.query || a.tags) {
      const r = await http.call("POST", "/api/recall", { query: a.query, tags: a.tags, max_results: 100 });
      return JSON.stringify({ matching: r.memories?.length ?? 0, total: stats.total_memories });
    }
    return JSON.stringify({ total: stats.total_memories });
  });
  reg("context_summary", "Compact summary of recent memory context.", {}, [], async () =>
    JSON.stringify(await http.call("GET", "/api/context_summary")),
  );
  reg("session_summary", "Digest of this MCP session: tool usage and token accounting.", {}, [], async () =>
    JSON.stringify({ tools_used: tracker.perTool, tokens_emitted: tracker.total }),
  );
  reg("session_digest", "Digest of the engine's latest session.", {}, [], async () => {
    const r = await http.call("POST", "/api/sessions/digest", {});
    return r.digest ?? "No session activity.";
  });
  reg("purge_facts", "Delete ALL distilled facts.", {}, [], async () => {
    const r = await http.call("POST", "/api/facts/purge", {});
    return `Purged ${r.purged} facts.`;
  });
  reg("reorder_todo", "Set a todo's sort order.", { todo_id: S, order: N }, ["todo_id", "order"], async (a) => {
    await http.call("POST", "/api/todos/reorder", { todo_id: a.todo_id, order: a.order });
    return "Reordered.";
  });
  reg("list_subtasks", "Subtasks of a todo.", { todo_id: S }, ["todo_id"], async (a) => {
    const r = await http.call("GET", `/api/todos/${a.todo_id}/subtasks`);
    return formatList(r.subtasks, (t) => `[${String(t.id).slice(0, 8)}] (${t.status}) ${t.title}`, "No subtasks.");
  });
  reg("list_todo_comments", "Comments on a todo.", { todo_id: S }, ["todo_id"], async (a) => {
    const r = await http.call("GET", `/api/todos/${a.todo_id}`);
    return formatList(r.comments, (c) => `[${String(c.id).slice(0, 8)}] ${c.text}`, "No comments.");
  });
  reg("update_todo_comment", "Edit a todo comment.", { todo_id: S, comment_id: S, text: S }, ["todo_id", "comment_id", "text"], async (a) => {
    await http.call("POST", `/api/todos/${a.todo_id}/comments/${a.comment_id}/update`, { text: a.text });
    return "Updated.";
  });
  reg("delete_todo_comment", "Delete a todo comment.", { todo_id: S, comment_id: S }, ["todo_id", "comment_id"], async (a) => {
    await http.call("DELETE", `/api/todos/${a.todo_id}/comments/${a.comment_id}`);
    return "Deleted.";
  });
  reg("archive_project", "Archive a project (hidden from active lists).", { project_id: S }, ["project_id"], async (a) => {
    const r = await http.call("POST", `/api/projects/${a.project_id}/update`, { status: "archived" });
    return `Project ${r.name} -> archived.`;
  });
  reg("delete_project", "Delete a project.", { project_id: S }, ["project_id"], async (a) => {
    const r = await http.call("POST", `/api/projects/${a.project_id}/delete`, {});
    return r.deleted ? "Deleted." : "Not found.";
  });
  reg("repair_index", "Verify the index and rebuild it when inconsistent.", {}, [], async () =>
    JSON.stringify(await http.call("POST", "/api/index/repair", {})),
  );
  reg(
    "fsck",
    "Full store integrity check across every derived structure (hash map, secondary index, vector rows, BM25 docs, temporal facts, lexical stamp); pass repair=true to fix findings.",
    { repair: B },
    [],
    async (a) => JSON.stringify(await http.call("POST", "/api/store/fsck", { repair: !!a.repair })),
  );
  reg("token_status", "Token accounting for tool output this session.", {}, [], async () =>
    JSON.stringify({ tokens: tracker.total, per_tool: tracker.perTool }),
  );
  reg("reset_token_session", "Reset the session token counter.", {}, [], async () => {
    tracker.reset();
    return "Token session reset.";
  });
  reg("backup_verify", "Verify a backup's checksums.", { backup_dir: S }, ["backup_dir"], async (a) => {
    const r = await http.call("POST", "/api/backup/verify", { path: a.backup_dir });
    return JSON.stringify({ ok: r.valid });
  });
  reg("backup_restore", "Restore the engine state from a backup.", { backup_dir: S }, ["backup_dir"], async (a) => {
    const r = await http.call("POST", "/api/backup/restore", { backup_dir: a.backup_dir });
    return r.restored ? `Restored into ${r.data_dir}.` : JSON.stringify(r);
  });
  reg("backup_purge", "Prune old backups, keeping the newest N.", { keep: N }, [], async (a) => {
    const r = await http.call("POST", "/api/backup/purge", { keep: a.keep ?? 5 });
    return `Purged ${r.purged} backups.`;
  });

  return tools;
}

// ---------------------------------------------------------------------------
// JSON-RPC stdio loop
// ---------------------------------------------------------------------------

async function main() {
  const keyStore = new ApiKeyStore();
  const apiKey = keyStore.get();
  const backend = new BackendLifecycle(apiKey);
  const userId = process.env.SHODH_USER_ID ?? "default";
  const http = new HttpClient(backend, apiKey, userId);
  const drain = new DrainController();
  const tracker = new TokenTracker();
  const tools = buildTools(http, userId, tracker);

  const write = (msg) => process.stdout.write(JSON.stringify(msg) + "\n");

  const shutdown = async () => {
    await drain.drain(5000);
    backend.shutdown();
    process.exit(0);
  };
  process.on("SIGINT", shutdown);
  process.on("SIGTERM", shutdown);

  const rl = createInterface({ input: process.stdin, crlfDelay: Infinity });
  for await (const line of rl) {
    const trimmed = line.trim();
    if (!trimmed) continue;
    let req;
    try {
      req = JSON.parse(trimmed);
    } catch {
      continue;
    }
    const rid = req.id;
    const method = req.method ?? "";
    if (method === "initialize") {
      write({
        jsonrpc: "2.0",
        id: rid,
        result: {
          protocolVersion: PROTOCOL_VERSION,
          capabilities: { tools: {} },
          serverInfo: { name: "shodh-tpu-memory", version: SERVER_VERSION },
        },
      });
    } else if (method === "notifications/initialized") {
      /* no response to notifications */
    } else if (method === "tools/list") {
      write({
        jsonrpc: "2.0",
        id: rid,
        result: { tools: [...tools.values()].map(([spec]) => spec) },
      });
    } else if (method === "tools/call") {
      const name = req.params?.name ?? "";
      const args = req.params?.arguments ?? {};
      const entry = tools.get(name);
      if (!entry) {
        write({ jsonrpc: "2.0", id: rid, error: { code: -32601, message: `unknown tool ${name}` } });
        continue;
      }
      drain.enter();
      try {
        const out = tracker.record(name, await entry[1](args));
        write({ jsonrpc: "2.0", id: rid, result: { content: [{ type: "text", text: out }] } });
      } catch (exc) {
        write({
          jsonrpc: "2.0",
          id: rid,
          result: { content: [{ type: "text", text: `error: ${exc?.message ?? exc}` }], isError: true },
        });
      } finally {
        drain.exit();
      }
    } else if (method === "ping") {
      write({ jsonrpc: "2.0", id: rid, result: {} });
    } else if (rid !== undefined) {
      write({ jsonrpc: "2.0", id: rid, error: { code: -32601, message: `unknown method ${method}` } });
    }
  }
  await shutdown();
}

main().catch((exc) => {
  process.stderr.write(`fatal: ${exc?.stack ?? exc}\n`);
  process.exit(1);
});
