"""Static web dashboard (reference: front/ axum static-UI server).

One self-contained HTML page served at ``/dashboard`` that talks to the
JSON API with the browser's fetch(): stats, recent memories, live search,
todos, and the knowledge-graph summary. No build step, no JS deps.
"""

from __future__ import annotations

from aiohttp import web

PAGE = """<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>shodh-tpu dashboard</title>
<style>
  :root { color-scheme: dark; }
  body { font-family: ui-monospace, SFMono-Regular, Menlo, monospace;
         background: #0d1117; color: #c9d1d9; margin: 0; padding: 1.5rem; }
  h1 { font-size: 1.1rem; color: #58a6ff; }
  h2 { font-size: 0.95rem; color: #8b949e; border-bottom: 1px solid #21262d;
       padding-bottom: 4px; }
  .grid { display: grid; grid-template-columns: 1fr 1fr; gap: 1.5rem; }
  .card { background: #161b22; border: 1px solid #21262d; border-radius: 8px;
          padding: 1rem; }
  input { width: 100%; background: #0d1117; color: #c9d1d9; border: 1px solid
          #30363d; border-radius: 6px; padding: 8px; font: inherit; }
  ul { list-style: none; padding: 0; margin: 0.5rem 0; }
  li { padding: 5px 0; border-bottom: 1px dotted #21262d; font-size: 0.85rem; }
  .score { color: #3fb950; margin-right: 8px; }
  .kind { color: #d29922; margin-right: 8px; }
  .stat { display: inline-block; margin-right: 1.2rem; }
  .stat b { color: #58a6ff; font-size: 1.2rem; }
</style>
</head>
<body>
<h1>shodh-tpu · cognitive memory engine</h1>
<div class="card" id="stats">loading…</div>
<div class="grid" style="margin-top:1.5rem">
  <div class="card">
    <h2>search</h2>
    <input id="q" placeholder="semantic recall query — press Enter">
    <ul id="results"></ul>
  </div>
  <div class="card">
    <h2>recent memories</h2>
    <ul id="recent"></ul>
  </div>
  <div class="card">
    <h2>open todos</h2>
    <ul id="todos"></ul>
  </div>
  <div class="card">
    <h2>knowledge graph</h2>
    <div id="graph"></div>
  </div>
</div>
<script>
const KEY = new URLSearchParams(location.search).get("key") || "dev-key-shodh-tpu";
const USER = new URLSearchParams(location.search).get("user") || "default";
const H = {"X-API-Key": KEY, "X-User-ID": USER, "Content-Type": "application/json"};
const get = (p) => fetch(p, {headers: H}).then(r => r.json());
const post = (p, b) => fetch(p, {method: "POST", headers: H, body: JSON.stringify(b)}).then(r => r.json());

async function refresh() {
  try {
    const s = await get("/api/stats");
    document.getElementById("stats").innerHTML =
      `<span class="stat"><b>${s.total_memories}</b> memories</span>` +
      `<span class="stat"><b>${s.index_rows}</b> vectors</span>` +
      `<span class="stat"><b>${s.working_count}</b> working</span>` +
      (s.graph ? `<span class="stat"><b>${s.graph.entities}</b> entities</span>` +
                 `<span class="stat"><b>${s.graph.edges}</b> edges</span>` : "");
    if (s.graph) {
      document.getElementById("graph").innerHTML =
        `density ${s.graph.density.toFixed(2)} · tiers ${JSON.stringify(s.graph.edge_tiers)}` +
        ` · ltp ${JSON.stringify(s.graph.ltp)}`;
    }
    const mems = await get("/api/memories?limit=12");
    document.getElementById("recent").innerHTML = mems.memories.map(m =>
      `<li><span class="kind">${m.experience.experience_type}</span>` +
      `${esc(m.experience.content.slice(0, 110))}</li>`).join("");
    const todos = await get("/api/todos");
    document.getElementById("todos").innerHTML = (todos.todos || []).map(t =>
      `<li><span class="kind">${t.priority}</span>${esc(t.title)}</li>`).join("") || "<li>none</li>";
  } catch (e) { console.error(e); }
}
function esc(s) { const d = document.createElement("div"); d.innerText = s; return d.innerHTML; }
document.getElementById("q").addEventListener("keydown", async (ev) => {
  if (ev.key !== "Enter") return;
  const out = await post("/api/recall", {query: ev.target.value, max_results: 8});
  document.getElementById("results").innerHTML = out.memories.map(m =>
    `<li><span class="score">${m.score.toFixed(3)}</span>${esc(m.experience.content.slice(0, 110))}</li>`
  ).join("") || "<li>no results</li>";
});
refresh();
setInterval(refresh, 5000);
</script>
</body>
</html>
"""


GRAPH_VIEW_HTML = """<!doctype html>
<html>
<head><meta charset="utf-8"><title>shodh graph</title>
<style>
body { margin: 0; background: #0b0e14; color: #cdd6f4; font: 13px monospace; }
#bar { padding: 8px 12px; } input { background: #161b26; color: inherit;
border: 1px solid #2a3142; padding: 4px 8px; width: 280px; }
svg { width: 100vw; height: calc(100vh - 40px); }
circle { fill: #7aa2f7; } circle.hub { fill: #f7768e; }
line { stroke: #2a3142; stroke-width: 1; } text { fill: #8a93a8; font-size: 10px; }
</style></head>
<body>
<div id="bar">entity graph — <input id="key" placeholder="API key"/>
<input id="user" value="default" style="width:120px"/>
<button onclick="load()">load</button></div>
<svg id="g"></svg>
<script>
// Minimal dependency-free force layout over /api/graph/data/{user}
async function load() {
  const key = document.getElementById("key").value || new URLSearchParams(location.search).get("key") || "";
  const user = document.getElementById("user").value || "default";
  const r = await fetch(`/api/graph/data/${user}`, {headers: {"X-API-Key": key}});
  const data = await r.json();
  const svg = document.getElementById("g"); svg.innerHTML = "";
  const W = svg.clientWidth, H = svg.clientHeight;
  const pos = {};
  data.nodes.forEach((n, i) => {
    const a = (i / Math.max(1, data.nodes.length)) * 2 * Math.PI;
    pos[n.id] = [W/2 + Math.cos(a) * H * 0.38, H/2 + Math.sin(a) * H * 0.38, n];
  });
  // 60 rounds of spring relaxation
  for (let it = 0; it < 60; it++) {
    data.edges.forEach(e => {
      const a = pos[e.source], b = pos[e.target]; if (!a || !b) return;
      const dx = b[0]-a[0], dy = b[1]-a[1], d = Math.hypot(dx,dy)||1, f = (d-90)/d*0.05;
      a[0]+=dx*f; a[1]+=dy*f; b[0]-=dx*f; b[1]-=dy*f;
    });
  }
  data.edges.forEach(e => {
    const a = pos[e.source], b = pos[e.target]; if (!a || !b) return;
    const l = document.createElementNS("http://www.w3.org/2000/svg","line");
    l.setAttribute("x1",a[0]); l.setAttribute("y1",a[1]);
    l.setAttribute("x2",b[0]); l.setAttribute("y2",b[1]); svg.appendChild(l);
  });
  Object.values(pos).forEach(([x,y,n]) => {
    const c = document.createElementNS("http://www.w3.org/2000/svg","circle");
    c.setAttribute("cx",x); c.setAttribute("cy",y); c.setAttribute("r",n.size||5);
    if ((n.strength||0) > 0.7) c.setAttribute("class","hub");
    svg.appendChild(c);
    const t = document.createElementNS("http://www.w3.org/2000/svg","text");
    t.setAttribute("x",x+8); t.setAttribute("y",y+3); t.textContent = n.label;
    svg.appendChild(t);
  });
}
</script>
</body>
</html>
"""


def register_dashboard(app) -> None:
    async def dashboard(request: web.Request):
        return web.Response(text=PAGE, content_type="text/html")

    app.router.add_get("/dashboard", dashboard)
    app.router.add_get("/", dashboard)
