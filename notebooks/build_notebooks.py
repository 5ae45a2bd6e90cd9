"""Generate the repo's notebooks deterministically.

Reference analog: notebooks/shodh_memory_demo.ipynb (interactive demo of
install → store → recall → modes → stats). Run this script to regenerate;
tests/test_notebooks.py executes every code cell to keep them green.
"""

import json
from pathlib import Path

HERE = Path(__file__).resolve().parent


def md(text):
    return {"cell_type": "markdown", "metadata": {}, "source": text.splitlines(keepends=True)}


def code(text):
    return {
        "cell_type": "code",
        "metadata": {},
        "execution_count": None,
        "outputs": [],
        "source": text.splitlines(keepends=True),
    }


def notebook(cells):
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python", "name": "python3"},
            "language_info": {"name": "python", "version": "3.11"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


DEMO = [
    md("""# shodh-tpu — Interactive Demo

A TPU-native cognitive memory engine: semantic + lexical + graph recall with
Hebbian learning, decay, and fact distillation. This notebook uses the
**embedded** mode (engine in-process — no server needed). On a machine without
a TPU everything runs on CPU via XLA."""),
    code("""# pip install shodh-tpu   (in this repo: pip install -e .)
import os, tempfile
os.environ.setdefault("JAX_PLATFORMS", "cpu")  # demo runs anywhere
import jax
jax.config.update("jax_platforms", "cpu")  # robust even where site config overrides env
data_dir = tempfile.mkdtemp(prefix="shodh-demo-")"""),
    md("""## 1. Initialize memory

`Memory(embedded=True)` runs the full engine in-process. Point it at a server
instead with `Memory(url=..., api_key=...)` — the API is identical."""),
    code("""from shodh_tpu.clients.client import Memory

memory = Memory(embedded=True, data_dir=data_dir)"""),
    md("## 2. Store memories\n\nEach memory carries a type, tags, and optional entities — the engine\nextracts entities, builds graph edges, and indexes text + vectors."),
    code("""memories = [
    ("We chose JAX over Torch for the retrieval stack because XLA fuses the whole funnel", "decision", ["architecture"]),
    ("The staging deploy failed with a CUDA OOM at batch size 512", "error", ["deploy", "bug"]),
    ("Fixed the deploy OOM by sharding the corpus across two replicas", "learning", ["deploy"]),
    ("Weekly sync: Priya owns the vector-index migration, due next Friday", "observation", ["planning"]),
    ("Auth tokens rotate every 24h; the refresh endpoint is /api/auth/refresh", "learning", ["security"]),
]
for content, mtype, tags in memories:
    mid = memory.add(content, memory_type=mtype, tags=tags)
    print(mid[:8], content[:60])"""),
    md("## 3. Recall\n\nRecall fuses vector similarity, BM25, graph activation, recency, and\nimportance (the FLAT calibrated-max fusion) in a single device program."),
    code("""for hit in memory.search("why did the deploy break", limit=3):
    print(f"{hit['score']:.3f}  {hit['experience']['content'][:70]}")"""),
    code("""for hit in memory.search("who is handling the index migration", limit=2):
    print(f"{hit['score']:.3f}  {hit['experience']['content'][:70]}")"""),
    md("## 4. Filters and retrieval modes\n\n`search` forwards any `Query` field: tag filters, `retrieval_mode`\n(hybrid / associative / causal / temporal …), date ranges, layers."),
    code("""print("tag-filtered:")
for hit in memory.search("deploy", tags=["bug"], limit=5):
    print(" ", hit["experience"]["content"][:70])

print("associative (graph-led):")
for hit in memory.search("deploy failure", retrieval_mode="associative", limit=3):
    print(" ", hit["experience"]["content"][:70])"""),
    md("## 5. Reinforcement\n\nTelling the engine which results helped strengthens their edges (Hebbian\nLTP) and nudges future rankings via feedback momentum."),
    code("""hits = memory.search("deploy OOM", limit=2)
memory.reinforce([h["id"] for h in hits], helpful=True)
print("reinforced", len(hits), "memories")"""),
    md("## 6. Statistics and maintenance\n\nConsolidation promotes important memories across tiers, distills semantic\nfacts from episodic clusters, and applies decay."),
    code("""print(memory.stats())
print(memory.run_maintenance())"""),
    md("## 7. The knowledge graph\n\nEvery memory contributes typed entities and edges; export DOT for a quick\nlook (render with graphviz if installed)."),
    code("""dot = memory.visualize()
print(dot[:400])"""),
    md("""## Next steps

- `notebooks/tpu_performance.ipynb` — the device-side search path and mesh sharding
- `python -m shodh_tpu.cli serve` — the HTTP server (~100 routes)
- `python -m shodh_tpu.clients.mcp_server` — MCP tools for agents
- `harness/` — the recall-quality eval suites used to gate changes"""),
    code("memory.close()"),
]

PERF = [
    md("""# shodh-tpu — TPU performance walkthrough

How the engine turns "cosine top-k over a million memories" into one fused
XLA program, and how it scales across a device mesh. Runs on CPU here
(shapes scaled down); on a TPU v5e the same code path does **~19,000 QPS/chip
exact top-10 over 1M×384 int8** (see `bench.py` / `BASELINE.md`)."""),
    code("""import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")  # robust even where site config overrides env
print(jax.devices())"""),
    md("""## 1. The device index

`DeviceVectorIndex` keeps the corpus resident on-device (int8 per-row
symmetric quantization, dequantized in the matmul epilogue), pads to a
capacity quantum so shapes stay static for XLA, and soft-deletes via a
validity mask fused into the scoring matmul."""),
    code("""from shodh_tpu.index.device_index import DeviceVectorIndex

rng = np.random.default_rng(0)
corpus = rng.standard_normal((10_000, 384)).astype(np.float32)
corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)

idx = DeviceVectorIndex(dim=384, dtype="int8")
idx.add(corpus)
vals, rows = idx.search(corpus[:4], k=5)
print(rows[:, 0])  # each query's own row comes back first"""),
    md("""## 2. Exact two-level top-k

TPUs have no fast global sort, so the hot kernel is a **group-max
selection**: reduce the corpus to per-group maxima (MXU-friendly), pick the
top groups, then rescan only those rows. Provably exact — the true top-k
rows can't hide outside the top-k groups. Two interchangeable
implementations: a Pallas kernel and a pure-XLA variant."""),
    code("""from shodh_tpu.ops.distance import brute_topk
from shodh_tpu.ops.fused_topk import two_level_topk

# pad the corpus to the 128-row group quantum; padding rows are masked out
n, GROUP = corpus.shape[0], 128
padded = ((n + GROUP - 1) // GROUP) * GROUP
c = jnp.asarray(np.pad(corpus, ((0, padded - n), (0, 0))))
valid = jnp.asarray(np.arange(padded) < n, jnp.float32)
q = jnp.asarray(corpus[:8])
bv, br = brute_topk(q, c, valid, 10)
fv, fr = two_level_topk(q, c, valid, 10)
print("exact parity:", bool((np.asarray(br) == np.asarray(fr)).all()))"""),
    md("""## 3. Scaling over a device mesh

Shard the corpus rows over a `jax.sharding.Mesh`; each device computes a
local top-k, then an all-gather over ICI merges the partials. The merge
moves `k` rows per device, not the corpus — bandwidth stays on-chip."""),
    code("""from shodh_tpu.parallel.mesh import make_mesh
from shodh_tpu.parallel.sharded_index import ShardedVectorIndex

mesh = make_mesh(8)
search = ShardedVectorIndex(corpus, mesh)
svals, srows = search.search(corpus[:4], k=5)
print("sharded matches single-device:", bool((np.asarray(srows[:, 0]) == np.arange(4)).all()))"""),
    md("""## 4. The fused recall funnel

Production recall is one jitted program — cosine scores → FLAT calibrated-max
fusion with BM25 → graph-activation bonus → L5 unified scoring → top-k —
so HBM is read once per query batch. See `shodh_tpu/ops/device_recall.py`
and run `python bench.py` on real hardware for the headline numbers."""),
]


def main():
    (HERE / "shodh_tpu_demo.ipynb").write_text(json.dumps(notebook(DEMO), indent=1) + "\n")
    (HERE / "tpu_performance.ipynb").write_text(json.dumps(notebook(PERF), indent=1) + "\n")
    print("wrote", HERE / "shodh_tpu_demo.ipynb")
    print("wrote", HERE / "tpu_performance.ipynb")


if __name__ == "__main__":
    main()
