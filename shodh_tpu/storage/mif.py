"""MIF v2 — vendor-neutral memory interchange export/import.

Reference: ``src/mif/schema.rs`` — a JSON format carrying memories, facts,
graph entities/edges, and todos so users can move between memory vendors.
Shape: {"mif_version": 2, "exported_at", "source", "memories": [...],
"facts": [...], "entities": [...], "relationships": [...], "todos": [...]}.
"""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path
from typing import Any

from shodh_tpu import __version__
from shodh_tpu.types import Experience, Memory, format_ts, parse_ts

MIF_VERSION = 2


def export_mif(system, now: datetime) -> dict[str, Any]:
    """Export a user's full memory state as a MIF v2 document."""
    memories = []
    for mem in system.storage.iter_memories():
        d = mem.to_dict()
        d.pop("vector_row", None)
        memories.append(d)
    doc: dict[str, Any] = {
        "mif_version": MIF_VERSION,
        "exported_at": format_ts(now),
        "source": f"shodh-tpu/{__version__}",
        "memories": memories,
    }
    if system.facts is not None:
        doc["facts"] = [f.to_dict() for f in system.facts.all_facts()]
    if system.graph is not None:
        doc["entities"] = [e.to_dict() for e in system.graph.entities.values()]
        doc["relationships"] = [e.to_dict() for e in system.graph.edges.values()]
    if system.todos is not None:
        doc["todos"] = [t.to_dict() for t in system.todos.list(include_done=True)]
    return doc


def import_mif(system, doc: dict[str, Any]) -> dict[str, int]:
    """Import a MIF document into a system. Memories re-embed + re-index
    (vectors are engine-internal, never interchanged); graph edges restore
    with their learning state."""
    version = int(doc.get("mif_version", 0))
    if version not in (1, 2):
        raise ValueError(f"unsupported MIF version {version}")
    counts = {"memories": 0, "facts": 0, "entities": 0, "relationships": 0, "todos": 0}
    for d in doc.get("memories", []):
        exp = Experience.from_dict(d.get("experience", d))
        created = parse_ts(d["created_at"]) if d.get("created_at") else None
        mem = system.remember(exp, created_at=created)
        if "importance" in d:
            mem.importance = float(d["importance"])
            system.storage.update(mem)
        counts["memories"] += 1
    if system.facts is not None:
        from shodh_tpu.engine.facts import SemanticFact

        for d in doc.get("facts", []):
            system.facts.store(SemanticFact.from_dict(d))
            counts["facts"] += 1
    if system.graph is not None:
        from shodh_tpu.graph.graph_memory import EntityNode
        from shodh_tpu.graph.plasticity import Edge

        for d in doc.get("entities", []):
            ent = EntityNode.from_dict(d)
            if ent.id not in system.graph.entities:
                system.graph.entities[ent.id] = ent
                system.graph._dirty_entities.add(ent.id)
                counts["entities"] += 1
        for d in doc.get("relationships", []):
            edge = Edge.from_dict(d)
            from shodh_tpu.graph.graph_memory import _edge_key

            key = _edge_key(edge.src, edge.dst)
            if key not in system.graph.edges:
                system.graph.edges[key] = edge
                system.graph.adjacency.setdefault(edge.src, set()).add(edge.dst)
                system.graph.adjacency.setdefault(edge.dst, set()).add(edge.src)
                system.graph._dirty_edges.add(key)
                counts["relationships"] += 1
        system.graph.flush()
    if system.todos is not None:
        from shodh_tpu.engine.todos import Todo

        for d in doc.get("todos", []):
            todo = Todo.from_dict(d)
            system.todos.update(todo)  # upsert by id
            counts["todos"] += 1
    return counts


def export_to_file(system, path: str | Path, now: datetime) -> None:
    Path(path).write_text(json.dumps(export_mif(system, now), indent=1))


def import_from_file(system, path: str | Path) -> dict[str, int]:
    return import_mif(system, json.loads(Path(path).read_text()))
