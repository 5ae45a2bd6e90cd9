"""Seat conversation harness example (reference: seat/ quickstart).

Runs a scripted conversation end-to-end in process: the agent recalls with
score attribution, cites memories, and both learning legs settle on the
next turn — every mutation landing in the revertible ledger. Swap the
ScriptedProvider for a local model by pointing OLLAMA_BASE_URL at an
Ollama instance and using provider_id="ollama".
"""

import tempfile
from pathlib import Path

from shodh_tpu.engine.memory_system import MemorySystem
from shodh_tpu.seat import Conversation, LearningLedger, ModelRegistry, ScriptedProvider
from shodh_tpu.types import Experience

data_dir = Path(tempfile.mkdtemp())
system = MemorySystem(data_dir / "alice")
harness = MemorySystem(data_dir / "alice.seat-harness")

# seed a memory the agent will recall and cite
seeded = system.remember(
    Experience(content="The staging cluster auth token rotates every Monday",
               tags=["ops"])
)

registry = ModelRegistry(data_dir)
registry._scripted = ScriptedProvider([
    {"tool": "recall_memory", "args": {"query": "staging auth token rotation"}},
    {"text": f"The token rotates every Monday [mem:{seeded.id[:8]}]."},
    {"text": "Noted — anything else?"},
])
ledger = LearningLedger(data_dir / "learning-ledger.jsonl")
conv = Conversation(None, "alice", system, harness, registry, ledger)

turn1 = conv.send("when does the staging token rotate?")
print("assistant:", turn1.assistant_text)
for ev in turn1.events:
    if ev["type"] == "memory_recall":
        top = ev["results"][0]
        print(f"recalled [{top['id'][:8]}] score={top['score']:.3f} "
              f"attribution={list(top['attribution'])[:4]}...")

conv.send("thanks, that matches what I remembered")  # settles turn 1

print("\nledger:")
for ev in ledger.events():
    print(f"  {ev['kind']:<12} {ev['detail'].get('outcome', '')} "
          f"{ev['detail'].get('leg', '')} ids={ev['detail'].get('memory_ids', [])}")

system.close()
harness.close()
