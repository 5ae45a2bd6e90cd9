"""Read-replica serving example (config 5's production shape).

One process ingests at full speed; replica readers over the same store
serve recalls concurrently (sqlite WAL: one writer, many readers). Here
both halves run in-process for a self-contained demo — in production the
replica is its own process/host:

    python -m shodh_tpu.cli replica --data-dir <store> --port 8901
"""

import tempfile
from pathlib import Path

from shodh_tpu.engine.follower import FollowerReader
from shodh_tpu.engine.memory_system import MemorySystem
from shodh_tpu.types import Experience, Query

store = Path(tempfile.mkdtemp()) / "store"

# --- the writer: ingest telemetry at full rate -------------------------------
writer = MemorySystem(store)
writer.batch_remember(
    [
        Experience(content=f"rover-7 cleared waypoint {i} on the ridge route",
                   tags=["mission-12"])
        for i in range(40)
    ]
)
writer.flush()

# --- a replica: serves recalls without touching the writer's lock ------------
replica = FollowerReader(store)
hits = replica.recall(Query(query_text="waypoint ridge route", max_results=3))
print("replica recall:", hits.memories[0].memory.experience.content)
print("replica lag:", replica.lag())

# --- the writer keeps ingesting; the replica catches up on its cadence -------
writer.batch_remember(
    [Experience(content="rover-7 detected a dust devil near waypoint 41",
                tags=["mission-12"])]
)
writer.flush()
print("lag before refresh:", replica.lag())
applied = replica.refresh()
print(f"refresh applied {applied} new memories; lag now {replica.lag()}")

fresh = replica.recall(Query(query_text="dust devil detected", max_results=1))
print("fresh read:", fresh.memories[0].memory.experience.content)

writer.close()
