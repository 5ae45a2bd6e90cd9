"""Spot-style inspection loop (reference: examples/spot): a quadruped runs
patrol missions, streams geo-tagged action outcomes into memory, and the
next mission briefs itself from what earlier patrols learned."""

import tempfile

from shodh_tpu.engine.memory_system import MemorySystem
from shodh_tpu.types import Experience, ExperienceType, GeoFilter, Query, RetrievalMode

sys_ = MemorySystem(tempfile.mkdtemp(prefix="shodh-spot-"))

# --- patrol 12: stream observations as they happen -------------------------
patrol = [
    Experience(
        content="thermal anomaly on pump 3, surface temp 82C",
        experience_type=ExperienceType.OBSERVATION,
        robot_id="spot-2", mission_id="patrol-12",
        geo_location=(29.7604, -95.3698, 0.0),
        action_type="inspect", sensor_data={"surface_temp_c": 82.0},
        severity="high", anomaly=True, entities=["pump 3"],
    ),
    Experience(
        content="stairwell B grating loose, rerouted via ramp",
        experience_type=ExperienceType.ERROR,
        robot_id="spot-2", mission_id="patrol-12",
        geo_location=(29.7606, -95.3702, 0.0),
        action_type="traverse", reward=-0.4, failure=True,
        entities=["stairwell B"],
    ),
    Experience(
        content="ramp route to sector C took 40s, clean traversal",
        experience_type=ExperienceType.TASK,
        robot_id="spot-2", mission_id="patrol-12",
        geo_location=(29.7607, -95.3701, 0.0),
        action_type="traverse", reward=0.7,
    ),
]
for exp in patrol:
    sys_.remember(exp)

# --- patrol 13 briefs itself ------------------------------------------------
print("anomalies logged near the pump deck:")
near = sys_.recall(Query(
    retrieval_mode=RetrievalMode.SPATIAL,
    geo_filter=GeoFilter(lat=29.7605, lon=-95.3699, radius_m=200),
    anomalies_only=True,
))
for s in near.memories:
    print("  -", s.memory.experience.content)

print("traversal actions that worked (reward >= 0.5):")
wins = sys_.recall(Query(
    retrieval_mode=RetrievalMode.ACTION_OUTCOME,
    action_type="traverse", reward_range=(0.5, 1.0),
))
for s in wins.memories:
    print("  -", s.memory.experience.content)

print("semantic question from the operator:")
ans = sys_.recall(Query(query_text="why did spot avoid the stairwell", max_results=2))
for s in ans.memories:
    print(f"  {s.score:.3f} {s.memory.experience.content}")

sys_.close()
