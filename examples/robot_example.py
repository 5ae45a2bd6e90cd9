"""Robotics usage: geo-tagged experiences + spatial/mission recall."""

from shodh_tpu.engine.memory_system import MemorySystem
from shodh_tpu.types import Experience, GeoFilter, Query, RetrievalMode

sys_ = MemorySystem("/tmp/shodh-robot")
sys_.remember(Experience(
    content="obstacle detected at loading dock A",
    robot_id="spot-1", mission_id="patrol-7",
    geo_location=(37.7749, -122.4194, 0.0),
    sensor_data={"lidar_range_m": 2.1}, reward=-0.2,
))
sys_.remember(Experience(
    content="charge station reached, battery 94%",
    robot_id="spot-1", mission_id="patrol-7",
    geo_location=(37.7751, -122.4190, 0.0), reward=0.8,
))

near = sys_.recall(Query(
    retrieval_mode=RetrievalMode.SPATIAL,
    geo_filter=GeoFilter(lat=37.7750, lon=-122.4192, radius_m=300),
))
print("Spatial recall:", [s.memory.experience.content for s in near.memories])

wins = sys_.recall(Query(retrieval_mode=RetrievalMode.ACTION_OUTCOME, reward_range=(0.5, 1.0)))
print("High-reward:", [s.memory.experience.content for s in wins.memories])
sys_.close()
