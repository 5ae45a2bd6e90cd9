"""Semantic search with layer attribution and debug timings."""

from shodh_tpu.engine.memory_system import MemorySystem
from shodh_tpu.types import Experience, LayerMode, Query

sys_ = MemorySystem("/tmp/shodh-search")
for text in [
    "Kafka consumer lag spiked after the partition rebalance",
    "Postgres vacuum settings tuned for the analytics tables",
    "The rebalance was triggered by the broker restart",
]:
    sys_.remember(Experience(content=text))

for mode in (LayerMode.VECTOR_ONLY, LayerMode.FULL):
    res = sys_.recall_with_diagnostics(Query(query_text="what caused the consumer lag", layers=mode))
    print(mode.report_key, res.ids[:2], res.stage_timings_ms.get("total_ms"))
sys_.close()
