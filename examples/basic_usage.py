"""Basic usage: store, recall, feedback, stats (examples/basic_usage.py analog)."""

from shodh_tpu.clients.client import Memory

with Memory(embedded=True, data_dir="/tmp/shodh-example") as m:
    m.add("We chose Rust for the backend because of memory safety",
          memory_type="decision", tags=["architecture"])
    m.add("The first deploy failed with a permissions error",
          memory_type="error", tags=["deploy"])
    m.add("Learned that WAL mode fixes sqlite lock contention",
          memory_type="learning")

    print("Recall: why rust?")
    for hit in m.search("why did we pick rust"):
        print(f"  {hit['score']:.3f}  {hit['experience']['content']}")

    ids = [h["id"] for h in m.search("deploy failure")]
    m.reinforce(ids[:1], helpful=True)
    print("Stats:", m.stats())
