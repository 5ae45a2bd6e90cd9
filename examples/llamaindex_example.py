"""LlamaIndex adapter example (reference: examples/llamaindex example).

Uses shodh-tpu as a LlamaIndex retriever: documents stored as memories,
queries answered from the fused recall funnel. Falls back to the raw
adapter interface when llama-index isn't installed.
"""

import tempfile

from shodh_tpu.clients.client import Memory
from shodh_tpu.clients.integrations import llamaindex_retriever


def main() -> None:
    store = Memory(embedded=True, data_dir=tempfile.mkdtemp(prefix="shodh-li-"))
    for doc in (
        "The ingestion service batches writes every 500ms",
        "Search latency SLO is p99 < 50ms at 1M documents",
        "The reranker was disabled after the March incident",
    ):
        store.add(doc, memory_type="learning")

    retriever = llamaindex_retriever(store, k=2)
    nodes = retriever.retrieve("what is the latency target?")
    for n in nodes:
        # NodeWithScore when llama-index is installed; plain dicts otherwise
        if isinstance(n, dict):  # framework-free fallback: raw hit dicts
            text, score = n["experience"]["content"], n.get("score", 0.0)
        else:
            text, score = n.node.text, n.score
        print(f"{score:.3f}  {text}")

    store.close()


if __name__ == "__main__":
    main()
