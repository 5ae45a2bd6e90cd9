"""LangChain adapter example (reference: examples/langchain example).

Wires shodh-tpu as a LangChain conversation memory: context saved after
each turn, relevant memories loaded into the prompt for the next one.
Runs without langchain installed (the adapter duck-types the interface).
"""

import tempfile

from shodh_tpu.clients.client import Memory
from shodh_tpu.clients.integrations import langchain_memory


def main() -> None:
    store = Memory(embedded=True, data_dir=tempfile.mkdtemp(prefix="shodh-lc-"))
    memory = langchain_memory(store, k=3)

    # a chain would call save_context after every exchange
    memory.save_context(
        {"input": "We deploy with blue-green on Fridays only"},
        {"output": "Noted — blue-green, Fridays."},
    )
    memory.save_context(
        {"input": "Postgres is our system of record, Redis is cache-only"},
        {"output": "Got it."},
    )

    # ...and load_memory_variables before composing the next prompt
    vars_ = memory.load_memory_variables({"input": "when do we deploy?"})
    print("memory variables injected into the prompt:")
    print(vars_[memory.memory_key])

    store.close()


if __name__ == "__main__":
    main()
