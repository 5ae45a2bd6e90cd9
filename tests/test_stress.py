"""Stress + timing-SLA tiers (reference: tests/brutal_stress_tests.rs,
tests/timing_sla_tests.rs) — real engine, temp storage, no mocks.

Budgets are generous (shared CI CPU) but catch order-of-magnitude
regressions and any concurrency corruption under the engine's RLock.
"""

import threading
import time

import pytest

from shodh_tpu.engine.memory_system import MemorySystem
from shodh_tpu.types import Experience, Query


@pytest.fixture()
def system(tmp_path):
    s = MemorySystem(tmp_path / "stress")
    yield s
    s.close()


class TestConcurrency:
    def test_concurrent_remember_recall_forget(self, system):
        """4 writer + 4 reader + 1 reaper threads hammer one engine; every
        operation must complete without exception and the store must end
        internally consistent."""
        errors: list[BaseException] = []
        stored: list[str] = []
        lock = threading.Lock()
        stop = threading.Event()

        def writer(tid):
            try:
                for i in range(25):
                    mem = system.remember(
                        Experience(content=f"thread {tid} wrote event {i} about topic-{i % 5}")
                    )
                    with lock:
                        stored.append(mem.id)
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        def reader(tid):
            try:
                while not stop.is_set():
                    system.recall(Query(query_text=f"topic-{tid % 5} event", max_results=5))
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        def reaper():
            try:
                while not stop.is_set():
                    with lock:
                        victim = stored.pop() if len(stored) > 40 else None
                    if victim:
                        system.forget(victim)
                    time.sleep(0.01)
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        writers = [threading.Thread(target=writer, args=(t,)) for t in range(4)]
        readers = [threading.Thread(target=reader, args=(t,)) for t in range(4)]
        rp = threading.Thread(target=reaper)
        for t in writers + readers + [rp]:
            t.start()
        for t in writers:
            t.join(timeout=120)
        stop.set()
        for t in readers + [rp]:
            t.join(timeout=30)

        assert not errors, errors[:3]
        # consistency: every surviving id is retrievable and indexed
        n = system.storage.count()
        assert n == len({*stored})
        res = system.recall(Query(query_text="event topic", max_results=10))
        assert len(res.ids) > 0

    def test_maintenance_during_recalls(self, system):
        for i in range(40):
            system.remember(Experience(content=f"maintenance fodder item {i}"))
        errors: list[BaseException] = []

        def recaller():
            try:
                for _ in range(10):
                    system.recall(Query(query_text="fodder item", max_results=5))
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        t = threading.Thread(target=recaller)
        t.start()
        for _ in range(3):
            system.run_maintenance()
        t.join(timeout=60)
        assert not errors, errors[:3]


class TestTimingSla:
    """Reference SLA tiers scaled to CPU CI: recall p95 under a loose budget
    so a 10x regression (e.g. an accidental O(n^2) stage) fails loudly."""

    def test_recall_p95_budget(self, system):
        for i in range(300):
            system.remember(
                Experience(content=f"sla corpus entry {i}: service-{i % 17} handled request {i}")
            )
        # warm caches + jit
        system.recall(Query(query_text="service handled request", max_results=10))
        lat = []
        for i in range(30):
            t0 = time.perf_counter()
            system.recall(Query(query_text=f"service-{i % 17} request", max_results=10))
            lat.append((time.perf_counter() - t0) * 1000)
        lat.sort()
        p95 = lat[int(len(lat) * 0.95) - 1]
        assert p95 < 1500, f"recall p95 {p95:.0f}ms blew the SLA budget (lats={lat[-3:]})"

    def test_remember_throughput_floor(self, system):
        t0 = time.perf_counter()
        n = 60
        for i in range(n):
            system.remember(Experience(content=f"ingest floor item {i} with some payload text"))
        per_item_ms = (time.perf_counter() - t0) * 1000 / n
        assert per_item_ms < 500, f"remember took {per_item_ms:.0f}ms/item"
