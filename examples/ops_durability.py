"""Operations tour: integrity checking, repair, backup, restore.

A store is a set of derived structures (vector index, BM25 postings,
entity graph, hash map, temporal facts) over one source of truth — the
memory records. fsck verifies every derivation; repair re-derives from
content; backups snapshot sqlite transactionally even under live
writers. See docs/deployment.md "Operations" and DESIGN.md §3.6.
"""

import tempfile
from pathlib import Path

from shodh_tpu.clients.client import Memory
from shodh_tpu.storage.backup import create_backup, restore_backup, verify_backup

data_dir = tempfile.mkdtemp(prefix="shodh-ops-")

with Memory(embedded=True, data_dir=data_dir) as m:
    m.add("Deployed the perception stack to rover fleet seven", tags=["ops"])
    m.add("Rover three's lidar needs recalibration after the dust storm", tags=["maintenance"])

    # 1. integrity: every derived structure checked against the records
    report = m.fsck()
    print(f"fsck ok={report['ok']}  memories={report['memories']}")

    # 2. sabotage a derived structure, then let repair re-derive it
    m._system.storage.kv.put("hash", "f" * 64, b"no-such-memory")
    report = m.fsck()
    print(f"after sabotage: ok={report['ok']} (dangling hash entries: "
          f"{report['hash_index']['dangling']})")
    report = m.fsck(repair=True)
    print(f"after repair:   ok={report['ok']}")

    # 3. transactional backup (safe under a live writer) + verify
    store = Path(data_dir) / "users" / "default"
    backup = create_backup(store, Path(data_dir) / "backups")
    print(f"backup verified: {verify_backup(backup)}")

# 4. restore into a fresh location and serve from it
restored = Path(tempfile.mkdtemp(prefix="shodh-ops-restored-")) / "users" / "default"
restore_backup(backup, restored)
with Memory(embedded=True, data_dir=str(restored.parent.parent)) as m2:
    hits = m2.search("lidar recalibration", limit=1)
    print(f"restored recall: {hits[0]['experience']['content']}")
