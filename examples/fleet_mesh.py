"""Fleet mesh example (reference: zenoh_transport robot-swarm usage).

Two peers on real TCP sockets: a "brain" running the engine and a "robot"
publishing signed remember/recall operations over the key-expression
catalog, discovering the brain through liveliness gossip.
"""

import json
import tempfile
import time
from pathlib import Path

from shodh_tpu.server.fleet import KEY_PREFIX, FleetTransport, InProcessBus
from shodh_tpu.server.fleet_net import TcpMeshBus
from shodh_tpu.server.state import MultiUserMemoryManager

SECRET = "fleet-demo-secret"

brain_bus = TcpMeshBus(peer_id="brain", heartbeat_secs=0.5)
manager = MultiUserMemoryManager(Path(tempfile.mkdtemp()))
brain = FleetTransport(manager, bus=brain_bus, auth_key=SECRET)
brain.announce("brain-1")

robot_bus = TcpMeshBus(peer_id="rover", connect=[brain_bus.endpoint],
                       heartbeat_secs=0.5)
signer = FleetTransport(manager, bus=InProcessBus(), auth_key=SECRET)

results = []
robot_bus.subscribe(f"{KEY_PREFIX}/*/recall/result",
                    lambda k, p: results.append(json.loads(p)))
acks = []
robot_bus.subscribe(f"{KEY_PREFIX}/*/remember/ack",
                    lambda k, p: acks.append(p))

payload = signer.sign({"content": "obstacle detected at loading dock 3",
                       "tags": ["nav"]})
robot_bus.publish(f"{KEY_PREFIX}/rover1/remember", json.dumps(payload).encode())
# Wait for the brain's ack, not a fixed sleep: first-contact engine
# construction on a loaded host can take seconds, and recalling before the
# remember lands races to an empty result.
deadline = time.monotonic() + 30
while time.monotonic() < deadline and not acks:
    time.sleep(0.05)
assert acks, "brain never acked the remember"

query = signer.sign({"query_text": "obstacle at the dock", "max_results": 3})
robot_bus.publish(f"{KEY_PREFIX}/rover1/recall", json.dumps(query).encode())
# Same generous deadline as the ack wait: the first recall JIT-compiles the
# scoring ops, which can take >5 s on a loaded single-core host.
deadline = time.monotonic() + 30
while time.monotonic() < deadline and not results:
    time.sleep(0.05)
assert results, "brain never answered the recall"

print("recall over the mesh:", results[0]["memories"][0]["content"])
print("fleet members discovered by the robot:",
      [m.rsplit("/", 1)[1] for m in robot_bus.live_members(f"{KEY_PREFIX}/fleet/")])

robot_bus.close()
brain_bus.close()
manager.close()
