"""Real-network fleet mesh tests (reference: src/zenoh_transport — peer
pub/sub + liveliness discovery). These run over actual TCP sockets on
localhost: a 3-peer mesh (B and C both dial A) must route key-expr
publications, HMAC-authenticated engine operations, and liveliness tokens
across hops."""

import json
import time

import pytest

from shodh_tpu.server.fleet import KEY_PREFIX, FleetTransport
from shodh_tpu.server.fleet_net import TcpMeshBus
from shodh_tpu.server.state import MultiUserMemoryManager


def wait_for(predicate, timeout=8.0, interval=0.05):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if predicate():
            return True
        time.sleep(interval)
    return False


@pytest.fixture()
def mesh():
    a = TcpMeshBus(peer_id="peer-a", heartbeat_secs=0.5)
    b = TcpMeshBus(peer_id="peer-b", connect=[a.endpoint], heartbeat_secs=0.5)
    c = TcpMeshBus(peer_id="peer-c", connect=[a.endpoint], heartbeat_secs=0.5)
    yield a, b, c
    for bus in (a, b, c):
        bus.close()


def test_pub_sub_across_real_sockets(mesh):
    a, b, c = mesh
    got = []
    b.subscribe(f"{KEY_PREFIX}/*/telemetry", lambda k, p: got.append((k, p)))
    a.publish(f"{KEY_PREFIX}/rover1/telemetry", b"battery=0.93")
    assert wait_for(lambda: got), "publication did not cross the socket"
    assert got[0] == (f"{KEY_PREFIX}/rover1/telemetry", b"battery=0.93")


def test_mesh_routing_via_intermediate_peer(mesh):
    # B and C are not directly connected — frames must route through A
    a, b, c = mesh
    got = []
    c.subscribe("shodh/**", lambda k, p: got.append(k))
    b.publish(f"{KEY_PREFIX}/rover2/remember", b"{}")
    assert wait_for(lambda: got), "frame did not route B -> A -> C"
    assert got[0] == f"{KEY_PREFIX}/rover2/remember"


def test_no_duplicate_delivery_in_cyclic_mesh(mesh):
    a, b, c = mesh
    c.dial(b.endpoint)  # close the cycle: A-B, A-C, B-C
    time.sleep(0.2)
    got = []
    a.subscribe(f"{KEY_PREFIX}/dup/check", lambda k, p: got.append(p))
    c.publish(f"{KEY_PREFIX}/dup/check", b"once")
    assert wait_for(lambda: got)
    time.sleep(0.5)  # allow any duplicate to arrive
    assert got == [b"once"], f"duplicate delivery: {got}"


def test_liveliness_discovery_across_mesh(mesh):
    a, b, c = mesh
    b.declare_liveliness(f"{KEY_PREFIX}/fleet/rover-b")
    c.declare_liveliness(f"{KEY_PREFIX}/fleet/rover-c")
    ok = wait_for(lambda: len(a.live_members(f"{KEY_PREFIX}/fleet/")) == 2)
    assert ok, a.live_members("")
    assert a.live_members(f"{KEY_PREFIX}/fleet/") == [
        f"{KEY_PREFIX}/fleet/rover-b", f"{KEY_PREFIX}/fleet/rover-c"]


def test_late_joiner_discovers_existing_tokens():
    a = TcpMeshBus(peer_id="a", heartbeat_secs=0.5)
    a.declare_liveliness(f"{KEY_PREFIX}/fleet/rover-a")
    late = TcpMeshBus(peer_id="late", connect=[a.endpoint], heartbeat_secs=0.5)
    try:
        assert wait_for(
            lambda: late.live_members(f"{KEY_PREFIX}/fleet/") ==
            [f"{KEY_PREFIX}/fleet/rover-a"]), "hello replay missed the token"
    finally:
        a.close()
        late.close()


def test_fleet_transport_remember_recall_over_network(tmp_path, monkeypatch):
    monkeypatch.setenv("SHODH_FLEET_KEY", "mesh-secret")
    a = TcpMeshBus(peer_id="brain", heartbeat_secs=0.5)
    b = TcpMeshBus(peer_id="robot", connect=[a.endpoint], heartbeat_secs=0.5)
    manager = MultiUserMemoryManager(tmp_path / "fleet")
    transport = FleetTransport(manager, bus=a, auth_key="mesh-secret")
    # robot side only needs the signer, not a dispatching transport
    from shodh_tpu.server.fleet import InProcessBus

    robot_side = FleetTransport(manager, bus=InProcessBus(), auth_key="mesh-secret")
    acks, results = [], []
    b.subscribe(f"{KEY_PREFIX}/*/remember/ack", lambda k, p: acks.append(json.loads(p)))
    b.subscribe(f"{KEY_PREFIX}/*/recall/result", lambda k, p: results.append(json.loads(p)))
    try:
        payload = robot_side.sign({"content": "obstacle at dock 3", "tags": ["nav"]})
        b.publish(f"{KEY_PREFIX}/rover9/remember", json.dumps(payload).encode())
        assert wait_for(lambda: acks), "no remember ack over the mesh"
        assert acks[0]["memory_id"]

        q = robot_side.sign({"query_text": "obstacle dock", "max_results": 3})
        b.publish(f"{KEY_PREFIX}/rover9/recall", json.dumps(q).encode())
        assert wait_for(lambda: results), "no recall result over the mesh"
        assert any("obstacle" in m["content"] for m in results[0]["memories"])
    finally:
        a.close()
        b.close()
        manager.close()


def test_bad_hmac_rejected_over_network(tmp_path, monkeypatch):
    a = TcpMeshBus(peer_id="brain2", heartbeat_secs=0.5)
    b = TcpMeshBus(peer_id="rogue", connect=[a.endpoint], heartbeat_secs=0.5)
    manager = MultiUserMemoryManager(tmp_path / "fleet2")
    FleetTransport(manager, bus=a, auth_key="real-key")
    acks = []
    b.subscribe(f"{KEY_PREFIX}/*/remember/ack", lambda k, p: acks.append(p))
    try:
        payload = {"content": "forged", "auth": "not-a-real-mac"}
        b.publish(f"{KEY_PREFIX}/rover9/remember", json.dumps(payload).encode())
        time.sleep(0.8)
        assert not acks, "forged payload was accepted"
        system = manager.get_user_memory("rover9")
        assert all("forged" not in m.experience.content for m in system.get_all(limit=10))
    finally:
        a.close()
        b.close()
        manager.close()


def test_malformed_frames_do_not_kill_the_link(mesh):
    a, b, c = mesh
    import socket as s

    host, _, port = a.endpoint.partition(":")
    raw = s.create_connection((host, int(port)))
    raw.sendall(b"this is not json\n{broken\n")
    got = []
    a.subscribe(f"{KEY_PREFIX}/ok/after", lambda k, p: got.append(p))
    raw.sendall(json.dumps({"op": "pub", "key": f"{KEY_PREFIX}/ok/after",
                            "payload": "aGk=", "id": "m1"}).encode() + b"\n")
    assert wait_for(lambda: got), "link died on malformed input"
    assert got[0] == b"hi"
    raw.close()
