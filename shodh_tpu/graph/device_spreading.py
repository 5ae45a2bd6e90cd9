"""Spreading activation as device sparse matvec (CSR push iterations).

Host spreading (graph/graph_memory.py) walks adjacency dicts — right for
small graphs, wrong shape for 10^5+ entities. This formulation exports the
graph once as flat edge arrays (src, dst, weight) and runs K push rounds

    a_{t+1} = max(a_t, decay * segment_max(weight * a_t[src] -> dst) / norm)

as one jitted program (segment_max over static-size edge arrays; padded
edges point at a sink slot). Degree normalization and the activation
threshold match the host math; hop count is static.

The two implementations are behaviorally aligned (same decay rate, degree
normalization, threshold) and tested against each other on random graphs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from shodh_tpu import constants as C


@partial(jax.jit, static_argnames=("hops", "n_nodes"))
def spread_device(seeds, src, dst, weight, degree, hops: int, n_nodes: int):
    """seeds: (n_nodes,) initial activation; src/dst/weight: (E,) edges
    (padding rows carry weight 0). Returns (n_nodes,) activation."""
    denom = jnp.maximum(1.0, jnp.sqrt(degree)) * C.SPREADING_NORMALIZATION_FACTOR

    def body(_, act):
        contrib = act[src] * weight * C.SPREADING_DECAY_RATE / denom[src]
        # threshold gate mirrors the host's relaxed cutoff
        contrib = jnp.where(contrib >= C.SPREADING_RELAXED_THRESHOLD, contrib, 0.0)
        pushed = jax.ops.segment_max(contrib, dst, num_segments=n_nodes)
        return jnp.maximum(act, pushed)

    return jax.lax.fori_loop(0, hops, body, seeds)


class DeviceSpreader:
    """Flat export of a GraphMemory for device spreading."""

    def __init__(self, graph):
        self.graph = graph
        self._version = -1
        self._node_of: dict[str, int] = {}
        self._nodes: list[str] = []
        self._src = self._dst = self._weight = self._degree = None
        self._jit_cache: dict[tuple, object] = {}

    def _batched_fn(self, hops: int, n_nodes: int):
        """Jitted vmapped propagation, cached per (hops, n_nodes) — edge
        arrays are already power-of-two-padded so shapes stay stable."""
        import functools

        import jax

        key = (hops, n_nodes)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(
                jax.vmap(
                    functools.partial(spread_device, hops=hops, n_nodes=n_nodes),
                    in_axes=(0, None, None, None, None),
                )
            )
            self._jit_cache[key] = fn
        return fn

    def _rebuild(self) -> None:
        from shodh_tpu.graph.plasticity import effective_strength
        from shodh_tpu.graph.relations import spreading_weight
        from shodh_tpu.utils.clock import scoring_now

        g = self.graph
        now = scoring_now()
        self._nodes = sorted(g.entities.keys())
        self._node_of = {eid: i for i, eid in enumerate(self._nodes)}
        srcs, dsts, ws = [], [], []
        for edge in g.edges.values():
            i = self._node_of.get(edge.src)
            j = self._node_of.get(edge.dst)
            if i is None or j is None:
                continue
            w = effective_strength(edge, now) * spreading_weight(edge.rel_type)
            # undirected: push both ways
            srcs += [i, j]
            dsts += [j, i]
            ws += [w, w]
        n = max(1, len(self._nodes))
        if not srcs:
            srcs, dsts, ws = [0], [0], [0.0]
        # pad edge count to a power-of-two bucket (static shapes)
        e = len(srcs)
        pad = 1 << (e - 1).bit_length()
        srcs += [0] * (pad - e)
        dsts += [0] * (pad - e)
        ws += [0.0] * (pad - e)
        self._src = jnp.asarray(np.asarray(srcs, np.int32))
        self._dst = jnp.asarray(np.asarray(dsts, np.int32))
        self._weight = jnp.asarray(np.asarray(ws, np.float32))
        degree = np.zeros(n, np.float32)
        for eid, nbrs in g.adjacency.items():
            if eid in self._node_of:
                degree[self._node_of[eid]] = len(nbrs)
        self._degree = jnp.asarray(degree)
        self._version = len(g.edges)

    def spreading_activation(self, seed_terms: list[str], hops: int | None = None) -> dict[str, float]:
        """Same output contract as GraphMemory.spreading_activation but the
        propagation runs on device. Returns memory_id -> activation."""
        g = self.graph
        seeds: dict[str, float] = {}
        for term in seed_terms[:12]:
            ent = g.find_entity(term)
            if ent is not None:
                seeds[ent.id] = max(seeds.get(ent.id, 0.0), 0.5 + 0.5 * ent.salience)
        return self.spreading_activation_from_seeds(seeds, hops)

    def spreading_activation_from_seeds(
        self, seeds: dict[str, float], hops: int | None = None
    ) -> dict[str, float]:
        """Device propagation from resolved entity seeds, INCLUDING the
        bidirectional-intersection boost: all seeds propagate in one vmapped
        batch ((S+1, N) activations: joint row + one row per seed), so the
        host path's per-seed re-spreads (round-1 weak spot: O(seeds * E) on
        big graphs) collapse into a single device program."""
        import jax

        g = self.graph
        if self._version != len(g.edges):
            self._rebuild()
        n = len(self._nodes)
        if n == 0 or not seeds:
            return {}
        seed_items = [
            (sid, act) for sid, act in sorted(seeds.items()) if sid in self._node_of
        ]
        if not seed_items:
            return {}
        do_bidir = len(seed_items) >= C.BIDIRECTIONAL_MIN_ENTITIES
        s_rows = min(4, len(seed_items)) if do_bidir else 0
        batch = np.zeros((1 + s_rows, n), np.float32)
        for sid, act in seed_items:
            batch[0, self._node_of[sid]] = act
        for i, (sid, act) in enumerate(seed_items[:s_rows]):
            batch[1 + i, self._node_of[sid]] = act
        hops = hops or g._adaptive_hops()
        out = np.asarray(self._batched_fn(hops, n)(
            jnp.asarray(batch), self._src, self._dst, self._weight, self._degree
        ))
        act = out[0]
        if s_rows >= 2:
            reached = (out[1:] > C.BIDIRECTIONAL_INTERSECTION_MIN).sum(axis=0)
            act = np.where(reached >= 2, act * C.BIDIRECTIONAL_INTERSECTION_BOOST, act)
        mem_activation: dict[str, float] = {}
        for idx in np.nonzero(act >= C.SPREADING_ACTIVATION_THRESHOLD)[0]:
            eid = self._nodes[int(idx)]
            for mid in g.entity_memories.get(eid, ()):
                mem_activation[mid] = mem_activation.get(mid, 0.0) + float(act[idx])
        if mem_activation:
            mx = max(mem_activation.values())
            if mx > 0:
                mem_activation = {m: a / mx for m, a in mem_activation.items()}
        return mem_activation
