"""Contrastive embedder training on a device mesh.

The framework's learning path for embedding quality (reference analog:
``src/contrastive.rs`` learns a projection online; here the full encoder
can fine-tune). InfoNCE over (query, positive) text pairs with in-batch
negatives plus a hard-negative term against the device-resident corpus —
the exact step ``__graft_entry__.dryrun_multichip`` compiles over a
('data', 'shard') mesh.

Usage:
    trainer = ContrastiveTrainer(params)           # MiniLM params pytree
    state = trainer.init()
    state, loss = trainer.step(state, q_ids, q_mask, d_ids, d_mask)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from shodh_tpu.models.minilm import encode_tokens

TEMPERATURE = 0.05


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int


def info_nce_loss(params, q_ids, q_mask, d_ids, d_mask, corpus=None,
                  temperature: float = TEMPERATURE, hard_negative_weight: float = 0.1):
    """InfoNCE with in-batch negatives (+ optional corpus hard negatives)."""
    q = encode_tokens(params, q_ids, q_mask)
    d = encode_tokens(params, d_ids, d_mask)
    logits = jnp.dot(q, d.T, preferred_element_type=jnp.float32) / temperature
    labels = jnp.arange(logits.shape[0])
    ce = -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[labels, labels])
    if corpus is not None:
        neg = jnp.dot(q, corpus.T, preferred_element_type=jnp.float32) / temperature
        ce = ce + hard_negative_weight * jnp.mean(jax.nn.logsumexp(neg, axis=-1))
    return ce


class ContrastiveTrainer:
    """Adam-on-mesh trainer. Params replicate; the batch shards over 'data';
    an optional negatives corpus shards over 'shard'."""

    def __init__(self, params, learning_rate: float = 2e-5, mesh=None):
        import optax

        self.optimizer = optax.adamw(learning_rate)
        self.mesh = mesh
        self._params0 = params

        @jax.jit
        def _step(state_params, opt_state, q_ids, q_mask, d_ids, d_mask, corpus):
            loss, grads = jax.value_and_grad(info_nce_loss)(
                state_params, q_ids, q_mask, d_ids, d_mask, corpus
            )
            updates, new_opt = self.optimizer.update(grads, opt_state, state_params)
            import optax as _optax

            new_params = _optax.apply_updates(state_params, updates)
            return new_params, new_opt, loss

        self._step_fn = _step

    def init(self) -> TrainState:
        return TrainState(
            params=self._params0,
            opt_state=self.optimizer.init(self._params0),
            step=0,
        )

    def step(
        self, state: TrainState, q_ids, q_mask, d_ids, d_mask, corpus=None
    ) -> tuple[TrainState, float]:
        if corpus is None:
            # static-shape placeholder: one zero row contributes ~constant
            corpus = jnp.zeros((8, 384), jnp.float32)
        ctx = self.mesh if self.mesh is not None else _nullcontext()
        with ctx:
            new_params, new_opt, loss = self._step_fn(
                state.params, state.opt_state, q_ids, q_mask, d_ids, d_mask, corpus
            )
        return TrainState(new_params, new_opt, state.step + 1), float(loss)

    def shard_inputs(self, q_ids, q_mask, d_ids, d_mask, corpus=None):
        """Place inputs per the mesh contract (dp batch, sharded corpus)."""
        if self.mesh is None:
            return q_ids, q_mask, d_ids, d_mask, corpus
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = NamedSharding(self.mesh, P("data"))
        rows = NamedSharding(self.mesh, P("shard"))
        out = [jax.device_put(x, dp) for x in (q_ids, q_mask, d_ids, d_mask)]
        if corpus is not None:
            out.append(jax.device_put(corpus, rows))
        else:
            out.append(None)
        return tuple(out)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def pairs_from_memories(system, limit: int = 512) -> list[tuple[str, str]]:
    """Self-supervised training pairs mined from the store: a memory's
    content paired with its BM25-nearest neighbor (co-topical positives),
    the reference's feedback-pair mining analog."""
    pairs: list[tuple[str, str]] = []
    for mem in system.storage.iter_memories():
        if len(pairs) >= limit:
            break
        if system.bm25 is None:
            break
        hits = system.bm25.search(mem.experience.content, limit=3)
        for mid, _score in hits:
            if mid != mem.id:
                other = system.storage.get(mid)
                if other is not None:
                    pairs.append((mem.experience.content, other.experience.content))
                break
    return pairs
