"""Contrastive trainer tests (CPU mesh)."""

import numpy as np
import pytest

import jax

from shodh_tpu.models.minilm import CONFIG, init_params
from shodh_tpu.models.trainer import ContrastiveTrainer, info_nce_loss, pairs_from_memories


@pytest.fixture(scope="module")
def tiny_params():
    cfg = dict(CONFIG, vocab_size=200, layers=2, max_position=32)
    return init_params(0, cfg)


def _batch(rng, b=8, L=12, vocab=200):
    ids = rng.integers(0, vocab, size=(b, L)).astype(np.int32)
    mask = np.ones((b, L), np.float32)
    return ids, mask


class TestTrainer:
    def test_loss_decreases(self, tiny_params):
        rng = np.random.default_rng(0)
        q_ids, q_mask = _batch(rng)
        d_ids, d_mask = _batch(rng)
        trainer = ContrastiveTrainer(tiny_params, learning_rate=1e-3)
        state = trainer.init()
        losses = []
        for _ in range(5):
            state, loss = trainer.step(state, q_ids, q_mask, d_ids, d_mask)
            losses.append(loss)
        assert losses[-1] < losses[0]
        assert state.step == 5

    def test_step_on_mesh(self, tiny_params):
        from shodh_tpu.parallel.mesh import make_mesh_2d

        mesh = make_mesh_2d(data=2, shard=4)
        trainer = ContrastiveTrainer(tiny_params, mesh=mesh)
        state = trainer.init()
        rng = np.random.default_rng(1)
        q_ids, q_mask = _batch(rng, b=8)
        d_ids, d_mask = _batch(rng, b=8)
        corpus = rng.standard_normal((64, 384)).astype(np.float32)
        q_ids, q_mask, d_ids, d_mask, corpus = trainer.shard_inputs(
            q_ids, q_mask, d_ids, d_mask, corpus
        )
        state, loss = trainer.step(state, q_ids, q_mask, d_ids, d_mask, corpus)
        assert np.isfinite(loss)

    def test_pair_mining(self, tmp_path):
        from shodh_tpu.engine.memory_system import MemorySystem
        from shodh_tpu.types import Experience

        sys_ = MemorySystem(tmp_path / "m")
        sys_.remember(Experience(content="kafka consumer lag spike in production"))
        sys_.remember(Experience(content="kafka lag resolved by partition rebalance"))
        sys_.remember(Experience(content="office plants need watering"))
        pairs = pairs_from_memories(sys_)
        assert any("kafka" in a and "kafka" in b for a, b in pairs)
        sys_.close()
