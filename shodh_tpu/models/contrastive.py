"""Online-learned linear projection pulling coreferent surfaces together.

Reference: ``src/contrastive.rs`` — a dim x dim linear map, identity-
initialized, updated by a delta rule on (anchor, positive) pairs
(Sudowoodo-lite), persisted. Projected embeddings replace raw ones for
entity-linking cosine checks.

TPU note: training is a rank-1 update (outer product) and application is a
matmul — both trivially batched; the whole projector can later train as a
jitted step (it's the same math as __graft_entry__'s contrastive step).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


class ContrastiveProjector:
    def __init__(self, dim: int = 384, lr: float = 0.05, path: Optional[str | Path] = None):
        self.dim = dim
        self.lr = lr
        self.path = Path(path) if path else None
        self.w = np.eye(dim, dtype=np.float32)
        self.updates = 0
        if self.path is not None and self.path.with_suffix(".npz").exists():
            self.load()

    def project(self, vectors: np.ndarray) -> np.ndarray:
        out = np.atleast_2d(vectors) @ self.w.T
        norms = np.linalg.norm(out, axis=-1, keepdims=True)
        out = out / np.maximum(norms, 1e-12)
        return out[0] if vectors.ndim == 1 else out

    def learn_pair(self, anchor: np.ndarray, positive: np.ndarray,
                   negative: Optional[np.ndarray] = None) -> float:
        """Delta rule: move W·anchor toward W·positive (and away from the
        negative when given). Returns the anchor-positive cosine after."""
        a, p = self.project(anchor), self.project(positive)
        # gradient of (1 - a·p) wrt W ~ -(p ⊗ anchor + a ⊗ positive)
        grad = np.outer(p, anchor) + np.outer(a, positive)
        self.w += self.lr * grad.astype(np.float32) * 0.5
        if negative is not None:
            n = self.project(negative)
            grad_n = np.outer(n, anchor) + np.outer(a, negative)
            self.w -= self.lr * 0.5 * grad_n.astype(np.float32) * 0.5
        # keep the map well-conditioned: decay toward identity
        self.w = 0.995 * self.w + 0.005 * np.eye(self.dim, dtype=np.float32)
        self.updates += 1
        if self.path is not None and self.updates % 50 == 0:
            self.save()
        return float(self.project(anchor) @ self.project(positive))

    def save(self) -> None:
        if self.path is None:
            return
        self.path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(self.path.with_suffix(".npz"), w=self.w, updates=self.updates)

    def load(self) -> None:
        data = np.load(self.path.with_suffix(".npz"))
        self.w = data["w"].astype(np.float32)
        self.updates = int(data["updates"])
