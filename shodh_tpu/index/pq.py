"""Product quantization: 48-byte codes for 384-d vectors (32x compression).

Reference: ``src/vector_db/pq.rs`` — 8-dim subvectors x 256 centroids per
subspace, k-means-trained codebooks, ADC (asymmetric distance computation).

TPU formulation: codebook training is one batched k-means per subspace
(vmapped), encoding is an argmax over (N, M, 256) subspace scores, and ADC
search is a lookup-table gather: per query, the (M, 256) table of
query-subvector x centroid dot products is built with one matmul, then
candidate scores are ``sum_m table[m, code[m]]`` — a gather + sum that
vectorizes over the whole corpus.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from shodh_tpu.constants import PQ_CENTROIDS, PQ_SUBVECTOR_DIM
from shodh_tpu.index.kmeans import kmeans_fit


@partial(jax.jit, static_argnames=("n_centroids", "iters"))
def _train_subspaces(sub_vectors, n_centroids: int, iters: int):
    """sub_vectors: (M, N, d_sub) -> codebooks (M, C, d_sub)."""

    def fit_one(sv):
        c, _ = kmeans_fit(sv, k=n_centroids, iters=iters)
        return c

    return jax.vmap(fit_one)(sub_vectors)


@jax.jit
def _encode(sub_vectors, codebooks):
    """(M, N, d) x (M, C, d) -> codes (N, M) uint8 (argmax dot per subspace)."""
    scores = jnp.einsum("mnd,mcd->mnc", sub_vectors, codebooks)
    return jnp.argmax(scores, axis=-1).astype(jnp.uint8).T


@partial(jax.jit, static_argnames=("k",))
def _adc_topk(query_subs, codebooks, codes, valid, k: int):
    """ADC search for one query batch.

    query_subs: (B, M, d), codebooks: (M, C, d), codes: (N, M) uint8.
    score(n) = sum_m <q_m, codebook[m, codes[n, m]]>
    """
    # Lookup tables: (B, M, C)
    tables = jnp.einsum("bmd,mcd->bmc", query_subs, codebooks)
    # Gather per corpus row: scores (B, N) = sum_m tables[b, m, codes[n, m]]
    m = codes.shape[1]
    codes_i = codes.astype(jnp.int32)  # (N, M)
    # take_along_axis over C: tables (B, M, C) x codes (N, M)
    # -> einsum-style gather via one-hot would be (N, C) huge; use vmap gather.
    def per_sub(tab_m, code_m):
        # tab_m: (B, C), code_m: (N,) -> (B, N)
        return tab_m[:, code_m]

    scores = jnp.zeros((tables.shape[0], codes.shape[0]), jnp.float32)
    for mi in range(m):  # M is small (48) and static -> unrolled into the graph
        scores = scores + per_sub(tables[:, mi, :], codes_i[:, mi])
    scores = scores * valid[None, :] + (1.0 - valid[None, :]) * -1e30
    return jax.lax.top_k(scores, k)


class ProductQuantizer:
    def __init__(
        self,
        dim: int = 384,
        sub_dim: int = PQ_SUBVECTOR_DIM,
        n_centroids: int = PQ_CENTROIDS,
    ):
        assert dim % sub_dim == 0
        self.dim = dim
        self.sub_dim = sub_dim
        self.m = dim // sub_dim
        self.n_centroids = n_centroids
        self.codebooks: np.ndarray | None = None  # (M, C, d_sub)

    def _split(self, vectors: np.ndarray) -> jnp.ndarray:
        n = vectors.shape[0]
        return jnp.asarray(
            vectors.reshape(n, self.m, self.sub_dim).transpose(1, 0, 2)
        )  # (M, N, d)

    def train(self, vectors: np.ndarray, iters: int = 8) -> None:
        sub = self._split(np.asarray(vectors, np.float32))
        self.codebooks = np.asarray(
            _train_subspaces(sub, n_centroids=self.n_centroids, iters=iters)
        )

    def encode(self, vectors: np.ndarray) -> np.ndarray:
        assert self.codebooks is not None, "train() first"
        sub = self._split(np.asarray(vectors, np.float32))
        return np.asarray(_encode(sub, jnp.asarray(self.codebooks)))

    def decode(self, codes: np.ndarray) -> np.ndarray:
        assert self.codebooks is not None
        out = np.zeros((codes.shape[0], self.dim), np.float32)
        for mi in range(self.m):
            out[:, mi * self.sub_dim : (mi + 1) * self.sub_dim] = self.codebooks[
                mi, codes[:, mi]
            ]
        return out

    def search(
        self, queries: np.ndarray, codes: np.ndarray, k: int,
        valid: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """ADC top-k over encoded corpus. Returns (scores, rows)."""
        assert self.codebooks is not None
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        b = queries.shape[0]
        qsub = jnp.asarray(queries.reshape(b, self.m, self.sub_dim))
        v = jnp.asarray(
            valid if valid is not None else np.ones(codes.shape[0], np.float32)
        )
        vals, rows = _adc_topk(qsub, jnp.asarray(self.codebooks), jnp.asarray(codes), v, k=k)
        return np.asarray(vals), np.asarray(rows).astype(np.int64)
