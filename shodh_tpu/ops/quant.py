"""INT8 symmetric quantization for embedding vectors.

The reference serves INT8-quantized MiniLM weights and f32 vectors; this
build additionally quantizes the *vector store* (BASELINE config 2: fused
dequant+distance). Scheme: per-vector symmetric int8 with an f32 scale,
``v ~= q * scale``, ``scale = max|v| / 127``. Cosine scores against an
L2-normalized f32 query dequantize exactly as
``score = (q_int8 . query) * scale`` — the dequant rides the matmul epilogue
and never materializes f32 vectors in HBM (4x bandwidth win, the usual
bottleneck per the TPU memory hierarchy).
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_int8(vectors):
    """Per-row symmetric int8 quantization.

    Args:
      vectors: (N, D) float array.
    Returns:
      (values int8 (N, D), scales f32 (N,)) with values*scales ~= vectors.
    """
    absmax = jnp.max(jnp.abs(vectors), axis=-1)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(vectors / scales[..., None]), -127, 127).astype(jnp.int8)
    return q, scales


def dequantize_int8(values, scales):
    return values.astype(jnp.float32) * scales[..., None]
