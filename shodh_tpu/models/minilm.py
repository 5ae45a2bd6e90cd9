"""MiniLM-L6-v2 sentence encoder as a pure-JAX model.

TPU-native replacement for the reference's ONNX Runtime inference
(``src/embeddings/minilm.rs``): the 6-layer BERT encoder runs as one jitted
XLA program on the MXU, batched across sentences/chunks, with mean pooling
over the attention mask and L2 normalization (+ NaN scrub) matching
``minilm.rs:598,1043``.

Architecture (all-MiniLM-L6-v2): hidden 384, 6 heads, FFN 1536, 6 post-LN
transformer layers, learned position embeddings, GELU. Weights load from a
HuggingFace checkpoint directory (``from_pretrained`` — safetensors or torch
.bin); with no checkpoint available, ``init_params`` gives a deterministic
random model (useful for perf work and architecture tests — quality then
comes from the hash embedder fallback, see models/hash_embedder.py).

Compute dtype is configurable: f32 for exactness, bf16 for ~2x MXU
throughput (accumulation stays f32 via preferred_element_type).
"""

from __future__ import annotations

import json
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

CONFIG = {
    "vocab_size": 30522,
    "hidden": 384,
    "layers": 6,
    "heads": 6,
    "ffn": 1536,
    "max_position": 512,
    "type_vocab": 2,
    "ln_eps": 1e-12,
}


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def init_params(seed: int = 0, cfg: dict = CONFIG) -> dict:
    """Deterministic random init with BERT-like scales (std 0.02)."""
    rng = np.random.default_rng(seed)
    h, f = cfg["hidden"], cfg["ffn"]

    def w(*shape):
        return jnp.asarray(rng.normal(0.0, 0.02, shape).astype(np.float32))

    def zeros(*shape):
        return jnp.zeros(shape, jnp.float32)

    def ones(*shape):
        return jnp.ones(shape, jnp.float32)

    params = {
        "word_emb": w(cfg["vocab_size"], h),
        "pos_emb": w(cfg["max_position"], h),
        "type_emb": w(cfg["type_vocab"], h),
        "emb_ln_g": ones(h),
        "emb_ln_b": zeros(h),
        "layers": [],
    }
    for _ in range(cfg["layers"]):
        params["layers"].append(
            {
                "q_w": w(h, h), "q_b": zeros(h),
                "k_w": w(h, h), "k_b": zeros(h),
                "v_w": w(h, h), "v_b": zeros(h),
                "o_w": w(h, h), "o_b": zeros(h),
                "attn_ln_g": ones(h), "attn_ln_b": zeros(h),
                "ffn_in_w": w(h, f), "ffn_in_b": zeros(f),
                "ffn_out_w": w(f, h), "ffn_out_b": zeros(h),
                "ffn_ln_g": ones(h), "ffn_ln_b": zeros(h),
            }
        )
    return params


def _hf_key_map(n_layers: int) -> dict[str, str]:
    """HF BertModel parameter name -> our param path ('layers.i.name')."""
    m = {
        "embeddings.word_embeddings.weight": "word_emb",
        "embeddings.position_embeddings.weight": "pos_emb",
        "embeddings.token_type_embeddings.weight": "type_emb",
        "embeddings.LayerNorm.weight": "emb_ln_g",
        "embeddings.LayerNorm.bias": "emb_ln_b",
    }
    for i in range(n_layers):
        p = f"encoder.layer.{i}."
        t = f"layers.{i}."
        m.update(
            {
                p + "attention.self.query.weight": t + "q_w",
                p + "attention.self.query.bias": t + "q_b",
                p + "attention.self.key.weight": t + "k_w",
                p + "attention.self.key.bias": t + "k_b",
                p + "attention.self.value.weight": t + "v_w",
                p + "attention.self.value.bias": t + "v_b",
                p + "attention.output.dense.weight": t + "o_w",
                p + "attention.output.dense.bias": t + "o_b",
                p + "attention.output.LayerNorm.weight": t + "attn_ln_g",
                p + "attention.output.LayerNorm.bias": t + "attn_ln_b",
                p + "intermediate.dense.weight": t + "ffn_in_w",
                p + "intermediate.dense.bias": t + "ffn_in_b",
                p + "output.dense.weight": t + "ffn_out_w",
                p + "output.dense.bias": t + "ffn_out_b",
                p + "output.LayerNorm.weight": t + "ffn_ln_g",
                p + "output.LayerNorm.bias": t + "ffn_ln_b",
            }
        )
    return m


def params_from_state_dict(state: dict, cfg: dict = CONFIG) -> dict:
    """Convert an HF BertModel state dict (numpy arrays) to our pytree.

    HF nn.Linear stores (out, in); our matmuls use (in, out), so linear
    weights are transposed. Embedding tables keep their layout.
    """
    key_map = _hf_key_map(cfg["layers"])
    params = init_params(0, cfg)
    seen = set()
    for hf_name, ours in key_map.items():
        candidates = [hf_name, "bert." + hf_name]
        arr = None
        for c in candidates:
            if c in state:
                arr = np.asarray(state[c], np.float32)
                break
        if arr is None:
            raise KeyError(f"missing parameter {hf_name} in checkpoint")
        if ours.endswith("_w") and arr.ndim == 2:
            arr = arr.T
        parts = ours.split(".")
        if parts[0] == "layers":
            params["layers"][int(parts[1])][parts[2]] = jnp.asarray(arr)
        else:
            params[ours] = jnp.asarray(arr)
        seen.add(hf_name)
    return params


def flatten_params(params: dict) -> dict:
    """Param pytree -> flat npz key space ('layers/<i>/<name>[/q|/s]');
    the converted-artifact layout tools/convert_minilm.py writes."""
    flat = {}
    for k, v in params.items():
        if k == "layers":
            for i, lp in enumerate(v):
                for kk, vv in lp.items():
                    if isinstance(vv, dict):  # int8 {q, s}
                        flat[f"layers/{i}/{kk}/q"] = np.asarray(vv["q"])
                        flat[f"layers/{i}/{kk}/s"] = np.asarray(vv["s"])
                    else:
                        flat[f"layers/{i}/{kk}"] = np.asarray(vv)
        else:
            flat[k] = np.asarray(v)
    return flat


def unflatten_params(data) -> dict:
    """Inverse of :func:`flatten_params` (accepts an npz handle or dict)."""
    params: dict = {"layers": []}
    layer_buf: dict[int, dict] = {}
    files = data.files if hasattr(data, "files") else list(data)
    for key in files:
        parts = key.split("/")
        if parts[0] == "layers":
            lp = layer_buf.setdefault(int(parts[1]), {})
            if len(parts) == 4:  # quantized {q, s}
                lp.setdefault(parts[2], {})[parts[3]] = data[key]
            else:
                lp[parts[2]] = data[key]
        else:
            params[key] = data[key]
    params["layers"] = [layer_buf[i] for i in sorted(layer_buf)]
    return params


def load_checkpoint(ckpt_dir: str | Path, cfg: dict = CONFIG) -> dict:
    """Load params from a checkpoint dir: model.npz (our converted layout,
    tools/convert_minilm.py), model.safetensors, or pytorch_model.bin."""
    ckpt_dir = Path(ckpt_dir)
    npz_path = ckpt_dir / "model.npz"
    if npz_path.exists():
        params = unflatten_params(np.load(npz_path))
        return {
            k: (v if k == "layers" else jnp.asarray(v)) for k, v in params.items()
        } | {
            "layers": [
                {
                    kk: (vv if isinstance(vv, dict) else jnp.asarray(vv))
                    for kk, vv in lp.items()
                }
                for lp in params["layers"]
            ]
        }
    st_path = ckpt_dir / "model.safetensors"
    bin_path = ckpt_dir / "pytorch_model.bin"
    if st_path.exists():
        from safetensors.numpy import load_file

        state = load_file(st_path)
    elif bin_path.exists():
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        state = {k: v.numpy() for k, v in sd.items()}
    else:
        raise FileNotFoundError(f"no model weights in {ckpt_dir}")
    cfg_path = ckpt_dir / "config.json"
    if cfg_path.exists():
        hf = json.loads(cfg_path.read_text())
        cfg = dict(
            cfg,
            vocab_size=hf.get("vocab_size", cfg["vocab_size"]),
            hidden=hf.get("hidden_size", cfg["hidden"]),
            layers=hf.get("num_hidden_layers", cfg["layers"]),
            heads=hf.get("num_attention_heads", cfg["heads"]),
            ffn=hf.get("intermediate_size", cfg["ffn"]),
            max_position=hf.get("max_position_embeddings", cfg["max_position"]),
            ln_eps=hf.get("layer_norm_eps", cfg["ln_eps"]),
        )
    return params_from_state_dict(state, cfg)


# ---------------------------------------------------------------------------
# INT8 weight quantization (reference serves model_quantized.onnx ~22 MB;
# same scheme here: per-output-channel symmetric int8 on every matmul weight,
# dequantized into the compute dtype at use — weight-only quantization, f32
# activations, so accuracy loss stays sub-percent while HBM traffic drops 4x)
# ---------------------------------------------------------------------------

_QUANT_KEYS = ("q_w", "k_w", "v_w", "o_w", "ffn_in_w", "ffn_out_w")


def quantize_params_int8(params: dict) -> dict:
    """Per-channel symmetric int8 for transformer matmul weights."""

    def quant(w):
        absmax = jnp.max(jnp.abs(w), axis=0)  # per output channel
        scale = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
        q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
        return {"q": q, "s": scale}

    out = dict(params)
    out["layers"] = []
    for lp in params["layers"]:
        nl = dict(lp)
        for key in _QUANT_KEYS:
            nl[key] = quant(lp[key])
        out["layers"].append(nl)
    return out


def _weight(w, dtype):
    """Dequantize-or-cast a (possibly int8-quantized) weight for matmul."""
    if isinstance(w, dict):
        return (w["q"].astype(dtype) * w["s"].astype(dtype)[None, :])
    return w.astype(dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_norm(x, g, b, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * g + b


def _encoder_layer(x, mask_bias, lp, heads: int, eps: float, dtype):
    h = x.shape[-1]
    dh = h // heads

    def lin(v, w_, b_):
        return (
            jnp.dot(v, _weight(w_, dtype), preferred_element_type=jnp.float32) + b_
        )

    b, L, _ = x.shape
    q = lin(x, lp["q_w"], lp["q_b"]).reshape(b, L, heads, dh).transpose(0, 2, 1, 3)
    k = lin(x, lp["k_w"], lp["k_b"]).reshape(b, L, heads, dh).transpose(0, 2, 1, 3)
    v = lin(x, lp["v_w"], lp["v_b"]).reshape(b, L, heads, dh).transpose(0, 2, 1, 3)
    scores = (
        jnp.einsum("bhqd,bhkd->bhqk", q.astype(dtype), k.astype(dtype),
                   preferred_element_type=jnp.float32)
        / np.sqrt(dh)
    )
    scores = scores + mask_bias  # (b, 1, 1, L) additive -inf on padding
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dtype), v.astype(dtype),
                     preferred_element_type=jnp.float32)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, L, h)
    attn_out = lin(ctx, lp["o_w"], lp["o_b"])
    x = _layer_norm(x + attn_out, lp["attn_ln_g"], lp["attn_ln_b"], eps)
    ffn = lin(jax.nn.gelu(lin(x, lp["ffn_in_w"], lp["ffn_in_b"]), approximate=False),
              lp["ffn_out_w"], lp["ffn_out_b"])
    return _layer_norm(x + ffn, lp["ffn_ln_g"], lp["ffn_ln_b"], eps)


@partial(jax.jit, static_argnames=("heads", "eps", "compute_dtype"))
def encode_token_states(params, ids, mask, heads: int = 6, eps: float = 1e-12,
                        compute_dtype: str = "float32"):
    """(B, L) token ids + mask -> (B, L, H) contextual token states.

    The shared transformer trunk; sentence embeddings pool over this, and
    the GLiNER-shape span typer gathers word states from it."""
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    L = ids.shape[1]
    x = (
        params["word_emb"][ids]
        + params["pos_emb"][:L][None, :, :]
        + params["type_emb"][0][None, None, :]
    )
    x = _layer_norm(x, params["emb_ln_g"], params["emb_ln_b"], eps)
    mask_bias = (1.0 - mask)[:, None, None, :] * -1e30
    for lp in params["layers"]:
        x = _encoder_layer(x, mask_bias, lp, heads, eps, dtype)
    return x


@partial(jax.jit, static_argnames=("heads", "eps", "compute_dtype"))
def encode_tokens(params, ids, mask, heads: int = 6, eps: float = 1e-12,
                  compute_dtype: str = "float32"):
    """(B, L) token ids + mask -> (B, H) L2-normalized sentence embeddings.

    Mean pooling over unmasked positions then L2 norm, matching the
    reference embedder (minilm.rs mean-pool + NaN scrub + normalize).
    """
    x = encode_token_states(params, ids, mask, heads=heads, eps=eps,
                            compute_dtype=compute_dtype)
    # Mean pool over real tokens
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1e-9)
    pooled = jnp.sum(x * mask[:, :, None], axis=1) / denom
    pooled = jnp.nan_to_num(pooled)
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-12)
