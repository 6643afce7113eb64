"""Text-conditioned Q-Former multimodal projector.

Behavioral parity: reference
`vis_zephyr/model/multimodal_projector/builder.py:12-101`:

- 32 learned query tokens of decoder width (4096),
- visual features pass one LayerNorm(visual_width=5120) at entry,
- block 0 consumes ``[queries ; text_embeddings]`` concatenated on the
  sequence axis and its output is truncated back to the 32 query slots;
  blocks 1..N-1 see queries only,
- each block is pre-LN: self-attention over queries, cross-attention
  (Q width 4096 / KV width 5120), GELU FFN (4096→8192→4096), residuals,
- final LayerNorm.

Note the reference passes zero-padded text embeddings with NO attention
mask (`vis_zephyr_arch.py:179-192`); we accept an optional `text_mask` but
default to the same unmasked behavior for checkpoint parity.

All matmuls are MXU-shaped einsums; the block stack unrolls (N=8 blocks,
block 0 differs structurally from the rest anyway).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ProjectorConfig


def _layer_norm(x, p, eps):
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(dtype)


def _dense(x, p):
    from ..ops.quant_matmul import qdot

    y = qdot(x, p)  # raw or int8-quantized kernels (quant.quantize_qformer)
    if "bias" in p:
        y = y + p["bias"]
    return y


def _mha(q_in, kv_in, p, num_heads, kv_mask: Optional[jnp.ndarray] = None):
    """Multi-head attention matching torch nn.MultiheadAttention semantics."""
    B, Tq, D = q_in.shape
    head_dim = D // num_heads
    q = _dense(q_in, p["q"]).reshape(B, Tq, num_heads, head_dim)
    k = _dense(kv_in, p["k"]).reshape(B, -1, num_heads, head_dim)
    v = _dense(kv_in, p["v"]).reshape(B, -1, num_heads, head_dim)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (head_dim ** -0.5)
    if kv_mask is not None:
        scores = jnp.where(kv_mask[:, None, None, :], scores, jnp.finfo(scores.dtype).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q_in.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Tq, D)
    return _dense(out, p["out"])


def _block(queries, visual, bp, cfg: ProjectorConfig, self_mask=None):
    h = _layer_norm(queries, bp["norm1"], cfg.layer_norm_eps)
    queries = queries + _mha(h, h, bp["self_attn"], cfg.num_heads, kv_mask=self_mask)
    h = _layer_norm(queries, bp["norm2"], cfg.layer_norm_eps)
    queries = queries + _mha(h, visual, bp["cross_attn"], cfg.num_heads)
    h = _layer_norm(queries, bp["norm3"], cfg.layer_norm_eps)
    queries = queries + _dense(jax.nn.gelu(_dense(h, bp["fc1"]), approximate=False), bp["fc2"])
    return queries


def qformer_forward(
    params,
    visual_features: jnp.ndarray,
    cfg: ProjectorConfig,
    text_embeddings: Optional[jnp.ndarray] = None,
    text_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Project visual features to `num_queries` decoder-width tokens.

    Args:
      params: pytree from `init_qformer` / `hf_convert.convert_qformer`.
      visual_features: [B, T_vis, visual_hidden_size] fused ViT features.
      cfg: projector config.
      text_embeddings: optional [B, L, hidden_size] prompt embeddings that
        condition block 0 (zero-padded to a fixed L by the caller).
      text_mask: optional [B, L] bool; when given, padded text positions are
        masked out of block-0 self-attention. Leave None for reference
        parity (the reference attends to zero padding).

    Returns:
      [B, num_queries, hidden_size]
    """
    B = visual_features.shape[0]
    visual = _layer_norm(visual_features, params["pre_norm"], cfg.layer_norm_eps)
    queries = jnp.broadcast_to(
        params["queries"][None], (B, cfg.num_queries, cfg.hidden_size)
    ).astype(visual_features.dtype)

    blocks = params["blocks"]

    def block_params(i):
        return jax.tree_util.tree_map(lambda x: x[i], blocks)

    if text_embeddings is not None:
        init = jnp.concatenate([queries, text_embeddings.astype(queries.dtype)], axis=1)
        self_mask = None
        if text_mask is not None:
            q_mask = jnp.ones((B, cfg.num_queries), dtype=bool)
            self_mask = jnp.concatenate([q_mask, text_mask.astype(bool)], axis=1)
        out = _block(init, visual, block_params(0), cfg, self_mask=self_mask)
        queries = out[:, : cfg.num_queries, :]
    else:
        queries = _block(queries, visual, block_params(0), cfg)

    for i in range(1, cfg.num_blocks):
        queries = _block(queries, visual, block_params(i), cfg)

    return _layer_norm(queries, params["final_norm"], cfg.layer_norm_eps)


def init_qformer(cfg: ProjectorConfig, key, dtype=jnp.float32):
    D, V, F, L = cfg.hidden_size, cfg.visual_hidden_size, cfg.ffn_dim, cfg.num_blocks
    k = jax.random.split(key, 4)

    def stacked_dense(key, din, dout):
        return {
            "kernel": jax.random.normal(key, (L, din, dout), dtype) * (din ** -0.5),
            "bias": jnp.zeros((L, dout), dtype),
        }

    def stacked_ln(dim):
        return {"scale": jnp.ones((L, dim), dtype), "bias": jnp.zeros((L, dim), dtype)}

    def stacked_mha(key, kv_dim):
        kk = jax.random.split(key, 4)
        return {
            "q": stacked_dense(kk[0], D, D),
            "k": stacked_dense(kk[1], kv_dim, D),
            "v": stacked_dense(kk[2], kv_dim, D),
            "out": stacked_dense(kk[3], D, D),
        }

    blocks = {
        "norm1": stacked_ln(D),
        "self_attn": stacked_mha(jax.random.fold_in(k[1], 0), D),
        "norm2": stacked_ln(D),
        "cross_attn": stacked_mha(jax.random.fold_in(k[1], 1), V),
        "norm3": stacked_ln(D),
        "fc1": stacked_dense(jax.random.fold_in(k[2], 0), D, F),
        "fc2": stacked_dense(jax.random.fold_in(k[2], 1), F, D),
    }
    return {
        "queries": jax.random.normal(k[0], (cfg.num_queries, D), dtype),
        "pre_norm": {"scale": jnp.ones((V,), dtype), "bias": jnp.zeros((V,), dtype)},
        "final_norm": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
        "blocks": blocks,
    }
