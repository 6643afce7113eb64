"""Attention ops with a uniform masking formulation.

`dot_product_attention` is the XLA reference implementation used for
correctness tests, CPU runs, and as the fallback path; the Pallas flash
attention kernel (`vis_zephyr_tpu.ops.flash_attention`) implements the same
contract for the TPU hot path (it replaces the role CUDA flash-attn plays in
the reference — `vis_zephyr/train/zephyr_flash_attn_monkey_patch.py`).

Masking model (covers prefill, decode, packed sequences and sliding
window in one rule): position `(q, kv)` may attend iff

    kv_valid[kv]  AND  kv_pos[kv] <= q_pos[q]            (causal)
                  AND  q_pos[q] - kv_pos[kv] < window     (sliding window)

Query/KV positions are explicit arrays, so right-padded batches, KV caches
(decode: a single query at position `length`), and spliced multimodal
sequences all express the same way.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def attention_mask(
    q_positions: jnp.ndarray,
    kv_positions: jnp.ndarray,
    kv_valid: Optional[jnp.ndarray] = None,
    causal: bool = True,
    sliding_window: Optional[int] = None,
) -> jnp.ndarray:
    """Boolean mask [B, Tq, Tkv] per the module-level rule."""
    mask = jnp.ones(
        (q_positions.shape[0], q_positions.shape[1], kv_positions.shape[1]), dtype=bool
    )
    if causal:
        mask &= kv_positions[:, None, :] <= q_positions[:, :, None]
    if sliding_window is not None:
        mask &= q_positions[:, :, None] - kv_positions[:, None, :] < sliding_window
    if kv_valid is not None:
        mask &= kv_valid[:, None, :]
    return mask


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Grouped-query attention, XLA path.

    Args:
      q: [B, Tq, Hq, D]
      k/v: [B, Tkv, Hkv, D] with Hq % Hkv == 0 (the group is broadcast).
      mask: bool [B, Tq, Tkv] (True = may attend), or None.
      scale: defaults to D**-0.5.

    Returns: [B, Tq, Hq, D]
    """
    B, Tq, Hq, D = q.shape
    Hkv = k.shape[2]
    groups = Hq // Hkv
    scale = D ** -0.5 if scale is None else scale

    qg = q.reshape(B, Tq, Hkv, groups, D)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k) * scale
    scores = scores.astype(jnp.float32)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)
    return out.reshape(B, Tq, Hq, D)
