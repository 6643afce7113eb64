"""Projector dispatch: Q-Former (the reference's real projector) or a
2-layer GELU MLP (`mlp2x_gelu`).

The reference *config* claims `mm_projector_type="mlp2x_gelu"` but its
builder unconditionally returns the QFormer
(reference `model/multimodal_projector/builder.py:97-101`, SURVEY §2.4.2) —
the MLP type is dead there. Here it is a live option: LLaVA-convention
`Linear(visual_hidden, hidden) → GELU → Linear(hidden, hidden)` applied per
patch token, keeping all 576 tokens per crop. That per-token output is what
makes the `spatial` / `spatial_unpad` merge paths (reference
`vis_zephyr_arch.py:396-473`) reachable — with the 32-query Q-Former they
assert-fail (`h*w == base_feature.shape[0]`, SURVEY §2.4.4).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import VisZephyrConfig
from .qformer import init_qformer, qformer_forward


def init_mlp_projector(cfg: VisZephyrConfig, key, dtype=jnp.float32) -> Dict:
    V = cfg.projector.visual_hidden_size
    D = cfg.projector.hidden_size
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "fc1": {
            "kernel": jax.random.normal(k1, (V, D), dtype) * (V ** -0.5),
            "bias": jnp.zeros((D,), dtype),
        },
        "fc2": {
            "kernel": jax.random.normal(k2, (D, D), dtype) * (D ** -0.5),
            "bias": jnp.zeros((D,), dtype),
        },
    }
    if "unpad" in cfg.mm_patch_merge_type:
        # Row separator appended after each unpadded feature row
        # (reference `vis_zephyr_arch.py:85-91`: Parameter ~ N(0, embed_std)
        # with embed_std = 1/sqrt(hidden)). Lives in the projector tree so
        # it trains whenever the projector does (stage 1).
        params["image_newline"] = jax.random.normal(k3, (D,), dtype) * (D ** -0.5)
    return params


def mlp_projector_forward(params: Dict, visual: jnp.ndarray) -> jnp.ndarray:
    """[N, T, V] fused visual features → [N, T, D] decoder-width tokens.
    `qdot` accepts raw or int8-quantized kernels (`--load-8bit/-4bit`)."""
    from ..ops.quant_matmul import qdot

    h = qdot(visual, params["fc1"]) + params["fc1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    return qdot(h, params["fc2"]) + params["fc2"]["bias"]


def init_projector(cfg: VisZephyrConfig, key, dtype=jnp.float32) -> Dict:
    if cfg.mm_projector_type == "mlp2x_gelu":
        return init_mlp_projector(cfg, key, dtype)
    if cfg.mm_projector_type == "qformer":
        return init_qformer(cfg.projector, key, dtype)
    raise ValueError(f"unknown mm_projector_type: {cfg.mm_projector_type!r}")


def project_visual(
    params: Dict,
    fused: jnp.ndarray,
    cfg: VisZephyrConfig,
    text_embeddings: Optional[jnp.ndarray] = None,
    text_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused visual features [N, T, V] → projected tokens
    [N, tokens_per_patch, D]. Text conditioning feeds only the Q-Former
    (block-0 concat); the MLP is per-token and ignores it."""
    if cfg.mm_projector_type == "mlp2x_gelu":
        return mlp_projector_forward(params, fused)
    return qformer_forward(
        params, fused, cfg.projector,
        text_embeddings=text_embeddings, text_mask=text_mask,
    )
