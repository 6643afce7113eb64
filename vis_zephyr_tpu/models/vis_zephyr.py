"""VisZephyr — the fused multimodal model: CLIP tower → multi-layer fusion
→ text-conditioned Q-Former → token splice → Mistral decoder.

One jittable program covers the whole prefill (reference equivalent:
`VisZephyrForCausalLM.forward` / `prepare_inputs_labels_for_multimodal`,
`vis_zephyr/model/language_model/vis_zephyr.py:51-142` +
`vis_zephyr_arch.py:129-333`).

Data model (static shapes; host collators produce these):
- `input_ids`   [B, T]   right-padded, one IMAGE_TOKEN_INDEX per multimodal
                         sample (text-only rows have none),
- `text_valid`  [B, T]   bool,
- `images`      [B, P, H, W, 3] normalized pixels; P = static max patches
                         (global image first, then tiles, then padding),
- `patch_valid` [B, P]   bool, valid patches contiguous from index 0,
- `labels`      [B, T]   optional, IGNORE_INDEX-masked.

The vision tower is frozen in every reference training stage
(`vision_encoder.py:55`), enforced here with stop_gradient.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import VisZephyrConfig
from ..ops.splice import compact_text_ids, splice_image_tokens
from .clip_vit import clip_vit_forward, init_clip_vit, select_and_stack
from .fusion import dense_channel_fusion
from .mistral import embed, init_mistral, mistral_forward
from .projector import init_projector, project_visual


def initialize_vision_tokenizer(
    params: Dict,
    tokenizer,
    mm_use_im_patch_token: bool = False,
    mm_use_im_start_end: bool = False,
    pretrained_embed_tokens=None,
) -> Tuple[Dict, int]:
    """Add the image placeholder special tokens and resize the embedding
    tables (functional: returns new params; the tokenizer gains the tokens
    in place). Reference: `vis_zephyr_arch.py:338-393`.

    - `<im_patch>` under `mm_use_im_patch_token`; `<im_start>`/`<im_end>`
      under `mm_use_im_start_end`.
    - New input/output embedding rows are mean-initialized from the existing
      rows (the reference's explicit mean-init for start/end; we apply the
      same to the patch token rather than torch's random resize).
    - `pretrained_embed_tokens`: optional [V, D] or [2, D] array from a
      stage-1 projector artifact that carried tuned embeddings — overrides
      the new input rows (reference `pretrain_mm_mlp_adapter` branch).

    Returns (params, num_new_tokens). No-op when the tables already cover
    the tokenizer (e.g. loading a checkpoint that was saved resized).
    """
    from ..constants import (
        DEFAULT_IM_END_TOKEN,
        DEFAULT_IM_START_TOKEN,
        DEFAULT_IMAGE_PATCH_TOKEN,
    )

    new_tokens = []
    if mm_use_im_patch_token:
        new_tokens.append(DEFAULT_IMAGE_PATCH_TOKEN)
    if mm_use_im_start_end:
        new_tokens += [DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN]
    if not new_tokens:
        return params, 0
    tokenizer.add_tokens(new_tokens, special_tokens=True)
    target_vocab = len(tokenizer)

    dec = dict(params["decoder"])
    embed = dec["embed_tokens"]
    V, D = embed.shape
    n_new = target_vocab - V
    if n_new <= 0:
        return params, 0  # tables already resized (saved checkpoint)

    def mean_extend(table, axis):
        mean = table.mean(axis=axis, keepdims=True).astype(table.dtype)
        reps = [1, 1]
        reps[axis] = n_new
        return jnp.concatenate([table, jnp.tile(mean, reps)], axis=axis)

    new_embed = mean_extend(embed, axis=0)
    if pretrained_embed_tokens is not None:
        pre = jnp.asarray(pretrained_embed_tokens, embed.dtype)
        if pre.shape[0] == target_vocab:
            new_embed = new_embed.at[-n_new:].set(pre[-n_new:])
        elif pre.shape[0] == n_new:
            new_embed = new_embed.at[-n_new:].set(pre)
        else:
            raise ValueError(
                f"pretrained embed_tokens shape {pre.shape} matches neither "
                f"the resized vocab {target_vocab} nor the {n_new} new rows"
            )
    dec["embed_tokens"] = new_embed
    dec["lm_head"] = {
        **dec["lm_head"],
        "kernel": mean_extend(dec["lm_head"]["kernel"], axis=1),
    }
    return {**params, "decoder": dec}, n_new


def init_vis_zephyr(cfg: VisZephyrConfig, key, dtype=jnp.float32) -> Dict:
    kv, kp, kd = jax.random.split(key, 3)
    return {
        "vision": init_clip_vit(cfg.vision, kv, dtype),
        "projector": init_projector(cfg, kp, dtype),
        "decoder": init_mistral(cfg.decoder, kd, dtype),
    }


def encode_images(
    params,
    images: jnp.ndarray,
    cfg: VisZephyrConfig,
    text_embeddings: Optional[jnp.ndarray] = None,
    text_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Images → projected visual tokens.

    Args:
      images: [N, H, W, 3] normalized pixels (N = B * P flattened patches).
      text_embeddings: optional [N, L, D_dec] Q-Former conditioning.

    Returns [N, tokens_per_patch, D_dec] — num_queries for the Q-Former,
    all patch tokens for mlp2x_gelu
    (reference `vis_zephyr_arch.py:120-124` encode_images).
    """
    hidden = clip_vit_forward(params["vision"], images, cfg.vision)
    stacked = select_and_stack(hidden, cfg.vision)          # [S, N, T, C]
    fused = dense_channel_fusion(stacked, cfg.vision.num_fusion_groups)
    fused = jax.lax.stop_gradient(fused)                    # frozen tower
    return project_visual(
        params["projector"], fused, cfg,
        text_embeddings=text_embeddings, text_mask=text_mask,
    )


def prepare_multimodal(
    params,
    input_ids: jnp.ndarray,
    images: jnp.ndarray,
    patch_valid: jnp.ndarray,
    cfg: VisZephyrConfig,
    text_valid: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    pad_to_multiple: Optional[int] = None,
    merge_info: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Encode images, build Q-Former text conditioning, merge patch tokens
    (flat or spatial/unpad), splice embeddings.

    `merge_info` [B, 5] (from `ops.patch_merge.spatial_merge_info`) is
    required when `cfg.mm_patch_merge_type` starts with "spatial" — it
    carries the per-sample anyres grid + unpad crop geometry that only the
    host (which saw the original image size) knows.

    Returns the `splice_image_tokens` dict (embeds/valid/positions/lengths
    [+labels]), ready for `mistral_forward`.
    """
    B, T = input_ids.shape
    P = images.shape[1]
    Q = cfg.tokens_per_patch

    if cfg.mm_projector_type == "qformer":
        # Q-Former text conditioning: the prompt with the sentinel removed,
        # embedded, repeated per patch (reference `vis_zephyr_arch.py:162-192`).
        # Batch padding is masked out of block-0 self-attention so a sample's
        # projection never depends on its batch neighbors (see
        # `compact_text_ids` docstring).
        text_ids, cond_valid = compact_text_ids(
            input_ids, cfg.decoder.pad_token_id, text_valid=text_valid
        )
        cond = embed(params["decoder"], text_ids)           # [B, T-1, D]
        cond = cond * cond_valid[..., None].astype(cond.dtype)
        cond = jnp.repeat(cond, P, axis=0)                  # [B*P, T-1, D]
        cond_mask = jnp.repeat(cond_valid, P, axis=0)
    else:  # per-token MLP projector: no text conditioning to compute
        cond = cond_mask = None

    flat_images = images.reshape((B * P,) + images.shape[2:])
    projected = encode_images(
        params, flat_images, cfg, text_embeddings=cond, text_mask=cond_mask
    )

    if cfg.mm_patch_merge_type.startswith("spatial"):
        from ..ops.patch_merge import spatial_merge

        if merge_info is None:
            raise ValueError(
                "mm_patch_merge_type=spatial* needs per-sample merge_info "
                "(ops.patch_merge.spatial_merge_info)"
            )
        image_embeds, num_image_tokens = spatial_merge(
            projected.reshape(B, P, Q, -1), merge_info, cfg,
            image_newline=params["projector"].get("image_newline"),
        )
    else:
        image_embeds = projected.reshape(B, P * Q, -1)      # flat patch merge
        num_image_tokens = patch_valid.astype(jnp.int32).sum(axis=1) * Q

    text_embeds = embed(params["decoder"], input_ids)
    prepared = splice_image_tokens(
        input_ids,
        text_embeds,
        image_embeds,
        num_image_tokens,
        text_valid=text_valid,
        labels=labels,
        max_length=cfg.tokenizer_model_max_length,
        pad_to_multiple=pad_to_multiple,
    )
    # Under a data-parallel mesh, pin the spliced activations back to the
    # batch axes — the gather-built embeds otherwise trigger XLA's
    # replicate-then-reshard fallback (see constrain_batch_sharded).
    from ..parallel.sharding import constrain_batch_sharded

    return {k: constrain_batch_sharded(v) for k, v in prepared.items()}


def vis_zephyr_forward(
    params,
    input_ids: jnp.ndarray,
    images: Optional[jnp.ndarray],
    patch_valid: Optional[jnp.ndarray],
    cfg: VisZephyrConfig,
    text_valid: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    cache: Optional[Dict] = None,
    remat: bool = False,
    return_kv: bool = False,
    pad_to_multiple: Optional[int] = None,
    use_flash: Optional[bool] = None,
    attn_mesh=None,
    merge_info: Optional[jnp.ndarray] = None,
    lora_dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    mlora: Optional[Dict] = None,
    adapter_idx: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict]:
    """Full multimodal forward (prefill or training step).

    Returns (logits, aux) where aux carries the spliced labels/valid/
    positions/lengths and (if cache was given) the updated cache.
    """
    if images is None:
        # Pure text path (reference `vis_zephyr_arch.py:148-149`).
        B, T = input_ids.shape
        valid = (
            jnp.ones((B, T), dtype=bool) if text_valid is None else text_valid.astype(bool)
        )
        positions = jnp.where(valid, jnp.cumsum(valid, axis=1) - 1, 0).astype(jnp.int32)
        embeds = embed(params["decoder"], input_ids)
        prepared = {
            "embeds": embeds,
            "valid": valid,
            "positions": positions,
            "lengths": valid.sum(axis=1).astype(jnp.int32),
        }
        if labels is not None:
            prepared["labels"] = labels
    else:
        prepared = prepare_multimodal(
            params, input_ids, images, patch_valid, cfg,
            text_valid=text_valid, labels=labels, pad_to_multiple=pad_to_multiple,
            merge_info=merge_info,
        )

    logits, extra = mistral_forward(
        params["decoder"],
        prepared["embeds"],
        cfg.decoder,
        prepared["positions"],
        attn_valid=prepared["valid"],
        cache=cache,
        remat=remat,
        return_kv=return_kv,
        use_flash=use_flash,
        attn_mesh=attn_mesh,
        lora_dropout=lora_dropout,
        dropout_rng=dropout_rng,
        mlora=mlora,
        adapter_idx=adapter_idx,
    )
    aux = {k: v for k, v in prepared.items() if k != "embeds"}
    if extra is not None:
        aux["kv" if cache is None else "cache"] = extra
    return logits, aux
