"""On-device multimodal token splice.

Replaces each IMAGE_TOKEN_INDEX sentinel in a (right-padded) token batch
with the per-sample block of projected image tokens, producing embedding
sequences, expanded labels, positions and validity masks — all with static
shapes, entirely inside XLA.

The reference does this with a per-sample Python loop over tensors
(`vis_zephyr/model/vis_zephyr_arch.py:230-333`), a host serialization point.
Here every input position i is assigned an expansion size
(1 for text, n_image_tokens for the sentinel, 0 for padding); exclusive
cumsums give each input token its output start offset, and each output slot
finds its source input token with a batched binary search — two gathers, no
loops, no host sync.

Supports K sentinels per sample (the reference's multi-image loop,
`vis_zephyr_arch.py:242-305`): the k-th sentinel of a row expands into the
k-th image's token block. The shipped datasets use one anyres image per
conversation (K=1, the fast path); pass 2-D `num_image_tokens [B, K]` with
`image_embeds` holding the images' blocks concatenated along the token axis
for multi-image samples. Samples without a sentinel pass through unchanged
(text-only samples in a multimodal batch, `vis_zephyr_arch.py:244-258`).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX


def splice_image_tokens(
    input_ids: jnp.ndarray,
    text_embeds: jnp.ndarray,
    image_embeds: jnp.ndarray,
    num_image_tokens: jnp.ndarray,
    text_valid: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    max_length: Optional[int] = None,
    pad_to_multiple: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Expand image sentinels into image-embedding blocks.

    Args:
      input_ids: [B, T] token ids, IMAGE_TOKEN_INDEX marks the image slot,
        right-padded.
      text_embeds: [B, T, D] embeddings of input_ids (sentinel/pad rows are
        ignored).
      image_embeds: [B, N, D] projected image tokens (N = total rows across
        the sample's images, blocks concatenated in sentinel order; trailing
        rows may be padding).
      num_image_tokens: [B] int — rows of image_embeds that are real
        (= valid_patches * num_queries) — or [B, K] for K images per
        sample: entry k sizes the k-th sentinel's block, blocks laid out
        back-to-back in image_embeds.
      text_valid: [B, T] bool mask of real text tokens (None = all real).
      labels: optional [B, T]; image spans and padding become IGNORE_INDEX.
      max_length: optional truncation of the output length (reference
        `vis_zephyr_arch.py:308-313`).

    Returns dict with:
      embeds  [B, T_out, D], labels [B, T_out] (if given),
      valid   [B, T_out] bool, positions [B, T_out] int32,
      lengths [B] int32 — T_out = T - 1 + N (then truncated).
    """
    B, T = input_ids.shape
    N = image_embeds.shape[1]
    D = text_embeds.shape[-1]
    T_out = T - 1 + N
    if max_length is not None:
        T_out = min(T_out, max_length)
    if pad_to_multiple:
        # Round the static output length up so downstream attention can use
        # 128-aligned flash-kernel tiles; the validity mask covers the rest.
        T_out = -(-T_out // pad_to_multiple) * pad_to_multiple

    if text_valid is None:
        text_valid = jnp.ones((B, T), dtype=bool)
    text_valid = text_valid.astype(bool)

    if num_image_tokens.ndim == 1:
        num_image_tokens = num_image_tokens[:, None]  # [B, K=1]
    K = num_image_tokens.shape[1]

    is_sentinel = (input_ids == IMAGE_TOKEN_INDEX) & text_valid
    # Ordinal of each sentinel within its row (0-based); the k-th sentinel
    # consumes the k-th image's block (reference multi-image loop order).
    sent_ord = jnp.clip(jnp.cumsum(is_sentinel, axis=1) - 1, 0, K - 1)
    batch_full = jnp.arange(B)[:, None]
    counts_at = num_image_tokens[batch_full, sent_ord]  # [B, T]
    # Exclusive cumsum of per-image counts: block k's base row in image_embeds.
    img_base = jnp.cumsum(num_image_tokens, axis=1) - num_image_tokens  # [B, K]

    # Expansion size per input position.
    sizes = jnp.where(is_sentinel, counts_at, 1)
    sizes = jnp.where(text_valid, sizes, 0)
    starts = jnp.cumsum(sizes, axis=1) - sizes  # exclusive cumsum [B, T]
    lengths = jnp.sum(sizes, axis=1).astype(jnp.int32)

    # For each output slot j: source input index = last i with starts[i] <= j.
    # starts is nondecreasing; searchsorted(side='right') - 1 gives it.
    out_idx = jnp.arange(T_out)
    src = jax.vmap(lambda s: jnp.searchsorted(s, out_idx, side="right") - 1)(starts)
    src = jnp.clip(src, 0, T - 1)  # [B, T_out]

    batch = jnp.arange(B)[:, None]
    src_is_img = is_sentinel[batch, src]
    offset = out_idx[None, :] - starts[batch, src]  # position within the block
    valid = out_idx[None, :] < lengths[:, None]

    # Row in image_embeds: the source sentinel's block base + in-block offset.
    img_row_idx = img_base[batch, sent_ord[batch, src]] + offset
    img_rows = image_embeds[batch, jnp.clip(img_row_idx, 0, N - 1)]
    txt_rows = text_embeds[batch, src]
    embeds = jnp.where((src_is_img & valid)[..., None], img_rows, txt_rows)
    embeds = jnp.where(valid[..., None], embeds, jnp.zeros((), embeds.dtype))

    out = {
        "embeds": embeds,
        "valid": valid,
        "positions": jnp.where(valid, out_idx[None, :], 0).astype(jnp.int32),
        "lengths": jnp.minimum(lengths, T_out),
    }
    if labels is not None:
        lab = labels[batch, src]
        lab = jnp.where(src_is_img | ~valid, IGNORE_INDEX, lab)
        out["labels"] = lab
    return out


def compact_text_ids(
    input_ids: jnp.ndarray,
    pad_id: int,
    text_valid: Optional[jnp.ndarray] = None,
):
    """Remove the image sentinel from each row, shifting the tail left and
    keeping length T-1 (matches the reference's
    ``cur_input_ids[cur_input_ids != IMAGE_TOKEN_INDEX]`` used to build the
    Q-Former text conditioning, `vis_zephyr_arch.py:168`). Rows without a
    sentinel lose their last token instead (the reference never hits this
    case — text-only rows take a different path — but padding there makes
    it harmless).

    Returns (compacted_ids [B, T-1], compacted_valid [B, T-1]). The validity
    mask travels through the same permutation so callers can exclude batch
    padding from Q-Former conditioning — unlike the reference, which lets
    pad tokens condition block 0 (`vis_zephyr_arch.py:162-192`), making a
    sample's projection depend on its batch neighbors. For unpadded inputs
    (CLI / bs=1 eval, the reference's only inference paths) the two are
    identical; under batching ours keeps outputs batch-invariant, which
    continuous batching requires.
    """
    B, T = input_ids.shape
    if text_valid is None:
        text_valid = jnp.ones((B, T), dtype=bool)
    is_sentinel = input_ids == IMAGE_TOKEN_INDEX
    # Stable argsort of the sentinel flag floats text tokens to the front in
    # original order and pushes the (single) sentinel to the back.
    order = jnp.argsort(is_sentinel.astype(jnp.int32), axis=1, stable=True)
    compacted = jnp.take_along_axis(input_ids, order, axis=1)[:, : T - 1]
    valid = jnp.take_along_axis(text_valid.astype(bool), order, axis=1)[:, : T - 1]
    valid &= compacted != IMAGE_TOKEN_INDEX
    return jnp.where(valid, compacted, pad_id), valid
