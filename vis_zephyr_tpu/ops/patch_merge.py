"""Spatial / spatial_unpad patch merging of per-crop projected tokens —
static shapes, entirely inside XLA.

Behavioral parity target: reference `_process_image_patches`
(`vis_zephyr/model/vis_zephyr_arch.py:396-473`):

- `flat`: concatenate each crop's tokens (handled inline by the caller).
- `spatial`: tiles (crops after the global view) are arranged into their
  2-D anyres grid — token (r, c) of the full `gh*tps × gw*tps` feature map
  comes from tile `(r//tps, c//tps)`, cell `(r%tps, c%tps)` — flattened
  row-major and appended after the global crop's tokens.
- `spatial_unpad`: additionally crop the grid back to the original aspect
  ratio (undo letterboxing; geometry = `data.anyres.unpad_slice`) and append
  a learned `image_newline` token after every row.

The reference does this per sample in torch with dynamic shapes (a host
loop). Here each output cell of a static `[GH, GW(+1)]` enumeration grid
computes its source tile/token by integer math, validity comes from the
per-sample crop box, and a stable argsort compacts valid cells to the front
in row-major order — one gather per sample, no dynamic shapes. Per-sample
geometry (grid width, crop box) is host-computed by `spatial_merge_info`
and enters the graph as a tiny int vector, keeping XLA shapes static.

NOTE: with the reference's Q-Former projector these paths are unreachable
(32 tokens cannot form the `tps×tps` grid; its `h*w == base.shape[0]`
assert fails, SURVEY §2.4.4) — they require `mm_projector_type=mlp2x_gelu`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VisZephyrConfig
from ..data.anyres import calculate_grid_shape, parse_grid_pinpoints, unpad_slice


def merge_grid_bounds(cfg: VisZephyrConfig) -> Tuple[int, int, int]:
    """Static (GH, GW, M_grid): max grid height/width in feature cells over
    the pinpoint set, and the max merged-grid token count (crop area plus
    the newline column under unpad)."""
    tps = cfg.vision.tokens_per_side
    side = cfg.vision.image_size
    nl = 1 if "unpad" in cfg.mm_patch_merge_type else 0
    gh_max = gw_max = 1
    m_grid = nl  # single-image unpad appends one newline token
    for w, h in parse_grid_pinpoints(cfg.mm_grid_pinpoints):
        gh, gw = (h // side) * tps, (w // side) * tps
        gh_max, gw_max = max(gh_max, gh), max(gw_max, gw)
        m_grid = max(m_grid, gh * (gw + nl))
    return gh_max, gw_max, m_grid


def merge_info_host(
    original_size: Tuple[int, int],
    grid_pinpoints,
    image_size: int,
    tokens_per_side: int,
    merge_type: str,
    n_patches: Optional[int] = None,
) -> np.ndarray:
    """Host-side per-sample merge geometry → int32 `[gw, rows, cols, y0, x0]`.

    `gw` is the tile-grid width (tiles, not cells); `rows/cols` the merged
    grid-region size in feature cells; `(y0, x0)` the unpad crop offset into
    the padded `gh*tps × gw*tps` map. `n_patches<=1` marks a tile-less image
    (aspect modes pad/square): the grid region is empty except for one
    newline token under unpad (reference `vis_zephyr_arch.py:462-468`).
    """
    tps = tokens_per_side
    unpad = "unpad" in merge_type
    if n_patches is not None and n_patches <= 1:
        return np.array([0, 1 if unpad else 0, 0, 0, 0], np.int32)
    gw, gh = calculate_grid_shape(tuple(original_size), grid_pinpoints, image_size)
    cur = (gw * tps, gh * tps)  # (w, h) of the padded feature map
    if unpad:
        w_sl, h_sl = unpad_slice(tuple(original_size), cur)
        x0 = w_sl.start or 0
        y0 = h_sl.start or 0
        cols = (w_sl.stop if w_sl.stop is not None else cur[0]) - x0
        rows = (h_sl.stop if h_sl.stop is not None else cur[1]) - y0
    else:
        x0 = y0 = 0
        cols, rows = cur
    return np.array([gw, rows, cols, y0, x0], np.int32)


def spatial_merge_info(
    original_size: Tuple[int, int],
    cfg: VisZephyrConfig,
    n_patches: Optional[int] = None,
) -> np.ndarray:
    """`merge_info_host` driven by a model config."""
    return merge_info_host(
        original_size, cfg.mm_grid_pinpoints, cfg.vision.image_size,
        cfg.vision.tokens_per_side, cfg.mm_patch_merge_type, n_patches,
    )


def spatial_merge(
    projected: jnp.ndarray,     # [B, P, tps*tps, D] per-crop projected tokens
    merge_info: jnp.ndarray,    # [B, 5] from spatial_merge_info
    cfg: VisZephyrConfig,
    image_newline: Optional[jnp.ndarray] = None,  # [D], required for unpad
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge per-crop token grids into per-sample sequences.

    Returns (image_embeds [B, tps² + M_grid, D], num_image_tokens [B]):
    global-crop tokens first, then the (cropped) spatial grid row-major with
    newline separators under unpad — valid tokens compacted to the front,
    matching the splice contract.
    """
    B, P, TPI, D = projected.shape
    tps = cfg.vision.tokens_per_side
    if TPI != tps * tps:
        raise ValueError(
            f"spatial merge needs per-cell tokens ({tps}²={tps*tps}/crop), "
            f"got {TPI} — use mm_projector_type=mlp2x_gelu "
            f"(the Q-Former's {TPI} queries cannot form the grid; reference "
            f"asserts likewise, vis_zephyr_arch.py:423-424)"
        )
    unpad = "unpad" in cfg.mm_patch_merge_type
    if unpad and image_newline is None:
        raise ValueError("spatial_unpad requires the image_newline parameter")
    GH, GW, M = merge_grid_bounds(cfg)
    W_enum = GW + (1 if unpad else 0)

    r = jnp.arange(GH)[:, None]
    c = jnp.arange(W_enum)[None, :]

    def merge_one(tokens, info):
        gw, rows, cols, y0, x0 = (info[i] for i in range(5))
        src_r, src_c = y0 + r, x0 + c
        is_nl = (c == cols) if unpad else jnp.zeros((1, W_enum), bool)
        width = cols + (1 if unpad else 0)
        valid = (r < rows) & (c < width)
        tile = (src_r // tps) * gw + (src_c // tps)
        cell = (src_r % tps) * tps + (src_c % tps)
        src = tile * TPI + cell  # into the flattened tile tokens

        flat_valid = valid.reshape(-1)
        # Stable sort floats valid cells to the front in row-major order
        # (the reference's flatten order).
        order = jnp.argsort(~flat_valid, stable=True)[:M]
        sel_src = src.reshape(-1)[order]
        sel_nl = jnp.broadcast_to(is_nl, (GH, W_enum)).reshape(-1)[order]
        sel_valid = flat_valid[order]

        if P > 1:
            tiles = tokens[1:].reshape((P - 1) * TPI, D)
        else:  # tile-less batch: grid region is newline-only / empty
            tiles = jnp.zeros((TPI, D), tokens.dtype)
        rows_d = tiles[jnp.clip(sel_src, 0, tiles.shape[0] - 1)]
        if unpad:
            rows_d = jnp.where(
                sel_nl[:, None], image_newline[None].astype(rows_d.dtype), rows_d
            )
        rows_d = jnp.where(sel_valid[:, None], rows_d, jnp.zeros((), rows_d.dtype))
        count = TPI + rows * width
        return jnp.concatenate([tokens[0], rows_d], axis=0), count

    embeds, counts = jax.vmap(merge_one)(projected, merge_info)
    return embeds, counts.astype(jnp.int32)
