"""Image preprocessing: anyres tiling + CLIP normalization.

Two implementations with one contract:

- **Device path** (`anyres_preprocess`, `preprocess_mode`): jittable JAX —
  resize (anti-aliased lanczos3 ≈ PIL LANCZOS), center pad, tile crop and
  CLIP mean/std normalization all happen on the TPU, per the rebuild's
  north star (BASELINE.json: "the PIL/torchvision image path ... becomes
  fused on-device JAX/Pallas kernels"). Geometry (best-fit resolution,
  static tile grid) is picked host-side so shapes stay static — there are
  only 4 distinct grids per pinpoint set, so jit caching is cheap.

- **Host path** (`anyres_preprocess_host`): numpy+PIL, bit-matching the
  reference pipeline (`vis_zephyr/model/multi_scale_process.py:136-183` +
  CLIPImageProcessor semantics) for golden parity tests and CPU fallbacks.

Output contract for one image: `pixels [P_max, S, S, 3]` (NHWC, normalized;
slot 0 = global LANCZOS-resized image, then row-major tiles, zero padding)
and `patch_valid [P_max]`.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from . import anyres

# OpenAI CLIP normalization constants (CLIPImageProcessor defaults).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_normalize(pixels: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] float pixels in [0, 1] → CLIP-normalized."""
    mean = jnp.asarray(CLIP_MEAN, pixels.dtype)
    std = jnp.asarray(CLIP_STD, pixels.dtype)
    return (pixels - mean) / std


@functools.partial(jax.jit, static_argnames=("target_size", "best_fit", "patch_size", "max_patches"))
def anyres_preprocess(
    image: jnp.ndarray,
    target_size: int,
    best_fit: Tuple[int, int],
    patch_size: int,
    max_patches: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device anyres pipeline for one image.

    Args:
      image: [H, W, 3] uint8 or float (0..255).
      target_size: encoder input side (336).
      best_fit: (w, h) canvas from `anyres.select_best_fit_resolution`
        (static — chosen host-side from the original size).
      patch_size: tile side (== target_size for ViT-L/14-336).
      max_patches: static output slots (1 global + max tiles).

    Returns (pixels [max_patches, S, S, 3] float32 normalized,
             patch_valid [max_patches] bool).
    """
    img = image.astype(jnp.float32) / 255.0
    H, W = img.shape[0], img.shape[1]

    # Global view: plain resize to (S, S) (reference multi_scale_process.py:171).
    global_view = jax.image.resize(
        img, (target_size, target_size, 3), method="lanczos3", antialias=True
    )

    # Fit-within resize + centered zero padding to the best-fit canvas.
    tw, th = best_fit
    (nw, nh), (px, py) = anyres.resize_pad_geometry((W, H), (tw, th))
    resized = jax.image.resize(img, (nh, nw, 3), method="lanczos3", antialias=True)
    canvas = jnp.zeros((th, tw, 3), jnp.float32)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (py, px, 0))

    # Row-major tiling (static grid).
    gw, gh = tw // patch_size, th // patch_size
    tiles = canvas.reshape(gh, patch_size, gw, patch_size, 3)
    tiles = tiles.transpose(0, 2, 1, 3, 4).reshape(gh * gw, patch_size, patch_size, 3)

    patches = jnp.concatenate([global_view[None], tiles], axis=0)
    patches = jnp.clip(patches, 0.0, 1.0)
    patches = clip_normalize(patches)

    n = patches.shape[0]
    if n > max_patches:
        raise ValueError(f"grid produces {n} patches > max_patches={max_patches}")
    pad = jnp.zeros((max_patches - n,) + patches.shape[1:], patches.dtype)
    valid = jnp.arange(max_patches) < n
    return jnp.concatenate([patches, pad], axis=0), valid


def anyres_preprocess_host(
    pil_image,
    grid_pinpoints,
    target_size: int = 336,
    max_patches: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Reference-exact host pipeline (PIL LANCZOS, black pad, tile, CLIP
    normalize). Returns the same contract as `anyres_preprocess` but NHWC
    numpy (reference `multi_scale_process.py:136-183`)."""
    from PIL import Image

    pinpoints = anyres.parse_grid_pinpoints(grid_pinpoints)
    if max_patches is None:
        max_patches = anyres.max_anyres_patches(pinpoints, target_size)

    best_fit = anyres.select_best_fit_resolution(pil_image.size, pinpoints)
    (nw, nh), (px, py) = anyres.resize_pad_geometry(pil_image.size, best_fit)
    resized = pil_image.resize((nw, nh), Image.Resampling.LANCZOS)
    canvas = Image.new("RGB", best_fit, (0, 0, 0))
    canvas.paste(resized, (px, py))

    crops = [
        canvas.crop(box) for box in anyres.tile_boxes(best_fit, target_size)
    ]
    global_view = pil_image.resize((target_size, target_size), Image.Resampling.LANCZOS)
    patches = [global_view] + crops

    arr = np.stack([np.asarray(p, dtype=np.float32) / 255.0 for p in patches])
    arr = (arr - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)

    n = arr.shape[0]
    out = np.zeros((max_patches,) + arr.shape[1:], np.float32)
    out[:n] = arr
    valid = np.arange(max_patches) < n
    return out, valid


def expand2square_host(pil_image, background_color):
    """Pad to square with a background color (reference `mm_utils.py:16-36`)."""
    from PIL import Image

    w, h = pil_image.size
    if w == h:
        return pil_image
    side = max(w, h)
    result = Image.new(pil_image.mode, (side, side), background_color)
    result.paste(pil_image, ((side - w) // 2, (side - h) // 2))
    return result


def preprocess_mode_host(pil_image, mode: str, target_size: int = 336) -> np.ndarray:
    """Non-anyres modes (reference `mm_utils.py:38-87` process_images):
    'pad' → expand2square(mean color); 'resize' → direct resize;
    'square' → center crop to the short side. Returns [S, S, 3] normalized."""
    from PIL import Image

    if mode == "pad":
        bg = tuple(int(x * 255) for x in CLIP_MEAN)
        img = expand2square_host(pil_image, bg)
    elif mode == "resize":
        img = pil_image
    elif mode == "square":
        w, h = pil_image.size
        s = min(w, h)
        left, top = (w - s) // 2, (h - s) // 2
        img = pil_image.crop((left, top, left + s, top + s))
    else:
        img = pil_image

    # CLIPImageProcessor: shortest edge → target (bicubic), center crop,
    # rescale, normalize.
    w, h = img.size
    scale = target_size / min(w, h)
    img = img.resize((max(1, round(w * scale)), max(1, round(h * scale))), Image.Resampling.BICUBIC)
    w, h = img.size
    left, top = (w - target_size) // 2, (h - target_size) // 2
    img = img.crop((left, top, left + target_size, top + target_size))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return (arr - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)
