"""Model loading: the `load_pretrained_model` surface.

Reference: `vis_zephyr/model/builder.py:16-160` with three load paths
(LoRA-merged, base + mm_projector.bin, consolidated). Here the equivalents:

1. **Framework-native** — a directory with `config.json` (our
   `VisZephyrConfig`) + an orbax checkpoint: fast path.
2. **HF interop** — HF Zephyr/Mistral weights (safetensors or torch .bin) +
   CLIP vision weights + the released `mm_projector.bin`: converted on load
   via `hf_convert`, with `load_8bit` mapping to int8 weight-only
   quantization (the reference's bitsandbytes option,
   `builder.py:33-45`).

Returns `(tokenizer, params, cfg, context_len)` mirroring the reference's
`(tokenizer, model, image_processor, context_len)` — the image processor is
subsumed by `data.image_pipeline` (CLIP constants live there).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import VisZephyrConfig
from .hf_convert import convert_clip_vision, convert_mistral, convert_qformer, load_torch_bin
from .vis_zephyr import init_vis_zephyr


def _load_hf_state_dict(model_dir: str) -> Dict:
    """Read all safetensors/bin shards in a directory into one numpy dict."""
    sd = {}
    safes = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if safes:
        from safetensors import safe_open

        for shard in safes:
            with safe_open(shard, framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        return sd
    bins = sorted(glob.glob(os.path.join(model_dir, "pytorch_model*.bin")))
    for shard in bins:
        sd.update(load_torch_bin(shard))
    if not sd:
        raise FileNotFoundError(f"no safetensors/bin weights under {model_dir}")
    return sd


def load_pretrained_model(
    model_path: str,
    model_base: Optional[str] = None,
    vision_tower_path: Optional[str] = None,
    load_8bit: bool = False,
    dtype=jnp.bfloat16,
    tokenizer_path: Optional[str] = None,
) -> Tuple[object, Dict, VisZephyrConfig, int]:
    """Load tokenizer + params + config.

    - `model_path` with an orbax `state`/`params` dir → native path.
    - otherwise `model_base` (HF Zephyr dir) + `model_path/mm_projector.bin`
      (+ `vision_tower_path` HF CLIP dir) → converted HF path
      (reference `builder.py:102-120`).
    """
    cfg = VisZephyrConfig()
    cfg_file = os.path.join(model_path, "config.json")
    if os.path.exists(cfg_file):
        with open(cfg_file) as f:
            raw = f.read()
        try:
            cfg = VisZephyrConfig.from_json(raw)
        except TypeError:
            # An HF-style config (reference checkpoint dir): keep defaults,
            # they encode the same released architecture.
            cfg = VisZephyrConfig()

    tokenizer = None
    tok_src = tokenizer_path or model_base or model_path
    try:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(tok_src, use_fast=True)
    except Exception:  # noqa: BLE001 — tokenizer optional for param-only use
        tokenizer = None

    native = os.path.join(model_path, "state")
    if os.path.isdir(native):
        from ..train.checkpoints import load_checkpoint

        params = init_vis_zephyr(cfg, jax.random.PRNGKey(0), dtype=dtype)
        params = load_checkpoint(model_path, {"params": params})["params"]
    else:
        params = {}
        if model_base:
            params["decoder"] = convert_mistral(_load_hf_state_dict(model_base), cfg.decoder, dtype)
        if vision_tower_path:
            params["vision"] = convert_clip_vision(
                _load_hf_state_dict(vision_tower_path), cfg.vision, dtype
            )
        proj_bin = os.path.join(model_path, "mm_projector.bin")
        if os.path.exists(proj_bin):
            params["projector"] = convert_qformer(load_torch_bin(proj_bin), cfg.projector, dtype)
        if not params:
            raise FileNotFoundError(
                f"{model_path}: neither a native checkpoint nor HF weights found"
            )

    if load_8bit:
        from ..ops.quant import quantize_decoder_layers, quantize_qformer

        if "decoder" in params:
            params["decoder"] = quantize_decoder_layers(params["decoder"])
        if "projector" in params:
            params["projector"] = quantize_qformer(params["projector"])

    context_len = cfg.tokenizer_model_max_length
    return tokenizer, params, cfg, context_len
