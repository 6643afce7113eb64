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


def _has_lora(params: Dict) -> bool:
    return any(
        str(getattr(p[-1], "key", "")) == "lora_a"
        for p, _ in jax.tree_util.tree_leaves_with_path(params)
    )


def _load_native(model_path: str, dtype) -> Dict:
    """Restore a native orbax dir as saved (no target tree): handles plain
    inference params, full train states ({"params", "opt_state", "step"}),
    and stage-2 LoRA states — adapters are merged into the base kernels for
    serving (reference merge_and_unload, `model/builder.py:90-95`)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        raw = ckptr.restore(os.path.abspath(os.path.join(model_path, "state")))
    params = raw.get("params", raw) if isinstance(raw, dict) else raw
    if _has_lora(params):
        from ..train.lora import merge_lora

        params = merge_lora(params)
    # Cast float leaves to the serving dtype; quantized int8 kernels and
    # integer buffers keep their dtypes.
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else jnp.asarray(x),
        params,
    )


def _load_lora_artifact(
    model_path: str, model_base: str, vision_tower_path: Optional[str],
    cfg: VisZephyrConfig, dtype,
) -> Dict:
    """Reference stage-2 artifact: HF base + peft adapter dir +
    `non_lora_trainables.bin` (`vis_zephyr/model/builder.py:53-95`): load
    the base decoder, overlay non-LoRA trainables (projector, possibly
    embeddings), attach + merge the adapters."""
    import json as _json

    from ..train.lora import attach_lora, merge_lora
    from .hf_convert import convert_lora_adapters

    params = {"decoder": convert_mistral(_load_hf_state_dict(model_base), cfg.decoder, dtype)}
    if vision_tower_path:
        params["vision"] = convert_clip_vision(
            _load_hf_state_dict(vision_tower_path), cfg.vision, dtype
        )

    nlt_path = os.path.join(model_path, "non_lora_trainables.bin")
    if os.path.exists(nlt_path):
        nlt = load_torch_bin(nlt_path)
        # Key cleanup as in the reference (DeepSpeed/FSDP prefixes).
        nlt = {(k[len("base_model."):] if k.startswith("base_model.") else k): v
               for k, v in nlt.items()}
        if any(k.startswith("model.model.") for k in nlt):
            nlt = {(k[len("model."):] if k.startswith("model.model.") else k): v
                   for k, v in nlt.items()}
        if any("mm_projector." in k for k in nlt):
            params["projector"] = convert_qformer(nlt, cfg.projector, dtype)
        emb = next((k for k in nlt if k.endswith("embed_tokens.weight")), None)
        if emb is not None:  # resized-embedding finetunes
            params["decoder"]["embed_tokens"] = jnp.asarray(nlt[emb], dtype)
        head = next((k for k in nlt if k.endswith("lm_head.weight")), None)
        if head is not None:
            params["decoder"]["lm_head"] = {"kernel": jnp.asarray(nlt[head].T, dtype)}

    adapters = _read_adapter(model_path, cfg, dtype)
    return merge_lora(attach_lora(params, adapters))


def _read_adapter(model_path: str, cfg: VisZephyrConfig, dtype) -> Dict:
    """Read one peft adapter dir → `convert_lora_adapters` output (keys
    "decoder/layers/<target>" with stacked per-layer A/B/scale)."""
    import json as _json

    from .hf_convert import convert_lora_adapters

    r, alpha = 128, 256.0  # reference script/finetune.sh defaults
    acfg_path = os.path.join(model_path, "adapter_config.json")
    if os.path.exists(acfg_path):
        with open(acfg_path) as f:
            acfg = _json.load(f)
        r = int(acfg.get("r", r))
        alpha = float(acfg.get("lora_alpha", alpha))

    afile = next(
        (p for p in (os.path.join(model_path, "adapter_model.safetensors"),
                     os.path.join(model_path, "adapter_model.bin"))
         if os.path.exists(p)),
        None,
    )
    if afile is None:
        raise FileNotFoundError(f"no adapter_model.(safetensors|bin) under {model_path}")
    if afile.endswith(".safetensors"):
        from safetensors import safe_open

        with safe_open(afile, framework="np") as f:
            asd = {k: f.get_tensor(k) for k in f.keys()}
    else:
        asd = load_torch_bin(afile)
    return convert_lora_adapters(asd, cfg.decoder, r=r, alpha=alpha, dtype=dtype)


def load_lora_pack(adapter_dirs: Dict[str, str], cfg: VisZephyrConfig,
                   dtype=jnp.float32):
    """Load MANY peft adapter dirs for multi-LoRA serving (`ops/mlora.py`).

    `adapter_dirs`: ordered {name: dir}. Returns (pack, {name: index})
    with index 0 reserved for the base model. Adapters may differ in rank
    (zero-padded) and in adapted targets (union). Net-new vs the reference
    (it merges exactly one adapter at load, `model/builder.py:88-95`)."""
    from ..ops.mlora import build_pack

    adapters, names = [], {}
    for i, (name, d) in enumerate(adapter_dirs.items(), start=1):
        adapters.append(_read_adapter(d, cfg, dtype))
        names[name] = i
    return build_pack(adapters, cfg.decoder.num_layers, dtype), names


def _convert_consolidated(sd: Dict, cfg: VisZephyrConfig, dtype) -> Dict:
    """One HF-style dir carrying the full VisZephyr model (reference
    `builder.py:123-129`): decoder (+ projector + vision tower when saved)."""
    params = {"decoder": convert_mistral(
        {k: v for k, v in sd.items() if "mm_projector." not in k and "vision_tower." not in k},
        cfg.decoder, dtype,
    )}
    if any("mm_projector." in k for k in sd):
        params["projector"] = convert_qformer(sd, cfg.projector, dtype)
    tower = {
        k.rsplit("vision_tower.", 1)[1]: v for k, v in sd.items() if "vision_tower." in k
    }
    if tower:
        params["vision"] = convert_clip_vision(tower, cfg.vision, dtype)
    return params


def load_pretrained_model(
    model_path: str,
    model_base: Optional[str] = None,
    vision_tower_path: Optional[str] = None,
    load_8bit: bool = False,
    load_4bit: bool = False,
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
            # An HF-style config (reference checkpoint dir): keep defaults —
            # they encode the same released architecture — but say so, and
            # refuse configs that plainly describe a different model.
            import json as _json
            import warnings

            hf = _json.loads(raw)
            declared_layers = hf.get("num_hidden_layers")
            if declared_layers is not None and declared_layers != cfg.decoder.num_layers:
                raise ValueError(
                    f"{cfg_file} is an HF config for a {declared_layers}-layer "
                    f"model; the built-in defaults describe "
                    f"{cfg.decoder.num_layers} layers — pass a VisZephyrConfig "
                    f"config.json instead"
                )
            warnings.warn(
                f"{cfg_file} is not a VisZephyrConfig; using built-in "
                "Zephyr-7B defaults (architecture fields matched)"
            )
            cfg = VisZephyrConfig()

    tokenizer = None
    tok_src = tokenizer_path or model_base or model_path
    if os.environ.get("VZT_NATIVE_TOKENIZER") == "1" and not (
        cfg.mm_use_im_start_end or cfg.mm_use_im_patch_token
    ):  # image-placeholder special tokens need HF's added-token machinery
        # Opt-in native C++ BPE tokenizer: drops transformers from the
        # serving path (GIL-free encode under the batcher's threads).
        try:
            from ..data.tokenizer_native import NativeTokenizer

            tokenizer = NativeTokenizer(
                model_dir=tok_src,
                bos_token_id=cfg.decoder.bos_token_id,
                eos_token_id=cfg.decoder.eos_token_id,
                pad_token_id=cfg.decoder.pad_token_id,
                model_max_length=cfg.tokenizer_model_max_length,
            )
        except Exception as e:  # noqa: BLE001 — fall back to HF below
            import warnings

            warnings.warn(f"native tokenizer unavailable ({e}); using HF")
            tokenizer = None
    if tokenizer is None:
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(tok_src, use_fast=True)
        except Exception:  # noqa: BLE001 — tokenizer optional for param-only use
            tokenizer = None

    native = os.path.join(model_path, "state")
    adapter_files = glob.glob(os.path.join(model_path, "adapter_model.*"))
    if os.path.isdir(native):
        params = _load_native(model_path, dtype)
    elif adapter_files and model_base:
        params = _load_lora_artifact(model_path, model_base, vision_tower_path, cfg, dtype)
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
            # Consolidated single-dir checkpoint: full VisZephyr weights in
            # one HF-style dir, no model_base (reference `builder.py:123-129`).
            try:
                sd = _load_hf_state_dict(model_path)
            except FileNotFoundError:
                raise FileNotFoundError(
                    f"{model_path}: neither a native checkpoint, a LoRA "
                    f"artifact (+model_base), nor HF weights found"
                ) from None
            params = _convert_consolidated(sd, cfg, dtype)

    # Checkpoints trained with image placeholder tokens need the tokenizer
    # and embedding tables aligned at load (reference `builder.py:140-153`).
    # No-op when the saved tables were already resized.
    if tokenizer is not None and (cfg.mm_use_im_start_end or cfg.mm_use_im_patch_token):
        from .vis_zephyr import initialize_vision_tokenizer

        params, _ = initialize_vision_tokenizer(
            params, tokenizer,
            mm_use_im_patch_token=cfg.mm_use_im_patch_token,
            mm_use_im_start_end=cfg.mm_use_im_start_end,
        )

    if load_8bit or load_4bit:
        # load_4bit → int4 weight-only with group-128 scales (the
        # reference's bitsandbytes NF4 option, `builder.py:33-45`); the
        # projector stays int8 (small, quality-sensitive cross-attention).
        from ..ops.quant import quantize_decoder_layers, quantize_qformer

        if "decoder" in params:
            params["decoder"] = quantize_decoder_layers(
                params["decoder"], bits=4 if load_4bit else 8
            )
        if "projector" in params:
            params["projector"] = quantize_qformer(params["projector"])

    context_len = cfg.tokenizer_model_max_length
    return tokenizer, params, cfg, context_len
