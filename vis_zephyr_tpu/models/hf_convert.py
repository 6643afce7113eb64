"""Converters from HuggingFace checkpoints to vis_zephyr_tpu param pytrees.

Covers the three checkpoint surfaces the reference loads
(`vis_zephyr/model/builder.py:16-160`):
- CLIP vision tower (`CLIPVisionModel` state dict / safetensors),
- the Q-Former `mm_projector.bin` (torch-saved dict with `mm_projector.`
  key prefix, reference `builder.py:118-120`),
- Mistral/Zephyr decoder weights.

torch is imported lazily so the core framework has no torch dependency;
state dicts may be passed directly as `{name: np.ndarray}` too.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

from ..config import DecoderConfig, ProjectorConfig, VisionConfig


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor
    return x.detach().to("cpu").float().numpy()


def _dense(sd: Mapping, prefix: str, dtype) -> Dict:
    """torch Linear → {kernel [in,out], bias [out]}."""
    out = {"kernel": jnp.asarray(_np(sd[prefix + ".weight"]).T, dtype)}
    if prefix + ".bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[prefix + ".bias"]), dtype)
    return out


def _ln(sd: Mapping, prefix: str, dtype) -> Dict:
    return {
        "scale": jnp.asarray(_np(sd[prefix + ".weight"]), dtype),
        "bias": jnp.asarray(_np(sd[prefix + ".bias"]), dtype),
    }


def _stack(dicts):
    """List of structurally identical pytrees → one pytree with leading L axis."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *dicts)


# ---------------------------------------------------------------------------
# CLIP vision tower
# ---------------------------------------------------------------------------

def convert_clip_vision(state_dict: Mapping, cfg: VisionConfig, dtype=jnp.float32) -> Dict:
    """HF CLIPVisionModel state dict → `clip_vit_forward` params.

    Accepts keys with or without the `vision_model.` prefix.
    """
    sd = dict(state_dict)
    if any(k.startswith("vision_model.") for k in sd):
        sd = {k[len("vision_model."):]: v for k, v in sd.items() if k.startswith("vision_model.")}

    # Patch conv [D, 3, ph, pw] → [ph*pw*3, D] matching row-major patchify
    # (patch pixel (ph, pw, c) flattened index = ph*P*3 + pw*3 + c).
    conv = _np(sd["embeddings.patch_embedding.weight"])
    patch_kernel = jnp.asarray(conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0]), dtype)

    layers = []
    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        layers.append(
            {
                "ln1": _ln(sd, f"{p}.layer_norm1", dtype),
                "ln2": _ln(sd, f"{p}.layer_norm2", dtype),
                "attn": {
                    "q": _dense(sd, f"{p}.self_attn.q_proj", dtype),
                    "k": _dense(sd, f"{p}.self_attn.k_proj", dtype),
                    "v": _dense(sd, f"{p}.self_attn.v_proj", dtype),
                    "out": _dense(sd, f"{p}.self_attn.out_proj", dtype),
                },
                "fc1": _dense(sd, f"{p}.mlp.fc1", dtype),
                "fc2": _dense(sd, f"{p}.mlp.fc2", dtype),
            }
        )

    return {
        "embeddings": {
            "class_embedding": jnp.asarray(_np(sd["embeddings.class_embedding"]), dtype),
            "patch_kernel": patch_kernel,
            "position_embedding": jnp.asarray(
                _np(sd["embeddings.position_embedding.weight"]), dtype
            ),
        },
        "pre_ln": _ln(sd, "pre_layrnorm", dtype),  # (sic) HF key spelling
        "layers": _stack(layers),
    }


# ---------------------------------------------------------------------------
# Q-Former projector (mm_projector.bin)
# ---------------------------------------------------------------------------

def _mha_in_proj(sd: Mapping, prefix: str, embed_dim: int, dtype, kv_dim=None) -> Dict:
    """torch nn.MultiheadAttention → separate q/k/v/out dense params.

    Same-dim attention packs q/k/v into `in_proj_weight` [3D, D]; when
    kdim/vdim differ it uses separate `q_proj_weight`/`k_proj_weight`/
    `v_proj_weight`. Bias is always packed `in_proj_bias` [3D].
    """
    if prefix + ".in_proj_weight" in sd:
        w = _np(sd[prefix + ".in_proj_weight"])
        qw, kw, vw = np.split(w, 3, axis=0)
    else:
        qw = _np(sd[prefix + ".q_proj_weight"])
        kw = _np(sd[prefix + ".k_proj_weight"])
        vw = _np(sd[prefix + ".v_proj_weight"])
    b = _np(sd[prefix + ".in_proj_bias"])
    qb, kb, vb = np.split(b, 3, axis=0)
    return {
        "q": {"kernel": jnp.asarray(qw.T, dtype), "bias": jnp.asarray(qb, dtype)},
        "k": {"kernel": jnp.asarray(kw.T, dtype), "bias": jnp.asarray(kb, dtype)},
        "v": {"kernel": jnp.asarray(vw.T, dtype), "bias": jnp.asarray(vb, dtype)},
        "out": _dense(sd, prefix + ".out_proj", dtype),
    }


def convert_qformer(state_dict: Mapping, cfg: ProjectorConfig, dtype=jnp.float32) -> Dict:
    """Q-Former torch state dict → `qformer_forward` params.

    Accepts raw keys or `mm_projector.`-prefixed keys (as saved in
    `mm_projector.bin`, reference `vis_zephyr_arch.py:95-102`).
    """
    sd = dict(state_dict)
    if any("mm_projector." in k for k in sd):
        # Keys may carry any outer prefix, e.g. "model.mm_projector.blocks..."
        # (reference get_w splits on the keyword, `vis_zephyr_arch.py:98-100`).
        sd = {
            k.split("mm_projector.", 1)[1]: v
            for k, v in sd.items()
            if "mm_projector." in k
        }

    blocks = []
    for i in range(cfg.num_blocks):
        p = f"blocks.{i}"
        blocks.append(
            {
                "norm1": _ln(sd, f"{p}.norm1", dtype),
                "self_attn": _mha_in_proj(sd, f"{p}.self_attn", cfg.hidden_size, dtype),
                "norm2": _ln(sd, f"{p}.norm2", dtype),
                "cross_attn": _mha_in_proj(
                    sd, f"{p}.cross_attn", cfg.hidden_size, dtype, kv_dim=cfg.visual_hidden_size
                ),
                "norm3": _ln(sd, f"{p}.norm3", dtype),
                "fc1": _dense(sd, f"{p}.ffn.0", dtype),
                "fc2": _dense(sd, f"{p}.ffn.2", dtype),
            }
        )

    return {
        "queries": jnp.asarray(_np(sd["learned_queries"]), dtype),
        "pre_norm": _ln(sd, "pre_norm", dtype),
        "final_norm": _ln(sd, "norm", dtype),
        "blocks": _stack(blocks),
    }


# ---------------------------------------------------------------------------
# Mistral / Zephyr decoder
# ---------------------------------------------------------------------------

def convert_mistral(state_dict: Mapping, cfg: DecoderConfig, dtype=jnp.float32) -> Dict:
    """HF MistralForCausalLM state dict → `mistral_forward` params."""
    sd = dict(state_dict)
    # Tolerate either `model.` prefixed (ForCausalLM) or bare keys.
    def key(name):
        return name if name in sd else "model." + name

    def rms(prefix):
        return {"scale": jnp.asarray(_np(sd[key(prefix + ".weight")]), dtype)}

    def lin(prefix):
        return {"kernel": jnp.asarray(_np(sd[key(prefix + ".weight")]).T, dtype)}

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}" if f"model.layers.{i}.input_layernorm.weight" in sd else f"layers.{i}"
        layers.append(
            {
                "input_ln": {"scale": jnp.asarray(_np(sd[f"{p}.input_layernorm.weight"]), dtype)},
                "post_attn_ln": {
                    "scale": jnp.asarray(_np(sd[f"{p}.post_attention_layernorm.weight"]), dtype)
                },
                "attn": {
                    "q": {"kernel": jnp.asarray(_np(sd[f"{p}.self_attn.q_proj.weight"]).T, dtype)},
                    "k": {"kernel": jnp.asarray(_np(sd[f"{p}.self_attn.k_proj.weight"]).T, dtype)},
                    "v": {"kernel": jnp.asarray(_np(sd[f"{p}.self_attn.v_proj.weight"]).T, dtype)},
                    "out": {"kernel": jnp.asarray(_np(sd[f"{p}.self_attn.o_proj.weight"]).T, dtype)},
                },
                "mlp": {
                    "gate": {"kernel": jnp.asarray(_np(sd[f"{p}.mlp.gate_proj.weight"]).T, dtype)},
                    "up": {"kernel": jnp.asarray(_np(sd[f"{p}.mlp.up_proj.weight"]).T, dtype)},
                    "down": {"kernel": jnp.asarray(_np(sd[f"{p}.mlp.down_proj.weight"]).T, dtype)},
                },
            }
        )

    return {
        "embed_tokens": jnp.asarray(_np(sd[key("embed_tokens.weight")]), dtype),
        "final_ln": rms("norm"),
        "lm_head": {"kernel": jnp.asarray(_np(sd["lm_head.weight"]).T, dtype)},
        "layers": _stack(layers),
    }


# peft module name → our param path under "decoder/layers".
_PEFT_MODULE_MAP = {
    "self_attn.q_proj": "attn/q",
    "self_attn.k_proj": "attn/k",
    "self_attn.v_proj": "attn/v",
    "self_attn.o_proj": "attn/out",
    "mlp.gate_proj": "mlp/gate",
    "mlp.up_proj": "mlp/up",
    "mlp.down_proj": "mlp/down",
}


def convert_lora_adapters(
    state_dict: Mapping, cfg: DecoderConfig, r: int, alpha: float, dtype=jnp.float32
) -> Dict[str, Dict]:
    """peft `adapter_model.bin` → `train.lora.attach_lora` adapter dict.

    peft keys look like
    `base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight`
    with A [r, in] / B [out, r] (torch layout); ours are stacked
    `lora_a [L, in, r]` / `lora_b [L, r, out]` + per-layer `lora_scale`
    (reference load path: `vis_zephyr/model/builder.py:88-95` PeftModel +
    merge_and_unload).
    """
    # Normalize keys down to "layers.{i}.{module}.lora_{A,B}.weight".
    sd = {}
    for k, v in state_dict.items():
        idx = k.find("layers.")
        if idx >= 0 and ".lora_" in k:
            sd[k[idx:]] = _np(v)

    adapters: Dict[str, Dict] = {}
    for module, path in _PEFT_MODULE_MAP.items():
        a_per_layer, b_per_layer = [], []
        for i in range(cfg.num_layers):
            ka = f"layers.{i}.{module}.lora_A.weight"
            kb = f"layers.{i}.{module}.lora_B.weight"
            if ka not in sd:
                break
            a_per_layer.append(sd[ka].T)  # [in, r]
            b_per_layer.append(sd[kb].T)  # [r, out]
        if not a_per_layer:
            continue
        if len(a_per_layer) != cfg.num_layers:
            raise ValueError(
                f"adapter for {module} covers {len(a_per_layer)} of "
                f"{cfg.num_layers} layers"
            )
        adapters[f"decoder/layers/{path}"] = {
            "lora_a": jnp.asarray(np.stack(a_per_layer), dtype),
            "lora_b": jnp.asarray(np.stack(b_per_layer), dtype),
            "lora_scale": jnp.full((cfg.num_layers,), alpha / r, dtype),
        }
    if not adapters:
        raise ValueError("no LoRA adapter weights recognized in state dict")
    return adapters


def load_torch_bin(path: str) -> Dict[str, np.ndarray]:
    """Load a torch-saved state dict (e.g. mm_projector.bin) as numpy."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in raw.items()}
