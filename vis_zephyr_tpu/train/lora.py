"""LoRA adapters for Stage-2 finetuning.

Reference parity: peft LoRA wrap with r=128, α=256, dropout 0.05 on every
decoder linear except the vision tower, the projector and lm_head
(`vis_zephyr/train/train.py:224-243` find_all_linear_names + `:775-787`;
`script/finetune.sh:18-20`).

Mechanism: each targeted dense param dict gains `lora_a [K, r]`
(kaiming-ish init), `lora_b [r, N]` (zeros) and `lora_scale` (= α/r)
leaves; `ops.quant_matmul.qdot` adds `(x@A)@B * scale` at apply time, so no
model code changes and the adapters compose with int8 base weights (QLoRA
style). `trainable_mask(stage="2")` combined with `lora_trainable_mask`
restricts gradients to the adapter leaves. The reference's LoRA dropout
(0.05) is applied train-side: `train/steps.py` threads a per-step rng
into the forward and drops the LoRA-branch input; inference paths stay
dropout-free (peft eval-mode equivalent).

Stacked scan-layout layers ([L, ...] leading axis) get per-layer adapters
stacked the same way.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 128
    alpha: int = 256
    # Decoder attention + MLP linears; excludes tower/projector/lm_head
    # (reference find_all_linear_names exclusions).
    target_pattern: str = r"decoder/layers/(attn/(q|k|v|out)|mlp/(gate|up|down))$"


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def _dense_dims(p: Dict):
    kernel = p.get("kernel", p.get("kernel_q"))
    return kernel.shape  # [..., K, N] (possibly [L, K, N])


def add_lora(params: Dict, cfg: LoraConfig, key, dtype=jnp.float32) -> Dict:
    """Return params with LoRA leaves added to every targeted dense dict."""
    pattern = re.compile(cfg.target_pattern)
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy

    def walk(node, prefix, key):
        if isinstance(node, dict) and ("kernel" in node or "kernel_q" in node):
            if pattern.search(prefix):
                shape = _dense_dims(node)
                *lead, K, N = shape
                ka, _ = jax.random.split(jax.random.fold_in(key, hash(prefix) & 0x7FFFFFFF))
                node = dict(node)
                node["lora_a"] = (
                    jax.random.normal(ka, (*lead, K, cfg.r), dtype) * (1.0 / np.sqrt(K))
                )
                node["lora_b"] = jnp.zeros((*lead, cfg.r, N), dtype)
                # Per-layer scalar for stacked [L, ...] params so lax.scan
                # can slice it alongside the kernels.
                node["lora_scale"] = jnp.full(tuple(lead), cfg.alpha / cfg.r, dtype)
            return node
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k, key) for k, v in node.items()}
        return node

    return walk(out, "", key)


def lora_trainable_mask(params: Dict) -> Dict:
    """Boolean pytree: True only on lora_a / lora_b leaves."""
    def decide(path, _):
        leaf = str(getattr(path[-1], "key", ""))
        return leaf in ("lora_a", "lora_b")

    return jax.tree_util.tree_map_with_path(decide, params)


def merge_lora(params: Dict) -> Dict:
    """Fold adapters into the base kernels and strip the LoRA leaves
    (reference merge_and_unload path, `model/builder.py:90-95`). Quantized
    bases are dequantized to the adapter dtype first."""
    def walk(node):
        if isinstance(node, dict) and "lora_a" in node:
            node = dict(node)
            a, b, s = node.pop("lora_a"), node.pop("lora_b"), node.pop("lora_scale")
            delta = jnp.einsum("...kr,...rn->...kn", a, b) * s.reshape(s.shape + (1, 1))
            if "kernel_q" in node:
                base = node.pop("kernel_q").astype(a.dtype) * node.pop("scale").astype(a.dtype)
            else:
                base = node.pop("kernel")
            node["kernel"] = base + delta.astype(base.dtype)
            return node
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def split_lora(params: Dict):
    """(base_params, adapter_params) — adapters saved separately like the
    reference's adapter dir + non_lora_trainables.bin split
    (`train/train.py:933-951`)."""
    adapters: Dict = {}

    def walk(node, prefix):
        if isinstance(node, dict) and "lora_a" in node:
            node = dict(node)
            adapters[prefix] = {
                "lora_a": node.pop("lora_a"),
                "lora_b": node.pop("lora_b"),
                "lora_scale": node.pop("lora_scale"),
            }
            return node
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k) for k, v in node.items()}
        return node

    base = walk(params, "")
    return base, adapters


def attach_lora(params: Dict, adapters: Dict) -> Dict:
    """Inverse of split_lora."""
    def walk(node, prefix):
        if isinstance(node, dict) and prefix in adapters:
            return {**node, **adapters[prefix]}
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k) for k, v in node.items()}
        return node

    return walk(params, "")
