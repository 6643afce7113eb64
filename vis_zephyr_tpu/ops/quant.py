"""Weight-only int8 / int4 quantization for decoder matmuls.

TPU-native replacement for the reference's bitsandbytes 4/8-bit inference
loading (`vis_zephyr/model/builder.py:33-45`): kernels are stored int8 with
per-output-channel float scales — or int4 (two nibbles per byte) with
per-K-group scales — and dequantized at the matmul (`w ≈ w_q * scale`). On
v5e this halves (int8) or quarters (int4) weight HBM traffic vs bf16 — the
decode hot loop is weight-bandwidth-bound — and makes Zephyr-7B (+KV cache)
fit a single 16 GB chip.

Param forms (`maybe_dequant` / `quant_matmul.qdot` accept any):
- raw:  {"kernel": [.., K, N]}
- int8: {"kernel_q": int8 [.., K, N], "scale": f32 [.., 1, N]}
- int4: {"kernel_q4": int8 [.., K/2, N], "scale4": f32 [.., K/group, N]} —
  group-wise scales along K (default 128) keep 4-bit quality. Packing is
  per-group half-split: within each K-group, the group's first half of
  rows live in the low nibbles and the second half in the high nibbles of
  the same bytes. Both nibbles of a byte share one scale group, and a
  kernel reading one group's packed panel can unpack with two shifts and
  one sublane concat (no row interleave) — the layout the Pallas int4
  matmul (`quant_matmul.quantized_matmul_int4`) relies on.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def quantize_kernel(kernel: jnp.ndarray, axis: int = -2) -> Dict[str, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization.

    `axis` is the contraction (input) dimension — scales are computed over
    it, one per output column (and per any leading stack dims).
    """
    k = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(k), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return {"kernel_q": q, "scale": scale.astype(jnp.float32)}


def quantize_kernel_int4(
    kernel: jnp.ndarray, group: int = 128
) -> Dict[str, jnp.ndarray]:
    """Symmetric int4 quantization with per-K-group scales.

    kernel [.., K, N] → {"kernel_q4": int8 [.., K/2, N], "scale4":
    f32 [.., K/group, N]}. Values are clipped to ±7 (the −8 code is unused,
    keeping the scheme symmetric). Per-group half-split packing: within
    each K-group, row `g*group + i` goes to the low nibble and row
    `g*group + group/2 + i` to the high nibble of packed row
    `g*group/2 + i`.
    """
    k = kernel.astype(jnp.float32)
    K, N = k.shape[-2:]
    group = min(group, K)
    if K % group or group % 2:
        raise ValueError(f"K={K} must tile by an even group={group}")
    lead = k.shape[:-2]
    grouped = k.reshape(*lead, K // group, group, N)
    absmax = jnp.max(jnp.abs(grouped), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(grouped / scale), -7, 7).astype(jnp.int8)
    lo, hi = q[..., : group // 2, :], q[..., group // 2 :, :]
    packed = jnp.bitwise_or(
        jnp.bitwise_and(lo, jnp.int8(0x0F)), jnp.left_shift(hi, 4)
    ).astype(jnp.int8)
    return {
        "kernel_q4": packed.reshape(*lead, K // 2, N),
        "scale4": scale[..., 0, :],
    }


def unpack_int4(packed: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    """int8 [.., K/2, N] (half-split groups) → int8 [.., K, N] in [-7, 7]."""
    lead = packed.shape[:-2]
    Kh, N = packed.shape[-2:]
    p = packed.reshape(*lead, num_groups, Kh // num_groups, N)
    # Arithmetic shifts sign-extend on signed ints: (p << 4) >> 4 recovers
    # the low nibble with sign, p >> 4 the high nibble.
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)
    hi = jnp.right_shift(p, 4)
    return jnp.concatenate([lo, hi], axis=-2).reshape(*lead, Kh * 2, N)


def dequant_int4(p: Dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    """{"kernel_q4", "scale4"} → dense [.., K, N] kernel."""
    G = p["scale4"].shape[-2]
    q = unpack_int4(p["kernel_q4"], G)
    K, N = q.shape[-2:]
    lead = q.shape[:-2]
    grouped = q.reshape(*lead, G, K // G, N).astype(dtype)
    return (grouped * p["scale4"][..., :, None, :].astype(dtype)).reshape(
        *lead, K, N
    )


def maybe_dequant(p: Dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Return a dense kernel from a raw or quantized (int8/int4) param dict."""
    if "kernel_q4" in p:
        return dequant_int4(p, dtype)
    if "kernel_q" in p:
        return (p["kernel_q"].astype(dtype) * p["scale"].astype(dtype))
    return p["kernel"]


def quantize_qformer(projector_params: Dict) -> Dict:
    """Int8-quantize the projector's dense kernels for inference. For the
    Q-Former tree ("blocks") that's ~1.7B params at full scale — the
    dominant share of the vision-side weight bytes. The `mlp2x_gelu` tree
    ({fc1, fc2[, image_newline]}) gets its two kernels quantized the same
    way (`projector.mlp_projector_forward` is quant-aware). LayerNorms,
    biases and the learned queries stay in their original dtype."""
    out = dict(projector_params)

    def q(d):
        rest = {k: v for k, v in d.items() if k != "kernel"}
        rest.update(quantize_kernel(d["kernel"]))
        return rest

    if "blocks" not in projector_params:  # mlp2x_gelu projector
        out["fc1"] = q(projector_params["fc1"])
        out["fc2"] = q(projector_params["fc2"])
        return out

    blocks = dict(projector_params["blocks"])

    for attn_name in ("self_attn", "cross_attn"):
        attn = dict(blocks[attn_name])
        for proj in ("q", "k", "v", "out"):
            attn[proj] = q(attn[proj])
        blocks[attn_name] = attn
    blocks["fc1"] = q(blocks["fc1"])
    blocks["fc2"] = q(blocks["fc2"])
    out["blocks"] = blocks
    return out


def quantize_decoder_layers(decoder_params: Dict, bits: int = 8,
                            group: int = 128) -> Dict:
    """Quantize the per-layer attention/MLP kernels of a Mistral param tree
    (embed_tokens / lm_head / norms stay in their original dtype — they are
    a small fraction of weight bytes and quality-sensitive). `bits`: 8
    (per-channel scales) or 4 (per-K-group scales, the reference's
    `load_4bit` bitsandbytes NF4 option mapped to symmetric int4)."""
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    out = dict(decoder_params)
    layers = jax.tree_util.tree_map(lambda x: x, decoder_params["layers"])

    def q(d):
        if bits == 4:
            return quantize_kernel_int4(d["kernel"], group=group)
        return quantize_kernel(d["kernel"])

    layers["attn"] = {name: q(layers["attn"][name]) for name in ("q", "k", "v", "out")}
    layers["mlp"] = {name: q(layers["mlp"][name]) for name in ("gate", "up", "down")}
    out["layers"] = layers
    return out
