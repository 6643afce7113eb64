"""Multi-LoRA: batched per-request adapters over one base model (serving).

The reference serves ONE merged LoRA checkpoint per process
(`vis_zephyr/model/builder.py:53-95` — PeftModel.merge_and_unload). This
module serves MANY adapters from one base simultaneously (the S-LoRA
serving pattern): each batcher slot carries an adapter index, and every
adapted projection adds a per-row low-rank delta

    y_b += (x_b @ A[idx_b]) @ B[idx_b] * scale[idx_b]

computed with `lax.ragged_dot` over the batch sorted by adapter — the
TPU-native grouped matmul (one pass over each adapter's [K, r] / [r, M]
panels, no [B, K, r] gathers, no [B, N, M] intermediates). Index 0 is
reserved for the BASE model (all-zero adapter), so un-adapted requests
ride the same code path with an exactly-zero delta.

Pack layout (scan-ready — leaf axis 0 is the layer axis, sliced by the
decoder's `lax.scan` alongside the base layer params):

    pack = {
      "attn": {"q"|"k"|"v"|"out": {"a": [L, N, K, r],
                                   "b": [L, N, r, M],
                                   "scale": [L, N]}},
      "mlp":  {"gate"|"up"|"down": {...}},
    }

Adapters with different ranks are zero-padded to the max rank (exact:
padded rank dimensions contribute 0). Adapters missing a target get zero
leaves for it.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# Target paths inside params["decoder"]["layers"], matching
# `hf_convert.convert_lora_adapters` keys ("decoder/layers/<path>").
TARGETS = ("attn/q", "attn/k", "attn/v", "attn/out",
           "mlp/gate", "mlp/up", "mlp/down")


def ragged_ctx(adapter_idx: jnp.ndarray, n_adapters: int) -> Dict:
    """Precompute the per-step grouping for `mlora_delta`: a stable sort of
    the batch by adapter, its inverse, and per-adapter group sizes. One ctx
    per step serves every layer/target (the grouping is layer-invariant)."""
    idx = adapter_idx.astype(jnp.int32)
    perm = jnp.argsort(idx, stable=True)
    inv = jnp.argsort(perm, stable=True)
    group_sizes = jnp.bincount(idx, length=n_adapters).astype(jnp.int32)
    return {"idx": idx, "perm": perm, "inv": inv, "group_sizes": group_sizes}


def mlora_delta(x: jnp.ndarray, target: Dict, ctx: Dict) -> jnp.ndarray:
    """Per-row adapter delta for one target at one layer.

    x [B, T, K]; target {"a" [N, K, r], "b" [N, r, M], "scale" [N]} (the
    pack's layer slice); returns [B, T, M] in x.dtype. Rows are grouped by
    adapter (T tokens per row stay contiguous, so group sizes scale by T),
    run through two ragged grouped matmuls, and scattered back."""
    B, T, K = x.shape
    a, b, scale = target["a"], target["b"], target["scale"]
    xs = x[ctx["perm"]].reshape(B * T, K)
    gs = ctx["group_sizes"] * T
    t = lax.ragged_dot(xs, a.astype(x.dtype), gs,
                       preferred_element_type=jnp.float32)
    d = lax.ragged_dot(t.astype(x.dtype), b.astype(x.dtype), gs,
                       preferred_element_type=jnp.float32)
    d = d.reshape(B, T, -1)[ctx["inv"]]
    s = scale.astype(jnp.float32)[ctx["idx"]][:, None, None]
    return (d * s).astype(x.dtype)


def mlora_layer_slice(pack: Optional[Dict], name: str) -> Optional[Dict]:
    """pack["attn"]["q"]-style access tolerant of missing packs/targets."""
    if pack is None:
        return None
    group, key = name.split("/")
    return pack.get(group, {}).get(key)


def build_pack(adapters: Sequence[Dict], num_layers: int,
               dtype=jnp.float32) -> Dict:
    """Stack per-adapter dicts (the `convert_lora_adapters` output: keys
    "decoder/layers/<target>" → {"lora_a" [L, K, r], "lora_b" [L, r, M],
    "lora_scale" [L]}) into one pack with adapter index 0 = BASE (zeros).

    Ranks are zero-padded to the max; targets absent from an adapter get
    zeros. The pack covers the UNION of targets seen in any adapter."""
    n = len(adapters) + 1  # + base at index 0
    targets = sorted({t for ad in adapters for t in ad}
                     & {f"decoder/layers/{t}" for t in TARGETS})
    if not targets:
        raise ValueError("no adapted decoder targets found in any adapter")
    pack: Dict = {}
    for full in targets:
        name = full[len("decoder/layers/"):]
        present = [ad[full] for ad in adapters if full in ad]
        L, K, _ = present[0]["lora_a"].shape
        M = present[0]["lora_b"].shape[-1]
        rmax = max(int(ad[full]["lora_a"].shape[-1])
                   for ad in adapters if full in ad)
        a = np.zeros((L, n, K, rmax), np.float32)
        b = np.zeros((L, n, rmax, M), np.float32)
        s = np.zeros((L, n), np.float32)
        for j, ad in enumerate(adapters, start=1):
            if full not in ad:
                continue
            t = ad[full]
            r = t["lora_a"].shape[-1]
            a[:, j, :, :r] = np.asarray(t["lora_a"], np.float32)
            b[:, j, :r, :] = np.asarray(t["lora_b"], np.float32)
            s[:, j] = np.asarray(t["lora_scale"], np.float32)
        group, key = name.split("/")
        pack.setdefault(group, {})[key] = {
            "a": jnp.asarray(a, dtype),
            "b": jnp.asarray(b, dtype),
            "scale": jnp.asarray(s, jnp.float32),
        }
    return pack


def pack_num_adapters(pack: Dict) -> int:
    for group in pack.values():
        for target in group.values():
            return int(target["a"].shape[1])
    raise ValueError("empty pack")


def make_random_pack(cfg, n_adapters: int, r: int, key,
                     targets: Sequence[str] = TARGETS,
                     dtype=jnp.float32) -> Dict:
    """Random adapters for tests/benches (index 0 still the zero base)."""
    dec = cfg.decoder
    dims = {
        "attn/q": (dec.hidden_size, dec.num_heads * dec.head_dim),
        "attn/k": (dec.hidden_size, dec.num_kv_heads * dec.head_dim),
        "attn/v": (dec.hidden_size, dec.num_kv_heads * dec.head_dim),
        "attn/out": (dec.num_heads * dec.head_dim, dec.hidden_size),
        "mlp/gate": (dec.hidden_size, dec.intermediate_size),
        "mlp/up": (dec.hidden_size, dec.intermediate_size),
        "mlp/down": (dec.intermediate_size, dec.hidden_size),
    }
    L, n = dec.num_layers, n_adapters + 1
    pack: Dict = {}
    for i, name in enumerate(targets):
        K, M = dims[name]
        ka, kb = jax.random.split(jax.random.fold_in(key, i))
        a = jax.random.normal(ka, (L, n, K, r), dtype) * (1.0 / np.sqrt(K))
        b = jax.random.normal(kb, (L, n, r, M), dtype) * 0.02
        a = a.at[:, 0].set(0.0)
        b = b.at[:, 0].set(0.0)
        group, keyname = name.split("/")
        pack.setdefault(group, {})[keyname] = {
            "a": a, "b": b,
            "scale": jnp.full((L, n), 2.0, jnp.float32).at[:, 0].set(0.0),
        }
    return pack


def lora_leaves_for_adapter(pack: Dict, adapter: int) -> Dict[str, Dict]:
    """Extract ONE adapter's leaves in `train.lora.attach_lora` form
    (single-LoRA view: lora_a [L, K, r], lora_b [L, r, M], lora_scale [L])
    keyed by "decoder/layers/<target>" — the merged-checkpoint oracle used
    by tests."""
    out = {}
    for group, kids in pack.items():
        for key, t in kids.items():
            out[f"decoder/layers/{group}/{key}"] = {
                "lora_a": t["a"][:, adapter],
                "lora_b": t["b"][:, adapter],
                "lora_scale": t["scale"][:, adapter],
            }
    return out
