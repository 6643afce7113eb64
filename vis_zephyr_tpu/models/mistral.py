"""Mistral / Zephyr-7B-β decoder — pure-functional JAX with a static-shape
KV cache.

Computation matches HF `MistralForCausalLM` (the reference decoder backbone,
`vis_zephyr/model/language_model/vis_zephyr.py:19-174` inherits it wholesale):
RMSNorm (f32 accumulation) → GQA attention with rotary embeddings
(θ=10000, rotate-half) and optional sliding-window causal mask → SiLU-gated
MLP, with a final RMSNorm and untied lm_head.

TPU-first choices:
- the layer stack is one `lax.scan` over stacked params; KV caches are
  stacked [L, ...] arrays scanned alongside, so prefill and every decode
  step are each a single compiled program,
- positions and cache lengths are explicit arrays → right-padded batches,
  multimodal spliced sequences and continuous batching share one code path,
- attention dispatches to the Pallas flash kernel on TPU for long
  sequences, falling back to the XLA reference op elsewhere.

The KV cache is a pytree `{"k": [L,B,S,Hkv,D], "v": ..., "length": [B]}`
(static max length S). `length[b]` is the number of valid cache slots for
sample b; decode writes at slot `length[b]` and increments.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import DecoderConfig
from ..ops.attention import attention_mask, dot_product_attention
from ..ops.kv_cache import dense_cache_update
from ..ops.quant import maybe_dequant  # noqa: F401 (re-exported for callers)
from ..ops.quant_matmul import qdot


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)).astype(dtype)


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for rotate-half RoPE. positions: [B, T] → [B, T, D/2]."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [B, T, D/2]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, H, D]; cos/sin: [B, T, D/2] (HF rotate-half convention:
    the head dim is split into two halves [x1; x2])."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def _mdelta(x, mlora, key, mctx):
    """Per-row multi-LoRA delta for target `key`, or 0 when absent (see
    `ops/mlora.py` — batched per-request adapters, serving only)."""
    if mlora is None or key not in mlora:
        return 0.0
    from ..ops.mlora import mlora_delta

    return mlora_delta(x, mlora[key], mctx)


def _project_qkv(h, attn_params, cfg: DecoderConfig, cos, sin, lora_do=None,
                 mlora=None, mctx=None):
    B, T, _ = h.shape
    nq = cfg.num_heads * cfg.head_dim
    nkv = cfg.num_kv_heads * cfg.head_dim

    def do(i):  # distinct dropout mask per projection (peft semantics)
        return None if lora_do is None else (jax.random.fold_in(lora_do[0], i), lora_do[1])

    if "qkv" in attn_params:
        # Inference-fused layout (see `fuse_decoder_layers`): one matmul for
        # q|k|v — fewer, larger weight reads in the bandwidth-bound decode.
        qkv = qdot(h, attn_params["qkv"])
        q, k, v = qkv[..., :nq], qkv[..., nq : nq + nkv], qkv[..., nq + nkv :]
    else:
        q = qdot(h, attn_params["q"], lora_dropout=do(0))
        k = qdot(h, attn_params["k"], lora_dropout=do(1))
        v = qdot(h, attn_params["v"], lora_dropout=do(2))
    if mlora is not None:
        # Multi-LoRA deltas add to the projection OUTPUTS (pre-RoPE) — the
        # fused qkv matmul stays one big weight read; q/k/v adapters have
        # independent rank spaces so their deltas apply per target.
        q = q + _mdelta(h, mlora, "q", mctx)
        k = k + _mdelta(h, mlora, "k", mctx)
        v = v + _mdelta(h, mlora, "v", mctx)
    q = apply_rope(q.reshape(B, T, cfg.num_heads, cfg.head_dim), cos, sin)
    k = apply_rope(k.reshape(B, T, cfg.num_kv_heads, cfg.head_dim), cos, sin)
    v = v.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    return q, k, v


def _attn_out(attn_flat, attn_params, mlora=None, mctx=None, lora_dropout=None):
    """Row-parallel output projection + optional multi-LoRA delta."""
    out = qdot(attn_flat, attn_params["out"], lora_dropout=lora_dropout)
    if mlora is not None:
        out = out + _mdelta(attn_flat, mlora, "out", mctx)
    return out


def _mlp(h, mlp_params, lora_do=None, mlora=None, mctx=None):
    def do(i):
        return None if lora_do is None else (jax.random.fold_in(lora_do[0], i), lora_do[1])

    if "gate_up" in mlp_params:
        fused = qdot(h, mlp_params["gate_up"])
        gate, up = jnp.split(fused, 2, axis=-1)
    else:
        gate = qdot(h, mlp_params["gate"], lora_dropout=do(0))
        up = qdot(h, mlp_params["up"], lora_dropout=do(1))
    if mlora is not None:
        gate = gate + _mdelta(h, mlora, "gate", mctx)
        up = up + _mdelta(h, mlora, "up", mctx)
    inter = jax.nn.silu(gate) * up
    out = qdot(inter, mlp_params["down"], lora_dropout=do(2))
    if mlora is not None:
        out = out + _mdelta(inter, mlora, "down", mctx)
    return out


def fuse_decoder_layers(decoder_params: Dict) -> Dict:
    """Concatenate q|k|v and gate|up kernels for inference (fewer, larger
    matmuls in the decode hot loop — the reference's flash-attn patch packs
    QKV the same way, `zephyr_flash_attn_monkey_patch.py:100-131`). Works on
    raw or int8-quantized layers; merge LoRA adapters first."""
    out = dict(decoder_params)
    layers = dict(decoder_params["layers"])
    attn = dict(layers["attn"])
    mlp = dict(layers["mlp"])

    def cat(parts, key):
        return jnp.concatenate([p[key] for p in parts], axis=-1)

    def fuse(parts):
        if any("lora_a" in p for p in parts):
            raise ValueError("merge LoRA adapters before fusing")
        if "kernel_q4" in parts[0]:
            return {"kernel_q4": cat(parts, "kernel_q4"), "scale4": cat(parts, "scale4")}
        if "kernel_q" in parts[0]:
            return {"kernel_q": cat(parts, "kernel_q"), "scale": cat(parts, "scale")}
        return {"kernel": cat(parts, "kernel")}

    attn["qkv"] = fuse([attn.pop("q"), attn.pop("k"), attn.pop("v")])
    mlp["gate_up"] = fuse([mlp.pop("gate"), mlp.pop("up")])
    layers["attn"] = attn
    layers["mlp"] = mlp
    out["layers"] = layers
    return out


def embed(params, input_ids: jnp.ndarray) -> jnp.ndarray:
    """Token ids → embeddings. Negative sentinel ids (image placeholders)
    are clamped to 0; callers overwrite those slots with image features."""
    ids = jnp.maximum(input_ids, 0)
    return params["embed_tokens"][ids]


def init_cache(cfg: DecoderConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> Dict:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "length": jnp.zeros((batch,), jnp.int32),
    }


def mistral_forward(
    params,
    inputs_embeds: jnp.ndarray,
    cfg: DecoderConfig,
    positions: jnp.ndarray,
    attn_valid: Optional[jnp.ndarray] = None,
    cache: Optional[Dict] = None,
    logits_slice: str = "all",  # "all" | "last"
    remat: bool = False,
    return_kv: bool = False,
    use_flash: Optional[bool] = None,
    attn_mesh=None,
    pallas_cache_update: Optional[bool] = None,
    lora_dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    mlora: Optional[Dict] = None,
    adapter_idx: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[Dict]]:
    """Run the decoder stack.

    `mlora`/`adapter_idx`: batched multi-LoRA serving — `mlora` is an
    `ops/mlora.py` pack ([L, N, ...] leaves, scanned with the layers) and
    `adapter_idx` [B] selects each row's adapter (0 = base). Every adapted
    projection adds a per-row ragged-grouped low-rank delta.

    Two modes:
      - cache=None: self-contained forward over [B, T] (training / scoring /
        prefill). Mask = causal ∧ sliding-window ∧ attn_valid. Attention
        runs through the Pallas flash kernel on TPU when shapes allow
        (`use_flash=None` → auto), the XLA reference op otherwise. With
        `return_kv=True` the per-layer K/V are also returned (stacked
        [L, B, T, Hkv, D]) so callers can seed a decode cache — prefill is
        just this mode + a pad (see `serve.generate.prefill`).
      - cache given: appends T tokens at slots `cache.length[b] + arange(T)`
        and attends against the whole cache buffer (the decode hot loop;
        also serves mid-conversation cache extension).

    Returns (logits, new_cache_or_kv). logits are float32.
    """
    B, T, D = inputs_embeds.shape
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    h = inputs_embeds

    mctx = None
    if mlora is not None:
        from ..ops.mlora import pack_num_adapters, ragged_ctx

        if adapter_idx is None:
            adapter_idx = jnp.zeros((B,), jnp.int32)
        mctx = ragged_ctx(adapter_idx, pack_num_adapters(mlora))

    if cache is None:
        if attn_mesh is not None and cfg.num_kv_heads % attn_mesh.shape.get(
                "model", 1):
            # GQA groups must stay whole per shard: the per-shard Pallas
            # kernel can't run, and an UNSHARDED Pallas custom call inside
            # the SPMD program can't be auto-partitioned either — fall all
            # the way back to XLA attention, which partitions fine.
            attn_mesh = None
            use_flash = False
        if use_flash is None:
            use_flash = (
                jax.default_backend() != "cpu"
                and T % 128 == 0
                and cfg.head_dim % 128 == 0
                and (cfg.sliding_window is None or T <= cfg.sliding_window)
            )
        if use_flash:
            from ..ops.flash_attention import flash_attention

            kv_valid = (
                jnp.ones((B, T), bool) if attn_valid is None else attn_valid.astype(bool)
            )

            def attend(q, k, v):
                # attn_mesh: run the Pallas kernel per TP shard over its
                # heads (custom calls can't be auto-partitioned).
                return flash_attention(q, k, v, kv_valid=kv_valid,
                                       causal=True, mesh=attn_mesh)
        else:
            mask = attention_mask(
                positions, positions, kv_valid=attn_valid, causal=True,
                sliding_window=cfg.sliding_window,
            )

            def attend(q, k, v):
                return dot_product_attention(q, k, v, mask=mask)

        # LoRA dropout (train-time only: an rng must be provided). Per-layer
        # keys ride the scan xs so every layer/projection draws a distinct
        # mask — reference peft applies an independent nn.Dropout per
        # adapted linear (`script/finetune.sh` lora_dropout 0.05).
        use_dropout = lora_dropout > 0.0 and dropout_rng is not None

        def body(carry, xs):
            h = carry
            if mlora is None:
                layer_params, i = xs
                ml = None
            else:
                layer_params, i, ml = xs
            lora_do = (
                (jax.random.fold_in(dropout_rng, i), lora_dropout)
                if use_dropout else None
            )
            hn = rms_norm(h, layer_params["input_ln"]["scale"], cfg.rms_norm_eps)
            q, k, v = _project_qkv(hn, layer_params["attn"], cfg, cos, sin,
                                   lora_do=lora_do,
                                   mlora=None if ml is None else ml.get("attn"),
                                   mctx=mctx)
            attn = attend(q, k, v)
            attn = _attn_out(
                attn.reshape(*attn.shape[:2], -1), layer_params["attn"],
                mlora=None if ml is None else ml.get("attn"), mctx=mctx,
                lora_dropout=(
                    (jax.random.fold_in(lora_do[0], 3), lora_dropout)
                    if lora_do else None))
            h = h + attn
            hn = rms_norm(h, layer_params["post_attn_ln"]["scale"], cfg.rms_norm_eps)
            h = h + _mlp(hn, layer_params["mlp"],
                         lora_do=(
                             (jax.random.fold_in(lora_do[0], 4), lora_dropout)
                             if lora_do else None),
                         mlora=None if ml is None else ml.get("mlp"),
                         mctx=mctx)
            return h, (k, v) if return_kv else None

        if remat:
            body = jax.checkpoint(body)  # trade FLOPs for HBM during backprop
        xs = (params["layers"], jnp.arange(cfg.num_layers))
        if mlora is not None:
            xs = xs + (mlora,)
        h, kv = jax.lax.scan(body, h, xs)
        new_cache = kv if return_kv else None
    else:
        S = cache["k"].shape[2]
        lengths = cache["length"]  # [B]
        # Slot indices where the T new tokens land: [B, T].
        slot = lengths[:, None] + jnp.arange(T)[None, :]
        new_valid = (
            jnp.ones((B, T), dtype=bool) if attn_valid is None else attn_valid.astype(bool)
        )
        # Cache-slot positions for masking: previously-written slots keep
        # their original token positions; we reconstruct masks from slot
        # validity + causality in *slot order* (slots are written in
        # position order, so slot index order == position order).
        slot_ids = jnp.arange(S)[None, :]  # [1, S]
        q_slot = slot  # [B, T]
        kv_valid_slots = slot_ids < (lengths[:, None] + T)  # may include pads; fixed below
        mask = attention_mask(
            q_slot, jnp.broadcast_to(slot_ids, (B, S)), kv_valid=kv_valid_slots,
            causal=True, sliding_window=cfg.sliding_window,
        )
        # Exclude padded new tokens from being attended BY anyone:
        pad_slots = jnp.ones((B, S), dtype=bool)
        pad_slots = pad_slots.at[jnp.arange(B)[:, None], q_slot].set(new_valid)
        mask &= pad_slots[:, None, :]

        batch_idx = jnp.arange(B)[:, None]

        # Default ON: exact vs the XLA scatter and equal-speed on the dense
        # layout (18.44 ms/step B=16 either way, v5e; the scatter is only
        # pathological on the head-major paged pools) — see ops/kv_cache.py.
        # Callers running this jit under SPMD auto-partitioning (the dense
        # TP serving path) must pass False — XLA cannot partition a Pallas
        # custom call it didn't shard_map.
        if pallas_cache_update is None:
            pallas_cache_update = True

        # The cache rides the scan CARRY (not xs/ys): XLA aliases carry
        # buffers across iterations, so each layer's update is an in-place
        # write (Pallas row kernel or XLA scatter) instead of a full-cache
        # copy per step.
        def body(carry, xs):
            h, ck, cv = carry
            if mlora is None:
                layer_params, i = xs
                ml = None
            else:
                layer_params, i, ml = xs
            hn = rms_norm(h, layer_params["input_ln"]["scale"], cfg.rms_norm_eps)
            q, k, v = _project_qkv(hn, layer_params["attn"], cfg, cos, sin,
                                   mlora=None if ml is None else ml.get("attn"),
                                   mctx=mctx)
            if pallas_cache_update:
                ck, cv = dense_cache_update(ck, cv, k, v, lengths, i)
            else:
                ck = ck.at[i, batch_idx, slot].set(k.astype(ck.dtype))
                cv = cv.at[i, batch_idx, slot].set(v.astype(cv.dtype))
            attn = dot_product_attention(q, ck[i].astype(q.dtype), cv[i].astype(q.dtype), mask=mask)
            attn = _attn_out(attn.reshape(*attn.shape[:2], -1),
                             layer_params["attn"],
                             mlora=None if ml is None else ml.get("attn"),
                             mctx=mctx)
            h = h + attn
            hn = rms_norm(h, layer_params["post_attn_ln"]["scale"], cfg.rms_norm_eps)
            h = h + _mlp(hn, layer_params["mlp"],
                         mlora=None if ml is None else ml.get("mlp"),
                         mctx=mctx)
            return (h, ck, cv), None

        xs = (params["layers"], jnp.arange(cfg.num_layers))
        if mlora is not None:
            xs = xs + (mlora,)
        (h, new_k, new_v), _ = jax.lax.scan(
            body, (h, cache["k"], cache["v"]), xs,
        )
        new_cache = {
            "k": new_k,
            "v": new_v,
            "length": lengths + jnp.sum(new_valid, axis=1).astype(lengths.dtype),
        }

    h = rms_norm(h, params["final_ln"]["scale"], cfg.rms_norm_eps)
    if logits_slice == "last":
        h = h[:, -1:, :]
    logits = jnp.einsum("btd,dv->btv", h, params["lm_head"]["kernel"]).astype(jnp.float32)
    return logits, new_cache


def init_mistral(cfg: DecoderConfig, key, dtype=jnp.float32):
    L, D, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    Hq, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    k = jax.random.split(key, 8)

    def w(key, shape):
        return jax.random.normal(key, shape, dtype) * 0.02

    return {
        "embed_tokens": w(k[0], (cfg.vocab_size, D)),
        "final_ln": {"scale": jnp.ones((D,), dtype)},
        "lm_head": {"kernel": w(k[1], (D, cfg.vocab_size))},
        "layers": {
            "input_ln": {"scale": jnp.ones((L, D), dtype)},
            "post_attn_ln": {"scale": jnp.ones((L, D), dtype)},
            "attn": {
                "q": {"kernel": w(k[2], (L, D, Hq * hd))},
                "k": {"kernel": w(k[3], (L, D, Hkv * hd))},
                "v": {"kernel": w(k[4], (L, D, Hkv * hd))},
                "out": {"kernel": w(k[5], (L, Hq * hd, D))},
            },
            "mlp": {
                "gate": {"kernel": w(k[6], (L, D, I))},
                "up": {"kernel": w(jax.random.fold_in(k[6], 1), (L, D, I))},
                "down": {"kernel": w(k[7], (L, I, D))},
            },
        },
    }
