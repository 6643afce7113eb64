"""Pallas TPU flash attention: blockwise online-softmax attention.

The TPU-native replacement for the reference's CUDA flash-attn training
path (`vis_zephyr/train/zephyr_flash_attn_monkey_patch.py:24-156`): the
[T, S] score matrix never touches HBM — each (Q tile, KV tile) pair is
scored, masked, softmaxed-online and accumulated in VMEM.

Features for this model family:
- causal masking with whole-tile skipping above the diagonal,
- grouped-query attention (q head h reads kv head h // group) expressed in
  the K/V BlockSpec index maps — no repeat_kv materialization,
- kv validity masking (right padding / ragged batches) via an int32 mask
  array with its own BlockSpec,
- fully-masked query rows produce zeros (not NaN).

`flash_attention` is differentiable: forward runs the kernel; backward
recomputes attention with the XLA reference op (exact same math) and
differentiates through it — no residual-stats kernels yet, so backward
memory matches plain XLA attention. Hot-path training still gains the
forward-kernel speed; dedicated dKV/dQ kernels are a later optimization.

On non-TPU backends the kernel runs in interpret mode (tests) or callers
use `ops.attention.dot_product_attention`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import attention_mask, dot_product_attention

NEG_INF = -0.7 * float(np.finfo(np.float32).max)


def _fwd_kernel(
    q_ref, k_ref, v_ref, kv_valid_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale: float, causal: bool, block_q: int, block_k: int,
):
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _reset():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    # Whole tiles strictly above the causal diagonal contribute nothing.
    run = True
    if causal:
        run = (q_idx + 1) * block_q - 1 >= kv_idx * block_k

    @pl.when(run)
    def _tile():
        q = q_ref[0, 0]                      # [block_q, D]
        k = k_ref[0, 0]                      # [block_k, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                            # [block_q, block_k]

        valid = kv_valid_ref[0, 0] > 0       # [block_k]
        mask = jnp.broadcast_to(valid.reshape(1, block_k), s.shape)
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_idx * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
            mask &= cols <= rows
        s = jnp.where(mask, s, NEG_INF)

        m_prev, l_prev = m_scratch[...], l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)            # [block_q, 1]
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        # Masked-out columns contribute exactly 0 (NEG_INF exp underflows,
        # but be explicit for the all-masked row case).
        p = jnp.where(mask, p, 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        m_scratch[...] = m_next
        l_scratch[...] = l_next

        v = v_ref[0, 0]                      # [block_k, D]
        acc_scratch[...] *= alpha[:, :1]
        acc_scratch[...] += jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "interpret"),
)
def _flash_forward(
    q, k, v, kv_valid, causal, scale, block_q, block_k, interpret
):
    B, Hq, T, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    group = Hq // Hkv

    grid = (B, Hq, pl.cdiv(T, block_q), pl.cdiv(S, block_k))

    return pl.pallas_call(
        functools.partial(
            _fwd_kernel,
            scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, T, D), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, qi, ki: (b, h // group, ki, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, qi, ki: (b, h // group, ki, 0)),
                pl.BlockSpec((1, 1, block_k), lambda b, h, qi, ki: (b, 0, ki)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, kv_valid)


def _reference(q, k, v, kv_valid, causal, scale):
    """XLA reference with identical semantics ([B, T, H, D] layout)."""
    B, T = q.shape[0], q.shape[1]
    S = k.shape[1]
    positions = jnp.broadcast_to(jnp.arange(T), (B, T))
    kv_positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    mask = attention_mask(
        positions, kv_positions, kv_valid=kv_valid.astype(bool), causal=causal,
        sliding_window=None,
    )
    return dot_product_attention(q, k, v, mask=mask, scale=scale)


def _reference_chunked(q, k, v, kv_valid, causal, scale, chunk: int = 256):
    """Same math as `_reference`, computed per q-chunk under jax.checkpoint:
    differentiating through it keeps peak memory at one chunk's score tile
    (≈ B·H·chunk·S f32) instead of the full [T, S] matrix — this is what the
    flash custom_vjp backward recomputes through."""
    B, T, Hq, D = q.shape
    S = k.shape[1]
    chunk = min(chunk, T)
    if T % chunk:
        return _reference(q, k, v, kv_valid, causal, scale)

    kv_positions = jnp.broadcast_to(jnp.arange(S), (B, S))

    @jax.checkpoint
    def chunk_fn(q_chunk, offset):
        positions = offset + jnp.broadcast_to(jnp.arange(chunk), (B, chunk))
        mask = attention_mask(
            positions, kv_positions, kv_valid=kv_valid.astype(bool), causal=causal,
            sliding_window=None,
        )
        return dot_product_attention(q_chunk, k, v, mask=mask, scale=scale)

    n = T // chunk
    q_chunks = jnp.moveaxis(q.reshape(B, n, chunk, Hq, D), 1, 0)
    offsets = jnp.arange(n) * chunk
    out = jax.lax.map(lambda args: chunk_fn(*args), (q_chunks, offsets))
    return jnp.moveaxis(out, 0, 1).reshape(B, T, Hq, D)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7)
)
def _flash(q, k, v, kv_valid, causal, scale, block_q, block_k):
    interpret = jax.default_backend() == "cpu"
    out = _flash_forward(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        kv_valid.astype(jnp.int32)[:, None, :], causal, scale, block_q, block_k,
        interpret,
    )
    return jnp.swapaxes(out, 1, 2)


def _flash_fwd(q, k, v, kv_valid, causal, scale, block_q, block_k):
    return _flash(q, k, v, kv_valid, causal, scale, block_q, block_k), (q, k, v, kv_valid)


def _flash_bwd(causal, scale, block_q, block_k, residuals, g):
    q, k, v, kv_valid = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: _reference_chunked(q, k, v, kv_valid, causal, scale), q, k, v
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid: Optional[jnp.ndarray] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
) -> jnp.ndarray:
    """Blockwise attention. q: [B, T, Hq, D]; k/v: [B, S, Hkv, D];
    kv_valid: bool [B, S] (None = all valid). Returns [B, T, Hq, D].

    Requires T % block_q == 0 and S % block_k == 0 (callers pad to length
    buckets); positions are row indices (causality in slot order)."""
    B, T, Hq, D = q.shape
    S = k.shape[1]
    scale = D ** -0.5 if scale is None else scale
    if T % 128 or S % 128:
        raise ValueError(f"T={T}, S={S} must be multiples of 128 (pad to a bucket)")
    # Largest block ≤ requested that divides the sequence exactly.
    block_q = next(b for b in (block_q, 256, 128) if b <= T and T % b == 0)
    block_k = next(b for b in (block_k, 256, 128) if b <= S and S % b == 0)
    if kv_valid is None:
        kv_valid = jnp.ones((B, S), bool)
    return _flash(q, k, v, kv_valid, causal, scale, block_q, block_k)
