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

`flash_attention` is differentiable end-to-end in Pallas: the forward
kernel saves the per-row logsumexp residuals (l/m), and dedicated dKV and
dQ backward kernels (`_bwd_dkv_kernel` / `_bwd_dq_kernel`) recompute tile
scores from those residuals — the [T, S] matrix never materializes in
either direction, so backward memory is O(T) like the forward.

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
    q_ref, k_ref, v_ref, kv_valid_ref, o_ref, l_ref, m_ref,
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
        # Softmax residuals for the backward kernels ([B, H, 1, T] layout —
        # the middle singleton keeps blocks tile-legal for any B, H).
        l_ref[0, 0, 0] = l_scratch[...][:, 0]
        m_ref[0, 0, 0] = m_scratch[...][:, 0]


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
        out_shape=(
            jax.ShapeDtypeStruct((B, Hq, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, 1, T), jnp.float32),
            jax.ShapeDtypeStruct((B, Hq, 1, T), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, qi, ki: (b, h // group, ki, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, qi, ki: (b, h // group, ki, 0)),
                pl.BlockSpec((1, 1, block_k), lambda b, h, qi, ki: (b, 0, ki)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, 1, block_q), lambda b, h, qi, ki: (b, h, 0, qi)),
                pl.BlockSpec((1, 1, 1, block_q), lambda b, h, qi, ki: (b, h, 0, qi)),
            ),
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


def _bwd_dkv_kernel(
    q_ref, do_ref, l_ref, m_ref, di_ref, k_ref, v_ref, kv_valid_ref,
    dk_ref, dv_ref, dk_acc, dv_acc,
    *, scale: float, causal: bool, block_q: int, block_k: int,
):
    """dK/dV for one KV tile, accumulated over Q tiles (innermost grid dim).
    Gradients are per Q-HEAD ([B, Hq, S, D]); GQA group-summing happens
    outside the kernel (a cheap XLA reduce), avoiding cross-cell races."""
    kv_idx = pl.program_id(2)
    q_idx = pl.program_id(3)
    n_q = pl.num_programs(3)

    @pl.when(q_idx == 0)
    def _reset():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    run = True
    if causal:
        run = (q_idx + 1) * block_q - 1 >= kv_idx * block_k

    @pl.when(run)
    def _tile():
        q = q_ref[0, 0]                       # [bq, D]
        k = k_ref[0, 0]                       # [bk, D]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        m = m_ref[0, 0, 0][:, None]           # [bq, 1]
        l = l_ref[0, 0, 0][:, None]
        di = di_ref[0, 0, 0][:, None]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        valid = kv_valid_ref[0, 0] > 0
        mask = jnp.broadcast_to(valid.reshape(1, block_k), s.shape)
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_idx * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
            mask &= cols <= rows
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        p = jnp.where(mask, jnp.exp(s - m), 0.0) * l_inv      # normalized probs

        dv_acc[...] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - di) * scale
        dk_acc[...] += jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(q_idx == n_q - 1)
    def _store():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref, do_ref, l_ref, m_ref, di_ref, k_ref, v_ref, kv_valid_ref,
    dq_ref, dq_acc,
    *, scale: float, causal: bool, block_q: int, block_k: int,
):
    """dQ for one Q tile, accumulated over KV tiles (innermost grid dim)."""
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _reset():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    run = True
    if causal:
        run = (q_idx + 1) * block_q - 1 >= kv_idx * block_k

    @pl.when(run)
    def _tile():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        m = m_ref[0, 0, 0][:, None]
        l = l_ref[0, 0, 0][:, None]
        di = di_ref[0, 0, 0][:, None]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        valid = kv_valid_ref[0, 0] > 0
        mask = jnp.broadcast_to(valid.reshape(1, block_k), s.shape)
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_idx * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
            mask &= cols <= rows
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        p = jnp.where(mask, jnp.exp(s - m), 0.0) * l_inv

        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - di) * scale
        dq_acc[...] += jax.lax.dot(
            ds, k.astype(jnp.float32), preferred_element_type=jnp.float32
        )

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "scale", "block_q", "block_k", "interpret")
)
def _flash_backward(q, k, v, kv_valid, o, l, m, do, causal, scale, block_q, block_k,
                    interpret):
    """[B, H, T, D]-layout backward. Returns (dq, dk_per_qhead, dv_per_qhead)."""
    B, Hq, T, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    group = Hq // Hkv

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)[:, :, None, :]

    def in_specs(qi, ki):
        # qi/ki pick which grid dims index the Q and KV tiles (the two
        # backward kernels transpose the reduction order).
        return [
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, qi(i, j), 0)),   # q
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, qi(i, j), 0)),   # do
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, qi(i, j))),   # l
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, qi(i, j))),   # m
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, qi(i, j))),   # di
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h // group, ki(i, j), 0)),  # k
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h // group, ki(i, j), 0)),  # v
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, ki(i, j))),          # kv_valid
        ]

    args = (q, do, l, m, di, k, v, kv_valid)

    # dKV: grid (B, Hq, kv, q) — q innermost (reduction).
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, causal=causal,
                          block_q=block_q, block_k=block_k),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hq, S, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, S, D), q.dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, Hq, pl.cdiv(S, block_k), pl.cdiv(T, block_q)),
            in_specs=in_specs(qi=lambda i, j: j, ki=lambda i, j: i),
            out_specs=(
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, i, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_k, D), jnp.float32),
                pltpu.VMEM((block_k, D), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)

    # dQ: grid (B, Hq, q, kv) — kv innermost (reduction).
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, causal=causal,
                          block_q=block_q, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((B, Hq, T, D), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, Hq, pl.cdiv(T, block_q), pl.cdiv(S, block_k)),
            in_specs=in_specs(qi=lambda i, j: i, ki=lambda i, j: j),
            out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return dq, dk, dv


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7)
)
def _flash(q, k, v, kv_valid, causal, scale, block_q, block_k):
    interpret = jax.default_backend() == "cpu"
    out, _, _ = _flash_forward(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        kv_valid.astype(jnp.int32)[:, None, :], causal, scale, block_q, block_k,
        interpret,
    )
    return jnp.swapaxes(out, 1, 2)


def _flash_fwd(q, k, v, kv_valid, causal, scale, block_q, block_k):
    interpret = jax.default_backend() == "cpu"
    o, l, m = _flash_forward(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        kv_valid.astype(jnp.int32)[:, None, :], causal, scale, block_q, block_k,
        interpret,
    )
    return jnp.swapaxes(o, 1, 2), (q, k, v, kv_valid, o, l, m)


def _flash_bwd(causal, scale, block_q, block_k, residuals, g):
    q, k, v, kv_valid, o, l, m = residuals
    interpret = jax.default_backend() == "cpu"
    Hq = q.shape[2]
    Hkv = k.shape[2]
    dq, dk_q, dv_q = _flash_backward(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        kv_valid.astype(jnp.int32)[:, None, :], o, l, m,
        jnp.swapaxes(g, 1, 2), causal, scale, block_q, block_k, interpret,
    )
    # GQA: sum the per-q-head dK/dV over each group.
    B, _, S, D = dk_q.shape
    group = Hq // Hkv
    dk = dk_q.reshape(B, Hkv, group, S, D).sum(axis=2)
    dv = dv_q.reshape(B, Hkv, group, S, D).sum(axis=2)
    return (
        jnp.swapaxes(dq, 1, 2).astype(q.dtype),
        jnp.swapaxes(dk, 1, 2).astype(k.dtype),
        jnp.swapaxes(dv, 1, 2).astype(v.dtype),
        None,
    )


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
    mesh=None,
) -> jnp.ndarray:
    """Blockwise attention. q: [B, T, Hq, D]; k/v: [B, S, Hkv, D];
    kv_valid: bool [B, S] (None = all valid). Returns [B, T, Hq, D].

    Requires T % block_q == 0 and S % block_k == 0 (callers pad to length
    buckets); positions are row indices (causality in slot order).

    `mesh`: a model-axis TP mesh — the kernel runs per shard over its
    heads via shard_map (a Pallas custom call can't be auto-partitioned;
    heads are embarrassingly parallel, zero collectives). The mesh's
    model axis must divide Hkv so GQA groups stay whole per shard."""
    B, T, Hq, D = q.shape
    S = k.shape[1]
    scale = D ** -0.5 if scale is None else scale
    if T % 128 or S % 128:
        raise ValueError(f"T={T}, S={S} must be multiples of 128 (pad to a bucket)")
    if kv_valid is None:
        kv_valid = jnp.ones((B, S), bool)
    if mesh is not None:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        heads = P(None, None, "model", None)

        def local(q, k, v, kv_valid):
            return flash_attention(q, k, v, kv_valid=kv_valid, causal=causal,
                                   scale=scale, block_q=block_q,
                                   block_k=block_k)

        return shard_map(
            local, mesh=mesh,
            in_specs=(heads, heads, heads, P(None, None)),
            out_specs=heads, check_rep=False,
        )(q, k, v, kv_valid)
    # Largest block ≤ requested that divides the sequence exactly.
    block_q = next(b for b in (block_q, 256, 128) if b <= T and T % b == 0)
    block_k = next(b for b in (block_k, 256, 128) if b <= S and S % b == 0)
    return _flash(q, k, v, kv_valid, causal, scale, block_q, block_k)
