"""Pallas TPU paged-attention decode kernel.

Single-query attention over a KV cache stored as fixed-size pages in
global pools, addressed through per-sequence page tables — the memory
model that lifts the dense-cache slot ceiling in the continuous batcher
(dense [slots, max_len] caches OOM a v5e chip at ~32 slots × 2048; paged
pools allocate only what sequences actually use).

Layout (head-major, matching the tuned library kernel
`jax.experimental.pallas.ops.tpu.paged_attention`):
  k_pages / v_pages: [Hkv, num_pages, page_size, D]   (global pools; a kv
                     head's pages are contiguous — the DMA-friendly order)
  page_table:        [B, pages_per_seq] int32         (pool indices)
  lengths:           [B] int32                        (tokens per sequence)
  q:                 [B, Hq, D] (one decode step)     → out [B, Hq, D]

The serving hot path (`serve/paged.py::_paged_step` mode="selfterm")
attends FIRST and writes ONCE: each layer calls the flash-structure
kernel (`paged_attention_fa`, folded grid) over the read-only pools with
the current token's K/V folded in as an online-softmax self-term, and
after the layer scan every layer's rows bulk-write through ONE aligned
row-tile RMW per slot (`paged_kv_update_rows`). Measured v5e B=64 int8
weights: 22.6-24.0 ms/step vs 28.6 for the previous write-first
structure (per-layer `paged_kv_update` page rewrites alone cost 5.3
ms/step; library-kernel attention 16.5 vs 13.2 folded). History that
still matters: an in-place XLA *scatter* aliasing a Pallas consumer
defeats XLA's buffer analysis and inserts a full pool copy per layer
(measured 333 ms/step vs 18 ms on v5e); a Pallas write with
`input_output_aliases` does not.

The kernel runs one (batch row, kv head) pair per grid cell and walks that
sequence's pages sequentially with online softmax; the page table rides the
scalar-prefetch channel so each page's DMA address is known before the body
runs (the standard TPU paged-attention structure). Pages past `lengths[b]`
are skipped entirely.

GQA: the q heads of a group ([G, D] per kv head) are processed together —
scores are [G, page_size] tiles on the MXU.

When `k_new` is None the call dispatches to the tuned library kernel on
TPU (multi-page compute blocks, megacore-aware).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import attention_mask, dot_product_attention

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# int8 KV quantization, library-kernel numeric convention
# (jax...paged_attention.quantization_utils): row ≈ int8 · scale / 127.5,
# scale = absmax of the row.
#
# POOL SCALE LAYOUT: [Hkv, num_pages, 1, page_size] f32 — one page's row
# scales along the LANE axis. This is the only layout that is both
# TPU-tile-compact and Pallas-block-legal:
#   · [.., ps, 1] (scale-per-row trailing) puts the singleton on the lane
#     dim: T(8,128) tiling pads 1 → 128, a 128× HBM expansion that turns
#     48 MB of scales into 6 GB per pool and OOMs the chip (measured —
#     XLA materializes padded copies inside the step program).
#   · [.., ps] 3D makes the page dim second-to-last, and a (1, 1, ps)
#     block's sublane dim (1 vs N) is neither 8-aligned nor equal to the
#     array dim — not lowerable.
#   · [.., 1, ps] tiles (1, ps) → (8, 128): an 8× sublane pad (48 → 385 MB
#     per pool) and blocks of (1, 1, 1, ps) equal the array dims — legal.
# The attention kernel consumes scales as (1, span) row vectors and folds
# them into the SCORES (s = (q·kqᵀ)·ksc) and the PROBABILITIES
# (acc += (p·vsc)·vq) instead of dequantizing rows — algebraically
# identical, broadcast-friendly, and the int8→bf16 convert feeding the MXU
# is exact (|int8| ≤ 127 is representable), so precision is a shade BETTER
# than per-row dequantization.
KV_QUANT_MAX = 127.5


def quantize_kv(x: jnp.ndarray):
    """[..., D] float → (int8 [..., D], scales [..., 1]) per-row absmax."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    q = jnp.rint(x.astype(jnp.float32) * (KV_QUANT_MAX / jnp.maximum(s, 1e-9)))
    return q.astype(jnp.int8), s.astype(jnp.float32)


def dequant_kv(q: jnp.ndarray, s: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """int8 [..., D] with scales [..., 1] → float [..., D]."""
    return (q.astype(jnp.float32) * (s / KV_QUANT_MAX)).astype(dtype)


def quantize_kv_pool(pool: jnp.ndarray):
    """[Hkv, N, ps, D] float pool → (int8 pool, scales [Hkv, N, 1, ps])
    in the pool scale layout (see module comment)."""
    q, s = quantize_kv(pool)
    return q, jnp.swapaxes(s, -1, -2)


def dequant_kv_pool(q: jnp.ndarray, s: jnp.ndarray, dtype=jnp.bfloat16):
    """Inverse of `quantize_kv_pool` (oracle/test helper)."""
    return dequant_kv(q, jnp.swapaxes(s, -1, -2), dtype)


def _make_kernel(R: int, page_size: int, scale: float, has_new: bool,
                 window: Optional[int] = None, quant: bool = False):
    """Kernel over R pages per grid cell: R k-page refs then R v-page refs
    follow q. Fewer grid cells and one [G, R*page_size] score matmul per
    cell amortize the per-cell overhead that dominates at R=1.

    `window`: sliding-window attention (Mistral semantics, matching
    `ops.attention.attention_mask`: q_pos − kv_pos < window). The query sits
    at position length−1 (pool walk includes the current token) or length
    (separate k_new self-term), so valid slots start at
    lo = length − window (+1 with k_new); blocks wholly below lo are
    skipped like blocks wholly past length.

    `quant`: int8 pages with per-row scales — R k-scale and R v-scale refs
    ([1, 1, 1, ps] f32 blocks, scales along lanes) follow the v-page refs.
    The scales are folded into the scores / probabilities as (1, span) row
    vectors (see module comment) — no per-row dequantization, no
    transposes. The scale blocks add ~3% to the page DMA bytes, so the
    decode step reads ~half the HBM bytes of the bf16 walk. NOTE: the
    tuned library kernel is NOT used for int8 pools — it broadcasts
    scales to full [.., ps, D] f32 arrays before its pallas_call
    (paged_attention_kernel.py:428-432), materializing 4× the int8 pool in
    HBM (measured: 24 GB program, OOM on a 16 GB chip)."""

    def kernel(page_table_ref, lengths_ref, q_ref, *rest):
        k_refs = rest[:R]
        v_refs = rest[R : 2 * R]
        base = 2 * R
        if quant:
            ks_refs = rest[base : base + R]
            vs_refs = rest[base + R : base + 2 * R]
            base += 2 * R
        k_new_ref, v_new_ref = rest[base], rest[base + 1]
        o_ref = rest[base + 2]
        m_scratch, l_scratch, acc_scratch = rest[base + 3 : base + 6]

        b = pl.program_id(0)
        p = pl.program_id(2)
        n_blocks = pl.num_programs(2)
        span = R * page_size

        @pl.when(p == 0)
        def _reset():
            m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
            l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
            acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

        length = lengths_ref[b]
        if window is None:
            lo = jnp.int32(0)
            live = p * span < length
        else:
            lo = jnp.maximum(length - window + (1 if has_new else 0), 0)
            live = (p * span < length) & ((p + 1) * span > lo)

        @pl.when(live)
        def _block():
            q = q_ref[0, 0]                               # [G, D]
            k = jnp.concatenate([r[0, 0] for r in k_refs], axis=0)  # [span, D]
            v = jnp.concatenate([r[0, 0] for r in v_refs], axis=0)
            if quant:
                # (1, span) row-scale vectors; int8 → q.dtype is exact.
                ksc = jnp.concatenate([r[0, 0] for r in ks_refs], axis=1)
                vsc = jnp.concatenate([r[0, 0] for r in vs_refs], axis=1)
                k = k.astype(q.dtype)
                v = v.astype(q.dtype)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale                                      # [G, span]
            if quant:
                # Fold the K row scales into the scores: s_j ·= ksc_j/127.5.
                s = s * (ksc * (1.0 / KV_QUANT_MAX))

            slot = p * span + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            mask = (slot < length) & (slot >= lo)
            s = jnp.where(mask, s, NEG_INF)

            m_prev, l_prev = m_scratch[...], l_scratch[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
            alpha = jnp.exp(m_prev - m_next)
            pexp = jnp.where(mask, jnp.exp(s - m_next[:, :1]), 0.0)
            l_scratch[...] = alpha * l_prev + jnp.sum(pexp, axis=1, keepdims=True)
            m_scratch[...] = m_next
            acc_scratch[...] *= alpha[:, :1]
            if quant:
                # Fold the V row scales into the probabilities:
                # acc += (p · vsc/127.5) @ vq  ==  p @ (vq·vsc/127.5).
                pexp = pexp * (vsc * (1.0 / KV_QUANT_MAX))
            acc_scratch[...] += jax.lax.dot(
                pexp.astype(v.dtype), v, preferred_element_type=jnp.float32
            )

        @pl.when(p == n_blocks - 1)
        def _store():
            m_prev, l_prev, acc = m_scratch[...], l_scratch[...], acc_scratch[...]
            if has_new:
                # Fold the current token's K/V in as the final online-softmax
                # term: attention covers cache slots [0, length) plus itself.
                q = q_ref[0, 0].astype(jnp.float32)        # [G, D]
                kn = k_new_ref[0, 0].astype(jnp.float32)   # [1, D]
                vn = v_new_ref[0, 0].astype(jnp.float32)   # [1, D]
                s_self = jax.lax.dot_general(
                    q, kn, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale                                  # [G, 1]
                m_next = jnp.maximum(m_prev, jnp.broadcast_to(s_self, m_prev.shape))
                alpha = jnp.exp(m_prev - m_next)
                p_self = jnp.exp(s_self - m_next[:, :1])   # [G, 1]
                l_prev = alpha * l_prev + p_self
                acc = acc * alpha[:, :1] + p_self * vn
            l = l_prev[:, :1]
            l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
            o_ref[0, 0] = (acc * l_inv).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "use_lib",
                                             "sliding_window"))
def paged_attention(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,
    lengths: jnp.ndarray,
    k_new: Optional[jnp.ndarray] = None,
    v_new: Optional[jnp.ndarray] = None,
    scale=None,
    interpret=None,
    use_lib=None,
    sliding_window: Optional[int] = None,
    k_scales: Optional[jnp.ndarray] = None,
    v_scales: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """q [B, Hq, D] against paged KV ([Hkv, num_pages, page_size, D]).

    `lengths` counts tokens already IN the pools. With `k_new`/`v_new`
    [B, Hkv, D] given, the current token participates in attention as a
    final self-term (exact online softmax) without being written to the
    pools first — see module docstring for why. Returns [B, Hq, D].

    `sliding_window` masks slots below the Mistral window (backbone
    semantics: window 4096, max_position 32768 — reference
    `checkpoints/.../config.json`); pass it only when sequences can
    actually exceed the window (it routes off the tuned library kernel,
    which has no window support).

    `k_scales`/`v_scales` [Hkv, num_pages, 1, page_size] (pool scale
    layout — see module comment) mark the pools as int8-quantized per row
    (numeric convention: `row ≈ int8 · scale/127.5`, scale = row absmax at
    write time). Halves the KV bytes per decode step — the dominant HBM
    traffic at high slot counts. The custom kernel folds the scales into
    scores/probabilities in VMEM; the tuned library kernel is NOT used for
    int8 pools because it broadcasts the scales to full [.., ps, D] f32
    arrays host-side (4× the int8 pool in HBM — OOM).
    """
    B, Hq, D = q.shape
    if v_pages is None:
        # KV-fused pool (see `paged_attention_fa`): every shape rides the
        # flash-structure kernel — the library kernel and the block-spec
        # walk below only know split pools.
        if k_new is None:
            return paged_attention_fa(
                q[:, None], k_pages, None, page_table, lengths, lengths - 1,
                scale=scale, sliding_window=sliding_window,
                k_scales=k_scales, interpret=interpret,
            )[:, 0]
        return paged_attention_fa(
            q[:, None], k_pages, None, page_table, lengths, lengths,
            scale=scale, sliding_window=sliding_window,
            k_scales=k_scales, k_new=k_new, v_new=v_new,
            interpret=interpret,
        )[:, 0]
    Hkv, _, page_size, _ = k_pages.shape
    pages_per_seq = page_table.shape[1]
    group = Hq // Hkv
    scale = D ** -0.5 if scale is None else scale
    quant = k_scales is not None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if use_lib is None:
        use_lib = (not interpret and k_new is None and scale == D ** -0.5
                   and sliding_window is None and not quant)

    if use_lib:
        from jax.experimental.pallas.ops.tpu.paged_attention import (
            paged_attention as _lib_paged_attention,
        )

        block = next(b for b in (8, 4, 2, 1) if pages_per_seq % b == 0)
        return _lib_paged_attention(
            q, k_pages, v_pages, lengths, page_table,
            pages_per_compute_block=block,
        )

    if k_new is None:
        # Every non-library single-token case (int8 pools, sliding window,
        # non-default scale, interpret) rides the flash-structure kernel —
        # parity with the tuned library kernel at bf16 and ~20% faster on
        # int8 pools (measured v5e B=64: lib 0.91 ms, FA bf16 0.91, FA
        # int8 0.73).
        return paged_attention_fa(
            q[:, None], k_pages, v_pages, page_table, lengths, lengths - 1,
            scale=scale, sliding_window=sliding_window,
            k_scales=k_scales, v_scales=v_scales, interpret=interpret,
        )[:, 0]

    # [B, Hkv, G, D] grouped query layout.
    qg = q.reshape(B, Hkv, group, D)
    has_new = k_new is not None
    if not has_new:  # dummy operands keep one kernel signature
        k_new = jnp.zeros((B, Hkv, D), q.dtype)
        v_new = jnp.zeros((B, Hkv, D), q.dtype)
    # Singleton token axis: TPU lowering needs the last two block dims to be
    # full (or 8/128-aligned); [B, Hkv, 1, D] blocks as (1, 1, 1, D).
    k_new = k_new[:, :, None, :]
    v_new = v_new[:, :, None, :]

    # R pages per grid cell (clamped to the sequence span); page j of cell p
    # reads table entry min(R*p+j, last) — overshoot rows are masked out by
    # the slot<length test and their DMAs dedup against the clamped entry.
    # NOTE (measured, v5e, 32 slots × 16-page tables, 704-token sequences):
    # a "smarter" index map that also clamps p to the sequence's last valid
    # block (so wholly-invalid blocks dedup against the previous step's
    # DMAs) is 20% SLOWER (44.7 vs 37.0 ms/step through the full decoder) —
    # the per-operand scalar-core division/min in the index map stalls the
    # prefetch pipeline more than the redundant fetches cost. Keep the
    # index math minimal.
    R = min(8, pages_per_seq)
    n_blocks = -(-pages_per_seq // R)

    def page_spec(j):
        return pl.BlockSpec(
            (1, 1, page_size, D),
            lambda b, h, p, pt, ln, j=j: (
                h, pt[b, jnp.minimum(R * p + j, pages_per_seq - 1)], 0, 0
            ),
        )

    def scale_spec(j):
        # Scale pool [Hkv, N, 1, ps]: one page's row scales along lanes.
        return pl.BlockSpec(
            (1, 1, 1, page_size),
            lambda b, h, p, pt, ln, j=j: (
                h, pt[b, jnp.minimum(R * p + j, pages_per_seq - 1)], 0, 0
            ),
        )

    scale_operands, scale_specs = (), []
    if quant:
        scale_operands = (*([k_scales] * R), *([v_scales] * R))
        scale_specs = [scale_spec(j) for j in range(R)] * 2

    grid = (B, Hkv, n_blocks)
    out = pl.pallas_call(
        _make_kernel(R, page_size=page_size, scale=scale, has_new=has_new,
                     window=sliding_window, quant=quant),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, group, D), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # page_table, lengths
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, group, D), lambda b, h, p, pt, ln: (b, h, 0, 0)),
                *[page_spec(j) for j in range(R)],
                *[page_spec(j) for j in range(R)],
                *scale_specs,
                pl.BlockSpec((1, 1, 1, D), lambda b, h, p, pt, ln: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, 1, D), lambda b, h, p, pt, ln: (b, h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, group, D), lambda b, h, p, pt, ln: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((group, 128), jnp.float32),
                pltpu.VMEM((group, 128), jnp.float32),
                pltpu.VMEM((group, D), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table, lengths, qg, *([k_pages] * R), *([v_pages] * R),
      *scale_operands, k_new, v_new)
    return out.reshape(B, Hq, D)


# ---------------------------------------------------------------------------
# Flash-structure kernel: pools stay in HBM (memory_space=ANY) and page
# blocks stream through double-buffered VMEM scratch via manual async
# copies, with the NEXT block's DMAs issued while the current block
# computes (including across grid cells, via mutable SMEM scalar state).
# This is the tuned library kernel's pipeline structure
# (jax...paged_attention_kernel.py) — measured 2× faster than the
# block-spec-operand walk above at decode shapes — extended three ways the
# library kernel cannot do:
#   · int8 pools with lane-layout per-row scales folded into the
#     scores/probabilities (the library variant broadcasts scales to full
#     [.., ps, D] f32 arrays host-side — 4× the int8 pool in HBM, OOM);
#     matmul inputs stay bf16/int8 on the MXU, no f32 dequant pass.
#   · sliding windows, applied to the LOOP BOUNDS (blocks wholly below
#     `q_offs − window + 1` are never fetched) rather than as a mask.
#   · S > 1 query rows per slot at consecutive positions — the
#     speculative-verify shape (row j sits at position q_offs[b]+j and
#     attends causally through the pool, including rows j' < j written
#     just before the call).
# ---------------------------------------------------------------------------


def _fa_kernel(G: int, S: int, bk: int, ppcb: int, page_size: int,
               pages_per_seq: int, scale: float, quant: bool,
               window: Optional[int], batch_size: int, num_kv_heads: int):
    """One (b, h) grid cell computes a whole slot×kv-head via an inline
    fori_loop over compute blocks of `ppcb` pages (bk = ppcb·page_size
    slots per block)."""

    def process_block(k_hbm, v_hbm, ks_hbm, vs_hbm, kb, vb, ksb, vsb, ksem,
                      vsem, pt_ref, lengths_ref, b, h, i, slot, wait):
        """Start (or wait on) the copies for compute block i of slot b in
        buffer `slot`. Only the `npg` pages that hold tokens are fetched
        (tail partial fetch — see `_fa_mh_kernel.process_block`); stale
        buffer pages beyond npg are masked by slot<length and the V
        buffer is zeroed once at init so stale VMEM can't be NaN."""
        base = b * pages_per_seq + i * ppcb
        npg = jnp.clip(
            lax.div(lengths_ref[b] + (page_size - 1), page_size) - i * ppcb,
            1, ppcb)
        for j in range(ppcb):
            pid = pt_ref[base + jnp.minimum(j, pages_per_seq - 1 - i * ppcb)]
            copies = [
                pltpu.make_async_copy(
                    k_hbm.at[h, pid], kb.at[slot, j], ksem.at[slot]),
                pltpu.make_async_copy(
                    v_hbm.at[h, pid], vb.at[slot, j], vsem.at[slot]),
            ]
            if quant:
                copies.append(pltpu.make_async_copy(
                    ks_hbm.at[h, pid], ksb.at[slot, j], ksem.at[slot]))
                copies.append(pltpu.make_async_copy(
                    vs_hbm.at[h, pid], vsb.at[slot, j], vsem.at[slot]))

            if j == 0:  # npg ≥ 1: page 0 is always live
                for c in copies:
                    c.wait() if wait else c.start()
            else:
                @pl.when(j < npg)
                def _page(copies=copies):
                    for c in copies:
                        c.wait() if wait else c.start()

    def kernel(lengths_ref, pt_ref, qoffs_ref, buf_ref, init_ref, q_ref,
               kn_ref, vn_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref,
               kb, vb, ksb, vsb, ksem, vsem, m_s, l_s, acc_s):
        # kn_ref/vn_ref are dummy operands on this grid (self-term decode is
        # a folded-grid feature); they keep one pallas_call signature.
        b, h = pl.program_id(0), pl.program_id(1)

        def lo_blk(bb):
            if window is None:
                return jnp.int32(0)
            return jnp.maximum(qoffs_ref[bb] - (window - 1), 0) // bk

        def hi_blk(bb):
            return lax.div(lengths_ref[bb] + (bk - 1), bk)

        def empty(bb):
            bc = jnp.minimum(bb, batch_size - 1)
            return hi_blk(bc) <= lo_blk(bc)

        def next_indices(b, h, i):
            # First (h, i) of the next slot with a non-empty block range;
            # b == batch_size signals "no further work" (prefetch skipped).
            # The empty-slot scan runs ONLY when slot b+1 is actually empty
            # (rare in serving: every slot has length ≥ 1) — an
            # unconditional scan here delays the next block's DMA issue by
            # O(B) scalar-core iterations per cell transition (measured
            # +70% on the whole kernel at B=64).
            def advance_b():
                next_b = b + 1

                def scan():
                    found = lax.fori_loop(
                        next_b + 1, batch_size,
                        lambda bb, best: jnp.where(
                            (best < 0) & ~empty(bb), bb, best),
                        jnp.int32(-1),
                    )
                    return jnp.where(found < 0, batch_size, found)

                nb = lax.cond(
                    (next_b < batch_size) & empty(next_b), scan,
                    lambda: next_b,
                )
                return (nb, jnp.int32(0),
                        lo_blk(jnp.minimum(nb, batch_size - 1)))

            def advance_h():
                return lax.cond(
                    h + 1 < num_kv_heads,
                    lambda: (b, h + 1, lo_blk(b)),
                    advance_b,
                )

            return lax.cond(i < hi_blk(b), lambda: (b, h, i), advance_h)

        m_s[...] = jnp.full(m_s.shape, -jnp.inf, jnp.float32)
        l_s[...] = jnp.zeros(l_s.shape, jnp.float32)
        acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)

        length = lengths_ref[b]
        qoff = qoffs_ref[b]
        lo = lo_blk(b)
        hi = hi_blk(b)

        def body(i, _):
            buf = buf_ref[0]

            @pl.when(init_ref[0] == 1)
            def _first():
                init_ref[0] = 0
                # See `_fa_mh_kernel`: stale VMEM past a tail partial fetch
                # must be finite before it can feed the P·V matmul.
                vb[...] = jnp.zeros(vb.shape, vb.dtype)
                process_block(k_hbm, v_hbm, ks_hbm, vs_hbm, kb, vb,
                              ksb, vsb, ksem, vsem, pt_ref, lengths_ref,
                              b, h, i, buf, wait=False)

            # Issue the next block's DMAs (possibly the next grid cell's
            # first block) before waiting on this one.
            nb, nh, ni = next_indices(b, h, i + 1)

            @pl.when(nb < batch_size)
            def _prefetch():
                nbuf = 1 - buf
                process_block(k_hbm, v_hbm, ks_hbm, vs_hbm, kb, vb,
                              ksb, vsb, ksem, vsem, pt_ref, lengths_ref,
                              nb, nh, ni, nbuf, wait=False)
                buf_ref[0] = nbuf

            # Wait on this block's copies (identical predicates and
            # descriptors to the ones started by _first or the previous
            # iteration's prefetch — each wait dequeues its own copy's
            # completion).
            process_block(k_hbm, v_hbm, ks_hbm, vs_hbm, kb, vb,
                          ksb, vsb, ksem, vsem, pt_ref, lengths_ref,
                          b, h, i, buf, wait=True)

            q = q_ref[0, 0]                                   # [S*G, D]
            k = kb[buf].reshape(bk, -1)                       # [bk, D]
            v = vb[buf].reshape(bk, -1)
            if quant:
                k = k.astype(q.dtype)
                v = v.astype(q.dtype)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                         # [S*G, bk]
            if quant:
                ksc = ksb[buf].reshape(1, bk)
                s = s * (ksc * (1.0 / KV_QUANT_MAX))

            slot = i * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            qpos = qoff + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // G
            mask = (slot <= qpos) & (slot < length)
            if window is not None:
                mask &= slot > qpos - window
            s = jnp.where(mask, s, NEG_INF)

            m_prev, l_prev = m_s[...], l_s[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
            alpha = jnp.exp(m_prev - m_next)
            pexp = jnp.where(mask, jnp.exp(s - m_next[:, :1]), 0.0)
            l_s[...] = alpha * l_prev + jnp.sum(pexp, axis=1, keepdims=True)
            m_s[...] = m_next
            acc_s[...] *= alpha[:, :1]
            if quant:
                # Masked re-select: stale scale lanes past the tail partial
                # fetch may be non-finite, and 0·NaN = NaN.
                vsc = vsb[buf].reshape(1, bk)
                pexp = jnp.where(
                    mask, pexp * (vsc * (1.0 / KV_QUANT_MAX)), 0.0)
            acc_s[...] += jax.lax.dot(
                pexp.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            return ()

        lax.fori_loop(lo, hi, body, ())

        l = l_s[...][:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_s[...] * l_inv).astype(o_ref.dtype)

    return kernel


def _fa_mh_kernel(G: int, S: int, bk: int, ppcb: int, page_size: int,
                  pages_per_seq: int, scale: float, quant: bool,
                  window: Optional[int], batch_size: int,
                  num_kv_heads: int, has_new: bool = False,
                  fused: bool = False):
    """One grid cell per SLOT, all kv heads folded in: grid (B,) instead of
    (B, Hkv). At serving batch sizes the (B, Hkv) grid is per-cell-overhead
    bound (B=64 × Hkv=8 = 512 cells/layer doing ~µs of work each); folding
    heads cuts the cell count 8× and batches each page's per-head fetches
    into ONE strided DMA (`k_hbm.at[:, pid]` — the head dim strides the
    pool). Scratch is head-major (`[2, Hkv, ppcb, ps, D]`) so each head's
    compute slice is contiguous. Compute is head-BATCHED: one
    [Hkv, SG, ·] dot_general pair + one set of [Hkv, SG, bk] VPU softmax
    ops per block instead of a per-head Python loop of Hkv tiny dots
    (measured v5e B=128 fused int8 ppcb=8: 19.79 → 16.47 ms per 32-layer
    step-equiv).

    `fused`: the KV-FUSED pool layout — `k_hbm` is one [Hkv, N, 2·ps, D]
    pool holding a page's K rows then its V rows ([Hkv, N, 1, 2·ps]
    scales likewise), so each page (or run) moves in ONE DMA instead of
    two (four with scales): the third descriptor-count lever on a
    descriptor-bound kernel. `v_hbm`/`vs_hbm` and the v/vs buffers are
    dummies in this mode; compute slices K and V out of the fused buffer
    rows (static offsets — free)."""

    def process_block(k_hbm, v_hbm, ks_hbm, vs_hbm, kb, vb, ksb, vsb, ksem,
                      vsem, pt_ref, lengths_ref, b, i, slot, wait):
        """Start (or wait on) compute block i of slot b in buffer `slot`.

        Two descriptor-count levers (measured v5e B=64: the kernel is
        DMA-descriptor-bound, ~0.5 µs per descriptor; bytes and block
        count barely move the time):
        · RUN fast path — when a block's table entries are an ascending
          run of pool ids (the allocator hands out contiguous runs when
          it can), the whole block moves in ONE dynamic-slice DMA per
          operand instead of ppcb.
        · TAIL partial fetch — only the `npg` pages that actually hold
          tokens are fetched; overshoot pages past ceil(length/ps) are
          never touched (they used to be clamped-duplicate DMAs, which
          still cost descriptors). Stale buffer contents beyond npg are
          masked out by the slot<length test; the V buffers are zeroed
          once at kernel init so never-written VMEM can't feed NaNs into
          the P·V matmul (0·NaN = NaN even in masked-out columns).
        All predicates are pure scalar state — recomputed identically at
        start and wait time, so starts and waits always pair."""
        base = b * pages_per_seq + i * ppcb
        # Pages of this block that hold tokens of slot b (≥ 1: the body
        # only runs for blocks below hi_blk).
        npg = jnp.clip(
            lax.div(lengths_ref[b] + (page_size - 1), page_size) - i * ppcb,
            1, ppcb)
        pids = [pt_ref[base + jnp.minimum(j, pages_per_seq - 1 - i * ppcb)]
                for j in range(ppcb)]

        def go(copies):
            for c in copies:
                c.wait() if wait else c.start()

        def scatter(T):
            copies = []
            for j in range(T):
                copies.append(pltpu.make_async_copy(
                    k_hbm.at[:, pids[j]], kb.at[slot, :, j], ksem.at[slot]))
                if not fused:
                    copies.append(pltpu.make_async_copy(
                        v_hbm.at[:, pids[j]], vb.at[slot, :, j],
                        vsem.at[slot]))
                if quant:
                    copies.append(pltpu.make_async_copy(
                        ks_hbm.at[:, pids[j]], ksb.at[slot, :, j],
                        ksem.at[slot]))
                    if not fused:
                        copies.append(pltpu.make_async_copy(
                            vs_hbm.at[:, pids[j]], vsb.at[slot, :, j],
                            vsem.at[slot]))
            go(copies)

        def run(T):
            # Scratch is [2, Hkv, ppcb, ps, D]; the run slice matches the
            # buffer's [Hkv, ppcb, ps, D] layout directly (page dim second).
            pid0 = pids[0]
            copies = [
                pltpu.make_async_copy(
                    k_hbm.at[:, pl.ds(pid0, T)], kb.at[slot, :, pl.ds(0, T)],
                    ksem.at[slot]),
            ]
            if not fused:
                copies.append(pltpu.make_async_copy(
                    v_hbm.at[:, pl.ds(pid0, T)], vb.at[slot, :, pl.ds(0, T)],
                    vsem.at[slot]))
            if quant:
                copies.append(pltpu.make_async_copy(
                    ks_hbm.at[:, pl.ds(pid0, T)],
                    ksb.at[slot, :, pl.ds(0, T)], ksem.at[slot]))
                if not fused:
                    copies.append(pltpu.make_async_copy(
                        vs_hbm.at[:, pl.ds(pid0, T)],
                        vsb.at[slot, :, pl.ds(0, T)], vsem.at[slot]))
            go(copies)

        if ppcb == 1:
            scatter(1)
            return

        # An ascending run of T pool ids needs T distinct pages, so the run
        # fast path is impossible (and its static slice invalid) when T
        # exceeds the pool's page count — tiny test pools hit this.
        pool_pages = k_hbm.shape[1]

        for T in range(1, ppcb + 1):
            is_T = npg == T
            if T == 1:
                @pl.when(is_T)
                def _one():
                    scatter(1)
            elif T > pool_pages:
                @pl.when(is_T)
                def _scatter_only(T=T):
                    scatter(T)
            else:
                run_ok = pids[1] == pids[0] + 1
                for j in range(2, T):
                    run_ok &= pids[j] == pids[0] + j

                @pl.when(is_T & run_ok)
                def _run(T=T):
                    run(T)

                @pl.when(is_T & jnp.logical_not(run_ok))
                def _scatter(T=T):
                    scatter(T)

    SG = S * G
    Hkv = num_kv_heads

    def kernel(lengths_ref, pt_ref, qoffs_ref, buf_ref, init_ref, q_ref,
               kn_ref, vn_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref,
               kb, vb, ksb, vsb, ksem, vsem, m_s, l_s, acc_s):
        b = pl.program_id(0)

        def lo_blk(bb):
            if window is None:
                return jnp.int32(0)
            return jnp.maximum(qoffs_ref[bb] - (window - 1), 0) // bk

        def hi_blk(bb):
            return lax.div(lengths_ref[bb] + (bk - 1), bk)

        def empty(bb):
            bc = jnp.minimum(bb, batch_size - 1)
            return hi_blk(bc) <= lo_blk(bc)

        def next_indices(b, i):
            # First block of the next slot with work; b == batch_size means
            # done. (Cheap path when b+1 is non-empty — see `_fa_kernel`.)
            def advance_b():
                next_b = b + 1

                def scan():
                    found = lax.fori_loop(
                        next_b + 1, batch_size,
                        lambda bb, best: jnp.where(
                            (best < 0) & ~empty(bb), bb, best),
                        jnp.int32(-1),
                    )
                    return jnp.where(found < 0, batch_size, found)

                nb = lax.cond(
                    (next_b < batch_size) & empty(next_b), scan,
                    lambda: next_b,
                )
                return nb, lo_blk(jnp.minimum(nb, batch_size - 1))

            return lax.cond(i < hi_blk(b), lambda: (b, i), advance_b)

        m_s[...] = jnp.full(m_s.shape, -jnp.inf, jnp.float32)
        l_s[...] = jnp.zeros(l_s.shape, jnp.float32)
        acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)

        length = lengths_ref[b]
        qoff = qoffs_ref[b]
        lo = lo_blk(b)
        hi = hi_blk(b)

        def body(i, _):
            buf = buf_ref[0]

            @pl.when(init_ref[0] == 1)
            def _first():
                init_ref[0] = 0
                # Never-written VMEM may hold non-finite bit patterns; the
                # tail partial fetch leaves pages ≥ npg stale, and a NaN in
                # V reaches the output through the P·V matmul even where
                # P's columns are masked to 0 (0·NaN = NaN). One zero fill
                # before any DMA makes every future stale byte finite
                # (fetched pool data is always finite). In fused mode the
                # V rows live inside kb, so the fused buffer is zeroed.
                if fused:
                    kb[...] = jnp.zeros(kb.shape, kb.dtype)
                else:
                    vb[...] = jnp.zeros(vb.shape, vb.dtype)
                process_block(k_hbm, v_hbm, ks_hbm, vs_hbm, kb, vb,
                              ksb, vsb, ksem, vsem, pt_ref, lengths_ref,
                              b, i, buf, wait=False)

            nb, ni = next_indices(b, i + 1)

            @pl.when(nb < batch_size)
            def _prefetch():
                nbuf = 1 - buf
                process_block(k_hbm, v_hbm, ks_hbm, vs_hbm, kb, vb,
                              ksb, vsb, ksem, vsem, pt_ref, lengths_ref,
                              nb, ni, nbuf, wait=False)
                buf_ref[0] = nbuf

            process_block(k_hbm, v_hbm, ks_hbm, vs_hbm, kb, vb,
                          ksb, vsb, ksem, vsem, pt_ref, lengths_ref,
                          b, i, buf, wait=True)

            # Mask geometry is shared by every head.
            slot = i * bk + jax.lax.broadcasted_iota(jnp.int32, (SG, bk), 1)
            qpos = qoff + jax.lax.broadcasted_iota(jnp.int32, (SG, bk), 0) // G
            mask = (slot <= qpos) & (slot < length)
            if window is not None:
                mask &= slot > qpos - window
            mask3 = mask[None]                              # [1, SG, bk]

            # All kv heads in ONE batched dot_general pair + one set of
            # [Hkv, SG, bk] VPU softmax ops, instead of a per-head Python
            # loop of Hkv tiny dots (measured v5e B=128 fused int8 ppcb=8:
            # 19.79 → 16.47 ms per 32-layer step-equiv, −17%).
            q = q_ref[0]                                    # [Hkv, SG, D]
            if fused:
                # Fused buffer [Hkv, ppcb, 2·ps, D]: rows [0, ps) are K,
                # [ps, 2·ps) are V — static slices, no data movement.
                kv = kb[buf]
                k = kv[:, :, :page_size].reshape(Hkv, bk, -1)
                v = kv[:, :, page_size:].reshape(Hkv, bk, -1)
            else:
                k = kb[buf].reshape(Hkv, bk, -1)            # [Hkv, bk, D]
                v = vb[buf].reshape(Hkv, bk, -1)
            if quant:
                k = k.astype(q.dtype)
                v = v.astype(q.dtype)
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale                                       # [Hkv, SG, bk]
            if quant:
                if fused:
                    ksc = ksb[buf][:, :, 0, :page_size].reshape(Hkv, 1, bk)
                else:
                    ksc = ksb[buf].reshape(Hkv, 1, bk)
                s = s * (ksc * (1.0 / KV_QUANT_MAX))
            s = jnp.where(mask3, s, NEG_INF)

            m_prev, l_prev = m_s[...], l_s[...]
            m_curr = jnp.max(s, axis=2, keepdims=True)
            m_next = jnp.maximum(
                m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
            alpha = jnp.exp(m_prev - m_next)
            pexp = jnp.where(mask3, jnp.exp(s - m_next[:, :, :1]), 0.0)
            l_s[...] = alpha * l_prev + jnp.sum(pexp, axis=2, keepdims=True)
            m_s[...] = m_next
            acc_s[...] *= alpha[:, :, :1]
            if quant:
                # Masked re-select: stale scale lanes past the tail
                # partial fetch may be non-finite, and 0·NaN = NaN.
                if fused:
                    vsc = ksb[buf][:, :, 0, page_size:].reshape(Hkv, 1, bk)
                else:
                    vsc = vsb[buf].reshape(Hkv, 1, bk)
                pexp = jnp.where(
                    mask3, pexp * (vsc * (1.0 / KV_QUANT_MAX)), 0.0)
            acc_s[...] += jax.lax.dot_general(
                pexp.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return ()

        lax.fori_loop(lo, hi, body, ())

        m_prev, l_prev, acc = m_s[...], l_s[...], acc_s[...]
        if has_new:
            # Fold the current token's (unquantized) K/V in as the final
            # online-softmax term: attention covers pool slots
            # [lo·bk, length) plus itself, so the hot decode path never
            # has to write the pools before attending.
            q = q_ref[0].astype(jnp.float32)               # [Hkv, SG, D]
            kn = kn_ref[0][:, None].astype(jnp.float32)    # [Hkv, 1, D]
            vn = vn_ref[0][:, None].astype(jnp.float32)
            s_self = jax.lax.dot_general(
                q, kn, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale                                      # [Hkv, SG, 1]
            m_next = jnp.maximum(
                m_prev, jnp.broadcast_to(s_self, m_prev.shape))
            alpha = jnp.exp(m_prev - m_next)
            p_self = jnp.exp(s_self - m_next[:, :, :1])
            l_prev = alpha * l_prev + p_self
            acc = acc * alpha[:, :, :1] + p_self * vn
        l = l_prev[:, :, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0] = (acc * l_inv).astype(o_ref.dtype)

    return kernel


def _fa_gmh_kernel(G: int, S: int, bk: int, ppcb: int, page_size: int,
                   pages_per_seq: int, scale: float, quant: bool,
                   window: Optional[int], batch_size: int,
                   num_kv_heads: int, slot_block: int,
                   has_new: bool = False, fused: bool = False):
    """Slot-GROUPED folded kernel: grid (B/SB,), each cell covers SB slots.

    At serving batch sizes the folded (B,) grid is fixed-cost bound: 128
    slots × 32 layers = 4096 programs/step at ~0.5 µs/program plus one
    block iteration each at ~0.6 µs (`experiments/program_cost_probe.py`)
    — ~4.5 ms of the 16.3 ms B=128 kernel time is dispatch, not data.
    Grouping SB slots per cell divides BOTH: one program walks the
    group's blocks, and each block's compute is ONE [SB·Hkv, SG, bk]
    dot_general pair + one set of batched VPU softmax ops (the slot dim
    rides the dot's batch dim — slots attend different pages, so K/V
    can't be shared, but the dispatch and bookkeeping can).

    The group walks blocks [min lo, max hi) over its member slots; every
    member fetches on every block — a slot past its own range clamps to
    a 1-page fetch of its own table (correctness comes from the per-slot
    masks; the waste is one page per skewed (slot, block), zero when the
    group's lengths are uniform as in steady-state decode). This keeps
    DMA starts and waits unconditionally paired — no hole blocks, no
    per-slot semaphore predicates.

    Scratch grows SB× (kb [2, SB, Hkv, ppcb, rows, D]): SB=4 fused int8
    at serving shape is ~12.6 MiB — `vmem_limit_bytes` is raised by the
    caller. m/l/acc are [SB·Hkv, SG, ·]."""
    SG = S * G
    Hkv = num_kv_heads
    SB = slot_block
    IBIG = 0x7FFFFFFF  # python int: a jnp scalar here would be a captured const

    def process_block(k_hbm, v_hbm, ks_hbm, vs_hbm, kb, vb, ksb, vsb, ksem,
                      vsem, pt_ref, lengths_ref, c, i, slot, wait):
        """Start (or wait on) compute block i of cell c's SB slots in
        buffer `slot`. Per-slot fetch: the block's pages of slot b, with
        the tail partial fetch (`npg`) and the contiguous-run single-DMA
        fast path, exactly as in `_fa_mh_kernel.process_block` — but a
        slot whose own walk is outside block i clamps to one page of its
        own table (masked out downstream)."""
        pool_pages = k_hbm.shape[1]

        def go(copies):
            for cp in copies:
                cp.wait() if wait else cp.start()

        for s_ in range(SB):
            b = c * SB + s_
            base = b * pages_per_seq
            npg = jnp.clip(
                lax.div(lengths_ref[b] + (page_size - 1), page_size)
                - i * ppcb, 1, ppcb)
            pids = [pt_ref[base + jnp.clip(i * ppcb + j, 0, pages_per_seq - 1)]
                    for j in range(ppcb)]

            def scatter(T, s_=s_, pids=pids):
                copies = []
                for j in range(T):
                    copies.append(pltpu.make_async_copy(
                        k_hbm.at[:, pids[j]], kb.at[slot, s_, :, j],
                        ksem.at[slot]))
                    if not fused:
                        copies.append(pltpu.make_async_copy(
                            v_hbm.at[:, pids[j]], vb.at[slot, s_, :, j],
                            vsem.at[slot]))
                    if quant:
                        copies.append(pltpu.make_async_copy(
                            ks_hbm.at[:, pids[j]], ksb.at[slot, s_, :, j],
                            ksem.at[slot]))
                        if not fused:
                            copies.append(pltpu.make_async_copy(
                                vs_hbm.at[:, pids[j]], vsb.at[slot, s_, :, j],
                                vsem.at[slot]))
                go(copies)

            def run(T, s_=s_, pids=pids):
                pid0 = pids[0]
                copies = [
                    pltpu.make_async_copy(
                        k_hbm.at[:, pl.ds(pid0, T)],
                        kb.at[slot, s_, :, pl.ds(0, T)], ksem.at[slot]),
                ]
                if not fused:
                    copies.append(pltpu.make_async_copy(
                        v_hbm.at[:, pl.ds(pid0, T)],
                        vb.at[slot, s_, :, pl.ds(0, T)], vsem.at[slot]))
                if quant:
                    copies.append(pltpu.make_async_copy(
                        ks_hbm.at[:, pl.ds(pid0, T)],
                        ksb.at[slot, s_, :, pl.ds(0, T)], ksem.at[slot]))
                    if not fused:
                        copies.append(pltpu.make_async_copy(
                            vs_hbm.at[:, pl.ds(pid0, T)],
                            vsb.at[slot, s_, :, pl.ds(0, T)], vsem.at[slot]))
                go(copies)

            if ppcb == 1:
                scatter(1)
                continue

            for T in range(1, ppcb + 1):
                is_T = npg == T
                if T == 1:
                    @pl.when(is_T)
                    def _one(scatter=scatter):
                        scatter(1)
                elif T > pool_pages:
                    @pl.when(is_T)
                    def _scatter_only(T=T, scatter=scatter):
                        scatter(T)
                else:
                    run_ok = pids[1] == pids[0] + 1
                    for j in range(2, T):
                        run_ok &= pids[j] == pids[0] + j

                    @pl.when(is_T & run_ok)
                    def _run(T=T, run=run):
                        run(T)

                    @pl.when(is_T & jnp.logical_not(run_ok))
                    def _scatter(T=T, scatter=scatter):
                        scatter(T)

    def kernel(lengths_ref, pt_ref, qoffs_ref, buf_ref, init_ref, q_ref,
               kn_ref, vn_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref,
               kb, vb, ksb, vsb, ksem, vsem, m_s, l_s, acc_s):
        c = pl.program_id(0)

        def lo_slot(b):
            if window is None:
                return jnp.int32(0)
            return jnp.maximum(qoffs_ref[b] - (window - 1), 0) // bk

        def hi_slot(b):
            return lax.div(lengths_ref[b] + (bk - 1), bk)

        def cell_range(cc):
            """(lo, hi) of cell cc's walk: [min lo, max hi) over its
            non-empty slots (empty members contribute nothing)."""
            lo = IBIG
            hi = jnp.int32(0)
            for s_ in range(SB):
                b = cc * SB + s_
                h = hi_slot(b)
                l = lo_slot(b)
                lo = jnp.minimum(lo, jnp.where(h > l, l, IBIG))
                hi = jnp.maximum(hi, h)
            return lo, hi

        def empty(cc):
            lo, hi = cell_range(jnp.minimum(cc, pl.num_programs(0) - 1))
            return hi <= lo

        def next_indices(cc, i, hi):
            """First block of the next cell with work; cc == n_cells means
            done."""
            n_cells = pl.num_programs(0)

            def advance_c():
                next_c = cc + 1

                def scan():
                    found = lax.fori_loop(
                        next_c + 1, n_cells,
                        lambda x, best: jnp.where(
                            (best < 0) & ~empty(x), x, best),
                        jnp.int32(-1),
                    )
                    return jnp.where(found < 0, n_cells, found)

                nc = lax.cond(
                    (next_c < n_cells) & empty(next_c), scan,
                    lambda: next_c,
                )
                lo, _ = cell_range(jnp.minimum(nc, n_cells - 1))
                return nc, lo

            return lax.cond(i < hi, lambda: (cc, i), advance_c)

        m_s[...] = jnp.full(m_s.shape, -jnp.inf, jnp.float32)
        l_s[...] = jnp.zeros(l_s.shape, jnp.float32)
        acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)

        lo, hi = cell_range(c)
        lo = jnp.minimum(lo, hi)  # all-empty cell: zero-trip walk

        def body(i, _):
            buf = buf_ref[0]

            @pl.when(init_ref[0] == 1)
            def _first():
                init_ref[0] = 0
                if fused:
                    kb[...] = jnp.zeros(kb.shape, kb.dtype)
                else:
                    vb[...] = jnp.zeros(vb.shape, vb.dtype)
                process_block(k_hbm, v_hbm, ks_hbm, vs_hbm, kb, vb,
                              ksb, vsb, ksem, vsem, pt_ref, lengths_ref,
                              c, i, buf, wait=False)

            nc, ni = next_indices(c, i + 1, hi)

            @pl.when(nc < pl.num_programs(0))
            def _prefetch():
                nbuf = 1 - buf
                process_block(k_hbm, v_hbm, ks_hbm, vs_hbm, kb, vb,
                              ksb, vsb, ksem, vsem, pt_ref, lengths_ref,
                              nc, ni, nbuf, wait=False)
                buf_ref[0] = nbuf

            process_block(k_hbm, v_hbm, ks_hbm, vs_hbm, kb, vb,
                          ksb, vsb, ksem, vsem, pt_ref, lengths_ref,
                          c, i, buf, wait=True)

            # Per-slot mask geometry, stacked on the (free) leading dim.
            masks = []
            for s_ in range(SB):
                b = c * SB + s_
                slot = i * bk + jax.lax.broadcasted_iota(
                    jnp.int32, (SG, bk), 1)
                qpos = (qoffs_ref[b]
                        + jax.lax.broadcasted_iota(jnp.int32, (SG, bk), 0)
                        // G)
                m = (slot <= qpos) & (slot < lengths_ref[b])
                if window is not None:
                    m &= slot > qpos - window
                masks.append(m)
            mask = jnp.stack(masks)                          # [SB, SG, bk]
            mask3 = jnp.broadcast_to(
                mask[:, None], (SB, Hkv, SG, bk)).reshape(SB * Hkv, SG, bk)

            # ONE dot pair + one set of softmax ops for the whole group:
            # the slot dim merges into the dot's batch dim.
            q = q_ref[...].reshape(SB * Hkv, SG, -1)
            if fused:
                kv = kb[buf]                    # [SB, Hkv, ppcb, 2·ps, D]
                k = kv[:, :, :, :page_size].reshape(SB * Hkv, bk, -1)
                v = kv[:, :, :, page_size:].reshape(SB * Hkv, bk, -1)
            else:
                k = kb[buf].reshape(SB * Hkv, bk, -1)
                v = vb[buf].reshape(SB * Hkv, bk, -1)
            if quant:
                k = k.astype(q.dtype)
                v = v.astype(q.dtype)
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale                                   # [SB·Hkv, SG, bk]
            if quant:
                if fused:
                    ksc = (ksb[buf][:, :, :, 0, :page_size]
                           .reshape(SB * Hkv, 1, bk))
                else:
                    ksc = ksb[buf].reshape(SB * Hkv, 1, bk)
                s = s * (ksc * (1.0 / KV_QUANT_MAX))
            s = jnp.where(mask3, s, NEG_INF)

            m_prev, l_prev = m_s[...], l_s[...]
            m_curr = jnp.max(s, axis=2, keepdims=True)
            m_next = jnp.maximum(
                m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
            alpha = jnp.exp(m_prev - m_next)
            pexp = jnp.where(mask3, jnp.exp(s - m_next[:, :, :1]), 0.0)
            l_s[...] = alpha * l_prev + jnp.sum(pexp, axis=2, keepdims=True)
            m_s[...] = m_next
            acc_s[...] *= alpha[:, :, :1]
            if quant:
                if fused:
                    vsc = (ksb[buf][:, :, :, 0, page_size:]
                           .reshape(SB * Hkv, 1, bk))
                else:
                    vsc = vsb[buf].reshape(SB * Hkv, 1, bk)
                pexp = jnp.where(
                    mask3, pexp * (vsc * (1.0 / KV_QUANT_MAX)), 0.0)
            acc_s[...] += jax.lax.dot_general(
                pexp.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return ()

        lax.fori_loop(lo, hi, body, ())

        m_prev, l_prev, acc = m_s[...], l_s[...], acc_s[...]
        if has_new:
            q = q_ref[...].reshape(SB * Hkv, SG, -1).astype(jnp.float32)
            kn = kn_ref[...].reshape(SB * Hkv, 1, -1).astype(jnp.float32)
            vn = vn_ref[...].reshape(SB * Hkv, 1, -1).astype(jnp.float32)
            s_self = jax.lax.dot_general(
                q, kn, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale                                   # [SB·Hkv, SG, 1]
            m_next = jnp.maximum(
                m_prev, jnp.broadcast_to(s_self, m_prev.shape))
            alpha = jnp.exp(m_prev - m_next)
            p_self = jnp.exp(s_self - m_next[:, :, :1])
            l_prev = alpha * l_prev + p_self
            acc = acc * alpha[:, :, :1] + p_self * vn
        l = l_prev[:, :, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[...] = (acc * l_inv).reshape(o_ref.shape).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("scale", "sliding_window",
                                             "pages_per_block", "fold_heads",
                                             "slot_block", "interpret"))
def paged_attention_fa(
    q: jnp.ndarray,              # [B, S, Hq, D]
    k_pages: jnp.ndarray,        # [Hkv, N, ps, D] (bf16 or int8)
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,     # [B, pages_per_seq] int32
    lengths: jnp.ndarray,        # [B] tokens in the pools (incl. q rows)
    q_offs: jnp.ndarray,         # [B] position of query row 0
    scale=None,
    sliding_window: Optional[int] = None,
    k_scales: Optional[jnp.ndarray] = None,  # [Hkv, N, 1, ps] f32
    v_scales: Optional[jnp.ndarray] = None,
    k_new: Optional[jnp.ndarray] = None,     # [B, Hkv, D] self-term (S=1)
    v_new: Optional[jnp.ndarray] = None,
    pages_per_block: Optional[int] = None,
    fold_heads: Optional[bool] = None,
    slot_block: Optional[int] = None,
    interpret=None,
) -> jnp.ndarray:
    """Flash-structure paged attention (see section comment above).

    Query row j of slot b sits at position `q_offs[b] + j` and attends
    slots `[max(0, pos−window+1), pos]` of the pool — S=1 with
    `q_offs = lengths − 1` reproduces single-token decode; S>1 is the
    speculative-verify shape (candidate rows must already be written to
    the pools). Returns [B, S, Hq, D].

    `k_new`/`v_new` (S=1, folded grid only): the current token's K/V as a
    final online-softmax self-term — attention covers pool slots
    [0, lengths) PLUS the new token, with `q_offs = lengths`. The decode
    step can then attend first and bulk-write all layers' rows once per
    step (`paged_kv_update_rows`) instead of rewriting a page block per
    (layer, slot). The self-term stays unquantized even over int8 pools.

    `fold_heads`: one grid cell per slot covering all kv heads (default)
    vs one per (slot, kv head). The folded grid is faster at serving
    batch sizes (B·Hkv µs-scale cells are per-cell-overhead-bound;
    measured v5e B=64, 640-token pools: 16.5 ms lib / 15.8 ms (b,h) grid
    → 13.2 ms folded per 32-layer step-equiv) and its strided all-head
    DMAs cost nothing extra; the (b, h) grid remains for VMEM-tight
    shapes (its scratch is Hkv× smaller).

    `slot_block` (SB): group SB slots per grid cell (`_fa_gmh_kernel`) —
    one program walks the group's blocks and each block is ONE
    [SB·Hkv, SG, bk] batched dot pair, dividing the per-program and
    per-block fixed costs SB×. Folded grid only; B is padded to a
    multiple of SB with empty slots. Default from VZT_FA_SB (1 = off).

    KV-FUSED pools (`v_pages=None`): `k_pages` is one
    [Hkv, N, 2·page_size, D] pool holding each page's K rows then its V
    rows (`k_scales` likewise [Hkv, N, 1, 2·page_size], K lanes then V
    lanes; `v_scales=None`) — each page block moves in ONE DMA instead
    of two (four with scales), halving descriptors again on a
    descriptor-bound kernel. Folded grid only."""
    B, S, Hq, D = q.shape
    fused = v_pages is None
    if fused:
        Hkv, _, two_ps, _ = k_pages.shape
        page_size = two_ps // 2
    else:
        Hkv, _, page_size, _ = k_pages.shape
    pages_per_seq = page_table.shape[1]
    G = Hq // Hkv
    SG = S * G
    scale = D ** -0.5 if scale is None else scale
    quant = k_scales is not None
    has_new = k_new is not None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if fold_heads is None:
        fold_heads = True
    if slot_block is not None and slot_block > 1 and not fold_heads:
        raise ValueError("slot_block requires the folded grid")
    if slot_block is None:
        # SB=4 is the measured optimum (v5e B=128 fused int8, 640-token
        # pools, bk=640: SB 1/2/4/8 = 11.96/11.06/10.30/— ms per
        # 32-layer step-equiv; SB=8 at bk=768 ties SB=4 but its scratch
        # is 2× — `experiments/fa_sb_probe.py`). End-to-end pagedqf
        # B=128: 25.34 → 23.94 ms/step same-run. Clamped to B, so
        # single-stream (B=1) is untouched; the (b, h) grid stays
        # ungrouped.
        slot_block = (int(os.environ.get("VZT_FA_SB", "4"))
                      if fold_heads else 1)
    slot_block = max(1, min(slot_block, B))
    if has_new and (S != 1 or not fold_heads):
        raise ValueError("k_new/v_new self-term requires S == 1 and the "
                         "folded grid")
    if fused and not fold_heads:
        raise ValueError("KV-fused pools require the folded grid")

    # Slot grouping: pad B to a multiple of SB with EMPTY slots (length
    # 0, table row 0) — they fetch one clamped page per block and mask
    # to zero output; the pad rows are sliced off below.
    B_in = B
    SB = slot_block
    pad = (-B) % SB
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, *q.shape[1:]), q.dtype)])
        page_table = jnp.concatenate(
            [page_table, jnp.zeros((pad, pages_per_seq), page_table.dtype)])
        lengths = jnp.concatenate(
            [lengths, jnp.zeros((pad,), lengths.dtype)])
        q_offs = jnp.concatenate([q_offs, jnp.zeros((pad,), q_offs.dtype)])
        if has_new:
            k_new = jnp.concatenate(
                [k_new, jnp.zeros((pad, *k_new.shape[1:]), k_new.dtype)])
            v_new = jnp.concatenate(
                [v_new, jnp.zeros((pad, *v_new.shape[1:]), v_new.dtype)])
        B = B + pad

    # [B, Hkv, S*G, D]: a kv head's query rows are its S positions × G
    # group heads; row r ↔ position q_offs + r // G.
    qg = (q.reshape(B, S, Hkv, G, D).transpose(0, 2, 1, 3, 4)
          .reshape(B, Hkv, SG, D))

    if pages_per_block is None:
        # The best block is the SMALLEST one that still covers the
        # serving-typical sequence in one block: per-block fixed overhead
        # (DMA setup, the scalar run/tail predicate chain, softmax
        # bookkeeping) punishes multi-block walks, while every column past
        # the real sequence length is padding the dot_general still pays
        # for, so oversizing the block wastes MXU work and VMEM pipelining.
        # Measured v5e B=128, 640-token fused int8 pools, 32-layer scan,
        # per-head-loop kernel: ppcb 4 (2 blocks/slot) = 25.65 ms, 6 =
        # 20.21, 8 = 19.79, 12 = 23.43, 16 = 27.04. Re-swept with the
        # head-BATCHED kernel (one dot pair per block): 4 = 15.71,
        # 6 = 13.70, 8 = 16.00, 12 = 20.84, 16 = 25.57. Re-swept AGAIN
        # r5 with the slot-GROUPED kernel (`experiments/fa_sb_probe.py`):
        # STANDALONE, bk=640 (ppcb 5 — zero dot-padding columns) beats
        # bk=768 at every SB (SB=4: 12.28 → 10.30 ms) — but IN-STEP the
        # ranking flips hard and reproducibly (pagedqf B=128 A/B/A:
        # bk=768 = 23.94 ms twice, bk=640 = 27.1 ms twice; bk=640 also
        # compiles ~2× slower). Mosaic schedules the ppcb=5 kernel
        # differently inside the full step program than standalone, so
        # the in-step measurement is the one that decides: default 768,
        # VZT_FA_BK to re-tune.
        if fold_heads:
            target = int(os.environ.get("VZT_FA_BK", "768"))  # tuning knob
            pages_per_block = min(max(target // page_size, 1), 6,
                                  pages_per_seq)
        else:
            pages_per_block = min(8, pages_per_seq)
    ppcb = pages_per_block
    bk = ppcb * page_size

    if fused:  # dummy v-side HBM refs keep one kernel signature
        v_pages = jnp.zeros((1, 1, 8, 128), k_pages.dtype)
        v_scales = jnp.zeros((1, 1, 1, page_size), jnp.float32)
    if not quant:  # dummy HBM refs keep one kernel signature
        k_scales = jnp.zeros(
            (Hkv, 1, 1, 2 * page_size if fused else page_size), jnp.float32)
        if not fused:
            v_scales = jnp.zeros((Hkv, 1, 1, page_size), jnp.float32)
    if not has_new:  # dummy self-term operands likewise
        k_new = jnp.zeros((1, Hkv, D), q.dtype)
        v_new = jnp.zeros((1, Hkv, D), q.dtype)

    compiler_kw = {}
    if fold_heads and SB > 1:
        grid = (B // SB,)
        kernel = _fa_gmh_kernel(
            G, S, bk, ppcb, page_size, pages_per_seq, scale, quant,
            sliding_window, B, Hkv, SB, has_new=has_new, fused=fused,
        )
        q_spec = pl.BlockSpec((SB, Hkv, SG, D), lambda c, *_: (c, 0, 0, 0))
        new_spec = pl.BlockSpec(
            (SB, Hkv, D) if has_new else (1, Hkv, D),
            (lambda c, *_: (c, 0, 0)) if has_new else (lambda c, *_: (0, 0, 0)))
        kv_rows = 2 * page_size if fused else page_size
        scratch = [
            pltpu.VMEM((2, SB, Hkv, ppcb, kv_rows, D), k_pages.dtype),
            (pltpu.VMEM((2, 1, 1, 1, 8, 128), k_pages.dtype) if fused else
             pltpu.VMEM((2, SB, Hkv, ppcb, page_size, D), v_pages.dtype)),
            pltpu.VMEM((2, SB, Hkv, ppcb, 1, kv_rows), jnp.float32),
            (pltpu.VMEM((2, 1, 1, 1, 1, 128), jnp.float32) if fused else
             pltpu.VMEM((2, SB, Hkv, ppcb, 1, page_size), jnp.float32)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((SB * Hkv, SG, 128), jnp.float32),
            pltpu.VMEM((SB * Hkv, SG, 128), jnp.float32),
            pltpu.VMEM((SB * Hkv, SG, D), jnp.float32),
        ]
        semantics = ("arbitrary",)
        # The double-buffered group scratch is SB× the per-slot one
        # (~12.6 MiB at SB=4, fused int8 serving shape) — Mosaic's
        # default 16 MiB scoped budget needs headroom for the q/out
        # blocks and accumulators on top.
        compiler_kw["vmem_limit_bytes"] = 100 * 2**20
    elif fold_heads:
        grid = (B,)
        kernel = _fa_mh_kernel(
            G, S, bk, ppcb, page_size, pages_per_seq, scale, quant,
            sliding_window, B, Hkv, has_new=has_new, fused=fused,
        )
        q_spec = pl.BlockSpec((1, Hkv, SG, D), lambda b, *_: (b, 0, 0, 0))
        new_spec = pl.BlockSpec(
            (1, Hkv, D),
            (lambda b, *_: (b, 0, 0)) if has_new else (lambda b, *_: (0, 0, 0)))
        kv_rows = 2 * page_size if fused else page_size
        scratch = [
            pltpu.VMEM((2, Hkv, ppcb, kv_rows, D), k_pages.dtype),
            (pltpu.VMEM((2, 1, 1, 8, 128), k_pages.dtype) if fused else
             pltpu.VMEM((2, Hkv, ppcb, page_size, D), v_pages.dtype)),
            pltpu.VMEM((2, Hkv, ppcb, 1, kv_rows), jnp.float32),
            (pltpu.VMEM((2, 1, 1, 1, 128), jnp.float32) if fused else
             pltpu.VMEM((2, Hkv, ppcb, 1, page_size), jnp.float32)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((Hkv, SG, 128), jnp.float32),
            pltpu.VMEM((Hkv, SG, 128), jnp.float32),
            pltpu.VMEM((Hkv, SG, D), jnp.float32),
        ]
        semantics = ("arbitrary",)
    else:
        grid = (B, Hkv)
        kernel = _fa_kernel(
            G, S, bk, ppcb, page_size, pages_per_seq, scale, quant,
            sliding_window, B, Hkv,
        )
        q_spec = pl.BlockSpec((1, 1, SG, D), lambda b, h, *_: (b, h, 0, 0))
        new_spec = pl.BlockSpec((1, Hkv, D), lambda b, h, *_: (0, 0, 0))
        scratch = [
            pltpu.VMEM((2, ppcb, page_size, D), k_pages.dtype),
            pltpu.VMEM((2, ppcb, page_size, D), v_pages.dtype),
            pltpu.VMEM((2, ppcb, 1, page_size), jnp.float32),
            pltpu.VMEM((2, ppcb, 1, page_size), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((SG, 128), jnp.float32),
            pltpu.VMEM((SG, 128), jnp.float32),
            pltpu.VMEM((SG, D), jnp.float32),
        ]
        semantics = ("arbitrary", "arbitrary")

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, SG, D), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,  # lengths, flat table, q_offs, buf, init
            grid=grid,
            in_specs=[
                q_spec,
                new_spec,
                new_spec,
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=q_spec,
            scratch_shapes=scratch,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics, **compiler_kw,
        ),
        interpret=interpret,
    )(lengths, page_table.reshape(-1), q_offs,
      jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.int32),
      qg, k_new.astype(q.dtype), v_new.astype(q.dtype),
      k_pages, v_pages, k_scales, v_scales)
    out = (out.reshape(B, Hkv, S, G, D).transpose(0, 2, 1, 3, 4)
           .reshape(B, S, Hq, D))
    return out[:B_in] if B != B_in else out


def _kv_update_kernel(page_size: int, fused: bool = False):
    def kernel(pids_ref, offs_ref, k_ref, v_ref, kold_ref, vold_ref,
               kout_ref, vout_ref):
        b = pl.program_id(1)
        off = offs_ref[b]
        if fused:
            # One [Hkv, 1, 2·ps, D] fused page: K row at `off`, V row at
            # `ps + off`.
            row = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, 2 * page_size, 1), 2)
            kout_ref[...] = jnp.where(
                row == off, k_ref[0, 0][:, None, None, :],
                jnp.where(row == page_size + off,
                          v_ref[0, 0][:, None, None, :], kold_ref[...]))
            vout_ref[...] = vold_ref[...]
            return
        row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, page_size, 1), 2)
        sel = row == off
        kout_ref[...] = jnp.where(sel, k_ref[0, 0][:, None, None, :], kold_ref[...])
        vout_ref[...] = jnp.where(sel, v_ref[0, 0][:, None, None, :], vold_ref[...])
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0, 1))
def paged_kv_update(
    k_pages: jnp.ndarray,   # [Hkv, N, ps, D] (donated, updated in place)
    v_pages: jnp.ndarray,
    ks: jnp.ndarray,        # [L, B, Hkv, D] — one decode step's new K rows
    vs: jnp.ndarray,
    page_ids: jnp.ndarray,  # [L, B] int32 absolute pool page per (layer, slot)
    offsets: jnp.ndarray,   # [B] int32 row within the page
    interpret=None,
) -> tuple:
    """Write one decode step's K/V rows into the pools IN PLACE.

    Replaces the XLA scatter `pool.at[:, page_lb, off_lb].set(...)`, which
    costs ~20 ms/step at B=32 on v5e (measured — XLA lowers the scatter to
    a serialized update loop over a 1.6 GB operand). Here each (layer,
    slot) grid cell streams its target page block through VMEM and
    rewrites one row (masked select — no dynamic stores), with
    `input_output_aliases` pinning the pools in place: total traffic is
    2·L·B page blocks (~0.5 GB at B=32) instead of a serialized scatter.

    The caller passes trash-page ids (0) for inactive slots; repeated
    writes to page 0 are benign (it is never attended).

    KV-FUSED pools (`v_pages=None`): `k_pages` is the fused
    [Hkv, N, 2·ps, D] pool; the K row lands at `off`, the V row at
    `ps + off` of the same page block. Returns `(pool, None)`.
    """
    fused = v_pages is None
    if fused:
        Hkv, N, two_ps, D = k_pages.shape
        ps = two_ps // 2
        v_pages = jnp.zeros((1, 1, 8, 128), k_pages.dtype)  # dummy
    else:
        Hkv, N, ps, D = k_pages.shape
    L, B, _, _ = ks.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    flat_pids = page_ids.reshape(-1)
    grid = (L, B)
    page_block = pl.BlockSpec(
        (Hkv, 1, 2 * ps if fused else ps, D),
        lambda l, b, pids, offs: (0, pids[l * B + b], 0, 0)
    )
    v_block = (pl.BlockSpec((1, 1, 8, 128), lambda l, b, pids, offs: (0, 0, 0, 0))
               if fused else page_block)
    new_block = pl.BlockSpec((1, 1, Hkv, D), lambda l, b, pids, offs: (l, b, 0, 0))
    kp, vp = pl.pallas_call(
        _kv_update_kernel(ps, fused=fused),
        out_shape=(jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                   jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # page ids, offsets
            grid=grid,
            in_specs=[new_block, new_block, page_block, v_block],
            out_specs=[page_block, v_block],
        ),
        # Operand indices count flattened args INCLUDING the scalar-prefetch
        # ones (cf. megablox gmm's {6: 0}): pools are args 4 and 5.
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(flat_pids, offsets, ks.astype(k_pages.dtype), vs.astype(k_pages.dtype),
      k_pages, v_pages)
    return (kp, None) if fused else (kp, vp)


def _kv_update_quant_kernel(page_size: int, fused: bool = False):
    def kernel(pids_ref, offs_ref, k_ref, v_ref,
               kold_ref, vold_ref, ksold_ref, vsold_ref,
               kout_ref, vout_ref, ksout_ref, vsout_ref):
        b = pl.program_id(1)
        off = offs_ref[b]
        # Quantize the new rows in VMEM (library convention: int8·s/127.5,
        # s = row absmax) — the pools never hold bf16 rows.
        k = k_ref[0, 0].astype(jnp.float32)   # [Hkv, D]
        v = v_ref[0, 0].astype(jnp.float32)
        ks = jnp.max(jnp.abs(k), axis=-1, keepdims=True)     # [Hkv, 1]
        vs = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
        kq = jnp.rint(k * (KV_QUANT_MAX / jnp.maximum(ks, 1e-9)))
        vq = jnp.rint(v * (KV_QUANT_MAX / jnp.maximum(vs, 1e-9)))
        if fused:
            # Fused page [Hkv, 1, 2·ps, D]: K row at `off`, V at `ps+off`;
            # fused scales [Hkv, 1, 1, 2·ps]: K lane `off`, V lane `ps+off`.
            row = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, 2 * page_size, 1), 2)
            kout_ref[...] = jnp.where(
                row == off, kq.astype(jnp.int8)[:, None, None, :],
                jnp.where(row == page_size + off,
                          vq.astype(jnp.int8)[:, None, None, :],
                          kold_ref[...]))
            vout_ref[...] = vold_ref[...]
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, 1, 2 * page_size), 3)
            ksout_ref[...] = jnp.where(
                lane == off, ks[:, None, None, :],
                jnp.where(lane == page_size + off, vs[:, None, None, :],
                          ksold_ref[...]))
            vsout_ref[...] = vsold_ref[...]
            return
        row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, page_size, 1), 2)
        sel = row == off
        kout_ref[...] = jnp.where(sel, kq.astype(jnp.int8)[:, None, None, :],
                                  kold_ref[...])
        vout_ref[...] = jnp.where(sel, vq.astype(jnp.int8)[:, None, None, :],
                                  vold_ref[...])
        # Scale blocks are [Hkv, 1, 1, ps] (row scales along lanes): select
        # lane `off` and broadcast the [Hkv, 1] scales across it.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, page_size), 3)
        lsel = lane == off
        ksout_ref[...] = jnp.where(lsel, ks[:, None, None, :], ksold_ref[...])
        vsout_ref[...] = jnp.where(lsel, vs[:, None, None, :], vsold_ref[...])
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0, 1, 2, 3))
def paged_kv_update_q(
    k_pages: jnp.ndarray,    # [Hkv, N, ps, D] int8 (donated, in place)
    v_pages: jnp.ndarray,
    k_scales: jnp.ndarray,   # [Hkv, N, 1, ps] f32 row scales along lanes (donated)
    v_scales: jnp.ndarray,
    ks: jnp.ndarray,         # [L, B, Hkv, D] float — new K rows
    vs: jnp.ndarray,
    page_ids: jnp.ndarray,   # [L, B] int32
    offsets: jnp.ndarray,    # [B] int32
    interpret=None,
) -> tuple:
    """`paged_kv_update` for int8-quantized pools: quantizes each new row
    in VMEM and writes the int8 row + its scale in place.

    KV-FUSED pools (`v_pages=None`, `v_scales=None`): the fused pool and
    fused scale pool are updated at `off` (K) and `ps + off` (V); returns
    `(pool, None, scales, None)`."""
    fused = v_pages is None
    if fused:
        Hkv, N, two_ps, D = k_pages.shape
        ps = two_ps // 2
        v_pages = jnp.zeros((1, 1, 8, 128), k_pages.dtype)    # dummies
        v_scales = jnp.zeros((1, 1, 1, 128), k_scales.dtype)
    else:
        Hkv, N, ps, D = k_pages.shape
    L, B, _, _ = ks.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    flat_pids = page_ids.reshape(-1)
    grid = (L, B)
    page_block = pl.BlockSpec(
        (Hkv, 1, 2 * ps if fused else ps, D),
        lambda l, b, pids, offs: (0, pids[l * B + b], 0, 0)
    )
    scale_block = pl.BlockSpec(
        (Hkv, 1, 1, 2 * ps if fused else ps),
        lambda l, b, pids, offs: (0, pids[l * B + b], 0, 0)
    )
    zero4 = lambda l, b, pids, offs: (0, 0, 0, 0)
    v_block = (pl.BlockSpec((1, 1, 8, 128), zero4) if fused else page_block)
    vs_block = (pl.BlockSpec((1, 1, 1, 128), zero4) if fused else scale_block)
    new_block = pl.BlockSpec((1, 1, Hkv, D), lambda l, b, pids, offs: (l, b, 0, 0))
    out = pl.pallas_call(
        _kv_update_quant_kernel(ps, fused=fused),
        out_shape=(jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                   jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
                   jax.ShapeDtypeStruct(k_scales.shape, k_scales.dtype),
                   jax.ShapeDtypeStruct(v_scales.shape, v_scales.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[new_block, new_block,
                      page_block, v_block, scale_block, vs_block],
            out_specs=[page_block, v_block, scale_block, vs_block],
        ),
        # Flattened args incl. scalar-prefetch: (pids, offs, k, v, kp, vp,
        # ksp, vsp) → pools are 4..7.
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(flat_pids, offsets, ks, vs, k_pages, v_pages, k_scales, v_scales)
    return (out[0], None, out[2], None) if fused else out


def _kv_update_rows_kernel(quant: bool, L: int, row_tile: int,
                           page_size: int, fused: bool = False,
                           slots_per_cell: int = 1):
    """Each cell read-modify-writes the `row_tile`-row tile containing a
    slot's row in every layer at once: HBM slices must be tile-aligned in
    the minor-two dims (Mosaic rejects 1-row slices of a [.., ps, D]
    pool), so the write granule is one aligned row tile, not one row.

    `fused`: the pools are KV-fused ([.., 2·ps, D] pages, K rows then V
    rows; scales [.., 1, 2·ps]) — the K tile sits at `base`, the V tile at
    `ps + base` of the SAME pool ref, and one fused scale RMW replaces
    two.

    `slots_per_cell` (SL): the cell handles SL slots, issuing ALL their
    fetches before the first wait (likewise flushes), so the HBM round-trip
    latency amortizes SL×. One cell per slot is LATENCY-bound: measured
    v5e B=128 fused int8, the serialized fetch→wait→RMW→flush→wait chain
    costs 2.47 ms/step (~19 µs/slot) against ~0.7 ms of actual tile
    traffic. Distinct active slots own distinct pages, so same-cell RMWs
    never overlap; inactive slots all target the trash page, whose
    concurrent torn tiles are garbage by definition (active rows are
    never read from it)."""
    SL = slots_per_cell

    def kernel(pages_ref, offs_ref, k_ref, v_ref, k_hbm, v_hbm,
               ks_hbm, vs_hbm, ko_hbm, vo_hbm, kso_hbm, vso_hbm,
               kb, vb, ksb, vsb, sem):
        cell = pl.program_id(0)
        nslots = pages_ref.shape[0]

        def slot_tiles(s):
            """(page, off, base, K tile, V tile) for lane s of this cell.
            Lanes past the slot count re-do the last slot (identical
            bytes, so the duplicate RMW is benign)."""
            b = jnp.minimum(cell * SL + s, nslots - 1)
            page = pages_ref[b]
            off = offs_ref[b]
            base = pl.multiple_of((off // row_tile) * row_tile, row_tile)
            tile = pl.ds(base, row_tile)
            tile_v = None
            if fused:
                # ps is a multiple of row_tile (row_tile = min(32, ps)), so
                # the V tile keeps the alignment guarantee.
                tile_v = pl.ds(pl.multiple_of(page_size + base, row_tile),
                               row_tile)
            return page, off, base, tile, tile_v

        def copies(s, to_hbm):
            page, _off, _base, tile, tile_v = slot_tiles(s)

            def cp(hbm_slice, buf):
                buf = buf.at[s]
                return pltpu.make_async_copy(
                    *( (buf, hbm_slice) if to_hbm else (hbm_slice, buf)),
                    sem)

            cs = [
                cp(ko_hbm.at[:, :, page, tile], kb),
                cp(ko_hbm.at[:, :, page, tile_v] if fused
                   else vo_hbm.at[:, :, page, tile], vb),
            ]
            if quant:
                cs.append(cp(kso_hbm.at[:, :, page], ksb))
                if not fused:
                    cs.append(cp(vso_hbm.at[:, :, page], vsb))
            return cs

        fetch = [c for s in range(SL) for c in copies(s, to_hbm=False)]
        for c in fetch:
            c.start()
        for c in fetch:
            c.wait()

        # Per-lane scalar planes for the batched select.
        offv = jnp.full((SL, 1, 1, row_tile, 1), slot_tiles(0)[1]
                        - slot_tiles(0)[2], jnp.int32)
        sidx = jax.lax.broadcasted_iota(
            jnp.int32, (SL, 1, 1, row_tile, 1), 0)
        for s in range(1, SL):
            _p, off, base, _t, _tv = slot_tiles(s)
            offv = jnp.where(sidx == s, off - base, offv)
        row = jax.lax.broadcasted_iota(
            jnp.int32, (SL, 1, 1, row_tile, 1), 3)
        sel = row == offv

        k = k_ref[...]                                  # [SL, Hkv, L, D]
        v = v_ref[...]
        if quant:
            kf = k.astype(jnp.float32)
            vf = v.astype(jnp.float32)
            ks = jnp.max(jnp.abs(kf), axis=-1, keepdims=True)  # [SL,Hkv,L,1]
            vs = jnp.max(jnp.abs(vf), axis=-1, keepdims=True)
            kq = jnp.rint(kf * (KV_QUANT_MAX / jnp.maximum(ks, 1e-9)))
            vq = jnp.rint(vf * (KV_QUANT_MAX / jnp.maximum(vs, 1e-9)))
            kb[...] = jnp.where(sel, kq.astype(jnp.int8)[:, :, :, None, :],
                                kb[...])
            vb[...] = jnp.where(sel, vq.astype(jnp.int8)[:, :, :, None, :],
                                vb[...])
            # Scale blocks [SL, Hkv, L, 1, ps]: select lane `off` (fused:
            # the K scale lands at lane `off`, the V scale at `ps + off` of
            # the one fused block).
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (SL, 1, 1, 1, ksb.shape[-1]), 4)
            loffv = jnp.full((SL, 1, 1, 1, ksb.shape[-1]),
                             slot_tiles(0)[1], jnp.int32)
            lsidx = jax.lax.broadcasted_iota(
                jnp.int32, (SL, 1, 1, 1, ksb.shape[-1]), 0)
            for s in range(1, SL):
                loffv = jnp.where(lsidx == s, slot_tiles(s)[1], loffv)
            if fused:
                ksb[...] = jnp.where(
                    lane == loffv, ks[:, :, :, None, :],
                    jnp.where(lane == page_size + loffv,
                              vs[:, :, :, None, :], ksb[...]))
            else:
                lsel = lane == loffv
                ksb[...] = jnp.where(lsel, ks[:, :, :, None, :], ksb[...])
                vsb[...] = jnp.where(lsel, vs[:, :, :, None, :], vsb[...])
        else:
            kb[...] = jnp.where(sel, k.astype(kb.dtype)[:, :, :, None, :],
                                kb[...])
            vb[...] = jnp.where(sel, v.astype(vb.dtype)[:, :, :, None, :],
                                vb[...])

        flush = [c for s in range(SL) for c in copies(s, to_hbm=True)]
        for c in flush:
            c.start()
        # Wait before the cell ends: the next cell may touch the same page
        # (trash-page collisions from inactive slots).
        for c in flush:
            c.wait()
    return kernel


def _kv_update_rows(k_pages, v_pages, k_scales, v_scales, ks, vs,
                    pages, offsets, quant: bool, interpret):
    """Shared body for `paged_kv_update_rows{,_q}` (see their docstrings).
    `v_pages=None` → KV-fused pools (pages [.., 2·ps, D], scales
    [.., 1, 2·ps]); returns the fused pool with `vp`/v-scales None."""
    fused = v_pages is None
    if fused:
        Hkv, NP, two_ps, D = k_pages.shape
        ps = two_ps // 2
    else:
        Hkv, NP, ps, D = k_pages.shape
    L, B, _, _ = ks.shape
    P = NP // L
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # SL slots per grid cell so the tile RMW's HBM round-trip latency
    # amortizes (one cell per slot measured latency-bound: 2.47 ms/step at
    # B=128 vs ~0.7 ms of traffic). Edge-pad to a multiple of SL: padding
    # lanes repeat the LAST slot — same page, same rows, so their
    # duplicate RMW flushes identical bytes.
    # VZT_KV_SL: experiment/override knob (also the safety valve — SL=1
    # restores the one-slot-per-cell r3 kernel exactly).
    # Default 4: the r5 standalone sweep (`experiments/kv_update_sl_probe`,
    # B=128 fused int8 serving shape) measured SL 1/2/4/8 =
    # 1.928/1.652/1.602/1.611 ms — latency amortization saturates by 4,
    # and the SL=4 scratch is half of SL=8's.
    SL = min(int(os.environ.get("VZT_KV_SL", "4")), B)
    # The scratch grows SL× and Mosaic's DEFAULT scoped-vmem budget is
    # 16 MiB: at the 7B serving shape (Hkv=8, L=32, fused int8) SL=8 needs
    # 19 MiB and the r4 driver bench died in compile on exactly that
    # ("scoped allocation 18.00M > limit 16.00M"). Size the budget to the
    # actual scratch (+2x headroom for the double-buffered row blocks) and
    # clamp SL so pathological configs can't blow past half of VMEM.
    pool_bytes = jnp.dtype(k_pages.dtype).itemsize
    row_tile = min(32, ps)  # aligned write granule for every pool dtype
    quant_sl = 2 * ps if fused and quant else ps
    lane_bytes = (2 * Hkv * L * row_tile * D * pool_bytes
                  + Hkv * L * (quant_sl + ps) * 4)
    while SL > 1 and SL * lane_bytes > 48 * 2**20:
        SL //= 2
    vmem_limit = int(min(100 * 2**20, max(32 * 2**20, 2 * SL * lane_bytes)))
    pad = (-B) % SL
    pages = pages.astype(jnp.int32)
    offsets = offsets.astype(jnp.int32)
    if pad:
        pages = jnp.concatenate([pages, jnp.repeat(pages[-1:], pad, 0)])
        offsets = jnp.concatenate([offsets, jnp.repeat(offsets[-1:], pad, 0)])
        ks = jnp.concatenate([ks, jnp.repeat(ks[:, -1:], pad, 1)], axis=1)
        vs = jnp.concatenate([vs, jnp.repeat(vs[:, -1:], pad, 1)], axis=1)

    # [L, B, Hkv, D] → [B, Hkv, L, D] so one slot's rows are one block.
    kt = jnp.transpose(ks, (1, 2, 0, 3))
    vt = jnp.transpose(vs, (1, 2, 0, 3))
    k5 = k_pages.reshape(Hkv, L, P, 2 * ps if fused else ps, D)
    v5 = (jnp.zeros((1, 1, 1, 8, 128), k_pages.dtype) if fused
          else v_pages.reshape(Hkv, L, P, ps, D))
    if quant:
        ks5 = k_scales.reshape(Hkv, L, P, 1, 2 * ps if fused else ps)
        vs5 = (jnp.zeros((1, 1, 1, 1, ps), jnp.float32) if fused
               else v_scales.reshape(Hkv, L, P, 1, ps))
    else:  # dummies keep one kernel signature
        ks5 = jnp.zeros((1, 1, 1, 1, ps), jnp.float32)
        vs5 = jnp.zeros((1, 1, 1, 1, ps), jnp.float32)

    row_block = pl.BlockSpec((SL, Hkv, L, D), lambda b, *_: (b, 0, 0, 0))
    pool_dtype = k_pages.dtype
    out = pl.pallas_call(
        _kv_update_rows_kernel(quant, L, row_tile, ps, fused=fused,
                               slots_per_cell=SL),
        out_shape=(jax.ShapeDtypeStruct(k5.shape, k5.dtype),
                   jax.ShapeDtypeStruct(v5.shape, v5.dtype),
                   jax.ShapeDtypeStruct(ks5.shape, ks5.dtype),
                   jax.ShapeDtypeStruct(vs5.shape, vs5.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # pages, offsets
            grid=((B + pad) // SL,),
            in_specs=[row_block, row_block,
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            scratch_shapes=[
                pltpu.VMEM((SL, Hkv, L, row_tile, D), pool_dtype),
                pltpu.VMEM((SL, Hkv, L, row_tile, D), pool_dtype),
                pltpu.VMEM((SL, Hkv, L, 1,
                            2 * ps if fused and quant else ps), jnp.float32),
                pltpu.VMEM((SL, Hkv, L, 1, ps), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        # Flattened args incl. scalar-prefetch: (pages, offs, kt, vt, k5,
        # v5, ks5, vs5) → pools are 4..7.
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(pages, offsets, kt, vt, k5, v5, ks5, vs5)
    kp = out[0].reshape(k_pages.shape)
    vp = None if fused else out[1].reshape(Hkv, NP, ps, D)
    if quant:
        if fused:
            return kp, None, (out[2].reshape(Hkv, NP, 1, 2 * ps), None)
        return kp, vp, (out[2].reshape(Hkv, NP, 1, ps),
                        out[3].reshape(Hkv, NP, 1, ps))
    return kp, vp, None


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0, 1))
def paged_kv_update_rows(
    k_pages: jnp.ndarray,   # [Hkv, L*P, ps, D] (donated, in place)
    v_pages: jnp.ndarray,
    ks: jnp.ndarray,        # [L, B, Hkv, D] — one step's rows, ALL layers
    vs: jnp.ndarray,
    pages: jnp.ndarray,     # [B] int32 logical (within-layer) page id
    offsets: jnp.ndarray,   # [B] int32 row within the page
    interpret=None,
) -> tuple:
    """Write one decode step's K/V rows for ALL layers in one kernel.

    Every layer of slot b lands at the same logical page id and offset
    (layer l's pages occupy pool segment [l·P, (l+1)·P)), so viewed as
    [Hkv, L, P, ps, D] one aligned row tile `[:, :, page, base:base+32]`
    covers the whole step's rows for that slot — one read-modify-write of
    a 32-row tile per pool per slot (HBM DMA slices must be tile-aligned
    in the minor-two dims, so single rows are not addressable). Replaces
    L·B masked-select FULL-page rewrites (`paged_kv_update` per layer:
    measured 5.3 ms/step at B=64 on v5e — ~19% of the whole decode step)
    with B tile RMWs, 2·ps/32× less write traffic and 2048 → 64 grid
    cells. Pairs with the attention self-term
    (`paged_attention_fa(k_new=...)`): attend first, bulk-write after the
    layer scan."""
    kp, vp, _ = _kv_update_rows(k_pages, v_pages, None, None, ks, vs,
                                pages, offsets, quant=False,
                                interpret=interpret)
    return kp, vp


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0, 1, 2, 3))
def paged_kv_update_rows_q(
    k_pages: jnp.ndarray,   # [Hkv, L*P, ps, D] int8 (donated, in place)
    v_pages: jnp.ndarray,
    k_scales: jnp.ndarray,  # [Hkv, L*P, 1, ps] f32 (donated)
    v_scales: jnp.ndarray,
    ks: jnp.ndarray,        # [L, B, Hkv, D] float
    vs: jnp.ndarray,
    pages: jnp.ndarray,     # [B] int32
    offsets: jnp.ndarray,   # [B] int32
    interpret=None,
) -> tuple:
    """`paged_kv_update_rows` for int8 pools: rows are absmax-quantized in
    VMEM and written with their scales (scale pools viewed
    [Hkv, L, P, 1, ps] take the rows' scales at `[:, :, page, :, off]`)."""
    kp, vp, scales = _kv_update_rows(k_pages, v_pages, k_scales, v_scales,
                                     ks, vs, pages, offsets, quant=True,
                                     interpret=interpret)
    return kp, vp, scales[0], scales[1]


def paged_attention_reference(q, k_pages, v_pages, page_table, lengths,
                              k_new=None, v_new=None, sliding_window=None):
    """XLA oracle: gather pages into dense KV (appending the current token's
    K/V when given), run masked attention."""
    B, Hq, D = q.shape
    Hkv, _, page_size, _ = k_pages.shape
    pages_per_seq = page_table.shape[1]
    S = pages_per_seq * page_size

    # [Hkv, B, pages, page_size, D] → [B, S, Hkv, D]
    k = jnp.moveaxis(k_pages[:, page_table], 0, 3).reshape(B, S, Hkv, D)
    v = jnp.moveaxis(v_pages[:, page_table], 0, 3).reshape(B, S, Hkv, D)
    kv_valid = jnp.arange(S)[None, :] < lengths[:, None]
    # The query's true position: length-1 when the pool walk already holds
    # the current token, length with a separate k_new self-term. Slot index
    # == token position for in-window slots, so the standard mask applies.
    q_pos = (lengths[:, None] - 1).astype(jnp.int32)
    if k_new is not None:
        k = jnp.concatenate([k, k_new[:, None].astype(k.dtype)], axis=1)
        v = jnp.concatenate([v, v_new[:, None].astype(v.dtype)], axis=1)
        kv_valid = jnp.concatenate(
            [kv_valid, jnp.ones((B, 1), bool)], axis=1
        )
        S += 1
        q_pos = q_pos + 1
        kv_pos = jnp.concatenate(
            [jnp.broadcast_to(jnp.arange(S - 1), (B, S - 1)), q_pos], axis=1
        )
    else:
        kv_pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    mask = attention_mask(q_pos, kv_pos, kv_valid=kv_valid, causal=True,
                          sliding_window=sliding_window)
    out = dot_product_attention(q[:, None], k, v, mask=mask)
    return out[:, 0]
