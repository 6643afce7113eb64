"""Paged-KV continuous batching: the page-pool memory model behind
high-slot-count serving.

Dense per-slot caches ([L, slots, cache_len, Hkv, D]) pay for `cache_len`
tokens per slot whether used or not — on a 16 GB v5e chip the 7B cache OOMs
near 32 slots × 2048. This engine stores K/V as fixed-size pages in global
pools and addresses them through per-sequence page tables, so a request
only occupies `ceil((prompt + budget) / page_size)` pages.

Net-new capability vs the reference (its server generates one request at a
time with a full dense cache, `vis_zephyr/serve/api.py:39-189`).

Layout (TPU-first):
- pools are head-major and layer-flat: `[Hkv, L*num_pages, page_size, D]`
  (the tuned TPU kernel's native layout — a kv head's pages are
  contiguous). Layer `l`'s pages occupy pool slots `[l*num_pages,
  (l+1)*num_pages)`; the decode step scans layers carrying the pools and
  offsets the page table by `l * num_pages` — no per-layer pool slice is
  ever materialized.
- pool page 0 (of every layer) is a reserved trash page: inactive slots
  write their dummy token there, and unused page-table entries point at it
  so the kernel's block DMAs dedup (consecutive grid steps with identical
  indices skip the fetch).
- page allocation is host-side (a free list): a request's full span
  (prompt pages + generation budget) is claimed at admit and released at
  finish. No per-step allocation, no fragmentation handling needed.
- the decode step attends FIRST and writes ONCE ("selfterm" mode): each
  layer runs the flash-structure kernel over the READ-ONLY pools with the
  current token's K/V as an online-softmax self-term, and after the layer
  scan all layers' rows bulk-write in one aligned row-tile RMW per slot
  (`ops/paged_attention.paged_kv_update_rows` — every layer of a slot
  shares one page id + offset). Measured v5e decode steps (512-token
  prompts, int8 weights): 24.0 ms at 64 slots bf16 pools (2671
  tok/s/chip), 22.6 ms at 64 with int8 pools (2831), 35.8 ms at 128 with
  int8 pools (3576 tok/s/chip — the slot count bf16 pools cannot hold).
  The previous write-first structure (per-layer in-place page rewrite +
  library kernel, 28.6 ms at 64) remains as `_paged_step(mode=
  "writefirst")`.

Multi-chip (model-axis TP mesh): params are TP-sharded, pools are sharded
over kv heads (`[Hkv, ...]` axis 0), and the decode kernel runs per shard
under `shard_map` — attention needs zero collectives (each chip owns whole
GQA groups); the row-parallel output projection carries the layer's single
psum. Per-chip pool HBM drops by the mesh size, so the aggregate slot
ceiling scales UP with chips (the v5e-8 north-star configuration).

int8 KV (`kv_quant=True`): pools hold int8 rows with per-row absmax
scales ([Hkv, L*num_pages, 1, page_size] f32 — row scales along lanes;
numeric convention row ≈ int8·scale/127.5). Prefill admission quantizes
on write (`_admit_paged_q`), decode writes quantize in VMEM
(`ops.paged_attention.paged_kv_update_q`), and the custom Pallas kernel
folds the scales into scores/probabilities during the page walk — KV
bytes per decode step halve, which is the dominant HBM traffic at high
slot counts, and the slot ceiling per pool byte nearly doubles.

Sliding window: when `cache_len` exceeds `decoder.sliding_window` the
decode step switches to the custom kernel's windowed page walk (slots
below `length − window` masked and their page blocks skipped) — sequences
beyond 4096 tokens serve correctly under the backbone's 32K positions.
Configs whose sequences cannot outgrow the window keep the tuned library
kernel.

KV-fused pools (`kv_fused=True` / `--kv-fused`): K and V (and their
scales) interleave in ONE pool array — each page holds its K rows then
its V rows ([Hkv, L·P, 2·ps, D]; scales [Hkv, L·P, 1, 2·ps]) — so the
descriptor-bound decode kernel moves every page block (or contiguous
run) in one DMA instead of two (four with kv_quant). Everywhere in this
module `vp is None` / `vsp is None` signals the fused layout; the kernels
accept the same convention, so the step/verify/admit code is layout-
agnostic. Token-exact with the split layout (tests/test_paged_fused.py).
"""

from __future__ import annotations

import functools
import queue
import threading
from collections import deque
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import VisZephyrConfig
from ..models.mistral import (_attn_out, _mlp, _project_qkv, embed, rms_norm,
                              rope_cos_sin)
from ..ops.paged_attention import (
    paged_attention,
    paged_attention_fa,
    paged_kv_update,
    paged_kv_update_q,
    paged_kv_update_rows,
    paged_kv_update_rows_q,
    quantize_kv,
)
from .batching import ContinuousBatcher, _Request
from .generate import (SamplingConfig, _apply_penalties, _count_token,
                       _logprobs, _sample)


class PageAllocator:
    """Free-list over pool pages. Page 0 is reserved (trash).

    `alloc` prefers a CONTIGUOUS ascending run: consecutive pool ids let
    the decode kernel fetch a whole compute block with ONE dynamic-slice
    DMA instead of one DMA per page (`ops/paged_attention._fa_mh_kernel`
    run fast path) — the kernel is descriptor-bound at serving batch
    sizes. Scattered pages remain fully supported (first-fit falls back
    to arbitrary pages under fragmentation; the kernel detects runs per
    block at runtime).

    Pages are REFCOUNTED so the prefix cache can share read-only prompt
    pages across requests: `alloc` hands out pages at count 1, `retain`
    adds a holder, and `release` decrements — a page returns to the free
    list only when its last holder releases it."""

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self._free: List[int] = list(range(1, num_pages))  # sorted ascending
        self._refs: dict = {}  # page -> holder count (allocated pages only)

    @property
    def available(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> Optional[List[int]]:
        free = self._free
        if len(free) < n:
            return None
        # First-fit contiguous run over the sorted free list.
        pages = None
        run_start = 0
        for i in range(1, len(free)):
            if free[i] != free[i - 1] + 1:
                run_start = i
            if i - run_start + 1 == n:  # run length grows by 1 → first hit
                pages = free[run_start:i + 1]
                del free[run_start:i + 1]
                break
        if pages is None:
            if n == 1 and free:
                pages = [free.pop(0)]
            else:
                # Fragmented: lowest n pages (keeps future runs high).
                pages = free[:n]
                del free[:n]
        for p in pages:
            self._refs[p] = 1
        return pages

    def retain(self, pages: List[int]) -> None:
        """Add a holder to already-allocated pages (prefix-cache sharing)."""
        for p in pages:
            self._refs[p] += 1

    def release(self, pages: List[int]) -> None:
        import bisect

        for p in pages:
            left = self._refs[p] - 1
            if left:
                self._refs[p] = left
            else:
                del self._refs[p]
                bisect.insort(self._free, p)


class PrefixCache:
    """Exact-prefix page sharing across requests (automatic prefix caching).

    A trie keyed by PAGE-SIZED chunks of raw prompt token ids: node at
    depth i holds the pool page whose K/V is the decode-time cache for
    prompt positions [i·ps, (i+1)·ps) of any prompt starting with those
    ids. Admission looks up the longest chain of full pages already in
    the pools, retains them for the new slot, and prefills ONLY the
    suffix (the warm path in `PagedBatcher`); finished prompts' full
    prompt pages are inserted so later requests (same system prompt,
    multi-turn continuations) skip their shared-prefix prefill entirely.

    Correctness constraints enforced by the batcher, not here:
    - only token positions BEFORE the first image sentinel are shareable
      (image tokens splice request-specific embeddings);
    - at least one prompt token must stay un-shared (the last token's
      logits start decode);
    - pages are immutable below the prompt length (decode/verify writes
      land at positions ≥ length), so shared pages are never written.

    Eviction is leaf-first LRU: dropping a deep node keeps the shorter
    prefix cached; a page whose holder count is still >1 (an active slot
    uses it) is released from the cache's ref and returns to the free
    list when that slot finishes."""

    def __init__(self, allocator: PageAllocator, page_size: int):
        self.allocator = allocator
        self.page_size = page_size
        # Trie node: {chunk_bytes: [page_id, child_dict, last_used]}
        self.root: dict = {}
        self._clock = 0
        self.hits = 0
        self.pages_reused = 0

    def _chunks(self, ids: np.ndarray, n: int, salt: bytes = b""):
        """Chunk keys; `salt` disambiguates contexts that change K/V for
        the same token ids (the request's multi-LoRA adapter). Salting the
        ROOT chunk suffices — every deeper node descends from it."""
        ps = self.page_size
        out = [np.asarray(ids[i * ps:(i + 1) * ps], np.int32).tobytes()
               for i in range(n)]
        if out and salt:
            out[0] = salt + out[0]
        return out

    def lookup(self, ids: np.ndarray, max_pages: int,
               salt: bytes = b"") -> List[int]:
        """Longest cached chain of full pages covering ids[:n·ps], n ≤
        max_pages. Retains the returned pages for the caller (one holder
        each) and refreshes their LRU stamps."""
        self._clock += 1
        pages: List[int] = []
        node = self.root
        for chunk in self._chunks(ids, max_pages, salt):
            ent = node.get(chunk)
            if ent is None:
                break
            ent[2] = self._clock
            pages.append(ent[0])
            node = ent[1]
        if pages:
            self.allocator.retain(pages)
            self.hits += 1
            self.pages_reused += len(pages)
        return pages

    def insert(self, ids: np.ndarray, pages: List[int], n_pages: int,
               salt: bytes = b"") -> None:
        """Register pages[i] as the cache page for prompt chunk i
        (i < n_pages). The cache becomes a holder of each NEWLY inserted
        page; chunks already present keep their existing page (the new
        request's identical duplicate page stays slot-owned and frees on
        finish)."""
        self._clock += 1
        node = self.root
        for i, chunk in enumerate(self._chunks(ids, n_pages, salt)):
            ent = node.get(chunk)
            if ent is None:
                self.allocator.retain([pages[i]])
                ent = node[chunk] = [pages[i], {}, self._clock]
            else:
                ent[2] = self._clock
            node = ent[1]

    def evict(self, n: int) -> int:
        """Release up to n cached pages, leaf-first LRU. Returns how many
        cache refs were dropped (pages still held by active slots free
        later).

        One DFS pass collects the n oldest CURRENT leaves into a bounded
        heap (this runs on the scheduler thread inside pool-exhausted
        admission — a per-page full-trie rescan would stall every active
        slot's decode). Dropping a node's last child exposes the parent as
        a new leaf, so loop passes until satisfied: each pass removes every
        current leaf at worst, bounding the pass count by trie depth."""
        import heapq
        import itertools

        dropped = 0
        tiebreak = itertools.count()
        while dropped < n:
            need = n - dropped
            heap: list = []  # size-bounded; root = newest kept candidate
            stack = [self.root]
            while stack:
                d = stack.pop()
                for key, (page, children, stamp) in d.items():
                    if children:
                        stack.append(children)
                        continue
                    item = (-stamp, next(tiebreak), key, d, page)
                    if len(heap) < need:
                        heapq.heappush(heap, item)
                    elif item[0] > heap[0][0]:
                        heapq.heapreplace(heap, item)
            if not heap:
                break
            for _, _, key, parent, page in heap:
                del parent[key]
                self.allocator.release([page])
                dropped += 1
        return dropped

    def drop_all(self) -> None:
        """Release every cache ref (shutdown / tests)."""
        stack = [self.root]
        while stack:
            d = stack.pop()
            for page, children, _ in d.values():
                self.allocator.release([page])
                stack.append(children)
        self.root = {}


@functools.partial(jax.jit, static_argnames=("slot", "start"),
                   donate_argnums=(0, 1, 2, 3, 4, 5))
def _admit_paged_q(kp, vp, ksp, vsp, page_table, lengths, k, v, length, row,
                   *, slot: int, start: int = 0):
    """`_admit_paged` for int8-quantized pools: per-row quantize the
    prefilled K/V, write int8 blocks + scale blocks. KV-fused pools
    (`vp=None`, `vsp=None`): the fused page gets K rows then V rows, the
    fused scale block K lanes then V lanes. `start`: see `_admit_paged`."""
    fused = vp is None
    L, T, Hkv, D = k.shape
    ps = kp.shape[2] // 2 if fused else kp.shape[2]
    P = kp.shape[1] // L
    n = T // ps
    kq, ks = quantize_kv(k)   # [L, T, Hkv, D] int8, [L, T, Hkv, 1]
    vq, vs = quantize_kv(v)
    kb = kq.reshape(L, n, ps, Hkv, D).transpose(3, 0, 1, 2, 4)
    vb = vq.reshape(L, n, ps, Hkv, D).transpose(3, 0, 1, 2, 4)
    # Pool scale layout [Hkv, N, 1, ps]: a page's row scales along lanes.
    ksb = ks[..., 0].reshape(L, n, ps, Hkv).transpose(3, 0, 1, 2)[:, :, :, None, :]
    vsb = vs[..., 0].reshape(L, n, ps, Hkv).transpose(3, 0, 1, 2)[:, :, :, None, :]
    pages = row[start:start + n]
    if fused:
        kvb = jnp.concatenate([kb, vb], axis=3)          # [Hkv, L, n, 2ps, D]
        kvsb = jnp.concatenate([ksb, vsb], axis=4)       # [Hkv, L, n, 1, 2ps]
        kp = (kp.reshape(Hkv, L, P, 2 * ps, D).at[:, :, pages].set(kvb)
              .reshape(Hkv, L * P, 2 * ps, D))
        ksp = (ksp.reshape(Hkv, L, P, 1, 2 * ps).at[:, :, pages].set(kvsb)
               .reshape(Hkv, L * P, 1, 2 * ps))
        page_table = page_table.at[slot].set(row)
        lengths = lengths.at[slot].set(length.astype(jnp.int32))
        return kp, None, ksp, None, page_table, lengths
    kp = kp.reshape(Hkv, L, P, ps, D).at[:, :, pages].set(kb).reshape(Hkv, L * P, ps, D)
    vp = vp.reshape(Hkv, L, P, ps, D).at[:, :, pages].set(vb).reshape(Hkv, L * P, ps, D)
    ksp = ksp.reshape(Hkv, L, P, 1, ps).at[:, :, pages].set(ksb).reshape(Hkv, L * P, 1, ps)
    vsp = vsp.reshape(Hkv, L, P, 1, ps).at[:, :, pages].set(vsb).reshape(Hkv, L * P, 1, ps)
    page_table = page_table.at[slot].set(row)
    lengths = lengths.at[slot].set(length.astype(jnp.int32))
    return kp, vp, ksp, vsp, page_table, lengths


@functools.partial(jax.jit, static_argnames=("slot", "start"),
                   donate_argnums=(0, 1, 2, 3))
def _admit_paged(kp, vp, page_table, lengths, k, v, length, row, *, slot: int,
                 start: int = 0):
    """Write a prefilled sequence's K/V into its allocated pages and install
    its page-table row. k/v: [L, T, Hkv, D] with T a page-size multiple
    (prefill pads to 128 on TPU; padded host-side otherwise).
    Pools are [Hkv, L*P, ps, D]; viewed as [Hkv, L, P, ps, D] the same
    logical page id is written in every layer's segment. KV-fused pools
    (`vp=None`): pages are [2·ps, D], K rows then V rows.

    `start`: first logical page of `row` to write (warm prefix-cache
    admission passes the SUFFIX K/V only — pages row[:start] are shared,
    already-written prompt pages that must not be touched)."""
    fused = vp is None
    L, T, Hkv, D = k.shape
    ps = kp.shape[2] // 2 if fused else kp.shape[2]
    P = kp.shape[1] // L
    n = T // ps
    # [L, T, Hkv, D] → [Hkv, L, n, ps, D] page blocks.
    kb = k.reshape(L, n, ps, Hkv, D).transpose(3, 0, 1, 2, 4).astype(kp.dtype)
    vb = v.reshape(L, n, ps, Hkv, D).transpose(3, 0, 1, 2, 4).astype(kp.dtype)
    pages = row[start:start + n]
    if fused:
        kvb = jnp.concatenate([kb, vb], axis=3)          # [Hkv, L, n, 2ps, D]
        kp = (kp.reshape(Hkv, L, P, 2 * ps, D).at[:, :, pages].set(kvb)
              .reshape(Hkv, L * P, 2 * ps, D))
        page_table = page_table.at[slot].set(row)
        lengths = lengths.at[slot].set(length.astype(jnp.int32))
        return kp, None, page_table, lengths
    kp = kp.reshape(Hkv, L, P, ps, D).at[:, :, pages].set(kb).reshape(Hkv, L * P, ps, D)
    vp = vp.reshape(Hkv, L, P, ps, D).at[:, :, pages].set(vb).reshape(Hkv, L * P, ps, D)
    page_table = page_table.at[slot].set(row)
    lengths = lengths.at[slot].set(length.astype(jnp.int32))
    return kp, vp, page_table, lengths


@functools.partial(jax.jit, donate_argnums=(0,))
def _clear_row(page_table, slot):
    return page_table.at[slot].set(jnp.zeros((page_table.shape[1],), page_table.dtype))


@jax.jit
def _pool_rows_get(pool, idx):
    """Gather pool pages [:, idx] along the (layer·page) axis — the raw
    swap-out read (int8/bf16 pool bytes or f32 scale rows, verbatim)."""
    return jnp.take(pool, idx, axis=1)


@functools.partial(jax.jit, donate_argnums=(0,))
def _pool_rows_set(pool, idx, data):
    """Scatter previously-gathered pages back into (possibly different)
    pool slots — the raw swap-in write. Bit-exact round-trip with
    `_pool_rows_get` by construction: no dequant/requant in the path."""
    return pool.at[:, idx].set(data)


@functools.partial(jax.jit, static_argnames=("num_layers",))
def _gather_prefix(kp, vp, ksp, vsp, pages, *, num_layers: int):
    """Gather shared prompt pages into dense prefix K/V [L, n0·ps, Hkv, D]
    for warm (prefix-cache-hit) admission: the suffix prefill attends this
    as its cache context. Handles all pool layouts via the module's None
    conventions (vp=None → fused rows; ksp≠None → int8 + per-row scales,
    dequantized here — the one place the int8 roundtrip leaks into prefill
    numerics, bounded like the quantization itself)."""
    from ..ops.paged_attention import KV_QUANT_MAX

    fused = vp is None
    quant = ksp is not None
    L = num_layers
    Hkv = kp.shape[0]
    rows = kp.shape[2]
    ps = rows // 2 if fused else rows
    P = kp.shape[1] // L
    n0 = pages.shape[0]

    k5 = kp.reshape(Hkv, L, P, rows, -1)[:, :, pages]  # [Hkv, L, n0, rows, D]
    if fused:
        kb, vb = k5[:, :, :, :ps], k5[:, :, :, ps:]
    else:
        kb = k5
        vb = vp.reshape(Hkv, L, P, ps, -1)[:, :, pages]
    if quant:
        lanes = 2 * ps if fused else ps
        s5 = ksp.reshape(Hkv, L, P, 1, lanes)[:, :, pages]
        if fused:
            ks_, vs_ = s5[..., :ps], s5[..., ps:]
        else:
            ks_ = s5
            vs_ = vsp.reshape(Hkv, L, P, 1, ps)[:, :, pages]
        kb = kb.astype(jnp.float32) * (jnp.swapaxes(ks_, -1, -2) / KV_QUANT_MAX)
        vb = vb.astype(jnp.float32) * (jnp.swapaxes(vs_, -1, -2) / KV_QUANT_MAX)

    def dense(b):  # [Hkv, L, n0, ps, D] → [L, n0·ps, Hkv, D]
        return b.transpose(1, 2, 3, 0, 4).reshape(L, n0 * ps, Hkv, -1)

    return dense(kb), dense(vb)


@functools.partial(jax.jit, donate_argnums=(0,))
def _warm_scratch(cache, pk, pv):
    """Install gathered prefix K/V into a fresh B=1 prefill scratch cache
    and set its length to the prefix span — chunk extension then starts at
    the first un-cached chunk."""
    t0 = pk.shape[1]
    ck = jax.lax.dynamic_update_slice(
        cache["k"], pk[:, None].astype(cache["k"].dtype), (0, 0, 0, 0, 0))
    cv = jax.lax.dynamic_update_slice(
        cache["v"], pv[:, None].astype(cache["v"].dtype), (0, 0, 0, 0, 0))
    return {"k": ck, "v": cv,
            "length": jnp.full_like(cache["length"], t0)}


# Shared TP sharding vocabulary: pools and per-row scale pools shard over
# kv heads; queries over query heads (GQA groups stay whole per shard, so
# attention needs zero collectives — the row-parallel `attn/out` matmul
# after it carries the layer's single psum, like the dense TP path);
# the page table and lengths are replicated.
_POOL_SPEC = P("model", None, None, None)     # [Hkv, L*P, ps, D] / scales
_Q3_SPEC = P(None, "model", None)             # [B, Hq, D] and k_new/v_new
_Q4_SPEC = P(None, None, "model", None)       # [B, S, Hq, D]


def _tp_attention(mesh, local, in_specs, out_spec):
    from jax.experimental.shard_map import shard_map

    return shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                     out_specs=out_spec, check_rep=False)


def _scale_kwargs(quant, scales):
    return {"k_scales": scales[0], "v_scales": scales[1]} if quant else {}


# KV-FUSED pools under TP: the fused pool/scale arrays shard over kv heads
# exactly like the split ones (axis 0), and the wrappers below keep the
# callers' (q, kp, vp, ...) convention with vp/vsp = None — only the
# shard_map operand lists shrink (None can't ride a shard_map spec).


def _tp_paged_attention_factory(mesh, call, q_spec, fixed_specs, quant,
                                fused):
    """Shared body of the three paged-attention TP wrappers.

    `call(q, kp, vp, *fixed, **scale_kw)` invokes the kernel; the factory
    builds the shard_map operand/spec lists once for every (quant, fused)
    combination — under `fused` the v-side pool and its scale pool are
    absent (vp/v_scales = None at the call sites) and simply drop out of
    the operand lists. Returns `wrapper(q, kp, vp, *fixed, **kw)` with the
    callers' uniform split-layout signature (kw may carry k_scales /
    v_scales; the extras are ignored where not applicable)."""
    npool = 1 if fused else 2

    def local(q, *rest):
        pools, rest = rest[:npool], rest[npool:]
        fixed, scales = rest[: len(fixed_specs)], rest[len(fixed_specs):]
        kw = {}
        if quant:
            kw["k_scales"] = scales[0]
            if not fused:
                kw["v_scales"] = scales[1]
        return call(q, pools[0], None if fused else pools[1], *fixed, **kw)

    specs = ([q_spec] + [_POOL_SPEC] * npool + list(fixed_specs)
             + [_POOL_SPEC] * (npool if quant else 0))
    sm = _tp_attention(mesh, local, specs, q_spec)

    def wrapper(q, kp, vp, *fixed, **kw):
        ops = (q, kp) + (() if fused else (vp,)) + fixed
        if quant:
            ops += ((kw["k_scales"],) if fused
                    else (kw["k_scales"], kw["v_scales"]))
        return sm(*ops)

    return wrapper


def _paged_attention_tp(mesh, sliding_window=None, quant=False, fused=False):
    """`paged_attention` (single-row dispatch, q [B, Hq, D]) under the
    model-axis TP mesh (sharding story: see the spec vocabulary above).
    `quant` appends the kv-head-sharded scale pools."""
    def call(q, kp, vp, table, lengths, **scale_kw):
        return paged_attention(q, kp, vp, table, lengths,
                               sliding_window=sliding_window, **scale_kw)

    return _tp_paged_attention_factory(
        mesh, call, _Q3_SPEC, [P(None, None), P(None)], quant, fused)


def _paged_attention_fa_tp(mesh, sliding_window=None, quant=False,
                           fused=False):
    """`paged_attention_fa` (multi-row verify shape, q [B, S, Hq, D],
    explicit q_offs) under the TP mesh."""
    def call(q, kp, vp, table, lengths, q_offs, **scale_kw):
        return paged_attention_fa(q, kp, vp, table, lengths, q_offs,
                                  sliding_window=sliding_window, **scale_kw)

    return _tp_paged_attention_factory(
        mesh, call, _Q4_SPEC, [P(None, None), P(None), P(None)], quant,
        fused)


def _paged_attention_fa_selfterm_tp(mesh, sliding_window=None, quant=False,
                                    fused=False):
    """Self-term decode attention (`paged_attention_fa(k_new=...)`,
    q [B, 1, Hq, D], q_offs = lengths) under the TP mesh: k_new/v_new
    shard over kv heads with the pools."""
    def call(q, kp, vp, table, lengths, kn, vn, **scale_kw):
        return paged_attention_fa(q, kp, vp, table, lengths, lengths,
                                  sliding_window=sliding_window,
                                  k_new=kn, v_new=vn, **scale_kw)

    inner = _tp_paged_attention_factory(
        mesh, call, _Q4_SPEC,
        [P(None, None), P(None), _Q3_SPEC, _Q3_SPEC], quant, fused)

    def wrapper(q, kp, vp, table, lengths, *, k_new, v_new, **kw):
        return inner(q, kp, vp, table, lengths, k_new, v_new, **kw)

    return wrapper


def _tp_kv_write_factory(mesh, kernel, quant, fused):
    """Shared body of the four paged KV-write TP wrappers.

    `kernel(*pools, k, v, idx, off) -> pools'` where pools is (kp, vp) or
    (kp, vp, ksp, vsp); everything kv-head-shards with zero collectives.
    Under `fused` the v-side pools (odd positions) are None — they drop
    out of the shard_map operands and reappear as None in the returned
    tuple, keeping the callers' uniform split-layout signature."""
    from jax.experimental.shard_map import shard_map

    n = 4 if quant else 2
    live = [i for i in range(n) if not (fused and i % 2)]
    data_spec = P(None, None, "model", None)  # k/v rows [B, S, Hkv, D]

    def local(*ops):
        pools, rest = ops[: len(live)], ops[len(live):]
        full = [None] * n
        for j, i in enumerate(live):
            full[i] = pools[j]
        out = kernel(*full, *rest)
        return tuple(out[i] for i in live)

    inner = shard_map(
        local, mesh=mesh,
        in_specs=tuple([P("model")] * len(live)
                       + [data_spec, data_spec, P(), P()]),
        out_specs=tuple([P("model")] * len(live)),
        check_rep=False,
    )

    def wrapper(*ops):
        pools, rest = ops[:n], ops[n:]
        outs = inner(*(pools[i] for i in live), *rest)
        full = [None] * n
        for j, i in enumerate(live):
            full[i] = outs[j]
        return tuple(full)

    return wrapper


def _kv_rows_tp(mesh, fused=False):
    """paged_kv_update_rows under the TP mesh: rows shard over kv heads
    with the pools (no collectives)."""
    return _tp_kv_write_factory(mesh, paged_kv_update_rows, quant=False,
                                fused=fused)


def _kv_rows_q_tp(mesh, fused=False):
    return _tp_kv_write_factory(mesh, paged_kv_update_rows_q, quant=True,
                                fused=fused)


def _kv_update_tp(mesh, fused=False):
    """paged_kv_update under the TP mesh: each shard writes its own kv
    heads' rows into its pool shard (no collectives)."""
    return _tp_kv_write_factory(mesh, paged_kv_update, quant=False,
                                fused=fused)


def _kv_update_q_tp(mesh, fused=False):
    """paged_kv_update_q under the TP mesh: int8 pools AND their per-row
    scale pools are kv-head-sharded; each shard quantizes and writes its
    own heads' rows (no collectives)."""
    return _tp_kv_write_factory(mesh, paged_kv_update_q, quant=True,
                                fused=fused)


@functools.partial(
    jax.jit, static_argnames=("cfg", "sampling", "mesh", "mode",
                              "want_logprobs"),
    donate_argnums=(1, 2, 3, 5),
)
def _paged_step(params, kp, vp, scales, page_table, lengths, token, active, key,
                cfg: VisZephyrConfig, sampling: SamplingConfig, mesh=None,
                mode: str = "selfterm", mlora=None, adapter_idx=None,
                sample_overrides=None, grammar=None,
                want_logprobs: bool = False, penalties=None):
    """One decode step over all slots against the paged pools.

    `scales`: `(None, None)` for bf16 pools, or `(k_scales, v_scales)`
    [Hkv, L*P, 1, ps] f32 for int8-quantized pools (the kv_quant serving mode
    — halves the KV pool HBM per slot, nearly doubling the slot ceiling; new
    rows are quantized in VMEM by the write kernel).

    `mode`:
    - "selfterm" (default): each layer attends the READ-ONLY pools with the
      current token's K/V folded in as the flash-structure kernel's
      online-softmax self-term; after the layer scan, ALL layers' rows are
      bulk-written in one strided DMA per slot (`paged_kv_update_rows` —
      every layer of a slot shares one page id + offset). Measured v5e
      B=64: the per-layer page rewrite alone costs 5.3 ms/step; the bulk
      write replaces it with B row DMAs.
    - "writefirst": the previous structure — each layer writes its row in
      place (`paged_kv_update`) and attends over cache+token with the
      tuned library kernel (bf16) or the flash-structure kernel (int8/
      windowed). Kept as the measured fallback."""
    dec = cfg.decoder
    L = dec.num_layers
    P = kp.shape[1] // L  # logical pages per layer segment
    # KV-fused pools carry 2·ps rows per page (K rows then V rows).
    ps = kp.shape[2] // 2 if vp is None else kp.shape[2]
    B = token.shape[0]

    lengths_eff = jnp.where(active, lengths, 0)
    positions = lengths_eff[:, None]  # the new token's position
    cos, sin = rope_cos_sin(positions, dec.head_dim, dec.rope_theta)
    h = embed(params["decoder"], token[:, None])

    # Where the new token's K/V lands: inactive slots write the trash page.
    row_idx = jnp.minimum(lengths_eff // ps, page_table.shape[1] - 1)
    cur_page = jnp.take_along_axis(page_table, row_idx[:, None], axis=1)[:, 0]
    cur_page = jnp.where(active, cur_page, 0)
    offset = lengths_eff % ps

    # Sliding-window only when a sequence can actually outgrow the window
    # (cache_len > window): short-sequence configs skip the mask entirely.
    cache_len = page_table.shape[1] * ps
    sw = dec.sliding_window
    window = sw if (sw is not None and cache_len > sw) else None

    ksp, vsp = scales
    dparams = params["decoder"]
    layers_xs = (dparams["layers"], jnp.arange(dec.num_layers))
    mctx = None
    if mlora is not None:
        from ..ops.mlora import pack_num_adapters, ragged_ctx

        mctx = ragged_ctx(
            adapter_idx if adapter_idx is not None
            else jnp.zeros((B,), jnp.int32),
            pack_num_adapters(mlora))
        layers_xs = layers_xs + (mlora,)

    fused = vp is None  # KV-fused pools (kv_fused=True serving mode)
    if mode == "selfterm":
        if mesh is None:
            attn_fn = functools.partial(
                paged_attention_fa, sliding_window=window)
        else:
            attn_fn = _paged_attention_fa_selfterm_tp(
                mesh, sliding_window=window, quant=ksp is not None,
                fused=fused)

        def body(h, xs):
            if mlora is None:
                layer_params, i = xs
                ml = None
            else:
                layer_params, i, ml = xs
            hn = rms_norm(h, layer_params["input_ln"]["scale"],
                          dec.rms_norm_eps)
            q, k, v = _project_qkv(hn, layer_params["attn"], dec, cos, sin,
                                   mlora=None if ml is None else ml.get("attn"),
                                   mctx=mctx)
            k_new, v_new = k[:, 0], v[:, 0]
            if mesh is None:
                extra = ({} if ksp is None
                         else {"k_scales": ksp, "v_scales": vsp})
                attn = attn_fn(q, kp, vp, page_table + i * P, lengths_eff,
                               lengths_eff, k_new=k_new, v_new=v_new,
                               **extra)[:, 0]
            else:
                extra = ({} if ksp is None
                         else {"k_scales": ksp, "v_scales": vsp})
                attn = attn_fn(q, kp, vp, page_table + i * P, lengths_eff,
                               k_new=k_new, v_new=v_new, **extra)[:, 0]
            attn = attn.reshape(B, 1, -1)
            h = h + _attn_out(attn, layer_params["attn"],
                              mlora=None if ml is None else ml.get("attn"),
                              mctx=mctx)
            hn = rms_norm(h, layer_params["post_attn_ln"]["scale"],
                          dec.rms_norm_eps)
            h = h + _mlp(hn, layer_params["mlp"],
                         mlora=None if ml is None else ml.get("mlp"),
                         mctx=mctx)
            return h, (k_new, v_new)

        h, (ks_rows, vs_rows) = jax.lax.scan(body, h, layers_xs)
        if ksp is None:
            rows_fn = (paged_kv_update_rows if mesh is None
                       else _kv_rows_tp(mesh, fused=fused))
            kp, vp = rows_fn(kp, vp, ks_rows, vs_rows, cur_page, offset)
        else:
            rows_fn = (paged_kv_update_rows_q if mesh is None
                       else _kv_rows_q_tp(mesh, fused=fused))
            kp, vp, ksp, vsp = rows_fn(kp, vp, ksp, vsp, ks_rows, vs_rows,
                                       cur_page, offset)
    else:
        # Attention spans the cache plus the just-written token. Inactive
        # slots attend one trash-page row (finite garbage; their token is
        # replaced below) — never zero slots, so no 0/0 in the softmax.
        lengths_next = lengths_eff + 1
        if mesh is None:
            attn_fn = functools.partial(paged_attention,
                                        sliding_window=window)
            kv_update = paged_kv_update
            kv_update_q = paged_kv_update_q
        else:
            attn_fn = _paged_attention_tp(mesh, sliding_window=window,
                                          quant=ksp is not None, fused=fused)
            kv_update = _kv_update_tp(mesh, fused=fused)
            kv_update_q = _kv_update_q_tp(mesh, fused=fused)

        def body(carry, xs):
            h, kp, vp, ksp, vsp = carry
            if mlora is None:
                layer_params, i = xs
                ml = None
            else:
                layer_params, i, ml = xs
            hn = rms_norm(h, layer_params["input_ln"]["scale"],
                          dec.rms_norm_eps)
            q, k, v = _project_qkv(hn, layer_params["attn"], dec, cos, sin,
                                   mlora=None if ml is None else ml.get("attn"),
                                   mctx=mctx)
            if ksp is None:
                kp, vp = kv_update(
                    kp, vp, k[:, 0][None], v[:, 0][None],
                    (i * P + cur_page)[None], offset,
                )
                attn = attn_fn(q[:, 0], kp, vp, page_table + i * P,
                               lengths_next)
            else:
                kp, vp, ksp, vsp = kv_update_q(
                    kp, vp, ksp, vsp, k[:, 0][None], v[:, 0][None],
                    (i * P + cur_page)[None], offset,
                )
                attn = attn_fn(q[:, 0], kp, vp, page_table + i * P,
                               lengths_next, k_scales=ksp, v_scales=vsp)
            attn = attn.reshape(B, 1, -1)
            h = h + _attn_out(attn, layer_params["attn"],
                              mlora=None if ml is None else ml.get("attn"),
                              mctx=mctx)
            hn = rms_norm(h, layer_params["post_attn_ln"]["scale"],
                          dec.rms_norm_eps)
            h = h + _mlp(hn, layer_params["mlp"],
                         mlora=None if ml is None else ml.get("mlp"),
                         mctx=mctx)
            return (h, kp, vp, ksp, vsp), None

        (h, kp, vp, ksp, vsp), _ = jax.lax.scan(
            body, (h, kp, vp, ksp, vsp), layers_xs
        )
    h = rms_norm(h, dparams["final_ln"]["scale"], dec.rms_norm_eps)
    logits = jnp.einsum(
        "btd,dv->btv", h[:, -1:], dparams["lm_head"]["kernel"]
    ).astype(jnp.float32)
    mask = None if grammar is None else grammar[0][grammar[1]]
    sample_logits = logits[:, 0]
    if penalties is not None:
        sample_logits = _apply_penalties(sample_logits, penalties[2],
                                         penalties[0], penalties[1])
    next_token = _sample(sample_logits, key, sampling,
                         overrides=sample_overrides, mask=mask)
    next_token = jnp.where(active, next_token, dec.pad_token_id)
    lp = _logprobs(logits[:, 0], next_token) if want_logprobs else None
    counts = (None if penalties is None
              else _count_token(penalties[2], next_token, active))
    new_lengths = jnp.where(active, lengths + 1, lengths)
    return next_token, kp, vp, (ksp, vsp), new_lengths, lp, counts


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sampling", "mesh", "mode", "n"),
    donate_argnums=(1, 2, 3, 5),
)
def _paged_multi_step(params, kp, vp, scales, page_table, lengths, token,
                      active, steps_left, key, cfg: VisZephyrConfig,
                      sampling: SamplingConfig, mesh=None,
                      mode: str = "selfterm", n: int = 4,
                      mlora=None, adapter_idx=None, sample_overrides=None):
    """`n` chained `_paged_step`s in ONE dispatch (multi-step scheduling):
    host scheduling + dispatch latency + the per-step device_get are paid
    once per burst instead of once per token.

    Token-exact with single-stepping: the scan carries `alive` and
    per-slot `steps_left` (the host's remaining budget), so a slot that
    emits EOS or runs out of budget mid-burst is frozen by the next
    iteration — lengths stop growing and its writes land on the trash
    page, exactly as if the host had finished it between steps. (See
    `batching._batch_multi_step` for the temperature > 0 rng caveat.)

    Returns (toks [n, B], entry_alive [n, B], kp, vp, scales, lengths,
    token)."""
    eos = sampling.eos_token_id

    def body(carry, sub):
        kp, vp, scales, lengths, token, alive, left = carry
        tok, kp, vp, scales, lengths, _, _ = _paged_step(
            params, kp, vp, scales, page_table, lengths, token, alive, sub,
            cfg, sampling, mesh=mesh, mode=mode, mlora=mlora,
            adapter_idx=adapter_idx, sample_overrides=sample_overrides,
        )
        entry_alive = alive
        left = left - 1
        alive = alive & (tok != eos) & (left > 0)
        return (kp, vp, scales, lengths, tok, alive, left), (tok, entry_alive)

    keys = jax.random.split(key, n)
    (kp, vp, scales, lengths, token, _, _), (toks, alive) = jax.lax.scan(
        body, (kp, vp, scales, lengths, token, active, steps_left), keys
    )
    return toks, alive, kp, vp, scales, lengths, token


@functools.partial(
    jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=(1, 2, 3),
)
def _paged_verify_step(params, kp, vp, scales, page_table, lengths, toks,
                       active, cfg: VisZephyrConfig, mesh=None,
                       mlora=None, adapter_idx=None):
    """Batched speculative verify over the paged pools: append S candidate
    rows per slot (column 0 is the slot's pending token, later columns its
    prompt-lookup proposals) in ONE cached forward, and return per-position
    greedy tokens [B, S].

    Per layer, each candidate row's K/V is written into the pools in place
    (S sequential single-row writes — consecutive rows may share a page, so
    a single batched write would lose earlier rows to the masked-select
    read-modify-write), then all S rows attend at once through the
    flash-structure kernel's multi-row shape (`paged_attention_fa`, row j
    at position lengths+j, attending causally through the pool including
    rows j' < j written just before it).

    The caller measures the accepted prefix per slot host-side and
    OVERWRITES `lengths`: rejected rows hold garbage K/V above the accepted
    point which the next append overwrites (attention masks slots off
    `lengths`, so stale rows are never attended). Like the dense
    `_verify_step`, a verify reads the same weight bytes as one decode step
    — each accepted token is nearly free."""
    dec = cfg.decoder
    L = dec.num_layers
    Pn = kp.shape[1] // L
    # KV-fused pools carry 2·ps rows per page (K rows then V rows).
    ps = kp.shape[2] // 2 if vp is None else kp.shape[2]
    B, S = toks.shape

    lengths_eff = jnp.where(active, lengths, 0)
    pos = lengths_eff[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    cos, sin = rope_cos_sin(pos, dec.head_dim, dec.rope_theta)
    h = embed(params["decoder"], toks)

    cache_len = page_table.shape[1] * ps
    # Landing sites per candidate row [S, B]. Rows past a slot's allocated
    # span land on trash naturally (unallocated table entries are 0), but
    # rows past cache_len itself must be FORCED to trash — clamping their
    # row index would overwrite the slot's last committed page. Only
    # padding rows can overflow (valid proposals are budget-capped).
    row_idx = pos // ps
    in_range = row_idx < page_table.shape[1]
    pages = jnp.take_along_axis(
        page_table, jnp.minimum(row_idx, page_table.shape[1] - 1), axis=1)
    pages = jnp.where(active[:, None] & in_range, pages, 0).T
    offsets = (pos % ps).T
    # Clamp so the kernel's page walk never runs past the table (padding
    # rows of a nearly-full slot would otherwise push it over).
    lengths_attn = jnp.minimum(lengths_eff + S, cache_len)
    sw = dec.sliding_window
    window = sw if (sw is not None and cache_len > sw) else None

    ksp, vsp = scales
    fused = kp is not None and vp is None  # KV-fused pools
    if mesh is None:
        attn_fn = functools.partial(paged_attention_fa, sliding_window=window)
        kv_update = paged_kv_update
        kv_update_q = paged_kv_update_q
    else:
        attn_fn = _paged_attention_fa_tp(mesh, sliding_window=window,
                                         quant=ksp is not None, fused=fused)
        kv_update = _kv_update_tp(mesh, fused=fused)
        kv_update_q = _kv_update_q_tp(mesh, fused=fused)

    mctx = None
    layers_xs = (params["decoder"]["layers"], jnp.arange(L))
    if mlora is not None:
        from ..ops.mlora import pack_num_adapters, ragged_ctx

        mctx = ragged_ctx(
            adapter_idx if adapter_idx is not None
            else jnp.zeros((B,), jnp.int32),
            pack_num_adapters(mlora))
        layers_xs = layers_xs + (mlora,)

    def body(carry, xs):
        h, kp, vp, ksp, vsp = carry
        if mlora is None:
            layer_params, i = xs
            ml = None
        else:
            layer_params, i, ml = xs
        hn = rms_norm(h, layer_params["input_ln"]["scale"], dec.rms_norm_eps)
        q, k, v = _project_qkv(hn, layer_params["attn"], dec, cos, sin,
                               mlora=None if ml is None else ml.get("attn"),
                               mctx=mctx)
        for s in range(S):
            if ksp is None:
                kp, vp = kv_update(
                    kp, vp, k[:, s][None], v[:, s][None],
                    (i * Pn + pages[s])[None], offsets[s],
                )
            else:
                kp, vp, ksp, vsp = kv_update_q(
                    kp, vp, ksp, vsp, k[:, s][None], v[:, s][None],
                    (i * Pn + pages[s])[None], offsets[s],
                )
        if ksp is None:
            attn = attn_fn(q, kp, vp, page_table + i * Pn, lengths_attn,
                           lengths_eff)
        else:
            attn = attn_fn(q, kp, vp, page_table + i * Pn, lengths_attn,
                           lengths_eff, k_scales=ksp, v_scales=vsp)
        attn = attn.reshape(B, S, -1)
        h = h + _attn_out(attn, layer_params["attn"],
                          mlora=None if ml is None else ml.get("attn"),
                          mctx=mctx)
        hn = rms_norm(h, layer_params["post_attn_ln"]["scale"], dec.rms_norm_eps)
        h = h + _mlp(hn, layer_params["mlp"],
                     mlora=None if ml is None else ml.get("mlp"), mctx=mctx)
        return (h, kp, vp, ksp, vsp), None

    dparams = params["decoder"]
    (h, kp, vp, ksp, vsp), _ = jax.lax.scan(
        body, (h, kp, vp, ksp, vsp), layers_xs
    )
    h = rms_norm(h, dparams["final_ln"]["scale"], dec.rms_norm_eps)
    logits = jnp.einsum(
        "bsd,dv->bsv", h, dparams["lm_head"]["kernel"]
    ).astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return greedy, kp, vp, (ksp, vsp)


class PagedBatcher(ContinuousBatcher):
    """Continuous batcher on paged KV pools (drop-in for ContinuousBatcher).

    `cache_len` bounds a single sequence's span (pages_per_seq); `num_pages`
    sizes the shared pool — unlike the dense batcher, total memory scales
    with tokens in flight, not slots × cache_len.
    """

    def __init__(
        self,
        params,
        cfg: VisZephyrConfig,
        max_slots: int = 32,
        cache_len: int = 2048,
        sampling: SamplingConfig = SamplingConfig(),
        seed: int = 0,
        page_size: int = 128,
        num_pages: Optional[int] = None,
        mesh=None,
        metrics=None,
        prefill_chunk: Optional[int] = None,
        kv_quant: bool = False,
        lookahead: int = 0,
        draft=None,
        multi_step: int = 1,
        kv_fused: bool = False,
        prefix_cache: bool = False,
        mlora=None,
        adapter_names=None,
        lazy_alloc: bool = False,
    ):
        """`kv_quant`: store the pools int8 with per-row absmax scales
        (library convention, `ops.paged_attention.quantize_kv`). Halves the
        KV pool bytes per slot — nearly doubling the slot ceiling per pool
        byte (the B=128 headline configuration). New rows are quantized in
        VMEM by the Pallas write kernels; decode folds the scales into
        scores/probabilities inside the flash-structure kernel (the tuned
        library kernel cannot take int8 pools — it broadcasts scales to
        full f32 arrays host-side and OOMs).

        `kv_fused`: ONE pool array holds each page's K rows then its V
        rows ([Hkv, L·P, 2·ps, D]; fused scales [Hkv, L·P, 1, 2·ps]), so
        the decode kernel moves every page block in one DMA instead of
        two (four with scales) — the third descriptor lever on a
        descriptor-bound kernel. Same bytes, same numerics: token-exact
        with the split layout (pinned in tests/test_paged_fused.py).

        `prefix_cache`: automatic prefix caching — prompts sharing a
        full-page-aligned token prefix (system prompts, multi-turn
        continuations) REUSE the earlier request's prompt pages and
        prefill only the suffix (`PrefixCache`; requires `prefill_chunk`,
        whose `_chunk_extend` numerics the warm path reproduces exactly —
        token-exact for bf16 pools, pinned in tests/test_prefix_cache.py;
        with `kv_quant` a hit re-reads the int8-rounded prefix, a drift
        of the same class as the quantization itself). Only positions
        before the first image sentinel are shareable.

        `lazy_alloc`: incremental page allocation + host-swap preemption.
        The default admission reserves a request's FULL span
        (prompt + max_new_tokens) up front — simple, but a request that
        stops early at EOS holds its unused reservation for its whole
        life, capping concurrency well below what tokens-in-flight would
        allow (the reference has nothing comparable; this is the
        vLLM-style alternative, TPU-first). With `lazy_alloc` a slot owns
        only the pages covering its CURRENT length plus one scheduler
        round of growth; before every round each active slot is topped up
        at page boundaries, and when the pool is exhausted the YOUNGEST
        slot is preempted: its raw pool rows (int8/bf16 bytes + f32
        scale rows, so restore is bit-exact in every layout) are gathered
        to host memory, its pages released, and it resumes FIFO — oldest
        first, never stealing from running slots — once finishing
        requests free pages. Token-exact vs eager allocation
        (tests/test_paged_swap.py)."""
        if mesh is not None:
            m = mesh.shape.get("model", 1)
            if cfg.decoder.num_kv_heads % max(m, 1):
                raise ValueError(
                    f"paged TP shards the pools over kv heads: mesh model "
                    f"axis {m} must divide num_kv_heads="
                    f"{cfg.decoder.num_kv_heads}"
                )
            from ..parallel.sharding import shard_params

            params = shard_params(params, mesh)
        self.mesh = mesh
        # Flash prefill runs under a mesh too (shard_map over heads via
        # `attn_mesh` in _prefill_kv); the auto-gate still applies.
        self.use_flash = None
        self.metrics = metrics
        # Multi-LoRA serving (see ContinuousBatcher docstring / ops/mlora):
        # per-slot adapter indices feed every paged forward.
        self.mlora = mlora
        self.adapter_names = dict(adapter_names or {})
        self.slot_adapter = np.zeros(max_slots, np.int32)
        self.prefill_chunk = prefill_chunk
        self._prefilling = None
        self._reserved_slot = None
        if cache_len % page_size:
            raise ValueError("cache_len must be a multiple of page_size")
        # cache_len beyond decoder.sliding_window is supported: the decode
        # kernel masks slots below length − window (`ops/paged_attention`,
        # backbone semantics — window 4096 under max_position 32768).
        self.params = params
        self.cfg = cfg
        self.max_slots = max_slots
        self.cache_len = cache_len
        self.sampling = sampling
        self.page_size = page_size
        self.pages_per_seq = cache_len // page_size
        if num_pages is None:
            # Default: half the dense-cache footprint, ≥ 2 full sequences.
            num_pages = 1 + max(2 * self.pages_per_seq,
                                max_slots * self.pages_per_seq // 2)
        self.num_pages = num_pages
        self.allocator = PageAllocator(num_pages)
        self.lazy_alloc = lazy_alloc
        # slot -> host pool-row snapshot; insertion order IS the FIFO
        # resume order (dicts preserve it).
        self._swapped: dict = {}
        self.slot_seq = np.zeros(max_slots, np.int64)  # admission order
        self._seq = 0
        if prefix_cache and not prefill_chunk:
            raise ValueError(
                "prefix_cache requires chunked prefill admission "
                "(prefill_chunk): the warm path starts chunk extension at "
                "the first un-cached chunk")
        self.prefix_cache = (PrefixCache(self.allocator, page_size)
                             if prefix_cache else None)

        dec = cfg.decoder
        dtype = params["decoder"]["embed_tokens"].dtype
        self.kv_quant = kv_quant
        self.kv_fused = kv_fused
        pool_dtype = jnp.int8 if kv_quant else dtype
        # KV-fused layout: one pool, 2·ps rows per page (K rows then V).
        rows = 2 * page_size if kv_fused else page_size
        pool_shape = (dec.num_kv_heads, dec.num_layers * num_pages, rows, dec.head_dim)
        scale_shape = pool_shape[:2] + (1, rows)
        self.vp = self.ksp = self.vsp = None
        if mesh is not None:
            # kv-head-sharded pools: each chip holds Hkv/m heads of every
            # page, so pool HBM scales down with the mesh — the aggregate
            # pool (slot ceiling) scales UP with chips.
            pool_sh = NamedSharding(mesh, P("model", None, None, None))
            self.kp = jnp.zeros(pool_shape, pool_dtype, device=pool_sh)
            if not kv_fused:
                self.vp = jnp.zeros(pool_shape, pool_dtype, device=pool_sh)
            if kv_quant:
                # [Hkv, N, 1, ps]: row scales along lanes (the ps-trailing
                # layout tile-pads 128× on TPU and OOMs — see
                # ops/paged_attention.py module comment).
                scale_sh = NamedSharding(mesh, P("model", None, None, None))
                self.ksp = jnp.zeros(scale_shape, jnp.float32, device=scale_sh)
                if not kv_fused:
                    self.vsp = jnp.zeros(scale_shape, jnp.float32, device=scale_sh)
        else:
            self.kp = jnp.zeros(pool_shape, pool_dtype)
            if not kv_fused:
                self.vp = jnp.zeros(pool_shape, pool_dtype)
            if kv_quant:
                self.ksp = jnp.zeros(scale_shape, jnp.float32)
                if not kv_fused:
                    self.vsp = jnp.zeros(scale_shape, jnp.float32)
        self.page_table = jnp.zeros((max_slots, self.pages_per_seq), jnp.int32)
        self.lengths = jnp.zeros((max_slots,), jnp.int32)
        self.token = jnp.full((max_slots,), dec.pad_token_id, jnp.int32)
        self.active = np.zeros(max_slots, bool)
        self.budget = np.zeros(max_slots, np.int64)
        self.slot_req: List[Optional[_Request]] = [None] * max_slots
        # Per-slot sampling params + structured-output grammar state (same
        # machinery as ContinuousBatcher — _activate/_finish are shared).
        self.slot_temp = np.full(max_slots, sampling.temperature, np.float32)
        self.slot_topp = np.full(max_slots, sampling.top_p, np.float32)
        self._override_slots = set()
        self._lp_slots = set()
        self.slot_freq = np.zeros(max_slots, np.float32)
        self.slot_pres = np.zeros(max_slots, np.float32)
        self._penalty_slots = set()
        self.counts = None
        from .structured import GrammarSlots

        self.grammar_slots = GrammarSlots(max_slots, dec.vocab_size)
        # _activate (shared with the dense batcher) maintains these.
        # `lookahead`: speculation via the flash-structure kernel's
        # multi-row verify shape (`_paged_verify_step`); greedy only,
        # same contract as the dense batcher. `draft`: optional
        # `serve.draft.DraftModel` proposer (its cache is dense
        # regardless of the target's paged pools).
        self.lookahead = lookahead if sampling.temperature <= 0.0 else 0
        self.draft = draft if self.lookahead > 0 else None
        # Multi-step bursts (`_paged_multi_step`): n decode steps per
        # dispatch when no admission work waits; exclusive with lookahead.
        self.multi_step = max(1, int(multi_step)) if self.lookahead == 0 else 1
        self.slot_hist: List[list] = [[] for _ in range(max_slots)]
        self.slot_len = np.zeros(max_slots, np.int64)
        self.slot_pages: List[List[int]] = [[] for _ in range(max_slots)]
        self.pending = queue.Queue()
        self._requeued: deque = deque()  # head-of-queue retries (no pages free)
        self.rng = jax.random.PRNGKey(seed)
        self._next_id = 0
        self._lock = threading.Lock()

    @property
    def has_work(self) -> bool:
        return (self.active.any() or not self.pending.empty()
                or bool(self._requeued) or self._prefilling is not None
                or bool(self._swapped))

    def _next_request(self) -> Optional[_Request]:
        if self._requeued:
            return self._requeued.popleft()
        try:
            return self.pending.get_nowait()
        except queue.Empty:
            return None

    def _slot_free(self, slot: int) -> bool:
        # A swapped-out slot is inactive but still OWNS its parked
        # request's state — admission must not clobber it.
        return super()._slot_free(slot) and slot not in self._swapped

    def _admit_pending(self) -> None:
        from .batching import _prefill_kv

        for slot in range(self.max_slots):
            if not self._slot_free(slot):
                continue
            req = self._next_request()
            if req is None:
                return
            if req.cancelled:
                req.out.put(None)
                continue
            ids = jnp.asarray(req.input_ids[None])
            images = None if req.images is None else jnp.asarray(req.images[None])
            pv = None if req.patch_valid is None else jnp.asarray(req.patch_valid[None])
            last_logits, k, v, length = _prefill_kv(
                self.params, ids, images, pv, self.cfg,
                use_flash=self.use_flash, attn_mesh=self.mesh,
                mlora=self.mlora, adapter_idx=self._req_aidx(req),
            )
            if int(length) + req.max_new_tokens > self.cache_len:
                req.out.put(None)  # exceeds a sequence's page span; reject
                continue
            if not self._install(req, slot, last_logits, k, v, length):
                # Pool exhausted: retry once active requests release pages.
                self._requeued.appendleft(req)
                return

    def _shareable_pages(self, input_ids, n_tokens: int) -> int:
        """How many full pages of this prompt are prefix-shareable: whole
        pages of raw token ids before the first image sentinel (image
        positions splice request-specific embeddings) and below
        `n_tokens`."""
        from ..constants import IMAGE_TOKEN_INDEX

        ids = np.asarray(input_ids)
        img = np.nonzero(ids == IMAGE_TOKEN_INDEX)[0]
        limit = int(img[0]) if len(img) else n_tokens
        return min(limit, n_tokens) // self.page_size

    def _install(self, req: _Request, slot: int, last_logits, k, v, length) -> bool:
        """Allocate pages for the request's full span and write its K/V.
        Returns False (caller retries) when the pool is exhausted.

        Warm admission (prefix-cache hit, chunked pump only): the
        in-flight prefill state carries `shared` — already-written pool
        pages covering the prompt's first `len(shared)` pages. Only the
        SUFFIX K/V is written; the page-table row chains shared + owned
        pages, and the slot holds a refcount on both."""
        st = self._prefilling
        shared = (st.get("shared") or []) if (
            st is not None and st.get("slot") == slot) else []
        n0 = len(shared)
        n_len = int(length)
        ps = self.page_size
        if n0:
            k = k[:, n0 * ps:]
            v = v[:, n0 * ps:]
        T = k.shape[1]
        if T % ps:  # CPU prefill doesn't pad; round up to a page
            pad = ps - T % ps
            k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
            T += pad
        span_pages = -(-(n_len + req.max_new_tokens) // ps)
        if self.lazy_alloc:
            # Reserve only current length + one round's growth; later
            # growth is topped up page-by-page (preempting under pressure).
            span_pages = min(span_pages, -(-(n_len + self._headroom) // ps))
        n_pages = max(n0 + T // ps, span_pages)
        n_owned = n_pages - n0
        pages = self.allocator.alloc(n_owned)
        if pages is None and self.prefix_cache is not None:
            # Reclaim idle cached prefixes before giving up.
            if self.prefix_cache.evict(n_owned - self.allocator.available):
                pages = self.allocator.alloc(n_owned)
        if pages is None:
            return False
        row = np.zeros((self.pages_per_seq,), np.int32)
        row[:n0] = shared
        row[n0:n_pages] = pages
        if self.kv_quant:
            (self.kp, self.vp, self.ksp, self.vsp, self.page_table,
             self.lengths) = _admit_paged_q(
                self.kp, self.vp, self.ksp, self.vsp, self.page_table,
                self.lengths, k, v, jnp.asarray(length, jnp.int32),
                jnp.asarray(row), slot=slot, start=n0,
            )
        else:
            self.kp, self.vp, self.page_table, self.lengths = _admit_paged(
                self.kp, self.vp, self.page_table, self.lengths,
                k, v, jnp.asarray(length, jnp.int32), jnp.asarray(row),
                slot=slot, start=n0,
            )
        self.slot_pages[slot] = shared + pages
        self.slot_len[slot] = n_len
        self.slot_seq[slot] = self._seq
        self._seq += 1
        if self.prefix_cache is not None:
            n_ins = self._shareable_pages(req.input_ids, n_len)
            if n_ins > 0:
                self.prefix_cache.insert(
                    np.asarray(req.input_ids),
                    [int(p) for p in row[:n_ins]], n_ins,
                    salt=self._pc_salt(req))
        self._activate(req, slot, last_logits)
        return True

    def _pc_salt(self, req: _Request) -> bytes:
        """Prefix-cache key salt: the adapter changes prompt K/V, so pages
        are only shareable within one adapter."""
        return (b"a%d|" % req.adapter) if req.adapter else b""

    def _begin_prefill(self, req: _Request, slot: int):
        """Chunked-pump admission start; with a prefix cache, look up the
        longest reusable page chain, gather it as dense prefix K/V into the
        scratch cache, and skip the covered chunks entirely — warm
        admission reproduces `_chunk_extend`'s numerics exactly (it IS
        `_chunk_extend`, starting later)."""
        st = super()._begin_prefill(req, slot)
        if st is None or self.prefix_cache is None:
            return st
        import math

        ps, C = self.page_size, self.prefill_chunk
        align = ps * C // math.gcd(ps, C)  # chunk AND page aligned
        per = align // ps
        # Shareable span: full pages before the first image sentinel,
        # leaving ≥ 1 prompt token un-shared (its logits start decode).
        max_pages = (min(self._shareable_pages(req.input_ids, st["length"]),
                         (st["length"] - 1) // ps) // per) * per
        st["shared"] = []
        if max_pages <= 0:
            return st
        shared = self.prefix_cache.lookup(np.asarray(req.input_ids), max_pages,
                                          salt=self._pc_salt(req))
        keep = (len(shared) // per) * per
        if keep < len(shared):  # chain must stay chunk-aligned to skip
            self.allocator.release(shared[keep:])
            # Keep the hit metrics honest: only truly reused pages count.
            self.prefix_cache.pages_reused -= len(shared) - keep
            if keep == 0:
                self.prefix_cache.hits -= 1
            shared = shared[:keep]
        if not shared:
            return st
        t0 = len(shared) * ps
        pk, pv = _gather_prefix(
            self.kp, self.vp, self.ksp, self.vsp,
            jnp.asarray(shared, jnp.int32),
            num_layers=self.cfg.decoder.num_layers)
        st["cache"] = _warm_scratch(st["cache"], pk, pv)
        st["chunk"] = t0 // C
        st["shared"] = shared
        return st

    def _finish(self, slot: int) -> None:
        if self.slot_pages[slot]:
            self.allocator.release(self.slot_pages[slot])
            self.slot_pages[slot] = []
            self.page_table = _clear_row(self.page_table, jnp.int32(slot))
        self._swapped.pop(slot, None)  # cancelled while swapped out
        super()._finish(slot)

    # -- lazy allocation + host-swap preemption ------------------------------

    @property
    def _headroom(self) -> int:
        """Rows a slot can append in ONE scheduler round (single step,
        `multi_step` burst, or a `lookahead+1`-row verify) — the growth
        margin every active slot must have page-backed before dispatch."""
        return max(self.multi_step, self.lookahead + 1)

    def _swap_idx(self, pages: List[int]):
        """Pool axis-1 indices of `pages` across all layers, padded to a
        power-of-two page count (bounds jit retraces); pad rows target the
        reserved trash page 0, so a swap-in scatter's padding writes land
        on rows nothing reads."""
        L = self.cfg.decoder.num_layers
        bucket = 1 << max(0, (len(pages) - 1).bit_length())
        padded = np.zeros(bucket, np.int64)
        padded[: len(pages)] = pages
        idx = (np.arange(L, dtype=np.int64)[:, None] * self.num_pages
               + padded[None, :]).ravel()
        return jnp.asarray(idx.astype(np.int32))

    def _swap_out(self, slot: int) -> None:
        """Preempt `slot`: gather its raw pool rows (and scale rows) to
        host, release its pages, deactivate. The snapshot is pool BYTES
        (int8/bf16 + f32 scales), never dequantized, so the swap round
        trip is bit-exact in every layout (bf16/int8, split/fused, TP).
        All host-side slot state (history, grammar, penalties, budget,
        pending token, draft-cache mirror) stays in place — only the
        device pages move."""
        pages = self.slot_pages[slot]
        idx = self._swap_idx(pages)
        # The pending token must survive the park: decode steps overwrite
        # INACTIVE slots' token entries with pad (their trash-row write),
        # so it would be gone by resume time without this save.
        snap: dict = {"n": len(pages),
                      "token": int(jax.device_get(self.token[slot]))}
        for name in ("kp", "vp", "ksp", "vsp"):
            pool = getattr(self, name)
            if pool is not None:
                snap[name] = jax.device_get(_pool_rows_get(pool, idx))
        self.allocator.release(pages)
        self.slot_pages[slot] = []
        self.page_table = _clear_row(self.page_table, jnp.int32(slot))
        self.active[slot] = False
        self._swapped[slot] = snap
        if self.metrics is not None:
            self.metrics.preempt_swap_out += 1

    def _swap_in(self, slot: int, pages: List[int]) -> None:
        """Restore a swapped slot into freshly-allocated `pages` (len ≥
        snapshot pages; extras are growth headroom) and reactivate it."""
        snap = self._swapped.pop(slot)
        idx = self._swap_idx(pages[: snap["n"]])
        for name in ("kp", "vp", "ksp", "vsp"):
            pool = getattr(self, name)
            if pool is not None:
                data = jnp.asarray(snap[name])
                if self.mesh is not None:
                    data = jax.device_put(data, pool.sharding)
                setattr(self, name, _pool_rows_set(pool, idx, data))
        row = np.zeros((self.pages_per_seq,), np.int32)
        row[: len(pages)] = pages
        self.page_table = self.page_table.at[slot].set(jnp.asarray(row))
        self.token = self.token.at[slot].set(jnp.int32(snap["token"]))
        self.slot_pages[slot] = list(pages)
        self.active[slot] = True
        if self.metrics is not None:
            self.metrics.preempt_swap_in += 1

    def _try_swap_in(self) -> None:
        """Resume swapped slots FIFO as pages free up. Resume never
        preempts running slots (no swap thrash); a blocked head blocks the
        queue so younger slots can't starve it."""
        while self._swapped:
            slot = next(iter(self._swapped))  # FIFO head
            req = self.slot_req[slot]
            if req is None or req.cancelled:
                self._finish(slot)  # drops the snapshot
                continue
            need = min(max(self._swapped[slot]["n"],
                           -(-(int(self.slot_len[slot]) + self._headroom)
                             // self.page_size)),
                       self.pages_per_seq)
            pages = self.allocator.alloc(need)
            if pages is None and self.prefix_cache is not None:
                if self.prefix_cache.evict(need - self.allocator.available):
                    pages = self.allocator.alloc(need)
            if pages is None:
                return
            self._swap_in(slot, pages)

    def _ensure_growth_capacity(self) -> None:
        """Top up every active slot's pages to cover one round of growth;
        under pool pressure preempt the YOUNGEST slot (highest admission
        seq) until the allocation fits. Runs on the scheduler thread
        before every decode dispatch; no-op without `lazy_alloc`."""
        if not self.lazy_alloc:
            return
        for slot in range(self.max_slots):
            if not self.active[slot]:
                continue
            # Clamp to the table row's width: near the cache_len boundary
            # the headroom can demand a page the row can't hold — the
            # device never writes past cache_len (budget freeze), so the
            # overshoot rows are never read.
            need = min(-(-(int(self.slot_len[slot]) + self._headroom)
                         // self.page_size), self.pages_per_seq)
            have = len(self.slot_pages[slot])
            if have >= need:
                continue
            pages = self._alloc_or_preempt(need - have, protect=slot)
            if pages is None:
                # Nothing left to preempt: park this slot too; finishing
                # requests will free the pages it needs.
                self._swap_out(slot)
                continue
            self.page_table = self.page_table.at[
                slot, have:need].set(jnp.asarray(pages, jnp.int32))
            self.slot_pages[slot].extend(pages)

    def _alloc_or_preempt(self, n: int, protect: int) -> Optional[List[int]]:
        """Allocate `n` pages, evicting idle cached prefixes and then
        swapping out the youngest other active slots until it fits (or
        None when no victim remains)."""
        while True:
            pages = self.allocator.alloc(n)
            if pages is not None:
                return pages
            if self.prefix_cache is not None and self.prefix_cache.evict(
                    n - self.allocator.available):
                continue
            victims = [s for s in range(self.max_slots)
                       if self.active[s] and s != protect]
            if not victims:
                return None
            self._swap_out(max(victims, key=lambda s: self.slot_seq[s]))

    def _verify_device(self, toks: np.ndarray, valid: np.ndarray) -> np.ndarray:
        """Paged verify append: all S rows are written to the pools (invalid
        rows land above the accepted prefix, or on the trash page past a
        slot's allocation) and rolled back by `_verify_rollback`; `valid`
        only drives the host-side acceptance loop."""
        greedy, self.kp, self.vp, (self.ksp, self.vsp) = _paged_verify_step(
            self.params, self.kp, self.vp, (self.ksp, self.vsp),
            self.page_table, self.lengths, jnp.asarray(toks),
            jnp.asarray(self.active), self.cfg, mesh=self.mesh,
            mlora=self.mlora, adapter_idx=self._slot_aidx(),
        )
        return np.asarray(jax.device_get(greedy))

    def _verify_rollback(self) -> None:
        self.lengths = jnp.asarray(self.slot_len.astype(np.int32))

    def _has_admission_work(self) -> bool:
        return (self._prefilling is not None or not self.pending.empty()
                or bool(self._requeued))

    def step(self) -> int:
        self._reap_cancelled()
        # Swapped slots resume BEFORE new admissions take pages (FIFO
        # fairness), and every active slot gets its growth pages BEFORE
        # the round dispatches (preempting the youngest under pressure).
        self._try_swap_in()
        if self.prefill_chunk:
            self._pump_prefill()
        else:
            self._admit_pending()
        self._ensure_growth_capacity()
        if not self.active.any():
            return 0
        if self.lookahead > 0:
            return self._step_verify()
        # Same rule as ContinuousBatcher.step: grammar/logprobs slots
        # single-step.
        grammar_op = self.grammar_slots.operand()
        want_lp = bool(self._lp_slots)
        pen = self._penalty_operand()
        if (self.multi_step > 1 and grammar_op is None and not want_lp
                and pen is None and not self._has_admission_work()):
            self.rng, sub = jax.random.split(self.rng)
            (toks, alive, self.kp, self.vp, (self.ksp, self.vsp),
             self.lengths, self.token) = _paged_multi_step(
                self.params, self.kp, self.vp, (self.ksp, self.vsp),
                self.page_table, self.lengths, self.token,
                jnp.asarray(self.active),
                jnp.asarray(self.budget.astype(np.int32)), sub,
                self.cfg, self.sampling, mesh=self.mesh, n=self.multi_step,
                mlora=self.mlora, adapter_idx=self._slot_aidx(),
                sample_overrides=self._sample_overrides(),
            )
            return self._process_burst(np.asarray(jax.device_get(toks)),
                                       np.asarray(jax.device_get(alive)))
        self.rng, sub = jax.random.split(self.rng)
        (self.token, self.kp, self.vp, (self.ksp, self.vsp), self.lengths,
         lp, counts) = _paged_step(
            self.params, self.kp, self.vp, (self.ksp, self.vsp),
            self.page_table, self.lengths,
            self.token, jnp.asarray(self.active), sub, self.cfg, self.sampling,
            mesh=self.mesh, mlora=self.mlora, adapter_idx=self._slot_aidx(),
            sample_overrides=self._sample_overrides(), grammar=grammar_op,
            want_logprobs=want_lp, penalties=pen,
        )
        if counts is not None:
            self.counts = counts
        tokens = np.asarray(jax.device_get(self.token))
        lp_host = jax.device_get(lp) if lp is not None else None
        stepped = 0
        for slot in range(self.max_slots):
            if not self.active[slot]:
                continue
            stepped += 1
            tok = int(tokens[slot])
            if tok == self.sampling.eos_token_id:
                self._finish(slot)
                continue
            self.grammar_slots.advance(slot, tok)
            if lp_host is not None and slot in self._lp_slots:
                self.slot_req[slot].lp_log.append(
                    (float(lp_host[0][slot]), lp_host[1][slot],
                     lp_host[2][slot]))
            self._emit(self.slot_req[slot], tok)
            self.slot_len[slot] += 1
            self.budget[slot] -= 1
            if self.budget[slot] <= 0:
                self._finish(slot)
        return stepped
