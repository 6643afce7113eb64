"""Continuous batching engine: slot-based multi-request decoding.

The reference serves one request at a time on a single model with no
locking (`vis_zephyr/serve/api.py:39-189`, SURVEY §2.3 "serving
parallelism: none"). This engine replaces that with the standard
continuous-batching design:

- a fixed pool of `max_slots` sequence slots shares one batched KV cache
  [L, max_slots, cache_len, Hkv, D] (the per-sample `length` vector the
  decode path already supports does the bookkeeping),
- new requests prefill individually (vision stack + flash attention, B=1)
  and their per-layer K/V are scattered into a free slot between decode
  steps,
- one jitted decode step advances ALL active slots each iteration; inactive
  slots are masked out of length updates and emit pad tokens,
- finished slots (EOS / budget) are freed and immediately reusable.

Decode throughput is weight-bandwidth-bound, so batching B slots multiplies
tokens/sec at nearly constant step latency — this is the mechanism behind
the "continuous-batched serving" north star (BASELINE.json config 5).
"""

from __future__ import annotations

import dataclasses
import functools
import queue
import threading
import time
from typing import Dict, Iterator, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import VisZephyrConfig
from ..models.mistral import embed, init_cache, mistral_forward
from ..models.vis_zephyr import vis_zephyr_forward
from .generate import (SamplingConfig, _apply_penalties, _count_token,
                       _logprobs, _logprobs_host, _sample)


@functools.partial(jax.jit, static_argnames=("cfg", "use_flash", "attn_mesh"))
def _prefill_kv(params, input_ids, images, patch_valid, cfg: VisZephyrConfig,
                use_flash: Optional[bool] = None, attn_mesh=None,
                mlora=None, adapter_idx=None):
    """Single-request prefill → (last_logits [1,V], k/v [L,T,Hkv,D], length).
    `attn_mesh`: TP mesh — the Pallas flash prefill runs per shard over its
    heads (previously TP admission fell back to XLA attention).
    `mlora`/`adapter_idx` [1]: multi-LoRA serving — the request's adapter
    shapes its prompt K/V (see `ops/mlora.py`)."""
    pad_mult = 128 if jax.default_backend() != "cpu" else None
    logits, aux = vis_zephyr_forward(
        params, input_ids, images, patch_valid, cfg,
        return_kv=True, pad_to_multiple=pad_mult, use_flash=use_flash,
        attn_mesh=attn_mesh, mlora=mlora, adapter_idx=adapter_idx,
    )
    k, v = aux["kv"]
    length = aux["lengths"][0]
    return logits[0, length - 1], k[:, 0], v[:, 0], length


@functools.partial(jax.jit, static_argnames=("cfg", "pad_to"))
def _splice_embeds(params, input_ids, images, patch_valid, cfg: VisZephyrConfig,
                   pad_to: int = 128):
    """Vision encode + Q-Former + splice WITHOUT the decoder pass — the
    front half of prefill, used by chunked admission. Returns
    (embeds [1, T, D], valid, positions, lengths) with T padded to
    `pad_to` so chunks stay shape-aligned."""
    from ..models.vis_zephyr import prepare_multimodal

    if images is None:
        B, T = input_ids.shape
        valid = jnp.ones((B, T), dtype=bool)
        positions = jnp.arange(T, dtype=jnp.int32)[None].repeat(B, 0)
        prepared = {
            "embeds": embed(params["decoder"], input_ids),
            "valid": valid,
            "positions": positions,
            "lengths": jnp.full((B,), T, jnp.int32),
        }
        pad = (-T) % pad_to
        if pad:
            prepared["embeds"] = jnp.pad(prepared["embeds"], ((0, 0), (0, pad), (0, 0)))
            prepared["valid"] = jnp.pad(prepared["valid"], ((0, 0), (0, pad)))
            prepared["positions"] = jnp.pad(prepared["positions"], ((0, 0), (0, pad)))
    else:
        prepared = prepare_multimodal(
            params, input_ids, images, patch_valid, cfg, pad_to_multiple=pad_to
        )
    return (prepared["embeds"], prepared["valid"], prepared["positions"],
            prepared["lengths"])


@functools.partial(jax.jit, static_argnames=("cfg", "pallas_cache"), donate_argnums=(4,))
def _chunk_extend(dec_params, embeds, positions, valid, cache, cfg: VisZephyrConfig,
                  pallas_cache: bool = True, mlora=None, adapter_idx=None):
    """Append one prefill chunk to a B=1 scratch cache (decoder cache-
    extension mode: the chunk attends causally over all previous chunks)."""
    logits, cache = mistral_forward(
        dec_params, embeds, cfg.decoder, positions,
        attn_valid=valid, cache=cache, logits_slice="all",
        pallas_cache_update=pallas_cache, mlora=mlora, adapter_idx=adapter_idx,
    )
    return logits, cache


@functools.partial(jax.jit, static_argnames=("cfg", "slot"), donate_argnums=(0,))
def _admit(cache, k, v, length, cfg: VisZephyrConfig, slot: int):
    """Scatter a prefilled sequence into cache slot `slot` (in-place)."""
    T = k.shape[1]
    ck = jax.lax.dynamic_update_slice(cache["k"], k[:, None].astype(cache["k"].dtype),
                                      (0, slot, 0, 0, 0))
    cv = jax.lax.dynamic_update_slice(cache["v"], v[:, None].astype(cache["v"].dtype),
                                      (0, slot, 0, 0, 0))
    lengths = cache["length"].at[slot].set(length.astype(jnp.int32))
    return {"k": ck, "v": cv, "length": lengths}


@functools.partial(jax.jit, static_argnames=("cfg", "pallas_cache"),
                   donate_argnums=(1,))
def _verify_step(params, cache, toks, valid, cfg: VisZephyrConfig,
                 pallas_cache: bool = True, mlora=None, adapter_idx=None):
    """Batched speculative verify: append up to S tokens per slot (column 0
    is every slot's pending token; later columns are prompt-lookup
    proposals, padded rows invalid) in ONE cached forward. Returns
    per-position greedy tokens [B, S]; the caller measures the accepted
    prefix per slot and OVERWRITES cache["length"] host-side — rejected
    slots hold garbage K/V above the accepted point that the next append
    overwrites (attention masks keys off `length`, so stale rows are never
    attended). Wraps `generate.decode_verify` (one multi-token append)
    with the batcher's greedy argmax and cache donation."""
    from .generate import decode_verify

    logits, new_cache = decode_verify(params, cache, toks, valid, cfg,
                                      pallas_cache=pallas_cache,
                                      mlora=mlora, adapter_idx=adapter_idx)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), new_cache


@functools.partial(jax.jit, static_argnames=("cfg", "sampling", "pallas_cache",
                                              "want_logprobs"),
                   donate_argnums=(1,))
def _batch_step(params, cache, token, active, key, cfg: VisZephyrConfig,
                sampling: SamplingConfig, pallas_cache: bool = True,
                mlora=None, adapter_idx=None, sample_overrides=None,
                grammar=None, want_logprobs: bool = False, penalties=None):
    """One decode step over all slots; inactive slots are frozen.
    `sample_overrides`: optional (temps [B], top_ps [B]) per-slot sampling
    parameters (per-request temperature/top_p, see `generate._sample`).
    `grammar`: optional (mask_table [R, V] bool, slot_rows [B] int32) —
    structured-output masking: each slot samples only tokens legal from its
    grammar state (`serve/structured.py`); unconstrained slots point at the
    table's all-True row.
    `want_logprobs` (static): additionally return
    (chosen_lp [B], top_ids [B, LP_TOPK], top_lps [B, LP_TOPK]) from the
    raw model distribution (`generate._logprobs`) — None when off, so
    logprob-free batches pay nothing.
    `penalties`: optional (freq [B], pres [B], counts [B, V]) — OpenAI
    frequency/presence penalties over emitted tokens; the updated counts
    come back as the 4th return (None when off). Logprobs stay RAW
    (pre-penalty), the documented convention."""
    old_lengths = cache["length"]
    embeds = embed(params["decoder"], token[:, None])
    logits, new_cache = mistral_forward(
        params["decoder"], embeds, cfg.decoder, old_lengths[:, None],
        cache=cache, logits_slice="last",
        pallas_cache_update=pallas_cache, mlora=mlora, adapter_idx=adapter_idx,
    )
    mask = None if grammar is None else grammar[0][grammar[1]]
    sample_logits = logits[:, 0]
    if penalties is not None:
        sample_logits = _apply_penalties(sample_logits, penalties[2],
                                         penalties[0], penalties[1])
    next_token = _sample(sample_logits, key, sampling,
                         overrides=sample_overrides, mask=mask)
    next_token = jnp.where(active, next_token, cfg.decoder.pad_token_id)
    lp = _logprobs(logits[:, 0], next_token) if want_logprobs else None
    counts = (None if penalties is None
              else _count_token(penalties[2], next_token, active))
    new_cache["length"] = jnp.where(active, new_cache["length"], old_lengths)
    return next_token, new_cache, lp, counts


@functools.partial(jax.jit, static_argnames=("cfg", "sampling", "n",
                                              "pallas_cache"),
                   donate_argnums=(1,))
def _batch_multi_step(params, cache, token, active, steps_left, key,
                      cfg: VisZephyrConfig, sampling: SamplingConfig,
                      n: int, pallas_cache: bool = True,
                      mlora=None, adapter_idx=None, sample_overrides=None):
    """`n` chained decode steps in ONE dispatch (multi-step scheduling,
    the vLLM-style host-overhead amortization): the per-step host work —
    Python scheduling, dispatch latency, one device_get per step — is paid
    once per burst instead of once per token.

    The burst is TOKEN-EXACT with single-stepping: the scan carries an
    `alive` mask and per-slot `steps_left` (the host's remaining budget),
    so a slot that emits EOS or exhausts its budget mid-burst is frozen by
    the very next iteration — its lengths stop growing and nothing is
    written (inactive slots write the trash page / are masked), exactly as
    if the host had finished it between steps. (Sampled decoding draws the
    burst's keys from one split rather than n sequential splits, so
    temperature > 0 sequences differ from the single-step path — both are
    valid samples.)

    Returns (toks [n, B], entry_alive [n, B], cache, token): the host
    processes token (j, b) iff entry_alive[j, b]."""
    eos = sampling.eos_token_id

    def body(carry, sub):
        cache, token, alive, left = carry
        tok, cache, _, _ = _batch_step(params, cache, token, alive, sub, cfg,
                                       sampling, pallas_cache=pallas_cache,
                                       mlora=mlora, adapter_idx=adapter_idx,
                                       sample_overrides=sample_overrides)
        entry_alive = alive
        left = left - 1
        alive = alive & (tok != eos) & (left > 0)
        return (cache, tok, alive, left), (tok, entry_alive)

    keys = jax.random.split(key, n)
    (cache, token, _, _), (toks, alive) = jax.lax.scan(
        body, (cache, token, active, steps_left), keys
    )
    return toks, alive, cache, token


@functools.partial(jax.jit, donate_argnums=(0,))
def _reset_count_row(counts, slot, tok):
    """Fresh activation in `slot`: zero its emitted-token counts and record
    the prefill-sampled first token."""
    counts = counts.at[slot].set(0.0)
    return counts.at[slot, tok].add(1.0)


@dataclasses.dataclass
class _Request:
    request_id: int
    input_ids: np.ndarray
    images: Optional[np.ndarray]
    patch_valid: Optional[np.ndarray]
    max_new_tokens: int
    adapter: int = 0  # multi-LoRA index (0 = base model)
    # Per-request sampling overrides (None = the batcher's SamplingConfig).
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    # OpenAI frequency/presence penalties over emitted tokens (0 = off).
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    # Structured output: a serve.structured.TokenGrammar constraining this
    # request's tokens (None = free-form).
    grammar: object = None
    # OpenAI logprobs: None = off; N (0..LP_TOPK) = chosen-token logprob
    # plus top-N alternatives per emitted token, appended to `lp_log` as
    # (chosen_lp, top_ids, top_lps) BEFORE the token enters `out` (so a
    # consumer reading token i may index lp_log[i]).
    logprobs: Optional[int] = None
    lp_log: List[tuple] = dataclasses.field(default_factory=list)
    cancelled: bool = False  # set by cancel(); slot freed at the next step
    out: "queue.Queue[Optional[int]]" = dataclasses.field(
        default_factory=queue.Queue
    )
    # Serving observability (ServingMetrics): wall-clock trace.
    submitted_at: float = 0.0
    first_token_at: Optional[float] = None
    n_tokens: int = 0


class ContinuousBatcher:
    """Host-side scheduler around the jitted prefill/admit/step programs."""

    def __init__(
        self,
        params,
        cfg: VisZephyrConfig,
        max_slots: int = 8,
        cache_len: int = 2048,
        sampling: SamplingConfig = SamplingConfig(),
        seed: int = 0,
        mesh=None,
        metrics=None,
        prefill_chunk: Optional[int] = None,
        lookahead: int = 0,
        draft=None,
        multi_step: int = 1,
        mlora=None,
        adapter_names: Optional[Dict[str, int]] = None,
    ):
        """`mesh`: optional inference mesh (see `parallel.mesh.inference_mesh`).
        Params are TP-sharded over its model axis and the KV cache over the
        head dim; every jitted step then partitions via SPMD propagation —
        no explicit collectives here. Pallas flash prefill is disabled under
        a mesh (a custom kernel can't be auto-partitioned; XLA attention
        shards cleanly head-parallel).
        `metrics`: optional `utils.metrics.ServingMetrics` — per-request
        TTFT/TPOT recorded at finish.
        `prefill_chunk`: admit long prompts in chunks of this many tokens,
        interleaved with decode steps (no head-of-line blocking).
        `lookahead`: per-slot speculative decoding (greedy only; silently
        off when sampling.temperature > 0): each scheduler step proposes up
        to `lookahead` tokens per slot — from the slot's own n-gram
        structure (prompt lookup, the default) or from `draft` — and
        verifies all slots in ONE multi-token cache append — token-
        identical to plain greedy, fewer device steps when proposals land.
        Acceptance recorded in `metrics`.
        `draft`: optional `serve.draft.DraftModel` proposer (requires
        lookahead > 0); slots it declines fall back to prompt lookup.
        `multi_step`: run this many decode steps per dispatch when no
        admission work is waiting (`_batch_multi_step`) — amortizes host
        scheduling + dispatch latency over n tokens, token-exact with
        single-stepping under greedy decoding. Mutually exclusive with
        `lookahead` (the verify step already advances multiple tokens per
        dispatch); ignored when lookahead > 0.
        `mlora`/`adapter_names`: multi-LoRA serving — an `ops/mlora.py`
        pack plus {name → index ≥ 1} routing; `submit(adapter=name)`
        selects each request's adapter (index 0 = base). Every forward
        (admission prefill, decode, verify) adds the per-row adapter
        deltas, so outputs per slot equal the single-adapter engine's."""
        self.metrics = metrics
        self.mlora = mlora
        self.adapter_names = dict(adapter_names or {})
        self.slot_adapter = np.zeros(max_slots, np.int32)
        self.prefill_chunk = prefill_chunk
        self.lookahead = lookahead if sampling.temperature <= 0.0 else 0
        self.multi_step = max(1, int(multi_step)) if self.lookahead == 0 else 1
        self.draft = draft if self.lookahead > 0 else None
        self._prefilling = None
        self._reserved_slot = None
        if mesh is not None:
            from ..parallel.sharding import shard_kv_cache, shard_params

            params = shard_params(params, mesh)
        self.params = params
        self.cfg = cfg
        self.mesh = mesh
        # Flash prefill runs under a mesh too (shard_map over heads via
        # `attn_mesh` — see _prefill_kv); the auto-gate still applies.
        self.use_flash = None
        self.max_slots = max_slots
        self.cache_len = cache_len
        self.sampling = sampling

        dtype = params["decoder"]["embed_tokens"].dtype
        self.cache = init_cache(cfg.decoder, max_slots, cache_len, dtype=dtype)
        if mesh is not None:
            self.cache = shard_kv_cache(self.cache, mesh)
        self.token = jnp.full((max_slots,), cfg.decoder.pad_token_id, jnp.int32)
        self.active = np.zeros(max_slots, bool)
        self.budget = np.zeros(max_slots, np.int64)
        self.slot_req: List[Optional[_Request]] = [None] * max_slots
        # Per-slot sampling parameters (per-request temperature/top_p).
        # The override set tracks slots whose request differs from the
        # batcher default: while it is empty, steps pass overrides=None and
        # keep the scalar greedy/sampled fast paths compiled for the
        # engine-level config.
        self.slot_temp = np.full(max_slots, sampling.temperature, np.float32)
        self.slot_topp = np.full(max_slots, sampling.top_p, np.float32)
        self._override_slots: set = set()
        # Slots whose request wants OpenAI logprobs: while empty, steps run
        # with want_logprobs=False and pay nothing.
        self._lp_slots: set = set()
        # Frequency/presence penalties: per-slot coefficients + a lazily
        # allocated [B, V] emitted-token count table on device. While no
        # slot is penalized, steps receive penalties=None and pay nothing;
        # rows reset at activation, so stale counts from off periods never
        # leak into a penalized request.
        self.slot_freq = np.zeros(max_slots, np.float32)
        self.slot_pres = np.zeros(max_slots, np.float32)
        self._penalty_slots: set = set()
        self.counts = None
        # Structured output (grammar-constrained slots): combined device
        # mask table + per-slot DFA states (serve/structured.py).
        from .structured import GrammarSlots

        self.grammar_slots = GrammarSlots(max_slots, cfg.decoder.vocab_size)
        # Speculation bookkeeping (host mirrors): per-slot token history for
        # n-gram lookup and the committed cache length (saves a device fetch
        # per step when clamping proposal spans).
        self.slot_hist: List[list] = [[] for _ in range(max_slots)]
        self.slot_len = np.zeros(max_slots, np.int64)
        self.pending: "queue.Queue[_Request]" = queue.Queue()
        self.rng = jax.random.PRNGKey(seed)
        self._next_id = 0
        self._lock = threading.Lock()

    # -- public API ----------------------------------------------------------

    def submit(
        self,
        input_ids: np.ndarray,
        images: Optional[np.ndarray] = None,
        patch_valid: Optional[np.ndarray] = None,
        max_new_tokens: Optional[int] = None,
        adapter: Optional[str] = None,
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
        grammar=None,
        logprobs: Optional[int] = None,
        frequency_penalty: float = 0.0,
        presence_penalty: float = 0.0,
    ) -> _Request:
        """Queue a request. Returns a handle whose `.out` queue yields token
        ids and a final `None` sentinel. `adapter`: multi-LoRA adapter NAME
        (requires the batcher's `mlora` pack; None/"base" = base model).
        `temperature`/`top_p`: per-request sampling overrides (None = the
        batcher's SamplingConfig). Ignored when the batcher speculates
        (`lookahead > 0`): the verify step commits greedy continuations, so
        a speculative engine serves greedy only.
        `grammar`: optional `serve.structured.TokenGrammar` — constrained
        decoding (structured output). Incompatible with speculation (the
        verify step commits unmasked greedy tokens).
        `logprobs`: None = off; N (0..LP_TOPK) = record the chosen token's
        raw-distribution logprob + top-N alternatives per emitted token in
        the handle's `lp_log`. Incompatible with speculation (verify
        commits multiple tokens from one forward's logits)."""
        if grammar is not None and self.lookahead > 0:
            raise ValueError(
                "structured output is incompatible with speculative "
                "decoding (--lookahead); serve grammars from a "
                "non-speculative engine")
        if logprobs is not None and self.lookahead > 0:
            raise ValueError(
                "logprobs are incompatible with speculative decoding "
                "(--lookahead); serve logprobs from a non-speculative "
                "engine")
        if (frequency_penalty or presence_penalty) and self.lookahead > 0:
            raise ValueError(
                "frequency/presence penalties are incompatible with "
                "speculative decoding (--lookahead)")
        if self.lookahead > 0:
            temperature = top_p = None
        aidx = 0
        if adapter is not None and adapter != "base":
            if adapter not in self.adapter_names:
                raise KeyError(
                    f"unknown adapter {adapter!r}; loaded: "
                    f"{sorted(self.adapter_names)} (plus 'base')")
            aidx = self.adapter_names[adapter]
        with self._lock:
            rid = self._next_id
            self._next_id += 1
        req = _Request(
            rid,
            np.asarray(input_ids),
            images if images is None else np.asarray(images),
            patch_valid if patch_valid is None else np.asarray(patch_valid),
            (self.sampling.max_new_tokens if max_new_tokens is None
             else max_new_tokens),  # an explicit 0 means zero tokens
            adapter=aidx,
            temperature=temperature,
            top_p=top_p,
            grammar=grammar,
            logprobs=logprobs,
            frequency_penalty=float(frequency_penalty or 0.0),
            presence_penalty=float(presence_penalty or 0.0),
        )
        req.submitted_at = time.perf_counter()
        self.pending.put(req)
        return req

    def stream(self, req: _Request) -> Iterator[int]:
        try:
            while True:
                tok = req.out.get()
                if tok is None:
                    return
                yield tok
        finally:
            # Closed early (client disconnect / consumer GC): free the slot
            # at the next scheduler step instead of decoding to budget.
            req.cancelled = True

    def cancel(self, req: _Request) -> None:
        """Stop generating for `req`: its slot (or queue entry) is released
        at the next scheduler step and its stream ends with the sentinel."""
        req.cancelled = True

    def _reap_cancelled(self) -> None:
        """Free slots whose requests were cancelled (client disconnects) —
        called at the top of every scheduler step, the one place all step
        variants share."""
        for slot in range(self.max_slots):
            req = self.slot_req[slot]
            if self.active[slot] and req is not None and req.cancelled:
                self._finish(slot)

    @property
    def has_work(self) -> bool:
        return (self.active.any() or not self.pending.empty()
                or self._prefilling is not None)

    # -- scheduler -----------------------------------------------------------

    def _slot_free(self, slot: int) -> bool:
        """Can `slot` take a new admission? (PagedBatcher also excludes
        slots parked by host-swap preemption — inactive but OWNED.)"""
        return not self.active[slot] and slot != self._reserved_slot

    def _admit_pending(self) -> None:
        for slot in range(self.max_slots):
            if not self._slot_free(slot):
                continue
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
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
                req.out.put(None)  # too long; reject
                continue
            self._install(req, slot, last_logits, k, v, length)

    def _install(self, req: _Request, slot: int, last_logits, k, v, length) -> bool:
        """Put a prefilled request into `slot` and emit its first token.
        k/v: [L, T, Hkv, D]; last_logits: [V]."""
        self.cache = _admit(self.cache, k, v, length, self.cfg, slot)
        self.slot_len[slot] = int(length)
        self._activate(req, slot, last_logits)
        return True

    def _req_aidx(self, req: _Request):
        """Adapter index operand for a single-request (B=1) forward."""
        if self.mlora is None:
            return None
        return jnp.asarray([req.adapter], jnp.int32)

    def _slot_aidx(self):
        """Adapter index operand for all-slots forwards (inactive slots sit
        at 0 = base: a zero adapter, exactly no-op)."""
        if self.mlora is None:
            return None
        return jnp.asarray(self.slot_adapter)

    def _sample_overrides(self):
        """Per-slot (temps, top_ps) operand for the jitted steps, or None
        while every active request uses the batcher default (keeps the
        scalar sampling fast path compiled)."""
        if not self._override_slots:
            return None
        return (jnp.asarray(self.slot_temp), jnp.asarray(self.slot_topp))

    def _penalty_operand(self):
        """(freq [B], pres [B], counts [B, V]) for the jitted steps, or
        None while no active request is penalized (zero hot-path cost)."""
        if not self._penalty_slots:
            return None
        return (jnp.asarray(self.slot_freq), jnp.asarray(self.slot_pres),
                self.counts)

    def _set_slot_sampling(self, req: _Request, slot: int) -> None:
        self.slot_temp[slot] = (self.sampling.temperature
                                if req.temperature is None else req.temperature)
        self.slot_topp[slot] = (self.sampling.top_p
                                if req.top_p is None else req.top_p)
        if req.temperature is not None or req.top_p is not None:
            self._override_slots.add(slot)
        else:
            self._override_slots.discard(slot)

    def _activate(self, req: _Request, slot: int, last_logits) -> None:
        self.slot_adapter[slot] = req.adapter
        self._set_slot_sampling(req, slot)
        self.grammar_slots.attach(slot, req.grammar)
        if req.logprobs is not None:
            self._lp_slots.add(slot)
        self.slot_freq[slot] = req.frequency_penalty
        self.slot_pres[slot] = req.presence_penalty
        if req.frequency_penalty or req.presence_penalty:
            self._penalty_slots.add(slot)
            if self.counts is None:
                self.counts = jnp.zeros(
                    (self.max_slots, self.cfg.decoder.vocab_size),
                    jnp.float32)
        else:
            self._penalty_slots.discard(slot)
        self.rng, sub = jax.random.split(self.rng)
        ov = None
        if req.temperature is not None or req.top_p is not None:
            ov = (jnp.asarray([self.slot_temp[slot]]),
                  jnp.asarray([self.slot_topp[slot]]))
        mask = None
        if req.grammar is not None:
            mask = self.grammar_slots.first_token_mask(req.grammar)[None]
        first = _sample(last_logits[None], sub, self.sampling, overrides=ov,
                        mask=mask)
        tok = int(first[0])
        if req.logprobs is not None and tok != self.sampling.eos_token_id:
            # The first (prefill-sampled) token's logprobs come from the
            # already host-bound admission logits.
            req.lp_log.append(_logprobs_host(jax.device_get(last_logits), tok))
        self.slot_req[slot] = req
        self.active[slot] = True
        self.budget[slot] = req.max_new_tokens - 1
        # Lookup history: vocabulary tokens only (image sentinels < 0 are
        # placeholders; an n-gram crossing one is meaningless).
        self.slot_hist[slot] = [int(t) for t in req.input_ids if t >= 0] + [tok]
        if self.draft is not None:
            self.draft.admit(slot, self.slot_hist[slot])
        if self.counts is not None:
            self.counts = _reset_count_row(self.counts, jnp.asarray(slot),
                                           jnp.asarray(tok))
        self.token = self.token.at[slot].set(tok)
        if req.max_new_tokens <= 0:
            # Explicit zero-token request: prefill ran (and sampled), but
            # nothing is emitted — matches the serialized path's behavior.
            self._finish(slot)
        elif tok == self.sampling.eos_token_id:
            self._finish(slot)
        else:
            self.grammar_slots.advance(slot, tok)
            self._emit(req, tok)
            # max_new_tokens == 1: the first (prefill-sampled) token
            # exhausts the budget — finish now, or the next step would
            # decode and emit a second token before the budget check.
            if self.budget[slot] <= 0:
                self._finish(slot)

    # -- chunked prefill admission --------------------------------------------
    #
    # With `prefill_chunk` set, a long prompt no longer stalls active
    # streams: each scheduler step advances the in-flight prefill by ONE
    # chunk (vision/splice ran once up front), then decodes all active
    # slots. The chunk extends a B=1 scratch cache (causal over previous
    # chunks); on completion the scratch K/V installs through the same
    # `_install` path as whole-prompt admission. Net-new vs the reference
    # (BASELINE north-star serving config).

    def _next_request(self) -> Optional[_Request]:
        try:
            return self.pending.get_nowait()
        except queue.Empty:
            return None

    def _pump_prefill(self) -> None:
        st = self._prefilling
        if st is not None and st["req"].cancelled:
            # Abandon the in-flight prefill; shared prefix pages (paged
            # warm admission) go back to their other holders.
            shared = st.get("shared")
            if shared:
                self.allocator.release(shared)
            st["req"].out.put(None)
            self._prefilling = None
            self._reserved_slot = None
            st = None
        if st is None:
            req = self._next_request()
            if req is None:
                return
            if req.cancelled:
                req.out.put(None)
                return
            slot = next(
                (s for s in range(self.max_slots) if self._slot_free(s)), None
            )
            if slot is None:
                self.pending.put(req)  # no slot; retry later
                return
            st = self._begin_prefill(req, slot)
            if st is None:
                return  # rejected
            self._prefilling = st
            self._reserved_slot = slot
            return  # vision+splice was this step's admission work

        C = self.prefill_chunk
        if st["chunk"] < st["n_chunks"]:
            c = st["chunk"]
            sl = slice(c * C, (c + 1) * C)
            logits, st["cache"] = _chunk_extend(
                self.params["decoder"], st["embeds"][:, sl], st["positions"][:, sl],
                st["valid"][:, sl], st["cache"], self.cfg,
                pallas_cache=self.mesh is None,
                mlora=self.mlora, adapter_idx=self._req_aidx(st["req"]),
            )
            if (st["length"] - 1) // C == c:  # chunk holding the last real token
                st["last_logits"] = logits[0, (st["length"] - 1) % C]
            st["chunk"] += 1
        if st["chunk"] >= st["n_chunks"]:
            k = st["cache"]["k"][:, 0]
            v = st["cache"]["v"][:, 0]
            if self._install(st["req"], st["slot"], st["last_logits"], k, v,
                             jnp.int32(st["length"])):
                self._prefilling = None
                self._reserved_slot = None
            # else: resources unavailable — retry install next step (the
            # scratch cache is complete; no chunk re-runs)

    def _begin_prefill(self, req: _Request, slot: int):
        ids = jnp.asarray(req.input_ids[None])
        images = None if req.images is None else jnp.asarray(req.images[None])
        pv = None if req.patch_valid is None else jnp.asarray(req.patch_valid[None])
        embeds, valid, positions, lengths = _splice_embeds(
            self.params, ids, images, pv, self.cfg, pad_to=self.prefill_chunk
        )
        length = int(lengths[0])
        if length + req.max_new_tokens > self.cache_len:
            req.out.put(None)
            return None
        T = embeds.shape[1]
        dtype = self.params["decoder"]["embed_tokens"].dtype
        return {
            "req": req,
            "slot": slot,
            "embeds": embeds,
            "valid": valid,
            "positions": positions,
            "cache": init_cache(self.cfg.decoder, 1, T, dtype=dtype),
            "chunk": 0,
            "n_chunks": -(-length // self.prefill_chunk),
            "length": length,
            "last_logits": None,
        }

    def _emit(self, req: _Request, tok: int) -> None:
        if req.first_token_at is None:
            req.first_token_at = time.perf_counter()
        req.n_tokens += 1
        req.out.put(tok)

    def _finish(self, slot: int) -> None:
        self.slot_adapter[slot] = 0
        self.slot_temp[slot] = self.sampling.temperature
        self.slot_topp[slot] = self.sampling.top_p
        self._override_slots.discard(slot)
        self._lp_slots.discard(slot)
        self.slot_freq[slot] = 0.0
        self.slot_pres[slot] = 0.0
        self._penalty_slots.discard(slot)
        self.grammar_slots.release(slot)
        req = self.slot_req[slot]
        if req is not None:
            req.out.put(None)
            if self.metrics is not None and req.first_token_at is not None:
                now = time.perf_counter()
                ttft = (req.first_token_at - req.submitted_at) * 1e3
                tpot = (
                    (now - req.first_token_at) / (req.n_tokens - 1) * 1e3
                    if req.n_tokens > 1 else 0.0
                )
                self.metrics.record_request(req.request_id, ttft, tpot, req.n_tokens)
        self.slot_req[slot] = None
        self.active[slot] = False
        if self.draft is not None:
            self.draft.release(slot)

    def _step_verify(self) -> int:
        """One speculative scheduler step: column 0 of the verify batch is
        every slot's pending token (exactly what `_batch_step` would have
        decoded), later columns are that slot's prompt-lookup proposals.
        All slots verify in one multi-token append; each slot commits its
        accepted prefix and carries the first mismatching greedy token as
        the next pending token — token-identical to plain greedy decoding
        (`tests/test_batching.py::TestSpeculativeBatcher`)."""
        from .generate import _propose_lookup

        S = self.lookahead + 1
        B = self.max_slots
        toks = np.full((B, S), self.cfg.decoder.pad_token_id, np.int32)
        # Column 0 valid for EVERY slot (active or not): a fully-invalid row
        # would attend zero keys. Inactive slots write one pad-token row
        # that the host-side length overwrite below rolls right back.
        valid = np.zeros((B, S), bool)
        valid[:, 0] = True
        token_host = np.array(jax.device_get(self.token))  # writable copy
        caps = np.zeros(B, np.int64)
        for slot in range(B):
            if self.active[slot]:
                caps[slot] = max(0, min(
                    self.lookahead, int(self.budget[slot]) - 1,
                    self.cache_len - int(self.slot_len[slot]) - 1))
        draft_props = (
            self.draft.propose(self.active, token_host, caps, self.lookahead)
            if self.draft is not None else [None] * B
        )
        props: List[Optional[np.ndarray]] = [None] * B
        for slot in range(B):
            if not self.active[slot]:
                continue
            toks[slot, 0] = token_host[slot]
            if caps[slot] <= 0:
                continue
            prop = draft_props[slot]
            if prop is None or not len(prop):
                prop = _propose_lookup(np.asarray(self.slot_hist[slot]),
                                       span=int(caps[slot]))
            if prop is None or not len(prop):
                continue
            prop = np.asarray(prop[: caps[slot]], np.int32)
            n = len(prop)
            toks[slot, 1 : 1 + n] = prop
            valid[slot, 1 : 1 + n] = True
            props[slot] = prop

        greedy = self._verify_device(toks, valid)

        stepped = 0
        for slot in range(B):
            if not self.active[slot]:
                continue
            stepped += 1
            prop = props[slot] if props[slot] is not None else np.zeros(0, np.int32)
            accepted = 0
            while accepted < len(prop) and greedy[slot, accepted] == prop[accepted]:
                accepted += 1
            emitted = list(int(t) for t in prop[:accepted]) + [int(greedy[slot, accepted])]
            if self.metrics is not None and len(prop):
                self.metrics.record_speculation(len(prop), accepted)
            # Cache now holds pending + accepted proposals; the final
            # emitted token is the NEW pending one (not yet written).
            self.slot_len[slot] += 1 + accepted
            finished = False
            for t in emitted:
                if t == self.sampling.eos_token_id:
                    finished = True
                    break
                self._emit(self.slot_req[slot], t)
                self.slot_hist[slot].append(t)
                self.budget[slot] -= 1
                if self.budget[slot] <= 0:
                    finished = True
                    break
            if finished:
                self._finish(slot)  # releases the draft slot too
            else:
                token_host[slot] = emitted[-1]
                if self.draft is not None:
                    # Committed rows this round = pending + accepted
                    # (the corrected token is the NEW pending and stays
                    # out of the draft cache).
                    self.draft.commit(slot, 1 + accepted)
        # Host is the source of truth for lengths: rolls every slot back to
        # its accepted prefix (and undoes the inactive slots' dummy row).
        self._verify_rollback()
        if self.draft is not None:
            self.draft.rollback()
        self.token = jnp.asarray(token_host)
        return stepped

    def _verify_device(self, toks: np.ndarray, valid: np.ndarray) -> np.ndarray:
        """Run the batched multi-token verify append; returns per-position
        greedy tokens [B, S] on host. (PagedBatcher overrides with the
        paged-pool verify step.)"""
        greedy, self.cache = _verify_step(
            self.params, self.cache, jnp.asarray(toks), jnp.asarray(valid),
            self.cfg, pallas_cache=self.mesh is None,
            mlora=self.mlora, adapter_idx=self._slot_aidx(),
        )
        return np.asarray(jax.device_get(greedy))

    def _verify_rollback(self) -> None:
        """Reset device lengths to the host-side committed lengths after a
        verify step (rejected rows above the accepted prefix become dead)."""
        self.cache = dict(
            self.cache, length=jnp.asarray(self.slot_len.astype(np.int32))
        )

    def _has_admission_work(self) -> bool:
        """True when a request is waiting to be admitted — the multi-step
        burst yields to single-stepping so admission latency stays one
        decode step, not `multi_step`."""
        return self._prefilling is not None or not self.pending.empty()

    def _process_burst(self, toks: np.ndarray, alive: np.ndarray) -> int:
        """Host-side processing of a multi-step burst: toks/alive [n, B],
        token (j, slot) is live iff the slot was alive entering step j.
        Applies the same emit/EOS/budget transitions as single-stepping —
        the device's alive/steps_left carry mirrors them exactly."""
        stepped = 0
        for j in range(toks.shape[0]):
            for slot in range(self.max_slots):
                if not (self.active[slot] and alive[j, slot]):
                    continue
                stepped += 1
                tok = int(toks[j, slot])
                if tok == self.sampling.eos_token_id:
                    self._finish(slot)
                    continue
                self._emit(self.slot_req[slot], tok)
                self.slot_len[slot] += 1
                self.budget[slot] -= 1
                if self.budget[slot] <= 0:
                    self._finish(slot)
        return stepped

    def step(self) -> int:
        """Admit pending requests (one chunk's worth under chunked prefill),
        then advance every active slot by one token (or by a speculative
        verify span with `lookahead`, or by up to `multi_step` tokens in one
        dispatch when no admission work waits). Returns the number of active
        slots stepped."""
        self._reap_cancelled()
        if self.prefill_chunk:
            self._pump_prefill()
        else:
            self._admit_pending()
        if not self.active.any():
            return 0
        if self.lookahead > 0:
            return self._step_verify()
        # Grammar-constrained and logprobs slots need host work between
        # steps (state advance / per-token log append), so they disable
        # the multi-step burst while active (both are rejected outright on
        # speculative engines).
        grammar_op = self.grammar_slots.operand()
        want_lp = bool(self._lp_slots)
        pen = self._penalty_operand()
        if (self.multi_step > 1 and grammar_op is None and not want_lp
                and pen is None and not self._has_admission_work()):
            self.rng, sub = jax.random.split(self.rng)
            toks, alive, self.cache, self.token = _batch_multi_step(
                self.params, self.cache, self.token,
                jnp.asarray(self.active),
                jnp.asarray(self.budget.astype(np.int32)), sub,
                self.cfg, self.sampling, n=self.multi_step,
                pallas_cache=self.mesh is None,
                mlora=self.mlora, adapter_idx=self._slot_aidx(),
                sample_overrides=self._sample_overrides(),
            )
            return self._process_burst(np.asarray(jax.device_get(toks)),
                                       np.asarray(jax.device_get(alive)))
        self.rng, sub = jax.random.split(self.rng)
        self.token, self.cache, lp, counts = _batch_step(
            self.params, self.cache, self.token, jnp.asarray(self.active), sub,
            self.cfg, self.sampling, pallas_cache=self.mesh is None,
            mlora=self.mlora, adapter_idx=self._slot_aidx(),
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

    def run_until_drained(self, max_steps: int = 100000) -> None:
        for _ in range(max_steps):
            if not self.has_work:
                return
            self.step()
