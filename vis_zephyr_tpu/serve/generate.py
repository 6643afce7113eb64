"""Autoregressive generation: multimodal prefill + KV-cache decode.

Reference equivalent: HF `generate` driven through
`VisZephyrForCausalLM.generate` / `prepare_inputs_for_generation`
(`vis_zephyr/model/language_model/vis_zephyr.py:100-170`) with
`KeywordsStoppingCriteria` and `TextStreamer` (`serve/cli.py:148-182`).

TPU-first shape: the whole vision stack runs once at prefill inside a
single jitted program; each decode step is one jitted KV-cache program.
Two drivers share them:

- `generate`        — fully-compiled `lax.scan` decode loop (batch eval,
                      benchmarking; no host round-trips between tokens),
- `generate_stream` — python loop over the jitted step fn, yielding tokens
                      as they decode (CLI/HTTP streaming).

Sequence lengths are bucketed (`pad_to_bucket`) so recompilation is rare.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VisZephyrConfig
from ..models.mistral import embed, mistral_forward
from ..models.vis_zephyr import vis_zephyr_forward


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    max_new_tokens: int = 128
    temperature: float = 0.0  # 0 → greedy
    top_p: float = 1.0
    eos_token_id: int = 2


def pad_to_bucket(length: int, bucket: int = 128, minimum: int = 128) -> int:
    return max(minimum, ((length + bucket - 1) // bucket) * bucket)


def _sample(logits: jnp.ndarray, key, sampling: SamplingConfig,
            overrides=None, mask=None) -> jnp.ndarray:
    """logits [B, V] → token [B].

    `overrides`: optional (temps [B], top_ps [B]) per-slot sampling
    parameters (OpenAI-style per-request temperature/top_p inside one
    batched step). When given they take precedence over the static
    `sampling` scalars; rows with temp ≤ 0 decode greedily. Passing None
    keeps the scalar fast paths (greedy batches never pay the categorical).

    `mask`: optional bool [B, V] grammar mask (structured output,
    `serve/structured.py`) — illegal tokens are dropped before greedy OR
    sampled selection, so every emitted token keeps the slot inside its
    grammar."""
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    if overrides is not None:
        return _sample_per_slot(logits, key, overrides[0], overrides[1])
    if sampling.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / sampling.temperature
    if sampling.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep the smallest set with cumulative prob ≥ top_p.
        cutoff_idx = jnp.sum(cum < sampling.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)


def _sample_per_slot(logits: jnp.ndarray, key, temps: jnp.ndarray,
                     top_ps: jnp.ndarray) -> jnp.ndarray:
    """Vectorized per-row sampling: logits [B, V], temps/top_ps [B] →
    token [B]. Row b is greedy when temps[b] ≤ 0, otherwise nucleus-sampled
    at its own temperature/top_p — one program serves a batch mixing greedy
    and sampled requests (the continuous batchers' per-request params)."""
    greedy = jnp.argmax(logits, axis=-1)
    scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < top_ps[:, None], axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    masked = jnp.where(scaled < cutoff, -jnp.inf, scaled)
    sampled = jax.random.categorical(key, masked, axis=-1)
    return jnp.where(temps <= 0.0, greedy, sampled)


# OpenAI caps `top_logprobs` at 20; one static K keeps a single compiled
# step variant (requests asking for fewer slice host-side).
LP_TOPK = 20


def _apply_penalties(logits: jnp.ndarray, counts: jnp.ndarray,
                     freq: jnp.ndarray, pres: jnp.ndarray) -> jnp.ndarray:
    """OpenAI frequency/presence penalties over OUTPUT tokens (the vLLM
    convention): logits [B, V], counts [B, V] (per-slot emitted-token
    counts), freq/pres [B] → penalized logits. Rows with zero coefficients
    pass through unchanged."""
    return (logits - freq[:, None] * counts
            - pres[:, None] * (counts > 0).astype(logits.dtype))


def _count_token(counts: jnp.ndarray, token: jnp.ndarray,
                 active: jnp.ndarray) -> jnp.ndarray:
    """Record this step's sampled token per active slot: counts [B, V],
    token [B], active [B] bool."""
    B = counts.shape[0]
    return counts.at[jnp.arange(B), token].add(
        active.astype(counts.dtype))


def _logprobs(logits: jnp.ndarray, token: jnp.ndarray):
    """Per-token logprob data from the RAW model distribution (f32
    log-softmax of the unscaled logits — before temperature, top-p, or any
    grammar mask, the OpenAI convention): logits [B, V], token [B] →
    (chosen_lp [B], top_ids [B, LP_TOPK] int32, top_lps [B, LP_TOPK])."""
    lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    chosen = jnp.take_along_axis(lsm, token[:, None], axis=-1)[:, 0]
    top_lps, top_ids = jax.lax.top_k(lsm, LP_TOPK)
    return chosen, top_ids.astype(jnp.int32), top_lps


def _logprobs_host(logits_row: np.ndarray, token: int):
    """numpy twin of `_logprobs` for one row (prefill-sampled first tokens,
    where the logits are already host-bound at admission)."""
    x = np.asarray(logits_row, np.float32)
    lsm = x - (np.max(x) + np.log(np.sum(np.exp(x - np.max(x)))))
    top = np.argpartition(-lsm, LP_TOPK)[:LP_TOPK]
    top = top[np.argsort(-lsm[top])]
    return float(lsm[token]), top.astype(np.int32), lsm[top]


@functools.partial(jax.jit, static_argnames=("cfg", "cache_len", "use_flash",
                                              "attn_mesh"))
def prefill(
    params,
    input_ids: jnp.ndarray,
    images: Optional[jnp.ndarray],
    patch_valid: Optional[jnp.ndarray],
    cfg: VisZephyrConfig,
    cache_len: int,
    text_valid: Optional[jnp.ndarray] = None,
    use_flash: Optional[bool] = None,
    attn_mesh=None,
    merge_info: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict, jnp.ndarray]:
    """Run the multimodal prefill and return greedy-ready last-token logits.

    The prefill runs through the no-cache forward (flash attention on TPU)
    and the per-layer K/V it returns are padded into a fresh decode cache —
    one program, no cache-buffer scatter on the hot path.

    Returns (last_logits [B, V], cache, lengths [B]).
    """
    B = input_ids.shape[0]
    pad_mult = 128 if jax.default_backend() != "cpu" else None
    logits, aux = vis_zephyr_forward(
        params, input_ids, images, patch_valid, cfg,
        text_valid=text_valid, return_kv=True, pad_to_multiple=pad_mult,
        use_flash=use_flash, attn_mesh=attn_mesh, merge_info=merge_info,
    )
    lengths = aux["lengths"]
    k, v = aux["kv"]  # [L, B, T, Hkv, D]
    T = k.shape[2]
    if cache_len < T:
        raise ValueError(f"cache_len={cache_len} < prefill length {T}")
    dtype = params["decoder"]["embed_tokens"].dtype
    pad = ((0, 0), (0, 0), (0, cache_len - T), (0, 0), (0, 0))
    cache = {
        "k": jnp.pad(k.astype(dtype), pad),
        "v": jnp.pad(v.astype(dtype), pad),
        "length": lengths.astype(jnp.int32),
    }
    last = logits[jnp.arange(B), lengths - 1]
    return last, cache, lengths


@functools.partial(jax.jit, static_argnames=("cfg", "pallas_cache"))
def decode_step(
    params,
    cache: Dict,
    token: jnp.ndarray,  # [B]
    cfg: VisZephyrConfig,
    pallas_cache: bool = True,
) -> Tuple[jnp.ndarray, Dict]:
    """One decode step. Returns (logits [B, V], new_cache).

    `pallas_cache=False` is required when this jit runs under SPMD
    auto-partitioning (serialized TP serving: a mesh-sharded cache) — XLA
    cannot partition the Pallas cache-update custom call; the plain XLA
    scatter shards cleanly (same rule as `batching._batch_step`)."""
    positions = cache["length"][:, None]
    embeds = embed(params["decoder"], token[:, None])
    logits, new_cache = mistral_forward(
        params["decoder"], embeds, cfg.decoder, positions,
        cache=cache, logits_slice="last",
        pallas_cache_update=pallas_cache,
    )
    return logits[:, 0], new_cache


@functools.partial(jax.jit, static_argnames=("cfg", "sampling", "n",
                                             "pallas_cache"),
                   donate_argnums=(1,))
def decode_multi_step(
    params,
    cache: Dict,
    token: jnp.ndarray,  # [B]
    key,
    cfg: VisZephyrConfig,
    sampling: SamplingConfig,
    n: int,
    pallas_cache: bool = True,
) -> Tuple[jnp.ndarray, Dict, jnp.ndarray]:
    """`n` chained `decode_step`s + sampling in ONE dispatch (the
    serialized-path multi-step burst). Returns (toks [n, B], cache,
    last token). The caller discards tokens past an EOS — the cache's
    post-EOS rows are per-call scratch and never observed."""

    def body(carry, sub):
        cache, token = carry
        logits, cache = decode_step(params, cache, token, cfg,
                                    pallas_cache=pallas_cache)
        tok = _sample(logits, sub, sampling)
        return (cache, tok), tok

    keys = jax.random.split(key, n)
    (cache, token), toks = jax.lax.scan(body, (cache, token), keys)
    return toks, cache, token


@functools.partial(jax.jit, static_argnames=("cfg", "sampling", "pallas_cache"))
def _decode_loop(
    params, cache, first_token, key, cfg: VisZephyrConfig, sampling: SamplingConfig,
    pallas_cache: bool = True,
):
    B = first_token.shape[0]

    def body(carry, _):
        cache, token, done, key = carry
        key, sub = jax.random.split(key)
        logits, cache = decode_step(params, cache, token, cfg, pallas_cache=pallas_cache)
        next_token = _sample(logits, sub, sampling)
        next_token = jnp.where(done, sampling.eos_token_id, next_token)
        done = done | (next_token == sampling.eos_token_id)
        return (cache, next_token, done, key), next_token

    init = (cache, first_token, first_token == sampling.eos_token_id, key)
    (cache, _, _, _), tokens = jax.lax.scan(
        body, init, None, length=sampling.max_new_tokens - 1
    )
    return jnp.concatenate([first_token[:, None], tokens.T], axis=1), cache


def generate(
    params,
    input_ids: jnp.ndarray,
    images: Optional[jnp.ndarray],
    patch_valid: Optional[jnp.ndarray],
    cfg: VisZephyrConfig,
    sampling: SamplingConfig = SamplingConfig(),
    text_valid: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    cache_len: Optional[int] = None,
    use_flash: Optional[bool] = None,
    attn_mesh=None,
    merge_info: Optional[jnp.ndarray] = None,
    pallas_cache: bool = True,
) -> np.ndarray:
    """Batch generation, fully compiled. Returns [B, max_new_tokens] token
    ids (EOS-padded after stop). Pass `pallas_cache=False` when params/cache
    are mesh-sharded (SPMD can't partition the Pallas cache-update)."""
    B, T = input_ids.shape
    if cache_len is None:
        n_img = (0 if images is None else
                 images.shape[1] * cfg.tokens_per_patch + cfg.max_extra_merge_tokens())
        cache_len = pad_to_bucket(T + n_img + sampling.max_new_tokens)
    rng = jax.random.PRNGKey(0) if rng is None else rng

    last_logits, cache, _ = prefill(
        params, input_ids, images, patch_valid, cfg, cache_len,
        text_valid=text_valid, use_flash=use_flash, attn_mesh=attn_mesh,
        merge_info=merge_info,
    )
    rng, sub = jax.random.split(rng)
    first = _sample(last_logits, sub, sampling)
    tokens, _ = _decode_loop(params, cache, first, rng, cfg, sampling,
                             pallas_cache=pallas_cache)
    return np.asarray(tokens)


@functools.partial(jax.jit, static_argnames=("n",))
def _beam_expand(cache: Dict, n: int) -> Dict:
    """B=1 prefill cache → n identical beams (k/v repeat on the batch
    axis, lengths broadcast)."""
    return {
        "k": jnp.repeat(cache["k"], n, axis=1),
        "v": jnp.repeat(cache["v"], n, axis=1),
        "length": jnp.repeat(cache["length"], n, axis=0),
    }


@functools.partial(jax.jit, donate_argnums=(0,))
def _beam_reorder(cache: Dict, beam_idx: jnp.ndarray) -> Dict:
    """Continue beam b from its parent `beam_idx[b]`'s cache row."""
    return {
        "k": cache["k"][:, beam_idx],
        "v": cache["v"][:, beam_idx],
        "length": cache["length"][beam_idx],
    }


@functools.partial(jax.jit, static_argnames=("k",))
def _beam_topk(logits: jnp.ndarray, k: int):
    """Per-beam log-softmax top-2k candidates (the HF beam-search pool:
    2k lets EOS candidates retire without starving the k live beams)."""
    lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    vals, ids = jax.lax.top_k(lsm, 2 * k)
    return vals, ids


def beam_search(
    params,
    input_ids: jnp.ndarray,
    images: Optional[jnp.ndarray],
    patch_valid: Optional[jnp.ndarray],
    cfg: VisZephyrConfig,
    num_beams: int = 4,
    max_new_tokens: int = 64,
    eos_token_id: int = 2,
    length_penalty: float = 1.0,
    cache_len: Optional[int] = None,
    use_flash: Optional[bool] = None,
) -> List[int]:
    """HF-semantics beam search (the reference's `num_beams > 1` path,
    `model.generate` via HF `BeamSearchScorer`): maintain `num_beams` live
    hypotheses; each step ranks the 2k best (beam, token) continuations,
    retires EOS candidates to the finished pool scored
    `logprob_sum / len**length_penalty`, and keeps the k best live. Device
    work per step is ONE batched decode over the beams + a top-2k; the
    tiny candidate bookkeeping runs on host. Returns the best sequence's
    new token ids (EOS excluded).

    TPU shape notes: beams ride the batch axis of the shared decode step
    (an extra beam is nearly free under the weight-bandwidth bound), and
    the per-step cache reorder is a device-side gather on that axis."""
    assert input_ids.shape[0] == 1, "beam search takes one prompt"
    K = num_beams
    T = input_ids.shape[1]
    if cache_len is None:
        n_img = (0 if images is None else
                 images.shape[1] * cfg.tokens_per_patch
                 + cfg.max_extra_merge_tokens())
        cache_len = pad_to_bucket(T + n_img + max_new_tokens)
    last_logits, cache, _ = prefill(
        params, input_ids, images, patch_valid, cfg, cache_len,
        use_flash=use_flash,
    )
    cache = _beam_expand(cache, K)

    # First expansion from the shared prefix: draw from a 2K candidate
    # pool like every later step (HF BeamSearchScorer semantics) — an EOS
    # among the top K retires to the finished pool WITHOUT consuming one
    # of the K live beam slots.
    lsm0 = jax.nn.log_softmax(last_logits[0].astype(jnp.float32))
    pool0 = min(2 * K, lsm0.shape[-1])
    vals0, ids0 = jax.lax.top_k(lsm0, pool0)
    vals0, ids0 = np.asarray(vals0), np.asarray(ids0)
    finished: List[tuple] = []                   # (normalized score, seq)

    def norm(s: float, length: int) -> float:
        return s / (max(length, 1) ** length_penalty)

    live: List[tuple] = []                       # (logprob sum, token)
    for v, t in zip(vals0, ids0):
        if int(t) == eos_token_id:
            # The prompt's best continuation is to end immediately.
            finished.append((norm(float(v), 1), []))
        elif len(live) < K:
            live.append((float(v), int(t)))
    while len(live) < K:  # degenerate tiny-vocab case: pad with dead beams
        live.append((-1e30, live[0][1] if live else 0))
    scores = np.asarray([v for v, _ in live], np.float64)
    seqs: List[List[int]] = [[t] for _, t in live]
    tokens = jnp.asarray(np.asarray([t for _, t in live], np.int32))

    for _ in range(max_new_tokens - 1):
        if all(s and s[-1] == eos_token_id for s in seqs):
            break
        logits, cache = decode_step(params, cache, tokens, cfg)
        vals, ids = _beam_topk(logits, K)
        vals, ids = np.asarray(vals), np.asarray(ids)
        cand = scores[:, None] + vals            # [K, 2K]
        order = np.argsort(-cand, axis=None)
        next_beams: List[tuple] = []             # (parent, token, score)
        for flat in order:
            b, j = divmod(int(flat), 2 * K)
            if seqs[b] and seqs[b][-1] == eos_token_id:
                continue                         # parent already retired
            tok = int(ids[b, j])
            if tok == eos_token_id:
                finished.append((norm(float(cand[b, j]), len(seqs[b])),
                                 list(seqs[b])))
                continue
            next_beams.append((b, tok, float(cand[b, j])))
            if len(next_beams) == K:
                break
        if not next_beams:
            break                                # every continuation ended
        # Early stop (HF early_stopping=False heuristic): no live beam can
        # beat the worst kept finished hypothesis.
        if len(finished) >= K:
            worst_kept = sorted(finished, reverse=True)[K - 1][0]
            best_live = norm(next_beams[0][2], len(seqs[next_beams[0][0]]) + 1)
            if best_live < worst_kept:
                break
        beam_idx = np.asarray([b for b, _, _ in next_beams], np.int32)
        toks = np.asarray([t for _, t, _ in next_beams], np.int32)
        scores = np.asarray([s for _, _, s in next_beams], np.float64)
        seqs = [seqs[b] + [t] for b, t, _ in next_beams]
        cache = _beam_reorder(cache, jnp.asarray(beam_idx))
        tokens = jnp.asarray(toks)

    for s, seq in zip(scores, seqs):
        if not (seq and seq[-1] == eos_token_id):
            finished.append((norm(float(s), len(seq)), list(seq)))
    finished.sort(key=lambda x: -x[0])
    return finished[0][1]


@functools.partial(jax.jit, static_argnames=("cfg", "pallas_cache"))
def decode_verify(
    params,
    cache: Dict,
    tokens: jnp.ndarray,  # [B, S]
    valid: jnp.ndarray,   # [B, S] bool — padded proposal slots are False
    cfg: VisZephyrConfig,
    pallas_cache: bool = True,
    mlora=None, adapter_idx=None,
) -> Tuple[jnp.ndarray, Dict]:
    """Speculative verify: append S tokens (the pending accepted token plus
    S−1 proposed) in ONE cached forward and return per-position logits
    [B, S, V]. A verify step reads the same weight bytes as a single decode
    step (both are HBM-bound), so each accepted proposal token is nearly
    free — the TPU-friendly way to buy single-stream latency. The caller
    rolls `cache["length"]` back to the accepted prefix; rejected slots
    hold garbage K/V that the next append overwrites (masks key validity
    off `length`, so stale slots are never attended)."""
    positions = cache["length"][:, None] + jnp.cumsum(
        valid.astype(jnp.int32), axis=1) - 1
    embeds = embed(params["decoder"], tokens)
    logits, new_cache = mistral_forward(
        params["decoder"], embeds, cfg.decoder, positions,
        attn_valid=valid, cache=cache, logits_slice="all",
        pallas_cache_update=pallas_cache, mlora=mlora,
        adapter_idx=adapter_idx,
    )
    return logits, new_cache


def _propose_lookup(history: np.ndarray, ngram: int = 2, span: int = 8):
    """Prompt-lookup proposal (draft-model-free speculation): find the most
    recent earlier occurrence of the trailing `ngram` tokens in the
    sequence so far and propose the tokens that followed it. Catches the
    copy/echo structure of VQA answers (entity names, option text, prompt
    phrases) with zero model cost."""
    n = len(history)
    if n < ngram + 1:
        return None
    tail = history[-ngram:]
    body = history[: n - 1]  # allow overlap up to the penultimate token
    windows = np.lib.stride_tricks.sliding_window_view(body, ngram)
    matches = np.flatnonzero((windows == tail).all(axis=1))
    # Most recent match whose continuation has at least one known token.
    for i in matches[::-1]:
        cont = history[i + ngram : i + ngram + span]
        if len(cont):
            return cont
    return None


def generate_stream(
    params,
    input_ids: jnp.ndarray,
    images: Optional[jnp.ndarray],
    patch_valid: Optional[jnp.ndarray],
    cfg: VisZephyrConfig,
    sampling: SamplingConfig = SamplingConfig(),
    text_valid: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    cache_len: Optional[int] = None,
    use_flash: Optional[bool] = None,
    attn_mesh=None,
    merge_info: Optional[jnp.ndarray] = None,
    lookahead: int = 0,
    pallas_cache: bool = True,
    multi_step: int = 1,
    grammar=None,
    lp_sink: Optional[list] = None,
    penalties: Optional[Tuple[float, float]] = None,
) -> Iterator[int]:
    """Single-sequence streaming generation: yields token ids until EOS or
    the budget is exhausted. Host drives one jitted step per token.

    `lookahead > 0` enables prompt-lookup speculative decoding (greedy
    only): up to `lookahead` tokens proposed from the sequence's own
    n-gram structure are verified in one multi-token cache append —
    identical output to plain greedy decoding, fewer device steps.

    `multi_step > 1` (ignored with lookahead): n chained decode steps per
    dispatch — host scheduling + dispatch latency amortized n×, emitted
    in bursts with a 1→2→4→n ramp.

    `grammar` (`serve.structured.TokenGrammar`): constrained decoding —
    every step masks the logits to the tokens legal from the grammar's
    current state and advances it host-side. Forces the plain single-step
    loop (speculation/multi-step commit tokens without a host state
    advance between them).

    `lp_sink`: when not None, one `(chosen_lp, top_ids, top_lps)` entry
    (raw-distribution logprobs, `_logprobs`) is appended per yielded token
    — the OpenAI `logprobs` surface. Forces the single-step loop (each
    token needs its own step's logits).

    `penalties`: optional (frequency_penalty, presence_penalty) floats —
    OpenAI penalties over this stream's emitted tokens. Forces the
    single-step loop."""
    assert input_ids.shape[0] == 1, "streaming path is single-sequence"
    if grammar is not None or lp_sink is not None or penalties is not None:
        lookahead = 0
        multi_step = 1
    T = input_ids.shape[1]
    if cache_len is None:
        n_img = (0 if images is None else
                 images.shape[1] * cfg.tokens_per_patch + cfg.max_extra_merge_tokens())
        cache_len = pad_to_bucket(T + n_img + sampling.max_new_tokens + lookahead)
    rng = jax.random.PRNGKey(0) if rng is None else rng

    last_logits, cache, _ = prefill(
        params, input_ids, images, patch_valid, cfg, cache_len,
        text_valid=text_valid, use_flash=use_flash, attn_mesh=attn_mesh,
        merge_info=merge_info,
    )
    speculate = lookahead > 0 and sampling.temperature <= 0.0
    # Image sentinels (< 0) are placeholders, not vocabulary: keep them out
    # of the lookup history (an n-gram crossing one is meaningless).
    history = [int(t) for t in np.asarray(input_ids[0]) if t >= 0]
    budget = sampling.max_new_tokens

    tok = int(jnp.argmax(last_logits, axis=-1)[0]) if speculate else None
    if speculate:
        # `tok` is pending: emitted to the caller, not yet in the cache.
        if tok == sampling.eos_token_id:
            return
        yield tok
        history.append(tok)
        budget -= 1
        S = lookahead + 1
        while budget > 0:
            prop = _propose_lookup(np.asarray(history), span=lookahead)
            if prop is None:
                prop = np.zeros((0,), np.int32)
            n_prop = len(prop)
            toks = np.full((1, S), cfg.decoder.pad_token_id, np.int32)
            toks[0, 0] = tok
            toks[0, 1 : 1 + n_prop] = prop
            valid = np.zeros((1, S), bool)
            valid[0, : 1 + n_prop] = True
            base_len = cache["length"]
            logits, cache = decode_verify(
                params, cache, jnp.asarray(toks), jnp.asarray(valid), cfg,
                pallas_cache=pallas_cache,
            )
            greedy = np.asarray(jnp.argmax(logits[0], axis=-1))
            accepted = 0
            while accepted < n_prop and greedy[accepted] == prop[accepted]:
                accepted += 1
            emitted = list(prop[:accepted]) + [int(greedy[accepted])]
            # Roll back to the accepted prefix: `tok` + accepted proposals
            # are real cache entries; the new pending token is not written.
            cache = dict(cache, length=base_len + 1 + accepted)
            for t in emitted[:budget]:
                if t == sampling.eos_token_id:
                    return
                yield int(t)
                history.append(int(t))
            budget -= len(emitted[:budget])
            tok = emitted[-1] if budget > 0 else None
        return

    token = None
    if multi_step > 1:
        # Multi-step bursts (the batchers' --multi-step, serialized path):
        # n chained decode steps per dispatch, one device_get per burst.
        # Burst sizes ramp 1→2→4→n so TTFT/early-token latency doesn't
        # regress; tokens past an in-burst EOS are computed on device but
        # discarded here (the cache is per-call scratch, so its post-EOS
        # rows are never observed). Greedy bursts are token-exact with
        # single-stepping; temperature > 0 draws the burst's keys from one
        # split (both are valid sample streams — same caveat as
        # `batching._batch_multi_step`).
        rng, sub = jax.random.split(rng)
        token = _sample(last_logits, sub, sampling)
        tok = int(token[0])
        if tok == sampling.eos_token_id:
            return
        yield tok
        remaining = sampling.max_new_tokens - 1
        ramp = [1, 2, 4]
        while remaining > 0:
            n = min(ramp.pop(0) if ramp else multi_step, multi_step,
                    remaining)
            rng, sub = jax.random.split(rng)
            toks, cache, token = decode_multi_step(
                params, cache, token, sub, cfg, sampling, n=n,
                pallas_cache=pallas_cache,
            )
            for t in np.asarray(jax.device_get(toks))[:, 0]:
                if int(t) == sampling.eos_token_id:
                    return
                yield int(t)
                remaining -= 1
        return

    gstate = 0
    logits = last_logits
    counts = fp = pp = None
    if penalties is not None:
        counts = jnp.zeros((1, cfg.decoder.vocab_size), jnp.float32)
        fp = jnp.asarray([penalties[0]], jnp.float32)
        pp = jnp.asarray([penalties[1]], jnp.float32)
    for _ in range(sampling.max_new_tokens):
        rng, sub = jax.random.split(rng)
        mask = (None if grammar is None
                else jnp.asarray(grammar.mask[gstate])[None])
        if token is not None:
            logits, cache = decode_step(params, cache, token, cfg,
                                        pallas_cache=pallas_cache)
        s_logits = (logits if counts is None
                    else _apply_penalties(logits, counts, fp, pp))
        token = _sample(s_logits, sub, sampling, mask=mask)
        tok = int(token[0])
        if tok == sampling.eos_token_id:
            return
        if counts is not None:
            counts = counts.at[0, tok].add(1.0)
        if grammar is not None:
            gstate = grammar.advance(gstate, tok)
        if lp_sink is not None:
            chosen, ids, lps = jax.device_get(_logprobs_jit(logits, token))
            lp_sink.append((float(chosen[0]), ids[0], lps[0]))
        yield tok


_logprobs_jit = jax.jit(_logprobs)
