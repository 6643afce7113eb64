"""Draft-model speculative proposer for the continuous batchers.

Prompt-lookup speculation (the default) only accelerates copy-heavy
outputs; a small draft LM proposes on ANY text. This module plugs a
second, much smaller decoder into the batchers' existing verify
machinery: the draft greedily decodes `span` candidate tokens per slot
per scheduler step, the TARGET model verifies all slots' candidates in
its one multi-token append (`_verify_step` / `_paged_verify_step`), and
the host accepts the matching prefix — token-identical to plain greedy
by construction, regardless of draft quality (a bad draft only wastes
proposal slots). Reference has no speculation at all; this matches the
standard two-model speculative-decoding serving design, TPU-first: all
draft work is batched over slots, S jitted micro-steps per scheduler
round.

Design notes:
- The draft conditions on VOCABULARY tokens only (the batchers' per-slot
  `slot_hist`, which already drops image sentinels): a multimodal target
  prompt degrades draft conditioning but never correctness — verify
  gates everything.
- The draft keeps its own DENSE cache [L_d, slots, cache_len, Hkv_d, D_d]
  aligned with the batcher's slot indices; paged/dense target layouts are
  irrelevant to it. Slot invariant between scheduler rounds: the draft
  cache holds the slot's history EXCEPT the pending token (the pending
  token is the first input of the next propose round).
- After the target's verdict, the draft cache rolls back to the committed
  prefix by overwriting its `length` vector — exactly the batchers' own
  rollback trick; rejected draft rows become dead and are overwritten by
  the next propose round.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import VisZephyrConfig
from ..models.mistral import init_cache
from .generate import SamplingConfig


@functools.partial(jax.jit, static_argnames=("cfg", "n"), donate_argnums=(1,))
def _draft_propose_steps(params, cache, token, steps_left, cfg: VisZephyrConfig,
                         n: int):
    """Up to `n` greedy draft decode steps + one final feed per slot, all
    in ONE dispatch.

    The naive loop paid (n+1) dispatches and n device_gets per scheduler
    round — on a tunneled link that dwarfs the draft's actual compute.
    A lax.scan chains the steps on device (the `_paged_multi_step`
    pattern). `steps_left` [B] int32 is each slot's total device-step
    budget (its allowed proposal span + 1 feed step; 0 = not drafting):
    a slot freezes once exhausted, so capacity-tight slots can draft a
    SHORTER span instead of being declined, and the final live step of
    every slot writes its last candidate's row — the draft cache holds
    every proposable row and `commit()` only ever rolls BACK.
    Returns (toks [n, B], cache): toks[j] is only meaningful for slots
    whose span exceeds j (the caller slices per-slot caps)."""
    from .batching import _batch_step

    sampling = SamplingConfig(temperature=0.0, eos_token_id=-1)
    key = jax.random.PRNGKey(0)  # unused at temperature 0

    def step(carry, _):
        cache, token, left = carry
        act = left > 0
        tok, cache, _, _ = _batch_step(params, cache, token, act, key,
                                       cfg, sampling)
        token = jnp.where(act, tok, token)
        return (cache, token, left - act.astype(left.dtype)), tok

    (cache, token, _), toks = jax.lax.scan(
        step, (cache, token, steps_left), None, length=n + 1)
    return toks[:n], cache


class DraftModel:
    """Batched draft proposer over the batcher's slot space.

    `params`/`cfg`: a (small) VisZephyr model — only its decoder runs.
    `cache_len` bounds draftable history; slots whose history outgrows it
    are declined (the batcher falls back to prompt-lookup for them).
    """

    def __init__(self, params, cfg: VisZephyrConfig, max_slots: int,
                 cache_len: int = 2048):
        self.params = params
        self.cfg = cfg
        self.max_slots = max_slots
        self.cache_len = cache_len
        dec = cfg.decoder
        dtype = params["decoder"]["embed_tokens"].dtype
        self.cache = init_cache(dec, max_slots, cache_len, dtype=dtype)
        # Host mirror of the committed draft length per slot (== len(hist)−1
        # between rounds; 0 = slot not draftable).
        self.len = np.zeros(max_slots, np.int64)
        self._drafted = np.zeros(max_slots, bool)  # fed this round

    # -- slot lifecycle -------------------------------------------------------

    def admit(self, slot: int, hist: List[int]) -> bool:
        """Prefill the draft on a slot's text history MINUS the pending
        token (`hist[:-1]`; `hist[-1]` is the batcher's pending token).
        Returns False when the slot can't be drafted (history too long)."""
        ids = np.asarray(hist[:-1], np.int32)
        if len(ids) == 0 or len(ids) + 1 >= self.cache_len:
            self.len[slot] = 0
            return False
        from .batching import _admit, _prefill_kv

        _, k, v, length = _prefill_kv(
            self.params, jnp.asarray(ids[None]), None, None, self.cfg,
        )
        if k.shape[1] > self.cache_len:
            self.len[slot] = 0
            return False
        self.cache = _admit(self.cache, k, v, length, self.cfg, slot)
        self.len[slot] = int(length)
        return True

    def release(self, slot: int) -> None:
        self.len[slot] = 0

    # -- per-round propose / commit ------------------------------------------

    def propose(self, active: np.ndarray, pending: np.ndarray,
                caps: np.ndarray, span: int) -> List[Optional[np.ndarray]]:
        """Greedy-decode up to `span` candidates for every draftable slot
        in `span` batched draft steps (one extra step feeds the last
        candidate so a fully-accepted round needs no special case).
        `pending`: the batcher's pending token per slot; `caps`: per-slot
        proposal budget (0 = don't propose). A slot whose draft cache can't
        hold the FULL span drafts a shorter one (rows needed next round =
        len + allowed + 2 ≤ cache_len) instead of being declined. Returns
        per-slot proposal arrays (None where not drafting)."""
        allowed = np.minimum(np.minimum(caps, span),
                             self.cache_len - self.len - 2)
        allowed = np.where(active & (self.len > 0),
                           np.maximum(allowed, 0), 0)
        drafting = allowed > 0
        self._drafted = drafting
        if not drafting.any():
            return [None] * self.max_slots

        # Align device lengths with the committed mirror before decoding
        # (rolls back any rejected rows from the previous round), then run
        # all span+1 draft steps in ONE dispatch with ONE device_get.
        self.cache = dict(
            self.cache, length=jnp.asarray(self.len.astype(np.int32))
        )
        token = jnp.asarray(np.where(drafting, pending, 0).astype(np.int32))
        steps_left = jnp.asarray((allowed + drafting).astype(np.int32))
        toks, self.cache = _draft_propose_steps(
            self.params, self.cache, token, steps_left, self.cfg, span,
        )
        out = np.asarray(jax.device_get(toks)).T  # [slots, span]
        return [out[s, : allowed[s]] if drafting[s] else None
                for s in range(self.max_slots)]

    def commit(self, slot: int, n_emitted: int) -> None:
        """Advance the committed mirror by the round's emitted tokens
        (pending + accepted proposals; the corrected token becomes the new
        pending and stays out of the draft cache per the invariant). A
        slot that was ACTIVE but skipped this round (cap exhausted, window
        full) never fed its pending row — its draft state is stale, so it
        stops being drafted rather than desynchronize."""
        if self.len[slot] <= 0:
            return
        if self._drafted[slot]:
            self.len[slot] += n_emitted
        else:
            self.len[slot] = 0

    def rollback(self) -> None:
        """Write the committed mirror into the device lengths (called once
        per round after all commits)."""
        self.cache = dict(
            self.cache, length=jnp.asarray(self.len.astype(np.int32))
        )
