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
from .generate import SamplingConfig, _sample


@functools.partial(jax.jit, static_argnames=("cfg", "use_flash"))
def _prefill_kv(params, input_ids, images, patch_valid, cfg: VisZephyrConfig,
                use_flash: Optional[bool] = None):
    """Single-request prefill → (last_logits [1,V], k/v [L,T,Hkv,D], length)."""
    pad_mult = 128 if jax.default_backend() != "cpu" else None
    logits, aux = vis_zephyr_forward(
        params, input_ids, images, patch_valid, cfg,
        return_kv=True, pad_to_multiple=pad_mult, use_flash=use_flash,
    )
    k, v = aux["kv"]
    length = aux["lengths"][0]
    return logits[0, length - 1], k[:, 0], v[:, 0], length


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


@functools.partial(jax.jit, static_argnames=("cfg", "sampling"), donate_argnums=(1,))
def _batch_step(params, cache, token, active, key, cfg: VisZephyrConfig,
                sampling: SamplingConfig):
    """One decode step over all slots; inactive slots are frozen."""
    old_lengths = cache["length"]
    embeds = embed(params["decoder"], token[:, None])
    logits, new_cache = mistral_forward(
        params["decoder"], embeds, cfg.decoder, old_lengths[:, None],
        cache=cache, logits_slice="last",
    )
    next_token = _sample(logits[:, 0], key, sampling)
    next_token = jnp.where(active, next_token, cfg.decoder.pad_token_id)
    new_cache["length"] = jnp.where(active, new_cache["length"], old_lengths)
    return next_token, new_cache


@dataclasses.dataclass
class _Request:
    request_id: int
    input_ids: np.ndarray
    images: Optional[np.ndarray]
    patch_valid: Optional[np.ndarray]
    max_new_tokens: int
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
    ):
        """`mesh`: optional inference mesh (see `parallel.mesh.inference_mesh`).
        Params are TP-sharded over its model axis and the KV cache over the
        head dim; every jitted step then partitions via SPMD propagation —
        no explicit collectives here. Pallas flash prefill is disabled under
        a mesh (a custom kernel can't be auto-partitioned; XLA attention
        shards cleanly head-parallel).
        `metrics`: optional `utils.metrics.ServingMetrics` — per-request
        TTFT/TPOT recorded at finish."""
        self.metrics = metrics
        if mesh is not None:
            from ..parallel.sharding import shard_kv_cache, shard_params

            params = shard_params(params, mesh)
        self.params = params
        self.cfg = cfg
        self.mesh = mesh
        self.use_flash = False if mesh is not None else None
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
    ) -> _Request:
        """Queue a request. Returns a handle whose `.out` queue yields token
        ids and a final `None` sentinel."""
        with self._lock:
            rid = self._next_id
            self._next_id += 1
        req = _Request(
            rid,
            np.asarray(input_ids),
            images if images is None else np.asarray(images),
            patch_valid if patch_valid is None else np.asarray(patch_valid),
            max_new_tokens or self.sampling.max_new_tokens,
        )
        req.submitted_at = time.perf_counter()
        self.pending.put(req)
        return req

    def stream(self, req: _Request) -> Iterator[int]:
        while True:
            tok = req.out.get()
            if tok is None:
                return
            yield tok

    @property
    def has_work(self) -> bool:
        return self.active.any() or not self.pending.empty()

    # -- scheduler -----------------------------------------------------------

    def _admit_pending(self) -> None:
        for slot in range(self.max_slots):
            if self.active[slot]:
                continue
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                return
            ids = jnp.asarray(req.input_ids[None])
            images = None if req.images is None else jnp.asarray(req.images[None])
            pv = None if req.patch_valid is None else jnp.asarray(req.patch_valid[None])
            last_logits, k, v, length = _prefill_kv(
                self.params, ids, images, pv, self.cfg, use_flash=self.use_flash
            )
            if int(length) + req.max_new_tokens > self.cache_len:
                req.out.put(None)  # too long; reject
                continue
            self.cache = _admit(self.cache, k, v, length, self.cfg, slot)
            self.rng, sub = jax.random.split(self.rng)
            first = _sample(last_logits[None], sub, self.sampling)
            tok = int(first[0])
            self.slot_req[slot] = req
            self.active[slot] = True
            self.budget[slot] = req.max_new_tokens - 1
            self.token = self.token.at[slot].set(tok)
            if tok == self.sampling.eos_token_id:
                self._finish(slot)
            else:
                self._emit(req, tok)
                # max_new_tokens == 1: the first (prefill-sampled) token
                # exhausts the budget — finish now, or the next step would
                # decode and emit a second token before the budget check.
                if self.budget[slot] <= 0:
                    self._finish(slot)

    def _emit(self, req: _Request, tok: int) -> None:
        if req.first_token_at is None:
            req.first_token_at = time.perf_counter()
        req.n_tokens += 1
        req.out.put(tok)

    def _finish(self, slot: int) -> None:
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

    def step(self) -> int:
        """Admit pending requests, then advance every active slot by one
        token. Returns the number of active slots stepped."""
        self._admit_pending()
        if not self.active.any():
            return 0
        self.rng, sub = jax.random.split(self.rng)
        self.token, self.cache = _batch_step(
            self.params, self.cache, self.token, jnp.asarray(self.active), sub,
            self.cfg, self.sampling,
        )
        tokens = np.asarray(jax.device_get(self.token))
        stepped = 0
        for slot in range(self.max_slots):
            if not self.active[slot]:
                continue
            stepped += 1
            tok = int(tokens[slot])
            if tok == self.sampling.eos_token_id:
                self._finish(slot)
                continue
            self._emit(self.slot_req[slot], tok)
            self.budget[slot] -= 1
            if self.budget[slot] <= 0:
                self._finish(slot)
        return stepped

    def run_until_drained(self, max_steps: int = 100000) -> None:
        for _ in range(max_steps):
            if not self.has_work:
                return
            self.step()
