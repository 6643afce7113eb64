"""ChatEngine: shared session/conversation state + streaming generation,
driving both the CLI and the HTTP server.

Reference equivalents: the per-session dict + generation thread in
`vis_zephyr/serve/api.py:41-184` and the interactive loop in
`serve/cli.py:49-194`. Differences by design:
- generation is serialized with a lock (the reference runs unguarded
  concurrent `generate` calls on one model, SURVEY §5.2),
- images are preprocessed once per session into static-shape patch
  tensors + validity masks (anyres) and cached on device,
- decoding streams through the jitted single-step path.
"""

from __future__ import annotations

import threading
import time
from typing import Dict, Iterator, Optional

import numpy as np
import jax.numpy as jnp

from ..config import VisZephyrConfig
from ..constants import DEFAULT_IMAGE_TOKEN
from ..conversation import templates
from ..data import anyres
from ..data.image_pipeline import anyres_preprocess_host, preprocess_mode_host
from ..data.tokenization import tokenize_with_images
from .generate import SamplingConfig, generate_stream


class EngineDraining(RuntimeError):
    """Raised for NEW requests while the engine is draining for shutdown
    (in-flight requests run to completion); the HTTP layer maps it to
    503."""


class ChatEngine:
    def __init__(
        self,
        params,
        cfg: VisZephyrConfig,
        tokenizer,
        conv_mode: str = "zephyr_v1",
        temperature: float = 0.0,
        max_new_tokens: int = 512,
        continuous_batching: bool = False,
        max_slots: int = 8,
        cache_len: int = 2048,
        kv_cache: str = "dense",  # "dense" | "paged"
        kv_quant: bool = False,
        num_pages: Optional[int] = None,
        mesh=None,
        metrics=None,
        prefill_chunk=None,
        lookahead: int = 0,
        draft_params=None,
        draft_cfg=None,
        multi_step: int = 1,
        kv_fused: bool = False,
        prefix_cache: bool = False,
        page_size: int = 128,
        mlora=None,
        adapter_names=None,
        lazy_alloc: bool = False,
    ):
        """`mesh`: optional inference mesh (model-axis TP). Params are
        sharded once here; jitted prefill/decode partition via SPMD
        propagation. Replaces the reference's `device_map="auto"` multi-GPU
        spread (`vis_zephyr/model/builder.py:22`) with ICI tensor
        parallelism."""
        self.mesh = mesh
        self.metrics = metrics
        # Prompt-lookup speculation: serialized path and both batchers
        # (paged verifies through the flash-structure kernel's multi-row
        # shape).
        self.lookahead = lookahead
        # Multi-step bursts apply to the serialized path too (ignored
        # when speculation is on, same rule as the batchers).
        self.multi_step = max(1, int(multi_step))
        self._use_flash = None
        if mesh is not None:
            from ..parallel.sharding import shard_params

            params = shard_params(params, mesh)
            # Flash prefill runs under the mesh too (shard_map over heads
            # via attn_mesh); the per-shape auto-gate still applies.
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.conv_mode = conv_mode
        # Prefer the tokenizer's EOS id (custom tokenizers may disagree with
        # the model config; for Zephyr both are 2).
        eos = getattr(tokenizer, "eos_token_id", None)
        self.sampling = SamplingConfig(
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            eos_token_id=cfg.decoder.eos_token_id if eos is None else int(eos),
        )
        self.sessions: Dict[str, Dict] = {}
        self._lock = threading.Lock()
        self._draining = False
        self._inflight = 0
        self._inflight_lock = threading.Lock()

        # Optional continuous batching: concurrent requests share decode
        # steps instead of serializing on the lock.
        self.batcher = None
        self._pump = None
        self._pump_stop = False
        self._pump_lock = threading.Lock()
        if lazy_alloc and (not continuous_batching or kv_cache != "paged"):
            raise ValueError("lazy_alloc requires continuous batching with "
                             "kv_cache='paged'")
        if continuous_batching:
            draft = None
            if draft_params is not None and lookahead > 0:
                from .draft import DraftModel

                # The draft's own dense cache is tiny (a small decoder);
                # it proposes for every slot regardless of the target's
                # cache layout.
                draft = DraftModel(draft_params, draft_cfg,
                                   max_slots=max_slots, cache_len=cache_len)
            if kv_cache == "paged":
                from .paged import PagedBatcher

                self.batcher = PagedBatcher(
                    params, cfg, max_slots=max_slots, cache_len=cache_len,
                    sampling=self.sampling, num_pages=num_pages, mesh=mesh,
                    metrics=metrics, prefill_chunk=prefill_chunk,
                    kv_quant=kv_quant, lookahead=lookahead, draft=draft,
                    multi_step=multi_step, kv_fused=kv_fused,
                    prefix_cache=prefix_cache, page_size=page_size,
                    mlora=mlora, adapter_names=adapter_names,
                    lazy_alloc=lazy_alloc,
                )
            else:
                from .batching import ContinuousBatcher

                self.batcher = ContinuousBatcher(
                    params, cfg, max_slots=max_slots, cache_len=cache_len,
                    sampling=self.sampling, mesh=mesh, metrics=metrics,
                    prefill_chunk=prefill_chunk, lookahead=lookahead,
                    draft=draft, multi_step=multi_step,
                    mlora=mlora, adapter_names=adapter_names,
                )

    def _ensure_pump(self) -> None:
        """Background thread advancing the batcher while work exists.
        Exactly ONE pump may run: the batcher donates its cache buffers to
        the jitted step, so concurrent step() calls would re-use freed
        device buffers."""
        with self._pump_lock:
            if self._pump is not None and self._pump.is_alive():
                return

            def pump():
                import time

                idle = 0
                while not self._pump_stop:
                    if self.batcher.has_work:
                        idle = 0
                        self.batcher.step()
                        continue
                    idle += 1
                    time.sleep(0.001)
                    if idle >= 2000:  # ~2s of no work → try to exit
                        # Exit decision must be made under _pump_lock: a
                        # request submitted after our last has_work check
                        # would otherwise see a live pump in _ensure_pump
                        # and then be orphaned when this thread dies.
                        with self._pump_lock:
                            if self.batcher.has_work:
                                idle = 0
                                continue
                            self._pump = None
                            return

            self._pump = threading.Thread(target=pump, daemon=True)
            self._pump.start()

    def close(self) -> None:
        """Stop the background pump and wait for it to exit.

        Call when retiring an engine while the process lives on (tests,
        embedding hosts): the pump idles ~2 s past the last request before
        exiting on its own, and a thread still stepping donated cache
        buffers while the next engine compiles races the runtime."""
        self._pump_stop = True
        pump = self._pump
        if pump is not None and pump.is_alive():
            pump.join(timeout=30)
        if pump is not None and pump.is_alive():
            # Wedged pump: leave the stop flag SET so it can never re-enter
            # its loop and step donated buffers under a successor engine —
            # clearing it here would recreate the exact race close() exists
            # to prevent.
            import warnings

            warnings.warn("ChatEngine.close(): pump thread did not exit "
                          "within 30s; leaving stop flag set")
            return
        self._pump = None
        self._pump_stop = False

    # -- session management -------------------------------------------------

    def get_session(self, session_id: str) -> Dict:
        with self._lock:
            if session_id not in self.sessions:
                self.sessions[session_id] = {
                    "conversation": templates[self.conv_mode].copy(),
                    "images": None,
                    "patch_valid": None,
                    "image_size": None,
                    # Serializes same-session requests: concurrent /chat
                    # calls for one session_id would interleave
                    # append_message and corrupt the prompt history.
                    # Different sessions still overlap in the batcher.
                    "lock": threading.Lock(),
                }
            return self.sessions[session_id]

    def reset_session(self, session_id: str) -> None:
        self.sessions.pop(session_id, None)

    def preprocess_image(self, pil_image):
        """Anyres/square preprocess → (pixels [P, S, S, 3], valid [P])."""
        if self.cfg.image_aspect_ratio == "anyres":
            return anyres_preprocess_host(
                pil_image,
                self.cfg.mm_grid_pinpoints,
                target_size=self.cfg.vision.image_size,
            )
        one = preprocess_mode_host(
            pil_image, self.cfg.image_aspect_ratio, self.cfg.vision.image_size
        )
        pins = anyres.parse_grid_pinpoints(self.cfg.mm_grid_pinpoints)
        P = anyres.max_anyres_patches(pins, self.cfg.vision.image_size)
        pixels = np.zeros((P,) + one.shape, np.float32)
        pixels[0] = one
        return pixels, np.arange(P) < 1

    def attach_image(self, session_id: str, pil_image) -> None:
        """Preprocess + cache the session image (first request only,
        reference `serve/api.py:100-122`)."""
        sess = self.get_session(session_id)
        pixels, valid = self.preprocess_image(pil_image)
        sess["images"] = jnp.asarray(pixels)[None]
        sess["patch_valid"] = jnp.asarray(valid)[None]
        sess["image_size"] = pil_image.size

    # -- generation ----------------------------------------------------------

    def chat(self, session_id: str, question: str, pil_image=None,
             adapter: Optional[str] = None) -> Iterator[str]:
        """Append the user turn, stream back the assistant reply text.
        `adapter`: multi-LoRA adapter name for this request (continuous
        batching only; None = base model)."""
        self._admit_inflight()  # eager: raises EngineDraining when draining
        return self._chat_stream(session_id, question, pil_image, adapter)

    def _chat_stream(self, session_id, question, pil_image,
                     adapter) -> Iterator[str]:
        try:
            sess = self.get_session(session_id)
            sess["lock"].acquire()
            try:
                yield from self._chat_locked(sess, session_id, question,
                                             pil_image, adapter=adapter)
            finally:
                sess["lock"].release()
        finally:
            self._release_inflight()

    def _chat_locked(self, sess, session_id: str, question: str, pil_image,
                     adapter: Optional[str] = None) -> Iterator[str]:
        conv = sess["conversation"]

        if pil_image is not None and sess["images"] is None:
            self.attach_image(session_id, pil_image)
            question = DEFAULT_IMAGE_TOKEN + "\n" + question.replace(DEFAULT_IMAGE_TOKEN, "").strip()

        conv.append_message(conv.roles[0], question)
        conv.append_message(conv.roles[1], None)
        prompt = conv.get_prompt()

        ids = tokenize_with_images(prompt, self.tokenizer)
        input_ids = jnp.asarray(np.asarray(ids, np.int64))[None]

        produced: list[int] = []
        emitted_text = ""
        if self.batcher is not None:
            images = sess["images"]
            handle = self.batcher.submit(
                np.asarray(input_ids[0]),
                None if images is None else np.asarray(images[0]),
                None if images is None else np.asarray(sess["patch_valid"][0]),
                adapter=adapter,
            )
            self._ensure_pump()
            stream = self.batcher.stream(handle)
        else:
            if adapter is not None and adapter != "base":
                raise ValueError(
                    "per-request adapters need --continuous-batching "
                    "(serialized engines merge one adapter at load)")
            self._lock.acquire()
            stream = generate_stream(
                self.params,
                input_ids,
                sess["images"],
                sess["patch_valid"],
                self.cfg,
                self.sampling,
                use_flash=self._use_flash,
                attn_mesh=self.mesh,
                lookahead=self.lookahead,
                # Mesh-sharded cache → the Pallas cache-update custom call
                # can't be auto-partitioned; use the XLA scatter (same rule
                # the batchers apply per-step).
                pallas_cache=self.mesh is None,
                multi_step=self.multi_step,
            )
        try:
            for tok in stream:
                produced.append(tok)
                text = self.tokenizer.decode(produced, skip_special_tokens=True)
                # Emit only the stable prefix delta (last token may merge).
                delta = text[len(emitted_text):]
                if delta:
                    emitted_text = text
                    yield delta
        finally:
            if self.batcher is None:
                self._lock.release()
            # Record the (possibly partial) reply even when the consumer
            # closes the stream early (client disconnect → cancellation):
            # a None assistant turn would corrupt the next turn's prompt.
            conv.messages[-1][1] = emitted_text

    def chat_text(self, session_id: str, question: str, pil_image=None,
                  adapter: Optional[str] = None) -> str:
        return "".join(self.chat(session_id, question, pil_image,
                                 adapter=adapter))

    # -- stateless generation (OpenAI-compatible endpoints) -------------------

    def compile_grammar(self, pattern: Optional[str] = None,
                        json_schema: Optional[dict] = None):
        """Compile (and cache) a structured-output grammar for this
        engine's tokenizer: a regex pattern or a JSON schema →
        `serve.structured.TokenGrammar`. The vocabulary walk runs once per
        distinct pattern; repeat requests hit the cache."""
        from .structured import (TokenGrammar, schema_to_regex,
                                 token_strings_from_tokenizer)

        if json_schema is not None:
            pattern = schema_to_regex(json_schema)
        if not pattern:
            raise ValueError("grammar needs a regex pattern or a JSON schema")
        if not hasattr(self, "_grammar_cache"):
            from collections import OrderedDict

            self._grammar_cache = OrderedDict()
        if pattern in self._grammar_cache:
            self._grammar_cache.move_to_end(pattern)
        else:
            # Bounded LRU: each entry holds an [S+1, V] mask (megabytes);
            # distinct patterns arrive from unauthenticated requests.
            self._grammar_cache[pattern] = TokenGrammar.from_regex(
                pattern, self.token_strings(), self.sampling.eos_token_id)
            while len(self._grammar_cache) > 32:
                self._grammar_cache.popitem(last=False)
        return self._grammar_cache[pattern]

    def token_strings(self):
        """Per-id raw decoded BYTES of the whole vocabulary (cached) —
        shared by grammar compilation and logprobs formatting."""
        from .structured import token_strings_from_tokenizer

        if not hasattr(self, "_token_strings"):
            self._token_strings = token_strings_from_tokenizer(
                self.tokenizer, self.cfg.decoder.vocab_size)
        return self._token_strings

    def token_bytes(self, tok: int) -> bytes:
        blobs = self.token_strings()
        return blobs[tok] if 0 <= tok < len(blobs) else b""

    def token_text(self, tok: int) -> str:
        # Lossy display form: a byte-fallback token may hold a partial
        # UTF-8 sequence; the exact bytes are available via token_bytes.
        return self.token_bytes(tok).decode("utf-8", errors="replace")

    def generate_request(
        self,
        prompt: str,
        pil_image=None,
        max_new_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
        adapter: Optional[str] = None,
        grammar=None,
        logprobs: Optional[int] = None,
        lp_sink: Optional[list] = None,
        frequency_penalty: float = 0.0,
        presence_penalty: float = 0.0,
    ) -> Iterator[int]:
        """Session-free generation from a fully-rendered prompt: yields raw
        token ids until EOS/budget. Drives /v1/chat/completions and
        /v1/completions — each request carries its whole context (the
        OpenAI contract), so nothing is cached between calls (the paged
        batcher's prefix cache still dedups shared prompt pages).

        Per-request `max_new_tokens`/`temperature`/`top_p` override the
        engine defaults; under continuous batching they apply per-slot
        within a shared step (`generate._sample_per_slot`). A speculative
        batcher (lookahead > 0) serves greedy only — overrides are ignored
        there (see `ContinuousBatcher.submit`).

        Submission is EAGER: under continuous batching the request enters
        the pending queue before this returns (so several calls decode
        concurrently — the OpenAI `n` parameter); errors (unknown adapter,
        speculative incompatibilities) raise here, not at first pull."""
        self._admit_inflight()
        try:
            return self._generate_request_registered(
                prompt, pil_image, max_new_tokens, temperature, top_p,
                adapter, grammar, logprobs, lp_sink, frequency_penalty,
                presence_penalty)
        except BaseException:
            self._release_inflight()  # error before streaming started
            raise

    def _generate_request_registered(
            self, prompt, pil_image, max_new_tokens, temperature, top_p,
            adapter, grammar, logprobs, lp_sink, frequency_penalty,
            presence_penalty) -> Iterator[int]:
        import dataclasses

        images = patch_valid = None
        if pil_image is not None:
            if DEFAULT_IMAGE_TOKEN not in prompt:
                prompt = DEFAULT_IMAGE_TOKEN + "\n" + prompt
            pixels, valid = self.preprocess_image(pil_image)
            images, patch_valid = pixels, valid
        ids = np.asarray(tokenize_with_images(prompt, self.tokenizer), np.int64)

        if self.batcher is not None:
            handle = self.batcher.submit(
                ids, images, patch_valid,
                max_new_tokens=max_new_tokens,
                adapter=adapter, temperature=temperature, top_p=top_p,
                grammar=grammar, logprobs=logprobs,
                frequency_penalty=frequency_penalty,
                presence_penalty=presence_penalty,
            )
            self._ensure_pump()
            return self._track(self._stream_handle(handle, logprobs, lp_sink))

        if adapter is not None and adapter != "base":
            raise ValueError(
                "per-request adapters need --continuous-batching "
                "(serialized engines merge one adapter at load)")
        overrides = {}
        if max_new_tokens is not None:
            overrides["max_new_tokens"] = max_new_tokens
        if temperature is not None:
            overrides["temperature"] = temperature
        if top_p is not None:
            overrides["top_p"] = top_p
        sampling = (dataclasses.replace(self.sampling, **overrides)
                    if overrides else self.sampling)
        return self._track(self._generate_serialized(
            ids, images, patch_valid, sampling, grammar,
            lp_sink if logprobs is not None else None,
            (frequency_penalty, presence_penalty)
            if (frequency_penalty or presence_penalty) else None))

    def _admit_inflight(self) -> None:
        """Register a request EAGERLY and atomically with the draining
        check — a request accepted before drain() flips the flag is
        always counted, so drain() can never report idle while an
        accepted request hasn't started streaming yet."""
        with self._inflight_lock:
            if self._draining:
                raise EngineDraining(
                    "engine is draining; not accepting requests")
            self._inflight += 1

    def _release_inflight(self) -> None:
        with self._inflight_lock:
            self._inflight -= 1

    def _track(self, it: Iterator[int]) -> Iterator[int]:
        """Stream `it`, releasing this request's in-flight registration
        (taken eagerly by `_admit_inflight`) when the iterator is
        exhausted or closed."""
        try:
            yield from it
        finally:
            self._release_inflight()

    def drain(self, timeout: float = 120.0) -> bool:
        """Graceful shutdown, phase 1: refuse NEW requests (`chat` /
        `generate_request` raise `EngineDraining`; the HTTP layer maps it
        to 503) and wait for every in-flight request — streaming
        iterators and batcher slots — to finish, up to `timeout` seconds.
        Returns True when fully drained. Call `close()` afterwards to
        retire the pump. Mirrors the trainer's SIGTERM checkpoint
        (train/train.py): no surface loses work to a delivery-time
        preemption."""
        self._draining = True
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            busy = self._inflight > 0 or (
                self.batcher is not None and self.batcher.has_work)
            if not busy:
                return True
            time.sleep(0.05)
        return False

    def _stream_handle(self, handle, logprobs, lp_sink) -> Iterator[int]:
        if logprobs is None or lp_sink is None:
            yield from self.batcher.stream(handle)
            return
        # lp_log[i] is appended before token i enters the queue, so
        # indexing by consumption order is race-free.
        for i, tok in enumerate(self.batcher.stream(handle)):
            lp_sink.append(handle.lp_log[i])
            yield tok

    def _generate_serialized(self, ids, images, patch_valid, sampling,
                             grammar, lp_sink,
                             penalties=None) -> Iterator[int]:
        with self._lock:
            yield from generate_stream(
                self.params,
                jnp.asarray(ids)[None],
                None if images is None else jnp.asarray(images)[None],
                None if patch_valid is None else jnp.asarray(patch_valid)[None],
                self.cfg,
                sampling,
                use_flash=self._use_flash,
                attn_mesh=self.mesh,
                lookahead=self.lookahead,
                pallas_cache=self.mesh is None,
                multi_step=self.multi_step,
                grammar=grammar,
                lp_sink=lp_sink,
                penalties=penalties,
            )

    def stream_text(self, token_iter: Iterator[int]) -> Iterator[str]:
        """Detokenize a token stream into stable text deltas.

        Incremental (the vLLM detokenizer structure): only a small sliding
        window of tokens is ever re-decoded — `prefix..read` is the
        already-emitted context (kept so sentencepiece renders the piece
        boundary, e.g. the leading-space convention, exactly as a full
        decode would) and `read..end` is the pending tail. The tail is held
        back while the decoder reports an incomplete sequence (text ending
        in U+FFFD, e.g. a split UTF-8 codepoint from byte-fallback tokens);
        once it renders cleanly its delta is emitted and the window slides.
        Work per token is O(window), not O(tokens so far)."""
        produced: list[int] = []
        prefix = 0  # window start: context tokens already fully emitted
        read = 0    # tokens emitted as text (prefix..read renders context)
        for tok in token_iter:
            produced.append(tok)
            ctx = self.tokenizer.decode(produced[prefix:read],
                                        skip_special_tokens=True)
            full = self.tokenizer.decode(produced[prefix:],
                                         skip_special_tokens=True)
            if len(full) <= len(ctx) or full.endswith("�"):
                continue  # tail incomplete (mid-codepoint or merged piece)
            yield full[len(ctx):]
            prefix = max(read, len(produced) - 8)
            read = len(produced)
        # Stream over: flush any tail still held back (it will never
        # complete; render what the decoder makes of it).
        if read < len(produced):
            ctx = self.tokenizer.decode(produced[prefix:read],
                                        skip_special_tokens=True)
            full = self.tokenizer.decode(produced[prefix:],
                                         skip_special_tokens=True)
            if len(full) > len(ctx):
                yield full[len(ctx):]
