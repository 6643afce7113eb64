"""OpenAI-compatible endpoints + per-request sampling params.

Covers the net-new serving surface (`serve/openai_api.py`): prompt
rendering from OpenAI messages, stop-string scanning, /v1 endpoints over
the stdlib server (stream + non-stream), multi-LoRA `model` routing
errors, and the per-slot sampling vectors in the continuous batchers.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vis_zephyr_tpu.config import tiny_config  # noqa: E402
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr  # noqa: E402
from vis_zephyr_tpu.serve.api import serve  # noqa: E402
from vis_zephyr_tpu.serve.engine import ChatEngine  # noqa: E402
from vis_zephyr_tpu.serve.generate import _sample_per_slot  # noqa: E402
from vis_zephyr_tpu.serve.openai_api import (  # noqa: E402
    StopMatcher,
    render_chat_prompt,
)


@pytest.fixture(scope="module")
def tokenizer():
    from conftest import MockTokenizer

    return MockTokenizer()


@pytest.fixture(scope="module")
def engine(tokenizer):
    cfg = tiny_config(vocab_size=50000)
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    return ChatEngine(params, cfg, tokenizer, max_new_tokens=6,
                      temperature=0.0, continuous_batching=True, max_slots=4)


@pytest.fixture(scope="module")
def server(engine):
    srv = serve(engine, host="127.0.0.1", port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


class TestStopMatcher:
    def test_no_stops_passthrough(self):
        m = StopMatcher(None)
        assert m.feed("hello") == "hello"
        assert not m.stopped

    def test_stop_split_across_deltas(self):
        m = StopMatcher(["STOP"])
        out = m.feed("abc ST")
        assert out == "abc "          # "ST" held back (possible prefix)
        out += m.feed("OP xyz")
        assert out == "abc "
        assert m.stopped
        assert m.flush() == ""        # nothing after a stop

    def test_partial_match_released_at_flush(self):
        m = StopMatcher(["ZZZ"])
        out = m.feed("tail ends with ZZ")
        assert out == "tail ends with "
        assert m.flush() == "ZZ"
        assert not m.stopped

    def test_earliest_of_multiple_stops(self):
        m = StopMatcher(["Y", "XX"])
        assert m.feed("abXXcdY") == "ab"
        assert m.stopped


class TestRenderChatPrompt:
    def test_system_and_turns(self):
        prompt, image = render_chat_prompt(
            [
                {"role": "system", "content": "Be terse."},
                {"role": "user", "content": "Hi"},
                {"role": "assistant", "content": "Hello"},
                {"role": "user", "content": "Bye"},
            ],
            "zephyr_v1",
        )
        assert image is None
        assert prompt.startswith("<|system|>\nBe terse.</s>")
        assert "<|user|>\nHi</s><|assistant|>\nHello</s>" in prompt
        assert prompt.endswith("<|user|>\nBye</s><|assistant|>\n")

    def test_image_data_url_part(self):
        import base64
        import io

        from PIL import Image

        img = Image.fromarray(
            np.random.default_rng(0).integers(0, 255, (20, 30, 3), np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
        prompt, image = render_chat_prompt(
            [{"role": "user", "content": [
                {"type": "image_url", "image_url": {"url": url}},
                {"type": "text", "text": "What is this?"},
            ]}],
            "zephyr_v1",
        )
        assert image is not None and image.size == (30, 20)
        assert "<image>\nWhat is this?" in prompt

    def test_remote_url_rejected(self):
        with pytest.raises(ValueError, match="data:"):
            render_chat_prompt(
                [{"role": "user", "content": [
                    {"type": "image_url",
                     "image_url": {"url": "https://example.com/x.png"}},
                ]}],
                "zephyr_v1",
            )

    def test_two_images_rejected(self):
        part = {"type": "image_url", "image_url": {"url": "data:image/png;base64,x"}}
        with pytest.raises(ValueError):
            render_chat_prompt(
                [{"role": "user", "content": [part, part]}], "zephyr_v1")


class TestPerSlotSampling:
    def test_greedy_rows_match_argmax(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (4, 64))
        temps = jnp.asarray([0.0, 1.0, 0.0, 0.7])
        tops = jnp.asarray([1.0, 0.9, 1.0, 1.0])
        toks = _sample_per_slot(logits, jax.random.PRNGKey(1), temps, tops)
        greedy = jnp.argmax(logits, axis=-1)
        assert toks[0] == greedy[0] and toks[2] == greedy[2]
        assert toks.shape == (4,)

    def test_top_p_restricts_support(self):
        # One dominant logit per row with top_p tiny → must pick argmax.
        logits = jnp.full((2, 16), -10.0)
        logits = logits.at[:, 3].set(10.0)
        temps = jnp.asarray([1.0, 1.0])
        tops = jnp.asarray([0.5, 0.5])
        for seed in range(5):
            toks = _sample_per_slot(logits, jax.random.PRNGKey(seed), temps, tops)
            assert (np.asarray(toks) == 3).all()

    def test_batcher_mixed_temps_keep_greedy_exact(self, tokenizer):
        """A temp>0 request sharing the batch must not perturb a greedy
        request's tokens (per-slot vectors, not batch-global)."""
        from vis_zephyr_tpu.serve.batching import ContinuousBatcher
        from vis_zephyr_tpu.serve.generate import SamplingConfig

        cfg = tiny_config(vocab_size=50000)
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0,
                                  eos_token_id=-1)
        ids = np.asarray([1, 17, 23, 42], np.int64)

        ref = ContinuousBatcher(params, cfg, max_slots=4, cache_len=256,
                                sampling=sampling)
        r = ref.submit(ids)
        ref.run_until_drained()
        expected = []
        while not r.out.empty():
            t = r.out.get()
            if t is not None:
                expected.append(t)

        mixed = ContinuousBatcher(params, cfg, max_slots=4, cache_len=256,
                                  sampling=sampling)
        a = mixed.submit(ids)                      # greedy (engine default)
        b = mixed.submit(ids, temperature=1.3, top_p=0.9)
        mixed.run_until_drained()
        got = []
        while not a.out.empty():
            t = a.out.get()
            if t is not None:
                got.append(t)
        assert got == expected
        n_b = 0
        while not b.out.empty():
            if b.out.get() is not None:
                n_b += 1
        assert n_b == 6  # sampled request ran to budget (eos disabled)


class TestStreamText:
    """Incremental detokenization must reproduce the full-decode text."""

    def _collect(self, engine_like, toks):
        from vis_zephyr_tpu.serve.engine import ChatEngine

        return "".join(ChatEngine.stream_text(engine_like, iter(toks)))

    class _EngineLike:
        def __init__(self, tokenizer):
            self.tokenizer = tokenizer

    def test_word_tokenizer_equivalence(self, tokenizer):
        ids = [tokenizer._word_id(w) for w in "alpha beta gamma delta".split()]
        shim = self._EngineLike(tokenizer)
        got = self._collect(shim, ids)
        assert got == tokenizer.decode(ids, skip_special_tokens=True)

    def test_sentencepiece_boundary_convention(self):
        """A ▁-style tokenizer renders a leading space only mid-sequence;
        the sliding window must keep enough context to see the boundary."""

        class SPTok:
            pieces = ["<pad>", "▁hello", "▁big", "▁world", "s", "▁again"]

            def decode(self, ids, skip_special_tokens=False):
                text = "".join(self.pieces[i] for i in ids
                               if not (skip_special_tokens and i == 0))
                return text.replace("▁", " ").lstrip(" ")

        tok = SPTok()
        ids = [1, 2, 3, 4, 5] * 4  # long enough to slide the window
        got = self._collect(self._EngineLike(tok), ids)
        assert got == tok.decode(ids, skip_special_tokens=True)

    def test_split_utf8_held_until_complete(self):
        class ByteTok:
            # token i is one raw byte of "é" (2-byte UTF-8) or an ASCII char
            table = {0: b"a", 1: b"\xc3", 2: b"\xa9", 3: b"b"}

            def decode(self, ids, skip_special_tokens=False):
                return b"".join(self.table[i] for i in ids).decode(
                    "utf-8", errors="replace")

        tok = ByteTok()
        got = self._collect(self._EngineLike(tok), [0, 1, 2, 3])
        assert got == "aéb"  # no replacement chars leaked mid-stream


class TestLogprobs:
    def test_logprobs_matches_log_softmax(self):
        from vis_zephyr_tpu.serve.generate import LP_TOPK, _logprobs

        logits = jax.random.normal(jax.random.PRNGKey(0), (3, 64))
        token = jnp.asarray([5, 0, 63])
        chosen, ids, lps = jax.device_get(_logprobs(logits, token))
        ref = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        np.testing.assert_allclose(chosen, ref[np.arange(3), [5, 0, 63]],
                                   rtol=1e-5)
        assert ids.shape == (3, LP_TOPK)
        for b in range(3):
            order = np.argsort(-ref[b])[:LP_TOPK]
            np.testing.assert_array_equal(ids[b], order)
            np.testing.assert_allclose(lps[b], ref[b][order], rtol=1e-5)

    def test_logprobs_host_matches_device(self):
        from vis_zephyr_tpu.serve.generate import _logprobs, _logprobs_host

        logits = np.random.default_rng(0).normal(size=(128,)).astype(np.float32)
        chosen_h, ids_h, lps_h = _logprobs_host(logits, 7)
        chosen_d, ids_d, lps_d = jax.device_get(
            _logprobs(jnp.asarray(logits)[None], jnp.asarray([7])))
        assert abs(chosen_h - float(chosen_d[0])) < 1e-4
        np.testing.assert_array_equal(ids_h, ids_d[0])
        np.testing.assert_allclose(lps_h, lps_d[0], rtol=1e-4)

    def test_batcher_lp_log(self, tokenizer):
        """Greedy + logprobs: one entry per emitted token; the chosen
        token IS the top-1 alternative (greedy = argmax of the raw
        distribution when no temperature/mask applies)."""
        from vis_zephyr_tpu.serve.batching import ContinuousBatcher
        from vis_zephyr_tpu.serve.generate import SamplingConfig

        cfg = tiny_config(vocab_size=50000)
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
        sampling = SamplingConfig(max_new_tokens=5, temperature=0.0,
                                  eos_token_id=-1)
        b = ContinuousBatcher(params, cfg, max_slots=2, cache_len=256,
                              sampling=sampling)
        ids = np.asarray([1, 17, 23, 42], np.int64)
        lp_req = b.submit(ids, logprobs=3)
        free = b.submit(ids)
        b.run_until_drained()
        toks = []
        while not lp_req.out.empty():
            t = lp_req.out.get()
            if t is not None:
                toks.append(t)
        assert len(lp_req.lp_log) == len(toks) == 5
        for tok, (chosen, top_ids, top_lps) in zip(toks, lp_req.lp_log):
            assert chosen <= 0.0
            assert int(top_ids[0]) == tok          # greedy == top-1
            assert abs(float(top_lps[0]) - chosen) < 1e-5
            assert all(top_lps[i] >= top_lps[i + 1]
                       for i in range(len(top_lps) - 1))
        # The logprob-free request sharing the batch recorded nothing.
        assert free.lp_log == []

    def test_paged_batcher_lp_log(self, tokenizer):
        from vis_zephyr_tpu.serve.generate import SamplingConfig
        from vis_zephyr_tpu.serve.paged import PagedBatcher

        cfg = tiny_config(vocab_size=50000)
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
        sampling = SamplingConfig(max_new_tokens=4, temperature=0.0,
                                  eos_token_id=-1)
        b = PagedBatcher(params, cfg, max_slots=2, cache_len=128,
                         sampling=sampling, page_size=16)
        req = b.submit(np.asarray([1, 17, 23, 42], np.int64), logprobs=2)
        b.run_until_drained()
        toks = []
        while not req.out.empty():
            t = req.out.get()
            if t is not None:
                toks.append(t)
        assert len(req.lp_log) == len(toks) == 4
        for tok, (chosen, top_ids, _) in zip(toks, req.lp_log):
            assert int(top_ids[0]) == tok and chosen <= 0.0

    def test_speculative_batcher_rejects_logprobs(self, tokenizer):
        from vis_zephyr_tpu.serve.batching import ContinuousBatcher
        from vis_zephyr_tpu.serve.generate import SamplingConfig

        cfg = tiny_config(vocab_size=50000)
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
        b = ContinuousBatcher(params, cfg, max_slots=2, cache_len=256,
                              sampling=SamplingConfig(max_new_tokens=4),
                              lookahead=2)
        with pytest.raises(ValueError, match="logprobs"):
            b.submit(np.asarray([1, 17], np.int64), logprobs=1)


class TestPenalties:
    def test_apply_penalties_math(self):
        from vis_zephyr_tpu.serve.generate import (_apply_penalties,
                                                   _count_token)

        logits = jnp.zeros((2, 6))
        counts = jnp.asarray([[2.0, 0, 1, 0, 0, 0], [0, 0, 0, 0, 0, 3.0]])
        freq = jnp.asarray([0.5, 0.0])
        pres = jnp.asarray([1.0, 2.0])
        out = np.asarray(_apply_penalties(logits, counts, freq, pres))
        np.testing.assert_allclose(out[0], [-2.0, 0, -1.5, 0, 0, 0])
        np.testing.assert_allclose(out[1], [0, 0, 0, 0, 0, -2.0])
        counts2 = _count_token(counts, jnp.asarray([2, 5]),
                               jnp.asarray([True, False]))
        assert counts2[0, 2] == 2.0 and counts2[1, 5] == 3.0  # inactive frozen

    def test_presence_penalty_prevents_repeats(self, tokenizer):
        """A small random model cycles under greedy decode; a presence
        penalty far above any logit gap forbids every re-emission, while a
        penalty-free batchmate stays token-identical to a reference run."""
        from vis_zephyr_tpu.serve.batching import ContinuousBatcher
        from vis_zephyr_tpu.serve.generate import SamplingConfig

        cfg = tiny_config(vocab_size=512)
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
        sampling = SamplingConfig(max_new_tokens=24, temperature=0.0,
                                  eos_token_id=-1)
        ids = np.asarray([1, 17, 23, 42], np.int64)

        ref = ContinuousBatcher(params, cfg, max_slots=2, cache_len=256,
                                sampling=sampling)
        r = ref.submit(ids)
        ref.run_until_drained()
        expected = _drain_tokens(r)
        assert len(set(expected)) < len(expected)  # baseline DOES repeat

        b = ContinuousBatcher(params, cfg, max_slots=2, cache_len=256,
                              sampling=sampling)
        pen = b.submit(ids, presence_penalty=100.0)
        free = b.submit(ids)
        b.run_until_drained()
        pen_toks = _drain_tokens(pen)
        assert len(pen_toks) == len(set(pen_toks)) == 24  # no repeats
        assert _drain_tokens(free) == expected

    def test_serialized_penalty(self, tokenizer):
        from vis_zephyr_tpu.serve.generate import (SamplingConfig,
                                                   generate_stream)

        cfg = tiny_config(vocab_size=512)
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
        sampling = SamplingConfig(max_new_tokens=16, temperature=0.0,
                                  eos_token_id=-1)
        toks = list(generate_stream(
            params, jnp.asarray([[1, 17, 23]]), None, None, cfg, sampling,
            penalties=(0.0, 100.0)))
        assert len(toks) == len(set(toks)) == 16


def _drain_tokens(req):
    out = []
    while not req.out.empty():
        t = req.out.get()
        if t is not None:
            out.append(t)
    return out


class TestOpenAIEndpoints:
    def test_models_lists_base(self, server):
        with urllib.request.urlopen(server + "/v1/models", timeout=30) as resp:
            body = json.loads(resp.read())
        assert body["object"] == "list"
        assert body["data"][0]["id"] == "vis-zephyr-tpu"

    def test_chat_completion_nonstream(self, server):
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "Hello there"}],
            "max_tokens": 4,
        })
        assert status == 200
        out = json.loads(body)
        assert out["object"] == "chat.completion"
        assert out["choices"][0]["message"]["role"] == "assistant"
        assert out["usage"]["completion_tokens"] <= 4
        assert out["usage"]["prompt_tokens"] > 0
        assert out["choices"][0]["finish_reason"] in ("stop", "length")

    def test_chat_completion_stream_sse(self, server):
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "Stream please"}],
            "max_tokens": 4,
            "stream": True,
        })
        assert status == 200
        events = [json.loads(line[len("data: "):])
                  for line in body.splitlines()
                  if line.startswith("data: ") and line != "data: [DONE]"]
        assert body.rstrip().endswith("data: [DONE]")
        assert events[0]["choices"][0]["delta"].get("role") == "assistant"
        # Per-choice finish chunk, then a bare usage chunk (empty choices).
        assert events[-2]["choices"][0]["finish_reason"] in ("stop", "length")
        assert events[-1]["choices"] == [] and "usage" in events[-1]
        text = "".join(e["choices"][0]["delta"].get("content", "")
                       for e in events if e["choices"])
        assert isinstance(text, str)

    def test_completions_endpoint(self, server):
        status, body = _post(server, "/v1/completions", {
            "prompt": "Some prefix text",
            "max_tokens": 3,
        })
        assert status == 200
        out = json.loads(body)
        assert out["object"] == "text_completion"
        assert "text" in out["choices"][0]
        assert out["usage"]["completion_tokens"] <= 3

    def test_unknown_model_rejected(self, server):
        status, body = _post(server, "/v1/chat/completions", {
            "model": "not-a-model",
            "messages": [{"role": "user", "content": "x"}],
        })
        assert status == 400
        assert "unknown model" in json.loads(body)["error"]["message"]

    def test_invalid_messages_rejected(self, server):
        status, body = _post(server, "/v1/chat/completions", {"messages": []})
        assert status == 400

    def test_stop_string_truncates(self, server, engine, tokenizer):
        """Force a known decode: find what the model says greedily, then
        stop on its first word — the reply must truncate before it."""
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "Tell me everything"}],
            "max_tokens": 6,
        })
        full = json.loads(body)["choices"][0]["message"]["content"]
        if not full.strip():
            pytest.skip("tiny model decoded nothing printable")
        first_word = full.split()[0]
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "Tell me everything"}],
            "max_tokens": 6,
            "stop": [first_word],
        })
        stopped = json.loads(body)["choices"][0]["message"]["content"]
        assert first_word not in stopped
        assert len(stopped) < len(full)
        assert json.loads(body)["choices"][0]["finish_reason"] == "stop"

    def test_chat_logprobs(self, server):
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "score this"}],
            "max_tokens": 4,
            "logprobs": True,
            "top_logprobs": 3,
        })
        assert status == 200
        out = json.loads(body)
        content = out["choices"][0]["logprobs"]["content"]
        assert len(content) == out["usage"]["completion_tokens"]
        for e in content:
            assert set(e) == {"token", "logprob", "bytes", "top_logprobs"}
            assert e["logprob"] <= 0.0
            assert len(e["top_logprobs"]) == 3
            # Greedy decode: the chosen token is the top-1 alternative.
            assert e["top_logprobs"][0]["logprob"] == e["logprob"]
            assert e["bytes"] == list(e["token"].encode("utf-8"))

    def test_completions_legacy_logprobs(self, server):
        status, body = _post(server, "/v1/completions", {
            "prompt": "prefix words here",
            "max_tokens": 3,
            "logprobs": 2,
        })
        assert status == 200
        lp = json.loads(body)["choices"][0]["logprobs"]
        n = len(lp["tokens"])
        assert n == len(lp["token_logprobs"]) == len(lp["top_logprobs"]) \
            == len(lp["text_offset"])
        assert all(len(t) == 2 for t in lp["top_logprobs"])
        assert lp["text_offset"] == sorted(lp["text_offset"])

    def test_streaming_logprobs(self, server):
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "stream scores"}],
            "max_tokens": 4,
            "logprobs": True,
            "top_logprobs": 1,
            "stream": True,
        })
        assert status == 200
        events = [json.loads(line[len("data: "):])
                  for line in body.splitlines()
                  if line.startswith("data: ") and line != "data: [DONE]"]
        entries = []
        for e in events:
            if not e["choices"]:
                continue
            lp = e["choices"][0].get("logprobs")
            if lp:
                entries.extend(lp["content"])
        assert len(entries) == events[-1]["usage"]["completion_tokens"]
        assert all(len(e["top_logprobs"]) == 1 for e in entries)

    def test_n_choices_nonstream(self, server):
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "many answers"}],
            "max_tokens": 3,
            "n": 3,
        })
        assert status == 200
        out = json.loads(body)
        assert [c["index"] for c in out["choices"]] == [0, 1, 2]
        # Greedy: every choice decodes identically (the OpenAI behavior).
        texts = {c["message"]["content"] for c in out["choices"]}
        assert len(texts) == 1
        assert out["usage"]["completion_tokens"] <= 9

    def test_n_choices_stream_interleaved(self, server):
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "many streams"}],
            "max_tokens": 3,
            "n": 2,
            "stream": True,
        })
        assert status == 200
        events = [json.loads(line[len("data: "):])
                  for line in body.splitlines()
                  if line.startswith("data: ") and line != "data: [DONE]"]
        finishes = {e["choices"][0]["index"]
                    for e in events
                    if e["choices"] and e["choices"][0]["finish_reason"]}
        assert finishes == {0, 1}
        per_idx = {0: "", 1: ""}
        for e in events:
            if e["choices"]:
                c = e["choices"][0]
                per_idx[c["index"]] += c["delta"].get("content", "")
        assert per_idx[0] == per_idx[1]  # greedy → identical
        assert events[-1]["choices"] == [] and "usage" in events[-1]

    def test_penalty_accepted_and_validated(self, server):
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "no repeats"}],
            "max_tokens": 4,
            "frequency_penalty": 0.5,
            "presence_penalty": 1.5,
        })
        assert status == 200
        assert json.loads(body)["usage"]["completion_tokens"] <= 4
        status, _ = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "x"}],
            "presence_penalty": 3.0,
        })
        assert status == 400

    def test_n_out_of_range(self, server):
        status, _ = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "x"}], "n": 99})
        assert status == 400

    def test_top_logprobs_out_of_range(self, server):
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "x"}],
            "logprobs": True,
            "top_logprobs": 50,
        })
        assert status == 400

    def test_per_request_temperature_accepted(self, server):
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "Sample away"}],
            "max_tokens": 4,
            "temperature": 1.1,
            "top_p": 0.95,
        })
        assert status == 200
        assert json.loads(body)["usage"]["completion_tokens"] <= 4


class TestMalformedPayloads:
    """Round-3 review regressions: shape-invalid payloads must produce a
    400 invalid_request_error, never an exception escaping the handler."""

    def test_string_content_part(self, server):
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": ["hi"]}]})
        assert status == 400
        assert json.loads(body)["error"]["type"] == "invalid_request_error"

    def test_tool_call_arguments_as_dict(self, server):
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [
                {"role": "assistant", "tool_calls": [
                    {"id": "c1", "type": "function",
                     "function": {"name": "f", "arguments": {"a": 1}}}]},
                {"role": "tool", "tool_call_id": "c1", "content": "ok"},
                {"role": "user", "content": "hi"},
            ]})
        assert status in (200, 400)  # dict arguments: reject or tolerate,
        # but never a dropped connection / 500
        if status == 400:
            assert json.loads(body)["error"]["type"] == "invalid_request_error"

    def test_tool_call_missing_function(self, server):
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [
                {"role": "assistant", "tool_calls": [{"id": "c1"}]},
                {"role": "user", "content": "hi"},
            ]})
        assert status == 400

    def test_max_tokens_zero_yields_zero_tokens(self, server):
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "count to ten"}],
            "max_tokens": 0,
        })
        assert status == 200
        out = json.loads(body)
        assert out["usage"]["completion_tokens"] == 0
        assert out["choices"][0]["message"]["content"] == ""
