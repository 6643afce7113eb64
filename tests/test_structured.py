"""Structured output (grammar-constrained decoding, `serve/structured.py`).

Covers the whole stack: regex → byte DFA, JSON schema → regex, the
token-level grammar lift (mask / transition tables, EOS-as-accept,
dead-end detection), the batcher-side GrammarSlots registry, constrained
decoding end-to-end in the continuous batcher (mixed with free slots), the
serialized generate_stream path, and the OpenAI `response_format` surface.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
from vis_zephyr_tpu.serve.structured import (
    GrammarSlots,
    TokenGrammar,
    compile_regex,
    schema_to_regex,
    token_strings_from_tokenizer,
)

VOCAB = 512
EOS = 2


def char_token_strings(vocab_size: int = VOCAB):
    """Vocab where ids 10..104 are printable ASCII chars; everything else
    contributes no text (and is therefore never legal under a grammar)."""
    out = [""] * vocab_size
    for i in range(95):
        out[10 + i] = chr(32 + i)
    return out


def detok(tokens, strings=None):
    strings = strings or char_token_strings()
    return "".join(strings[t] for t in tokens)


class CharTokenizer:
    """HF-ish single-character tokenizer (convert_ids_to_tokens surface)
    matching `char_token_strings`, for endpoint-level grammar tests."""

    bos_token_id = 1
    eos_token_id = EOS
    pad_token_id = 0
    vocab_size = VOCAB
    model_max_length = 4096

    class _Out:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text, **kwargs):
        ids = [self.bos_token_id]
        for ch in text:
            o = ord(ch)
            ids.append(10 + o - 32 if 32 <= o < 127 else 3)
        return self._Out(ids)

    def convert_ids_to_tokens(self, ids):
        toks = []
        for i in ids:
            if i in (0, 1, 2, 3):
                toks.append("<sp>")  # special: contributes no text
            elif 10 <= i < 105:
                toks.append(chr(32 + i - 10))
            else:
                toks.append("<sp>")
        return toks

    def decode(self, ids, skip_special_tokens=False):
        return detok([i for i in ids if 10 <= i < 105])


# ---------------------------------------------------------------------------
# Regex → byte DFA
# ---------------------------------------------------------------------------


class TestCompileRegex:
    @pytest.mark.parametrize("pattern,ok,bad", [
        ("abc", ["abc"], ["ab", "abcd", ""]),
        ("a|bc", ["a", "bc"], ["b", "abc"]),
        ("a*", ["", "a", "aaaa"], ["b", "ab"]),
        ("a+b?", ["a", "ab", "aaab"], ["", "b", "abb"]),
        ("[0-9]{2,3}", ["12", "123"], ["1", "1234", "ab"]),
        ("[a-c]+|x", ["abc", "ccc", "x"], ["xd", "abx"]),
        ("[^0-9]", ["a", "!"], ["5", "ab"]),
        ("(ab)+c", ["abc", "ababc"], ["ac", "abab"]),
        ("a{3}", ["aaa"], ["aa", "aaaa"]),
        ("a{2,}", ["aa", "aaaaa"], ["a"]),
        (r"\d+\.\d+", ["3.14", "0.5"], ["3.", ".5", "3"]),
        (r"\w+", ["abc_9", "Z"], ["a b", ""]),
        (r"\\n", ["\\n"], ["\n"]),
        (r"\x41+", ["A", "AA"], ["B"]),
        ("(yes|no)( (yes|no))*", ["yes", "no yes no"], ["yes  no", " yes"]),
    ])
    def test_match_behavior(self, pattern, ok, bad):
        dfa = compile_regex(pattern)
        for s in ok:
            assert dfa.matches(s), (pattern, s)
        for s in bad:
            assert not dfa.matches(s), (pattern, s)

    def test_dot_excludes_newline(self):
        dfa = compile_regex("a.c")
        assert dfa.matches("abc") and dfa.matches("a c")
        assert not dfa.matches("a\nc")

    def test_errors(self):
        for bad in ["(ab", "a)", "*a", "[ab", "a{2"]:
            with pytest.raises(ValueError):
                compile_regex(bad)


# ---------------------------------------------------------------------------
# JSON schema → regex
# ---------------------------------------------------------------------------


class TestSchemaToRegex:
    def _accepts(self, schema, doc) -> bool:
        return compile_regex(schema_to_regex(schema)).matches(doc)

    @pytest.mark.parametrize("schema,ok,bad", [
        ({"type": "integer"}, ["0", "42", "-7"], ["007", "1.5", ""]),
        ({"type": "number"}, ["3.14", "-2e10", "0"], ["1.", "+1", "e5"]),
        ({"type": "boolean"}, ["true", "false"], ["True", "1"]),
        ({"type": "null"}, ["null"], ["nil", ""]),
        ({"type": "string"}, ['"hi"', '""', '"a\\nb"', '"\\u0041"'],
         ['"unterminated', 'hi', '"bad\\q"']),
        ({"enum": ["a", "b"]}, ['"a"', '"b"'], ['"c"', "a"]),
        ({"const": 5}, ["5"], ["6", '"5"']),
        ({"type": "array", "items": {"type": "integer"}},
         ["[]", "[1]", "[1, 2, 3]"], ["[1,]", "[", "[1 2]"]),
        ({"type": "array", "items": {"type": "boolean"},
          "minItems": 1, "maxItems": 2},
         ["[true]", "[true, false]"], ["[]", "[true, true, false]"]),
        ({"type": "string", "pattern": "[A-Z]{2}"}, ['"AB"'], ['"abc"', 'AB']),
    ])
    def test_scalar_and_array(self, schema, ok, bad):
        for doc in ok:
            assert self._accepts(schema, doc), doc
        for doc in bad:
            assert not self._accepts(schema, doc), doc

    def test_object_required_and_optional(self):
        schema = {
            "type": "object",
            "properties": {
                "name": {"type": "string"},
                "age": {"type": "integer"},
                "vip": {"type": "boolean"},
            },
            "required": ["name"],
        }
        ok = [
            '{"name": "x"}',
            '{"name": "x", "age": 3}',
            '{"name": "x", "vip": true}',
            '{"name": "x", "age": 3, "vip": false}',
            '{ "name": "x" }',
        ]
        bad = [
            "{}",                      # required property missing
            '{"age": 3}',
            '{"age": 3, "name": "x"}',  # declaration order is fixed
            '{"name": "x",}',
        ]
        for doc in ok:
            assert self._accepts(schema, doc), doc
        for doc in bad:
            assert not self._accepts(schema, doc), doc

    def test_object_all_optional_allows_empty(self):
        schema = {"type": "object",
                  "properties": {"a": {"type": "integer"}},
                  "required": []}
        assert self._accepts(schema, "{}")
        assert self._accepts(schema, '{"a": 1}')

    def test_conforming_docs_round_trip_json(self):
        """Anything the grammar accepts for this schema must parse as JSON
        conforming to it (soundness on a sample of accepted strings)."""
        schema = {
            "type": "object",
            "properties": {
                "tags": {"type": "array", "items": {"enum": ["x", "y"]},
                         "maxItems": 3},
                "n": {"type": "integer"},
            },
        }
        dfa = compile_regex(schema_to_regex(schema))
        for doc in ['{"tags": ["x"], "n": 0}',
                    '{"tags": ["x", "y", "y"], "n": -12}',
                    '{"tags": [], "n": 4}']:
            assert dfa.matches(doc)
            parsed = json.loads(doc)
            assert set(parsed) == {"tags", "n"}

    def test_free_form_objects_rejected(self):
        with pytest.raises(ValueError):
            schema_to_regex({"type": "object"})
        with pytest.raises(ValueError):
            schema_to_regex({"type": "whatever"})

    def test_nested_object(self):
        schema = {
            "type": "object",
            "properties": {
                "point": {"type": "object",
                          "properties": {"x": {"type": "integer"},
                                         "y": {"type": "integer"}}},
            },
        }
        assert self._accepts(schema, '{"point": {"x": 1, "y": -2}}')
        assert not self._accepts(schema, '{"point": {"x": 1}}')


# ---------------------------------------------------------------------------
# Token-level grammar
# ---------------------------------------------------------------------------


class TestTokenGrammar:
    def test_mask_and_transitions(self):
        g = TokenGrammar.from_regex("ab+", char_token_strings(), EOS)
        a_id, b_id = 10 + ord("a") - 32, 10 + ord("b") - 32
        # State 0: only 'a' legal, EOS illegal (not accepting).
        assert g.mask[0, a_id] and not g.mask[0, b_id]
        assert not g.mask[0, EOS]
        s1 = g.advance(0, a_id)
        assert s1 >= 0 and g.mask[s1, b_id] and not g.mask[s1, EOS]
        s2 = g.advance(s1, b_id)
        assert g.mask[s2, EOS]          # "ab" accepts → EOS legal
        assert g.mask[s2, b_id]          # more b's also legal
        # EOS self-loops on accepting states (host stops there anyway).
        assert g.advance(s2, EOS) == s2

    def test_zero_length_tokens_never_legal(self):
        g = TokenGrammar.from_regex("[ -~]*", char_token_strings(), EOS)
        strings = char_token_strings()
        empty = [i for i, s in enumerate(strings) if not s and i != EOS]
        assert not g.mask[0, empty].any()

    def test_multi_char_tokens(self):
        strings = [""] * 16
        strings[5], strings[6], strings[7] = "ab", "c", "abc"
        g = TokenGrammar.from_regex("abc", strings, eos_token_id=2)
        assert g.mask[0, 5] and g.mask[0, 7] and not g.mask[0, 6]
        s = g.advance(0, 5)              # consumed "ab"
        assert g.mask[s, 6] and not g.mask[s, 5]
        assert g.mask[g.advance(s, 6), 2]  # EOS after "abc"
        assert g.mask[g.advance(0, 7), 2]

    def test_undecodable_grammar_rejected(self):
        # Pattern needs a 'Z' but the vocabulary has no token containing it.
        strings = [""] * 8
        strings[4] = "a"
        with pytest.raises(ValueError, match="not decodable"):
            TokenGrammar.from_regex("aZ", strings, eos_token_id=2)

    def test_dead_branch_trimmed_not_fatal(self):
        """A token that strands the decode (its target can't reach accept
        through whole tokens) is masked out, but decodable paths survive —
        word-level vocab: "w1" must be illegal for w1(0|7) while "w10"
        completes directly."""
        strings = [""] * 8
        strings[4], strings[5], strings[6] = "w1", "w10", "w17"
        g = TokenGrammar.from_regex("w1(0|7)", strings, eos_token_id=2)
        assert not g.mask[0, 4]          # "w1" leads to a stranded state
        assert g.mask[0, 5] and g.mask[0, 6]
        assert g.mask[g.advance(0, 5), 2]  # EOS after "w10"

    def test_free_state_row_all_true(self):
        g = TokenGrammar.from_regex("a", char_token_strings(), EOS)
        assert g.mask[g.free_state].all()

    def test_token_strings_from_hf_conventions(self):
        class Conv:
            vocab_size = 5

            def convert_ids_to_tokens(self, ids):
                return ["<s>", "▁the", "<0x41>", "x", None][: len(ids)]

        out = token_strings_from_tokenizer(Conv())
        assert out == [b"", b" the", b"A", b"x", b""]

    def test_byte_fallback_token_is_one_raw_byte(self):
        """<0xC3> IS byte 0xC3 — as a str it would re-encode to TWO UTF-8
        bytes and the token-level DFA walk would follow the wrong path."""

        class Conv:
            vocab_size = 3

            def convert_ids_to_tokens(self, ids):
                return ["<0xC3>", "<0xA9>", "</s>"][: len(ids)]

        out = token_strings_from_tokenizer(Conv())
        assert out == [b"\xc3", b"\xa9", b""]
        # 'é' (U+00E9, UTF-8 c3 a9) spelled via byte-fallback tokens:
        g = TokenGrammar.from_regex("é", out, eos_token_id=2)
        s = g.advance(0, 0)
        assert s >= 0 and not g.dfa.accept[s]
        s = g.advance(s, 1)
        assert g.mask[s, 2]  # EOS legal: full character consumed


class TestGrammarSlots:
    def test_operand_rows_and_rebuild(self):
        strings = char_token_strings()
        ga = TokenGrammar.from_regex("a+", strings, EOS)
        gb = TokenGrammar.from_regex("[0-9]{2}", strings, EOS)
        slots = GrammarSlots(max_slots=4, vocab_size=VOCAB)
        assert slots.operand() is None          # nothing constrained
        slots.attach(0, ga)
        slots.attach(2, gb)
        table, rows = slots.operand()
        rows = np.asarray(rows)
        table = np.asarray(table)
        # Free slots point at the all-True final row.
        assert table[rows[1]].all() and table[rows[3]].all()
        # Constrained rows reproduce each grammar's start mask.
        np.testing.assert_array_equal(table[rows[0]], ga.mask[0])
        np.testing.assert_array_equal(table[rows[2]], gb.mask[0])
        # Advancing a slot moves its row within the same table.
        d5 = 10 + ord("5") - 32
        slots.advance(2, d5)
        _, rows2 = slots.operand()
        np.testing.assert_array_equal(
            np.asarray(table)[np.asarray(rows2)[2]], gb.mask[gb.advance(0, d5)])
        # Releasing the last grammar collapses the operand to None.
        slots.release(0)
        slots.release(2)
        assert slots.operand() is None

    def test_desync_raises(self):
        g = TokenGrammar.from_regex("a", char_token_strings(), EOS)
        slots = GrammarSlots(2, VOCAB)
        slots.attach(0, g)
        with pytest.raises(RuntimeError, match="desync"):
            slots.advance(0, 10 + ord("z") - 32)


# ---------------------------------------------------------------------------
# End-to-end constrained decoding
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config(vocab_size=VOCAB)
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _drain(req):
    out = []
    while True:
        t = req.out.get(timeout=60)
        if t is None:
            return out
        out.append(t)


class TestConstrainedBatching:
    def test_batcher_outputs_match_grammar(self, tiny_model):
        from vis_zephyr_tpu.serve.batching import ContinuousBatcher
        from vis_zephyr_tpu.serve.generate import SamplingConfig

        cfg, params = tiny_model
        strings = char_token_strings()
        sampling = SamplingConfig(max_new_tokens=16, temperature=0.0,
                                  eos_token_id=EOS)
        b = ContinuousBatcher(params, cfg, max_slots=4, cache_len=128,
                              sampling=sampling)
        ga = TokenGrammar.from_regex("[ab]{4}", strings, EOS)
        gb = TokenGrammar.from_regex("-?[0-9]{2}", strings, EOS)
        ids = np.asarray([1, 17, 23, 42], np.int64)
        free = b.submit(ids)
        ra = b.submit(ids, grammar=ga)
        rb = b.submit(ids, grammar=gb)
        b.run_until_drained()
        ta, tb, tf = _drain(ra), _drain(rb), _drain(free)
        assert ga.dfa.matches(detok(ta)), detok(ta)
        assert gb.dfa.matches(detok(tb)), detok(tb)
        # Bounded grammars MUST terminate via EOS before the budget.
        assert len(ta) == 4 and len(tb) <= 3
        # The free slot decoded the full budget alongside them, unmasked.
        assert len(tf) == 16 or EOS not in tf

    def test_constrained_slot_does_not_perturb_free_slot(self, tiny_model):
        from vis_zephyr_tpu.serve.batching import ContinuousBatcher
        from vis_zephyr_tpu.serve.generate import SamplingConfig

        cfg, params = tiny_model
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0,
                                  eos_token_id=-1)
        ids = np.asarray([1, 17, 23, 42], np.int64)
        ref = ContinuousBatcher(params, cfg, max_slots=4, cache_len=128,
                                sampling=sampling)
        expected = _drain_run(ref, ids)
        mixed = ContinuousBatcher(params, cfg, max_slots=4, cache_len=128,
                                  sampling=sampling)
        g = TokenGrammar.from_regex("[0-9]+", char_token_strings(), EOS)
        free = mixed.submit(ids)
        mixed.submit(ids, grammar=g)
        mixed.run_until_drained()
        assert _drain(free) == expected

    def test_paged_batcher_grammar(self, tiny_model):
        from vis_zephyr_tpu.serve.generate import SamplingConfig
        from vis_zephyr_tpu.serve.paged import PagedBatcher

        cfg, params = tiny_model
        sampling = SamplingConfig(max_new_tokens=16, temperature=0.0,
                                  eos_token_id=EOS)
        b = PagedBatcher(params, cfg, max_slots=4, cache_len=128,
                         sampling=sampling, page_size=16)
        g = TokenGrammar.from_regex('\\{"k": [0-9]\\}', char_token_strings(),
                                    EOS)
        req = b.submit(np.asarray([1, 17, 23, 42], np.int64), grammar=g)
        b.run_until_drained()
        text = detok(_drain(req))
        assert g.dfa.matches(text), text
        parsed = json.loads(text)
        assert set(parsed) == {"k"}

    def test_speculative_batcher_rejects_grammar(self, tiny_model):
        from vis_zephyr_tpu.serve.batching import ContinuousBatcher
        from vis_zephyr_tpu.serve.generate import SamplingConfig

        cfg, params = tiny_model
        sampling = SamplingConfig(max_new_tokens=4, temperature=0.0,
                                  eos_token_id=EOS)
        b = ContinuousBatcher(params, cfg, max_slots=2, cache_len=128,
                              sampling=sampling, lookahead=2)
        g = TokenGrammar.from_regex("a", char_token_strings(), EOS)
        with pytest.raises(ValueError, match="speculative"):
            b.submit(np.asarray([1, 17], np.int64), grammar=g)

    def test_serialized_generate_stream_grammar(self, tiny_model):
        from vis_zephyr_tpu.serve.generate import (SamplingConfig,
                                                   generate_stream)

        cfg, params = tiny_model
        g = TokenGrammar.from_regex("(true|false)", char_token_strings(), EOS)
        sampling = SamplingConfig(max_new_tokens=8, temperature=0.0,
                                  eos_token_id=EOS)
        toks = list(generate_stream(
            params, jnp.asarray([[1, 17, 23]]), None, None, cfg, sampling,
            grammar=g))
        assert detok(toks) in ("true", "false")


def _drain_run(batcher, ids):
    req = batcher.submit(ids)
    batcher.run_until_drained()
    return _drain(req)


# ---------------------------------------------------------------------------
# OpenAI response_format surface
# ---------------------------------------------------------------------------


class TestResponseFormatEndpoint:
    @pytest.fixture(scope="class")
    def server(self):
        from vis_zephyr_tpu.serve.api import serve
        from vis_zephyr_tpu.serve.engine import ChatEngine

        cfg = tiny_config(vocab_size=VOCAB)
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
        engine = ChatEngine(params, cfg, CharTokenizer(), max_new_tokens=24,
                            temperature=0.0, continuous_batching=True,
                            max_slots=4)
        srv = serve(engine, host="127.0.0.1", port=0)
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()

    def _post(self, base, payload):
        req = urllib.request.Request(
            base + "/v1/chat/completions", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=120) as resp:
                return resp.status, resp.read().decode()
        except urllib.error.HTTPError as e:
            return e.code, e.read().decode()

    def test_regex_response_format(self, server):
        status, body = self._post(server, {
            "messages": [{"role": "user", "content": "pick"}],
            "response_format": {"type": "regex", "regex": "(yes|no)"},
        })
        assert status == 200
        out = json.loads(body)["choices"][0]
        assert out["message"]["content"] in ("yes", "no")
        assert out["finish_reason"] == "stop"

    def test_json_schema_response_format(self, server):
        status, body = self._post(server, {
            "messages": [{"role": "user", "content": "emit json"}],
            "response_format": {"type": "json_schema", "json_schema": {
                "name": "ans",
                "schema": {"type": "object",
                           "properties": {"ok": {"type": "boolean"}}},
            }},
        })
        assert status == 200
        text = json.loads(body)["choices"][0]["message"]["content"]
        assert json.loads(text)["ok"] in (True, False)

    def test_json_object_rejected(self, server):
        status, body = self._post(server, {
            "messages": [{"role": "user", "content": "x"}],
            "response_format": {"type": "json_object"},
        })
        assert status == 400
        assert "json_schema" in json.loads(body)["error"]["message"]

    TOOLS = [
        {"type": "function", "function": {
            "name": "get_weather",
            "description": "Weather for a city",
            "parameters": {"type": "object",
                           "properties": {"city": {"enum": ["Paris", "Tokyo"]}}},
        }},
        {"type": "function", "function": {
            "name": "noop",
            "parameters": {},
        }},
    ]

    def test_forced_tool_call(self, server):
        status, body = self._post(server, {
            "messages": [{"role": "user", "content": "weather please"}],
            "tools": self.TOOLS,
            "tool_choice": "required",
            "max_tokens": 96,
        })
        assert status == 200
        choice = json.loads(body)["choices"][0]
        assert choice["finish_reason"] == "tool_calls"
        msg = choice["message"]
        assert msg["content"] is None
        call = msg["tool_calls"][0]
        assert call["type"] == "function"
        assert call["id"].startswith("call_")
        assert call["function"]["name"] in ("get_weather", "noop")
        args = json.loads(call["function"]["arguments"])
        if call["function"]["name"] == "get_weather":
            assert set(args) <= {"city"}
            if "city" in args:
                assert args["city"] in ("Paris", "Tokyo")
        else:
            assert args == {}

    def test_named_tool_choice(self, server):
        status, body = self._post(server, {
            "messages": [{"role": "user", "content": "call noop"}],
            "tools": self.TOOLS,
            "tool_choice": {"type": "function", "function": {"name": "noop"}},
            "max_tokens": 96,
        })
        assert status == 200
        call = json.loads(body)["choices"][0]["message"]["tool_calls"][0]
        assert call["function"]["name"] == "noop"
        assert json.loads(call["function"]["arguments"]) == {}

    def test_tool_choice_none_is_plain_chat(self, server):
        status, body = self._post(server, {
            "messages": [{"role": "user", "content": "just chat"}],
            "tools": self.TOOLS,
            "tool_choice": "none",
            "max_tokens": 4,
        })
        assert status == 200
        msg = json.loads(body)["choices"][0]["message"]
        assert "tool_calls" not in msg

    def test_unknown_named_tool_rejected(self, server):
        status, body = self._post(server, {
            "messages": [{"role": "user", "content": "x"}],
            "tools": self.TOOLS,
            "tool_choice": {"type": "function",
                            "function": {"name": "missing"}},
        })
        assert status == 400
        assert "unknown function" in json.loads(body)["error"]["message"]

    def test_forced_tool_call_streaming(self, server):
        status, body = self._post(server, {
            "messages": [{"role": "user", "content": "stream a call"}],
            "tools": self.TOOLS,
            "tool_choice": "required",
            "stream": True,
            "max_tokens": 96,
        })
        assert status == 200
        events = [json.loads(line[len("data: "):])
                  for line in body.splitlines()
                  if line.startswith("data: ") and line != "data: [DONE]"]
        call_events = [e for e in events
                       if e["choices"]
                       and e["choices"][0]["delta"].get("tool_calls")]
        assert len(call_events) == 1
        call = call_events[0]["choices"][0]["delta"]["tool_calls"][0]
        assert call["index"] == 0 and call["function"]["name"]
        finishes = [e["choices"][0]["finish_reason"] for e in events
                    if e["choices"] and e["choices"][0]["finish_reason"]]
        assert finishes == ["tool_calls"]

    def test_auto_mode_skips_grammar_compile(self, server):
        """tool_choice auto never compiles the call grammar, so tools whose
        call JSON the vocabulary can't express still serve plain chat."""
        status, body = self._post(server, {
            "messages": [{"role": "user", "content": "maybe call"}],
            "tools": [{"type": "function", "function": {
                "name": "needs_unicode",
                "parameters": {"type": "object", "properties": {
                    "x": {"enum": ["éé"]}}},  # no é token exists
            }}],
            "max_tokens": 4,
        })
        assert status == 200
        assert "content" in json.loads(body)["choices"][0]["message"]

    def test_tool_turns_render(self):
        from vis_zephyr_tpu.serve.openai_api import render_chat_prompt

        prompt, _ = render_chat_prompt(
            [
                {"role": "user", "content": "weather?"},
                {"role": "assistant", "content": None, "tool_calls": [
                    {"id": "call_1", "type": "function", "function": {
                        "name": "get_weather",
                        "arguments": '{"city": "Paris"}'}}]},
                {"role": "tool", "name": "get_weather",
                 "tool_call_id": "call_1", "content": "sunny, 21C"},
            ],
            "zephyr_v1", tools=self.TOOLS,
        )
        assert '{"name": "get_weather", "arguments": {"city": "Paris"}}' in prompt
        assert "[tool result get_weather] sunny, 21C" in prompt
        assert "You can call these functions" in prompt

    def test_streaming_with_grammar(self, server):
        status, body = self._post(server, {
            "messages": [{"role": "user", "content": "pick"}],
            "response_format": {"type": "regex", "regex": "[0-9]{3}"},
            "stream": True,
        })
        assert status == 200
        events = [json.loads(line[len("data: "):])
                  for line in body.splitlines()
                  if line.startswith("data: ") and line != "data: [DONE]"]
        text = "".join(e["choices"][0]["delta"].get("content", "")
                       for e in events if e["choices"])
        assert len(text) == 3 and text.isdigit()


class TestGrammarHardening:
    """Round-3 review regressions: non-ASCII byte sequences, hostile
    repetition bounds, degenerate array bounds."""

    def test_non_ascii_literal_matches_character_not_lone_bytes(self):
        dfa = compile_regex("é")
        assert dfa.matches("é")
        assert not dfa.matches(b"\xc3")       # lone lead byte
        assert not dfa.matches(b"\xa9")       # lone continuation byte

    def test_non_ascii_in_char_class_rejected(self):
        with pytest.raises(ValueError):
            compile_regex("[é]")

    def test_hostile_repetition_bound_rejected_fast(self):
        with pytest.raises(ValueError):
            compile_regex("a{0,999999999}")
        with pytest.raises(ValueError):
            compile_regex("a{5,2}")

    def test_nested_repetition_hits_state_budget(self):
        with pytest.raises(ValueError):
            compile_regex("(((a{1000}){1000}){1000})")

    def test_max_items_zero_admits_only_empty_array(self):
        pat = schema_to_regex({"type": "array",
                               "items": {"type": "integer"},
                               "maxItems": 0})
        dfa = compile_regex(pat)
        assert dfa.matches("[]")
        assert not dfa.matches("[1]")

    def test_max_items_below_min_items_rejected(self):
        with pytest.raises(ValueError):
            schema_to_regex({"type": "array", "items": {"type": "integer"},
                             "minItems": 2, "maxItems": 1})
