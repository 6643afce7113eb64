"""Structured output: grammar-constrained decoding (regex / JSON schema).

Net-new serving surface (no reference equivalent; the reference free-forms
every reply). An OpenAI-style ``response_format`` compiles to a byte-level
DFA, the DFA lifts to a token-level transition table over the tokenizer
vocabulary, and decoding masks every step's logits to the tokens that keep
the output inside the grammar — the output is guaranteed to match (e.g.
valid JSON for the given schema) without any retry loop.

TPU-first split of the work:
- compile time (host, once per grammar, cached): regex → NFA → DFA over
  bytes, then a vectorized numpy walk of every vocab token's bytes through
  the DFA → ``token_trans [S, V]`` and the boolean ``mask [S+1, V]``;
- decode time (device): the jitted step gathers one mask row per slot
  (``mask[slot_state]``) and adds it to the logits before sampling — a
  [B, V] gather+where fused into the sampling epilogue, nothing
  data-dependent;
- between steps (host): the scheduler advances each constrained slot's
  state with one ``token_trans[state, token]`` lookup.

The mask table's LAST row is all-True: unconstrained slots point at it, so
one program serves a batch mixing constrained and free requests.

EOS is part of the grammar: its mask column is the DFA's accept flag, so
generation can only stop on a complete match (and MUST stop when a state
allows nothing else).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Regex parsing (byte-level subset: literals, escapes, ., classes, groups,
# alternation, * + ? {m} {m,} {m,n})
# ---------------------------------------------------------------------------

_CLS_ESCAPES = {
    "d": "0123456789",
    "w": "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_",
    "s": " \t\n\r\f\v",
}
_CHAR_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "f": "\f", "v": "\v", "0": "\0"}


def _escape_set(ch: str) -> Optional[set]:
    if ch in _CLS_ESCAPES:
        return {ord(c) for c in _CLS_ESCAPES[ch]}
    if ch in ("D", "W", "S"):
        return set(range(256)) - {ord(c) for c in _CLS_ESCAPES[ch.lower()]}
    return None


class _Parser:
    """Recursive-descent regex → AST. Nodes:
    ("lit", set[int]) | ("cat", [n...]) | ("alt", [n...]) |
    ("star", n) | ("plus", n) | ("opt", n) | ("rep", n, lo, hi|None)."""

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def parse(self):
        node = self._alt()
        if self.i != len(self.p):
            raise ValueError(f"regex: unexpected {self.p[self.i]!r} at {self.i}")
        return node

    def _peek(self) -> str:
        return self.p[self.i] if self.i < len(self.p) else ""

    def _alt(self):
        branches = [self._cat()]
        while self._peek() == "|":
            self.i += 1
            branches.append(self._cat())
        return branches[0] if len(branches) == 1 else ("alt", branches)

    def _cat(self):
        parts = []
        while self._peek() not in ("", "|", ")"):
            parts.append(self._quant())
        if not parts:
            return ("cat", [])  # empty branch (matches "")
        return parts[0] if len(parts) == 1 else ("cat", parts)

    def _quant(self):
        node = self._atom()
        while True:
            ch = self._peek()
            if ch == "*":
                self.i += 1
                node = ("star", node)
            elif ch == "+":
                self.i += 1
                node = ("plus", node)
            elif ch == "?":
                self.i += 1
                node = ("opt", node)
            elif ch == "{":
                j = self.p.find("}", self.i)
                if j < 0:
                    raise ValueError("regex: unterminated {")
                body = self.p[self.i + 1 : j]
                self.i = j + 1
                if "," in body:
                    lo_s, hi_s = body.split(",", 1)
                    lo = int(lo_s or 0)
                    hi = int(hi_s) if hi_s.strip() else None
                else:
                    lo = hi = int(body)
                if lo < 0 or (hi is not None and hi < lo):
                    raise ValueError(f"regex: bad repetition {{{body}}}")
                # Bounded repetition expands to lo+(hi-lo) concatenated NFA
                # fragments; grammars arrive from unauthenticated requests,
                # so cap the expansion (the NFA state budget in new_state
                # backstops nesting).
                if max(lo, hi or 0) > _MAX_REPETITION:
                    raise ValueError(
                        f"regex: repetition bound over {_MAX_REPETITION}")
                node = ("rep", node, lo, hi)
            else:
                return node

    def _atom(self):
        ch = self._peek()
        if ch == "(":
            self.i += 1
            if self.p[self.i : self.i + 2] == "?:":  # non-capturing marker
                self.i += 2
            node = self._alt()
            if self._peek() != ")":
                raise ValueError("regex: unbalanced (")
            self.i += 1
            return node
        if ch == "[":
            return self._char_class()
        if ch == ".":
            self.i += 1
            return ("lit", set(range(256)) - {ord("\n")})
        if ch == "\\":
            self.i += 1
            group = _escape_set(self._peek())
            if group is not None:
                self.i += 1
                return ("lit", group)
            return ("lit", {self._escape_char()})
        if ch in ("*", "+", "?", "{"):
            raise ValueError(f"regex: dangling quantifier at {self.i}")
        self.i += 1
        if ord(ch) > 127:
            # A non-ASCII character is a SEQUENCE of UTF-8 bytes, not an
            # alternation over them (a one-byte set would admit lone
            # continuation bytes and reject the actual character).
            return ("cat", [("lit", {b}) for b in ch.encode("utf-8")])
        return ("lit", {ord(ch)})

    def _escape_char(self) -> int:
        """After a backslash: consume one escaped character (incl. \\xNN),
        returning its byte value."""
        esc = self._peek()
        self.i += 1
        if esc == "x":
            code = int(self.p[self.i : self.i + 2], 16)
            self.i += 2
            return code
        code = ord(_CHAR_ESCAPES.get(esc, esc))
        if code > 127:
            raise ValueError(
                "regex: non-ASCII escape is not a single byte; use \\xNN "
                "byte escapes (UTF-8) instead")
        return code

    def _char_class(self):
        assert self._peek() == "["
        self.i += 1
        negate = self._peek() == "^"
        if negate:
            self.i += 1
        chars: set = set()
        first = True
        while True:
            ch = self._peek()
            if ch == "":
                raise ValueError("regex: unterminated [")
            if ch == "]" and not first:
                self.i += 1
                break
            first = False
            if ch == "\\":
                self.i += 1
                group = _escape_set(self._peek())
                if group is not None:
                    self.i += 1
                    chars |= group
                    continue
                lo = self._escape_char()
            else:
                self.i += 1
                lo = ord(ch)
                if lo > 127:
                    # Inside a class a member must be ONE byte; a multi-byte
                    # UTF-8 character cannot be (write it outside the class,
                    # or as \xNN byte escapes).
                    raise ValueError(
                        "regex: non-ASCII character in a character class; "
                        "use \\xNN byte escapes (UTF-8) instead")
            if self._peek() == "-" and self.p[self.i + 1 : self.i + 2] not in ("]", ""):
                self.i += 1
                if self._peek() == "\\":
                    self.i += 1
                    hi = self._escape_char()
                else:
                    hi = ord(self._peek())
                    self.i += 1
                    if hi > 127:
                        raise ValueError(
                            "regex: non-ASCII character in a character "
                            "class; use \\xNN byte escapes (UTF-8) instead")
                chars |= set(range(lo, hi + 1))
            else:
                chars.add(lo)
        if negate:
            chars = set(range(256)) - chars
        return ("lit", chars)


# ---------------------------------------------------------------------------
# Thompson NFA → subset-construction DFA
# ---------------------------------------------------------------------------


# Resource caps: grammars arrive from unauthenticated requests, and both
# constructions can explode (nested bounded repetition for the NFA, subset
# construction for the DFA). Exceeding a cap is a ValueError — the serving
# layers turn that into a 400, never an OOM. The token mask is [S+1, V]
# bool, so _MAX_DFA_STATES=4096 bounds it at ~128 MB for a 32K vocab.
_MAX_REPETITION = 1024
_MAX_NFA_STATES = 100_000
_MAX_DFA_STATES = 4096


class _NFA:
    def __init__(self):
        self.eps: List[List[int]] = []
        self.edges: List[Dict[int, List[int]]] = []  # state → byte → targets

    def new_state(self) -> int:
        if len(self.eps) >= _MAX_NFA_STATES:
            raise ValueError(
                f"regex too large (over {_MAX_NFA_STATES} NFA states)")
        self.eps.append([])
        self.edges.append({})
        return len(self.eps) - 1

    def add_eps(self, a: int, b: int) -> None:
        self.eps[a].append(b)

    def add_edge(self, a: int, bytes_: set, b: int) -> None:
        for byte in bytes_:
            self.edges[a].setdefault(byte, []).append(b)


def _build_nfa(node, nfa: _NFA) -> Tuple[int, int]:
    """AST node → (start, end) NFA fragment."""
    kind = node[0]
    if kind == "lit":
        s, e = nfa.new_state(), nfa.new_state()
        nfa.add_edge(s, node[1], e)
        return s, e
    if kind == "cat":
        if not node[1]:
            s = nfa.new_state()
            return s, s
        s, e = _build_nfa(node[1][0], nfa)
        for sub in node[1][1:]:
            s2, e2 = _build_nfa(sub, nfa)
            nfa.add_eps(e, s2)
            e = e2
        return s, e
    if kind == "alt":
        s, e = nfa.new_state(), nfa.new_state()
        for sub in node[1]:
            s2, e2 = _build_nfa(sub, nfa)
            nfa.add_eps(s, s2)
            nfa.add_eps(e2, e)
        return s, e
    if kind == "star":
        s, e = nfa.new_state(), nfa.new_state()
        s2, e2 = _build_nfa(node[1], nfa)
        nfa.add_eps(s, s2)
        nfa.add_eps(s, e)
        nfa.add_eps(e2, s2)
        nfa.add_eps(e2, e)
        return s, e
    if kind == "plus":
        return _build_nfa(("cat", [node[1], ("star", node[1])]), nfa)
    if kind == "opt":
        return _build_nfa(("alt", [node[1], ("cat", [])]), nfa)
    if kind == "rep":
        _, sub, lo, hi = node
        parts = [sub] * lo
        if hi is None:
            parts.append(("star", sub))
        else:
            parts.extend([("opt", sub)] * (hi - lo))
        return _build_nfa(("cat", parts), nfa)
    raise ValueError(f"unknown node {kind}")


@dataclasses.dataclass
class ByteDFA:
    """Deterministic automaton over bytes: `trans [S, 256]` (−1 = reject),
    `accept [S]`, start state 0."""

    trans: np.ndarray
    accept: np.ndarray

    @property
    def n_states(self) -> int:
        return self.trans.shape[0]

    def matches(self, text) -> bool:
        state = 0
        for b in text.encode("utf-8") if isinstance(text, str) else text:
            state = int(self.trans[state, b])
            if state < 0:
                return False
        return bool(self.accept[state])


def compile_regex(pattern: str) -> ByteDFA:
    """Full-match regex → byte DFA (subset construction)."""
    nfa = _NFA()
    start, end = _build_nfa(_Parser(pattern).parse(), nfa)

    def closure(states: frozenset) -> frozenset:
        stack, seen = list(states), set(states)
        while stack:
            s = stack.pop()
            for t in nfa.eps[s]:
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        return frozenset(seen)

    start_set = closure(frozenset([start]))
    dfa_ids: Dict[frozenset, int] = {start_set: 0}
    order = [start_set]
    trans_rows: List[np.ndarray] = []
    i = 0
    while i < len(order):
        cur = order[i]
        row = np.full(256, -1, np.int32)
        by_byte: Dict[int, set] = {}
        for s in cur:
            for byte, targets in nfa.edges[s].items():
                by_byte.setdefault(byte, set()).update(targets)
        for byte, targets in by_byte.items():
            nxt = closure(frozenset(targets))
            if nxt not in dfa_ids:
                if len(order) >= _MAX_DFA_STATES:
                    raise ValueError(
                        f"regex too large (over {_MAX_DFA_STATES} DFA "
                        "states)")
                dfa_ids[nxt] = len(order)
                order.append(nxt)
            row[byte] = dfa_ids[nxt]
        trans_rows.append(row)
        i += 1
    trans = np.stack(trans_rows)
    accept = np.asarray([end in s for s in order])
    return ByteDFA(trans=trans, accept=accept)


# ---------------------------------------------------------------------------
# Token-level grammar (DFA lifted over the tokenizer vocabulary)
# ---------------------------------------------------------------------------


def token_strings_from_tokenizer(tokenizer, vocab_size: Optional[int] = None
                                 ) -> List[bytes]:
    """RAW BYTES each vocab id contributes to the decoded text.

    HF sentencepiece-style tokenizers: `convert_ids_to_tokens` with the
    ``▁``→space and ``<0xNN>``→byte conventions. Fallback (test/mock
    tokenizers): per-id `decode`. Bytes, not str: a byte-fallback token
    ``<0xC3>`` IS the single byte 0xC3 — as a str it would re-encode to two
    UTF-8 bytes and walk the wrong sequence through the byte DFA."""
    V = vocab_size or getattr(tokenizer, "vocab_size", None) or len(
        tokenizer.get_vocab())
    conv = getattr(tokenizer, "convert_ids_to_tokens", None)
    out: List[bytes] = []
    if conv is not None:
        toks = conv(list(range(V)))
        for t in toks:
            if t is None:
                out.append(b"")
            elif len(t) == 6 and t.startswith("<0x") and t.endswith(">"):
                out.append(bytes([int(t[3:5], 16)]))
            elif t.startswith("<") and t.endswith(">"):
                out.append(b"")  # special tokens contribute no text
            else:
                out.append(t.replace("▁", " ").encode("utf-8"))
        return out
    for i in range(V):
        try:
            out.append(tokenizer.decode([i], skip_special_tokens=True)
                       .encode("utf-8"))
        except Exception:  # noqa: BLE001
            out.append(b"")
    return out


class TokenGrammar:
    """A compiled grammar over a fixed vocabulary.

    - ``mask`` bool [S+1, V]: row s = tokens legal from DFA state s (the
      EOS column is the accept flag); the LAST row is all-True for
      unconstrained slots sharing the batch.
    - ``token_trans`` int32 [S, V]: next DFA state per (state, token).
    - `advance(state, token)` is the host-side per-emission update.
    """

    def __init__(self, dfa: ByteDFA, token_strings: Sequence[str],
                 eos_token_id: int):
        self.dfa = dfa
        self.eos_token_id = eos_token_id
        S = dfa.n_states
        V = len(token_strings)

        # Pack token bytes into a padded matrix for a vectorized DFA walk.
        # token_strings normally arrives as raw bytes (see
        # token_strings_from_tokenizer); str entries are encoded for
        # compatibility with hand-built vocabularies in tests.
        blobs = [t if isinstance(t, bytes) else t.encode("utf-8")
                 for t in token_strings]
        lens = np.asarray([len(b) for b in blobs], np.int32)
        L = max(1, int(lens.max()))
        mat = np.zeros((V, L), np.uint8)
        for i, b in enumerate(blobs):
            if b:
                mat[i, : len(b)] = np.frombuffer(b, np.uint8)

        token_trans = np.empty((S, V), np.int32)
        for s in range(S):
            st = np.full(V, s, np.int32)
            for j in range(L):
                live = (j < lens) & (st >= 0)
                nxt = dfa.trans[np.maximum(st, 0), mat[:, j]]
                st = np.where(live, nxt, st)
            token_trans[s] = st
        # Zero-length tokens advance nothing: emitting them would loop
        # forever inside the grammar, so they are never legal.
        token_trans[:, lens == 0] = -1

        if 0 <= eos_token_id < V:
            token_trans[:, eos_token_id] = np.where(dfa.accept,
                                                    np.arange(S), -1)

        # Trim to co-accessible states: a token whose target can never
        # reach acceptance THROUGH WHOLE TOKENS must itself be illegal
        # (the byte DFA may allow it, but the vocabulary offers no way to
        # finish from there — e.g. a word-level vocab with "w10" but no
        # bare "0" strands "w1"). Fixed point: live(s) ⇐ accept(s) or some
        # token reaches a live state; then drop transitions into non-live
        # states. Standard automaton trimming, lifted to the token level.
        live = dfa.accept.copy()
        while True:
            tgt_live = (token_trans >= 0) & live[np.maximum(token_trans, 0)]
            new_live = live | tgt_live.any(axis=1)
            if (new_live == live).all():
                break
            live = new_live
        token_trans = np.where(
            (token_trans >= 0) & live[np.maximum(token_trans, 0)],
            token_trans, -1)

        mask = np.zeros((S + 1, V), bool)
        mask[:S] = token_trans >= 0
        if 0 <= eos_token_id < V:
            mask[:S, eos_token_id] = dfa.accept
        mask[S] = True  # unconstrained row
        self.token_trans = token_trans
        self.mask = mask

        # Decodability: after trimming, every surviving transition leads
        # to a live state, so mid-decode dead ends are impossible — only
        # an unusable START state remains to check (no conforming output
        # exists in this vocabulary at all).
        if not mask[0].any():
            raise ValueError(
                "grammar is not decodable with this vocabulary: no token "
                "sequence can produce a conforming output")

    @property
    def n_states(self) -> int:
        return self.dfa.n_states

    @property
    def free_state(self) -> int:
        """Index of the all-True mask row (unconstrained slots)."""
        return self.dfa.n_states

    def advance(self, state: int, token: int) -> int:
        return int(self.token_trans[state, token])

    @classmethod
    def from_regex(cls, pattern: str, token_strings: Sequence[str],
                   eos_token_id: int) -> "TokenGrammar":
        return cls(compile_regex(pattern), token_strings, eos_token_id)

    @classmethod
    def from_json_schema(cls, schema: dict, token_strings: Sequence[str],
                         eos_token_id: int) -> "TokenGrammar":
        return cls.from_regex(schema_to_regex(schema), token_strings,
                              eos_token_id)


# ---------------------------------------------------------------------------
# JSON schema → regex
# ---------------------------------------------------------------------------

# One OPTIONAL whitespace char between JSON punctuation, not a Kleene
# star: this grammar shapes what the model may EMIT, and an unbounded
# whitespace loop is a live trap — a greedy step whose argmax lands on
# the space token inside `[ \n\t]*` can repeat it to the token budget
# without ever violating the grammar. Bounding costs no JSON conformance
# (json.dumps spacing fits) and removes the loop.
_WS = "[ \\n\\t]?"
_STRING = '"([^"\\\\\\x00-\\x1f]|\\\\["\\\\/bfnrt]|\\\\u[0-9a-fA-F]{4})*"'
_INTEGER = "-?(0|[1-9][0-9]*)"
_NUMBER = "-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?"


def _regex_escape(text: str) -> str:
    out = []
    for ch in text:
        if ch in r"\.[]{}()*+?|^$/-":
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\t":
            out.append("\\t")
        else:
            out.append(ch)
    return "".join(out)


def schema_to_regex(schema: dict) -> str:
    """JSON schema subset → a full-match regex for conforming documents.

    Supported: object (fixed `properties` in declaration order; properties
    not listed in `required` may be omitted), array (`items`,
    `minItems`/`maxItems`), string (`enum`, `pattern`), integer, number,
    boolean, null, `enum` of scalars, `const`. Free-form nesting
    (`additionalProperties`, unconstrained "type": "object") is rejected —
    a DFA needs a bounded shape."""
    t = schema.get("type")
    if "const" in schema:
        import json as _json

        return _regex_escape(_json.dumps(schema["const"]))
    if "enum" in schema:
        import json as _json

        return "(" + "|".join(
            _regex_escape(_json.dumps(v)) for v in schema["enum"]) + ")"
    if t == "string":
        if "pattern" in schema:
            return '"' + schema["pattern"] + '"'
        return _STRING
    if t == "integer":
        return _INTEGER
    if t == "number":
        return _NUMBER
    if t == "boolean":
        return "(true|false)"
    if t == "null":
        return "null"
    if t == "array":
        item = schema_to_regex(schema.get("items", {"type": "number"}))
        lo = int(schema.get("minItems", 0))
        hi = schema.get("maxItems")
        if lo < 0:
            raise ValueError(f"minItems must be >= 0, got {lo}")
        if hi is not None:
            hi = int(hi)
            if hi < lo:
                raise ValueError(f"maxItems {hi} < minItems {lo}")
            if hi == 0:
                return f"\\[{_WS}\\]"  # only the empty array conforms
        rest = f"({_WS},{_WS}{item})"
        if hi is None:
            body = f"{item}{rest}*" if lo <= 1 else f"{item}{rest}{{{lo - 1},}}"
        else:
            body = f"{item}{rest}{{{max(lo - 1, 0)},{hi - 1}}}"
        if lo == 0:
            return f"\\[{_WS}({body})?{_WS}\\]"
        return f"\\[{_WS}{body}{_WS}\\]"
    if t == "object":
        props = schema.get("properties")
        if not props:
            raise ValueError(
                "structured output requires 'properties' on objects "
                "(free-form objects are not regular)")
        required = set(schema.get("required", list(props)))
        parts = []
        for name, sub in props.items():
            pair = f'"{_regex_escape(name)}"{_WS}:{_WS}{schema_to_regex(sub)}'
            parts.append((pair, name in required))
        # Fixed declaration order; optional properties may be skipped.
        # Render as: { p1? , p2? ... } with separators folded into each
        # optional group so "{}", "{p1}", "{p1, p3}" all parse.
        body = _object_body(parts)
        return f"\\{{{_WS}{body}{_WS}\\}}"
    raise ValueError(f"unsupported schema: {schema!r}")


def _object_body(parts: List[Tuple[str, bool]]) -> str:
    """Property regexes → body alternation handling optional members.

    With any optional properties, enumerate the allowed subsets (must
    include all required ones) — fine for the handful of properties real
    response schemas carry; the DFA shares their common structure anyway."""
    from itertools import combinations

    n = len(parts)
    optional_idx = [i for i, (_, req) in enumerate(parts) if not req]
    if not optional_idx:
        return f"{_WS},{_WS}".join(p for p, _ in parts)
    if len(optional_idx) > 8:
        raise ValueError("too many optional properties (max 8)")
    alts = []
    for r in range(len(optional_idx) + 1):
        for omit in combinations(optional_idx, r):
            kept = [p for i, (p, _) in enumerate(parts) if i not in omit]
            if kept:
                alts.append(f"{_WS},{_WS}".join(kept))
    if len(optional_idx) == n:
        alts.append("")  # everything optional → "{}" is conforming
    seen = set()
    uniq = [a for a in alts if not (a in seen or seen.add(a))]
    return "(" + "|".join(uniq) + ")"


# ---------------------------------------------------------------------------
# Grammar registry: combined device mask for a batch of active grammars
# ---------------------------------------------------------------------------


class GrammarSlots:
    """Tracks per-slot grammar state for a batcher and maintains the
    COMBINED device mask table (each active grammar's rows at an offset;
    final row all-True for unconstrained slots).

    The combined table is rebuilt only when the set of distinct active
    grammars changes (admission/finish), never per step."""

    def __init__(self, max_slots: int, vocab_size: int):
        self.max_slots = max_slots
        self.vocab_size = vocab_size
        self.slot_grammar: List[Optional[TokenGrammar]] = [None] * max_slots
        self.slot_state = np.zeros(max_slots, np.int64)  # local DFA state
        self._table = None          # jnp [R, V] combined mask
        self._offsets: Dict[int, int] = {}  # id(grammar) → row offset
        self._dirty = True

    @property
    def any_active(self) -> bool:
        return any(g is not None for g in self.slot_grammar)

    def attach(self, slot: int, grammar: Optional[TokenGrammar]) -> None:
        self.slot_grammar[slot] = grammar
        self.slot_state[slot] = 0
        if grammar is not None:
            self._dirty = True

    def release(self, slot: int) -> None:
        if self.slot_grammar[slot] is not None:
            self._dirty = True
        self.slot_grammar[slot] = None
        self.slot_state[slot] = 0

    def advance(self, slot: int, token: int) -> None:
        g = self.slot_grammar[slot]
        if g is None:
            return
        nxt = g.advance(int(self.slot_state[slot]), token)
        # A masked step can only emit legal tokens; -1 here would mean the
        # mask and trans tables disagree — fail loudly rather than decode
        # garbage.
        if nxt < 0 and token != g.eos_token_id:
            raise RuntimeError(
                f"grammar desync: token {token} illegal from state "
                f"{int(self.slot_state[slot])}")
        if nxt >= 0:
            self.slot_state[slot] = nxt

    def first_token_mask(self, grammar: TokenGrammar):
        """Start-state mask row for sampling a request's first token."""
        import jax.numpy as jnp

        return jnp.asarray(grammar.mask[0])

    def operand(self):
        """(combined_mask [R, V] bool, slot_rows [B] int32) device operands
        for the jitted step, or None when no slot is constrained."""
        if not self.any_active:
            return None
        import jax.numpy as jnp

        if self._dirty or self._table is None:
            grammars = []
            seen = set()
            for g in self.slot_grammar:
                if g is not None and id(g) not in seen:
                    seen.add(id(g))
                    grammars.append(g)
            blocks = []
            self._offsets = {}
            off = 0
            for g in grammars:
                self._offsets[id(g)] = off
                blocks.append(g.mask[:-1])  # drop each grammar's free row
                off += g.n_states
            blocks.append(np.ones((1, self.vocab_size), bool))
            self._table = jnp.asarray(np.concatenate(blocks, axis=0))
            self._free_row = off
            self._dirty = False
        rows = np.full(self.max_slots, self._free_row, np.int32)
        for slot, g in enumerate(self.slot_grammar):
            if g is not None:
                rows[slot] = self._offsets[id(g)] + int(self.slot_state[slot])
        import jax.numpy as jnp

        return self._table, jnp.asarray(rows)
