"""Regex -> DFA constrained decoding (the xgrammar/llguidance analog).

The reference guides decoding with xgrammar token bitmasks
(`pyexecutor/guided_decoder.py` + `kernels/logitsBitmask.cu`).  Neither
xgrammar nor llguidance exist in this image, so this module implements the
same capability from scratch, outlines-style:

  regex  --Thompson-->  NFA  --subset construction-->  DFA over character
  intervals  --vocab trie walk-->  per-DFA-state allowed-token sets

A JSON Schema (common subset) or a bare `json_object` constraint compiles to
a regex first (`json_schema_to_regex`).  Token masks are memoized per DFA
state; computing one is a trie x DFA product walk, so shared token prefixes
are pruned once.

Supported regex subset: literals, escapes (\\d \\w \\s \\n \\t \\\\ etc.),
character classes [a-z0-9_] and negations [^"], '.', alternation '|',
grouping '()', quantifiers * + ? {m} {m,} {m,n}.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------- charsets --
MAX_CP = 0x10FFFF


def _norm(ranges: List[Tuple[int, int]]) -> Tuple[Tuple[int, int], ...]:
    rs = sorted((lo, hi) for lo, hi in ranges if lo <= hi)
    out = []
    for lo, hi in rs:
        if out and lo <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return tuple(out)


def _negate(ranges) -> Tuple[Tuple[int, int], ...]:
    out, cur = [], 0
    for lo, hi in ranges:
        if cur < lo:
            out.append((cur, lo - 1))
        cur = hi + 1
    if cur <= MAX_CP:
        out.append((cur, MAX_CP))
    return tuple(out)


_ESCAPES = {
    "d": (("0", "9"),),
    "w": (("a", "z"), ("A", "Z"), ("0", "9"), ("_", "_")),
    "s": ((" ", " "), ("\t", "\t"), ("\n", "\n"), ("\r", "\r"),
          ("\f", "\f"), ("\v", "\v")),
}


def _esc_ranges(ch: str):
    if ch in _ESCAPES:
        return _norm([(ord(a), ord(b)) for a, b in _ESCAPES[ch]])
    if ch in "DWS":
        return _negate(_esc_ranges(ch.lower()))
    lit = {"n": "\n", "t": "\t", "r": "\r", "f": "\f", "v": "\v",
           "0": "\0"}.get(ch, ch)
    return ((ord(lit), ord(lit)),)


# ---------------------------------------------------------------- parsing ---
class _Parser:
    """Recursive-descent regex parser -> AST.

    AST nodes: ("cls", ranges) | ("cat", [..]) | ("alt", [..])
             | ("rep", node, min, max|None) | ("eps",)
    """

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def parse(self):
        node = self._alt()
        if self.i != len(self.p):
            raise ValueError(f"regex parse error at {self.i}: {self.p!r}")
        return node

    def _peek(self):
        return self.p[self.i] if self.i < len(self.p) else None

    def _alt(self):
        branches = [self._cat()]
        while self._peek() == "|":
            self.i += 1
            branches.append(self._cat())
        return branches[0] if len(branches) == 1 else ("alt", branches)

    def _cat(self):
        items = []
        while self._peek() not in (None, "|", ")"):
            items.append(self._rep())
        if not items:
            return ("eps",)
        return items[0] if len(items) == 1 else ("cat", items)

    def _rep(self):
        node = self._atom()
        while True:
            c = self._peek()
            if c == "*":
                self.i += 1
                node = ("rep", node, 0, None)
            elif c == "+":
                self.i += 1
                node = ("rep", node, 1, None)
            elif c == "?":
                self.i += 1
                node = ("rep", node, 0, 1)
            elif c == "{":
                j = self.p.index("}", self.i)
                spec = self.p[self.i + 1:j]
                self.i = j + 1
                if "," in spec:
                    lo, hi = spec.split(",", 1)
                    node = ("rep", node, int(lo or 0),
                            int(hi) if hi else None)
                else:
                    node = ("rep", node, int(spec), int(spec))
            else:
                return node

    def _atom(self):
        c = self.p[self.i]
        if c == "(":
            self.i += 1
            node = self._alt()
            assert self._peek() == ")", "unbalanced group"
            self.i += 1
            return node
        if c == "[":
            return self._class()
        if c == ".":
            self.i += 1
            return ("cls", _negate(((10, 10),)))  # any char but newline
        if c == "\\":
            self.i += 2
            return ("cls", _esc_ranges(self.p[self.i - 1]))
        self.i += 1
        return ("cls", ((ord(c), ord(c)),))

    def _class(self):
        assert self.p[self.i] == "["
        self.i += 1
        neg = self._peek() == "^"
        if neg:
            self.i += 1
        ranges: List[Tuple[int, int]] = []
        while self._peek() != "]":
            c = self.p[self.i]
            if c == "\\":
                self.i += 2
                ranges.extend(_esc_ranges(self.p[self.i - 1]))
                continue
            self.i += 1
            if self._peek() == "-" and self.i + 1 < len(self.p) \
                    and self.p[self.i + 1] != "]":
                hi = self.p[self.i + 1]
                self.i += 2
                ranges.append((ord(c), ord(hi)))
            else:
                ranges.append((ord(c), ord(c)))
        self.i += 1  # ]
        r = _norm(ranges)
        return ("cls", _negate(r) if neg else r)


# ---------------------------------------------------------------- NFA -------
class _NFA:
    def __init__(self):
        self.eps: List[List[int]] = []
        self.edges: List[List[Tuple[Tuple[Tuple[int, int], ...], int]]] = []

    def state(self) -> int:
        self.eps.append([])
        self.edges.append([])
        return len(self.eps) - 1

    def build(self, node, src: int, dst: int):
        kind = node[0]
        if kind == "eps":
            self.eps[src].append(dst)
        elif kind == "cls":
            self.edges[src].append((node[1], dst))
        elif kind == "cat":
            cur = src
            for item in node[1][:-1]:
                nxt = self.state()
                self.build(item, cur, nxt)
                cur = nxt
            self.build(node[1][-1], cur, dst)
        elif kind == "alt":
            for b in node[1]:
                self.build(b, src, dst)
        elif kind == "rep":
            _, inner, lo, hi = node
            cur = src
            for _ in range(lo):
                nxt = self.state()
                self.build(inner, cur, nxt)
                cur = nxt
            if hi is None:                       # unbounded tail
                loop = self.state()
                self.eps[cur].append(loop)
                self.build(inner, loop, loop)
                self.eps[loop].append(dst)
            else:
                self.eps[cur].append(dst)
                for _ in range(hi - lo):
                    nxt = self.state()
                    self.build(inner, cur, nxt)
                    self.eps[nxt].append(dst)
                    cur = nxt
        else:
            raise ValueError(kind)


class DFA:
    """Deterministic automaton over character intervals."""

    def __init__(self, pattern: str):
        ast = _Parser(pattern).parse()
        nfa = _NFA()
        s0, s1 = nfa.state(), nfa.state()
        nfa.build(ast, s0, s1)
        self._nfa, self._accept = nfa, s1

        # interval alphabet: all boundaries across all NFA edges
        points = {0, MAX_CP + 1}
        for edges in nfa.edges:
            for ranges, _ in edges:
                for lo, hi in ranges:
                    points.add(lo)
                    points.add(hi + 1)
        cuts = sorted(points)
        self.intervals = [(cuts[i], cuts[i + 1] - 1)
                          for i in range(len(cuts) - 1)]
        self._lo = np.array([iv[0] for iv in self.intervals])

        def closure(states):
            stack, seen = list(states), set(states)
            while stack:
                s = stack.pop()
                for t in nfa.eps[s]:
                    if t not in seen:
                        seen.add(t)
                        stack.append(t)
            return frozenset(seen)

        start = closure({s0})
        self.trans: List[Dict[int, int]] = []   # state -> {interval: state}
        self.accepting: List[bool] = []
        index = {start: 0}
        self.trans.append({})
        self.accepting.append(s1 in start)
        work = [start]
        order = [start]
        while work:
            cur = work.pop()
            ci = index[cur]
            for k, (lo, hi) in enumerate(self.intervals):
                nxt = set()
                for s in cur:
                    for ranges, t in nfa.edges[s]:
                        if any(rlo <= lo and hi <= rhi
                               for rlo, rhi in ranges):
                            nxt.add(t)
                if not nxt:
                    continue
                nc = closure(nxt)
                if nc not in index:
                    index[nc] = len(self.trans)
                    self.trans.append({})
                    self.accepting.append(s1 in nc)
                    work.append(nc)
                    order.append(nc)
                self.trans[ci][k] = index[nc]
        self.start = 0

    def _sym(self, ch: str) -> int:
        return int(np.searchsorted(self._lo, ord(ch), side="right")) - 1

    def step(self, state: int, ch: str) -> int:
        """-1 = dead."""
        return self.trans[state].get(self._sym(ch), -1)

    def walk(self, state: int, text: str) -> int:
        for ch in text:
            state = self.trans[state].get(self._sym(ch), -1)
            if state < 0:
                return -1
        return state

    def matches(self, text: str) -> bool:
        s = self.walk(self.start, text)
        return s >= 0 and self.accepting[s]


# ---------------------------------------------------------------- vocab -----
class _Trie:
    __slots__ = ("children", "token_ids")

    def __init__(self):
        self.children: Dict[str, "_Trie"] = {}
        self.token_ids: List[int] = []


def token_strings(tokenizer, vocab_size: int) -> List[Optional[str]]:
    """Best-effort per-token surface strings (byte-BPE Ġ/Ċ and
    sentencepiece ▁ conventions normalized)."""
    try:
        toks = tokenizer.convert_ids_to_tokens(list(range(vocab_size)))
    except Exception:  # noqa: BLE001
        toks = [None] * vocab_size
        for i in range(vocab_size):
            try:
                toks[i] = tokenizer.decode([i])
            except Exception:  # noqa: BLE001
                pass
    special = set(getattr(tokenizer, "all_special_ids", []) or [])
    out: List[Optional[str]] = []
    for i, t in enumerate(toks):
        if t is None or i in special:
            out.append(None)
            continue
        out.append(t.replace("Ġ", " ").replace("Ċ", "\n")
                   .replace("ĉ", "\t").replace("▁", " "))
    return out


def build_vocab_trie(strings: List[Optional[str]]) -> _Trie:
    root = _Trie()
    for tid, s in enumerate(strings):
        if not s:
            continue
        node = root
        for ch in s:
            node = node.children.setdefault(ch, _Trie())
        node.token_ids.append(tid)
    return root


class TokenMaskCache:
    """Per-DFA-state allowed-token sets via a trie x DFA product walk."""

    def __init__(self, dfa: DFA, trie: _Trie, eos_token_id: Optional[int],
                 strings: Optional[List[Optional[str]]] = None):
        self.dfa = dfa
        self.trie = trie
        self.eos = eos_token_id
        self.strings = strings  # token id -> surface text (advance walks)
        self._cache: Dict[int, np.ndarray] = {}

    def allowed(self, state: int) -> np.ndarray:
        hit = self._cache.get(state)
        if hit is not None:
            return hit
        out: List[int] = []
        stack = [(self.trie, state)]
        while stack:
            node, st = stack.pop()
            out.extend(node.token_ids)
            for ch, child in node.children.items():
                nxt = self.dfa.step(st, ch)
                if nxt >= 0:
                    stack.append((child, nxt))
        # the root's token_ids are empty; tokens collected above all KEEP a
        # live DFA path.  EOS only once the regex fully matches.
        out = [t for t in out]
        if self.dfa.accepting[state] and self.eos is not None:
            out.append(self.eos)
        arr = np.array(sorted(set(out)), np.int32)
        self._cache[state] = arr
        return arr


# ---------------------------------------------------------------- schema ----
_STRING_RE = r'"([^"\\]|\\["\\/bfnrtu])*"'
_INT_RE = r"(-?(0|[1-9][0-9]*))"
_NUM_RE = r"(-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?)"
_BOOL_RE = r"(true|false)"
_NULL_RE = r"null"


def _regex_escape(s: str) -> str:
    out = []
    for ch in s:
        if ch in r"\.[]{}()*+?|^$/":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def _json_value_regex(depth: int) -> str:
    """Generic JSON value, recursion depth-limited."""
    scalar = f"({_STRING_RE}|{_NUM_RE}|{_BOOL_RE}|{_NULL_RE})"
    if depth <= 0:
        return scalar
    inner = _json_value_regex(depth - 1)
    arr = rf"\[({inner}(,{inner})*)?\]"
    obj = rf"\{{({_STRING_RE}:{inner}(,{_STRING_RE}:{inner})*)?\}}"
    return f"({scalar}|{arr}|{obj})"


def json_schema_to_regex(schema: dict, depth: int = 3) -> str:
    """JSON Schema (common subset) -> canonical compact-JSON regex.

    Supports: type string/integer/number/boolean/null/object/array, enum,
    const, required object properties (emitted in declaration order),
    arrays with `items`, minItems/maxItems, nested schemas."""
    import json as _json

    if not schema:
        return _json_value_regex(depth)
    if "enum" in schema:
        opts = "|".join(_regex_escape(_json.dumps(v, separators=(",", ":")))
                        for v in schema["enum"])
        return f"({opts})"
    if "const" in schema:
        return _regex_escape(
            _json.dumps(schema["const"], separators=(",", ":")))
    t = schema.get("type")
    if isinstance(t, list):
        return "(" + "|".join(
            json_schema_to_regex({**schema, "type": tt}, depth)
            for tt in t) + ")"
    if t == "string":
        return _STRING_RE
    if t == "integer":
        return _INT_RE
    if t == "number":
        return _NUM_RE
    if t == "boolean":
        return _BOOL_RE
    if t == "null":
        return _NULL_RE
    if t == "array":
        item = json_schema_to_regex(schema.get("items", {}), depth - 1)
        lo = schema.get("minItems", 0)
        hi = schema.get("maxItems")
        if hi is None:
            body = rf"({item}(,{item})*)?" if lo == 0 else \
                rf"{item}(,{item}){{{lo - 1},}}"
        else:
            if lo == 0:
                body = rf"({item}(,{item}){{0,{max(hi - 1, 0)}}})?"
            else:
                body = rf"{item}(,{item}){{{lo - 1},{hi - 1}}}"
        return rf"\[{body}\]"
    if t == "object" or "properties" in schema:
        props = schema.get("properties")
        if not props:
            return _json_value_regex(depth)
        parts = []
        for name, sub in props.items():
            key = _regex_escape(_json.dumps(name))
            val = json_schema_to_regex(sub, depth - 1)
            parts.append(f"{key}:{val}")
        return r"\{" + ",".join(parts) + r"\}"
    return _json_value_regex(depth)
