"""Minimal regex-directed string sampler (randexp analog).

The reference uses the ``randexp`` npm package to generate strings matching
``$string.regex`` / map-key regexes (/root/reference/src/generate.ts:7,147,163).
This is a from-scratch sampler covering the regex constructs that appear in
yaschva schemas and specs: literals, escapes (\\w \\d \\s \\b \\\\ etc.),
character classes with ranges and negation, groups, alternation, the
quantifiers ``? * + {n} {n,m}``, anchors (ignored — generation produces a
full match), and dot.

Every sample is drawn from a caller-provided ``random.Random`` so fixture
generation is fully deterministic.
"""

from __future__ import annotations

import random
import string

_WORD = string.ascii_letters + string.digits + "_"
_DIGIT = string.digits
_SPACE = " \t"
_DOT = string.ascii_letters + string.digits
_ANY_PRINTABLE = string.ascii_letters + string.digits + " _.-"
_UNBOUNDED_EXTRA = 4  # extra repeats sampled for * + and {n,}


class RegexSampleError(ValueError):
    pass


class _Parser:
    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def peek(self) -> str | None:
        return self.p[self.i] if self.i < len(self.p) else None

    def next(self) -> str:
        ch = self.p[self.i]
        self.i += 1
        return ch

    # alternation := sequence ('|' sequence)*
    def parse_alternation(self) -> list:
        alts = [self.parse_sequence()]
        while self.peek() == "|":
            self.next()
            alts.append(self.parse_sequence())
        return alts

    # sequence := (atom quantifier?)*
    def parse_sequence(self) -> list:
        seq = []
        while self.peek() is not None and self.peek() not in ")|":
            atom = self.parse_atom()
            lo, hi = self.parse_quantifier()
            if atom is not None:
                seq.append((atom, lo, hi))
        return seq

    def parse_atom(self):
        ch = self.next()
        if ch == "(":
            if self.peek() == "?":  # (?: (?= (?! (?<name> — strip the prefix
                self.next()
                if self.peek() in (":", "=", "!"):
                    self.next()
                elif self.peek() == "<":
                    self.next()
                    if self.peek() in ("=", "!"):  # lookbehind
                        self.next()
                    else:  # named group (?<name>...): consume through '>'
                        while self.peek() is not None and self.peek() != ">":
                            self.next()
                        if self.peek() == ">":
                            self.next()
            alts = self.parse_alternation()
            if self.peek() == ")":
                self.next()
            return ("alt", alts)
        if ch == "[":
            return ("class", self.parse_class())
        if ch == "\\":
            return self.parse_escape()
        if ch == ".":
            return ("set", _DOT)
        if ch in "^$":
            return None  # anchors contribute nothing to generation
        return ("lit", ch)

    def parse_escape(self):
        ch = self.next()
        if ch == "w":
            return ("set", _WORD)
        if ch == "d":
            return ("set", _DIGIT)
        if ch == "s":
            return ("set", _SPACE)
        if ch == "W":
            return ("set", " .-")
        if ch == "D":
            return ("set", string.ascii_letters)
        if ch == "S":
            return ("set", _DOT)
        if ch in ("b", "B"):
            return None  # zero-width
        if ch == "n":
            return ("lit", "\n")
        if ch == "t":
            return ("lit", "\t")
        if ch == "r":
            return ("lit", "\r")
        return ("lit", ch)  # \\ \. \$ \[ etc.

    def parse_class(self) -> str:
        negate = False
        if self.peek() == "^":
            self.next()
            negate = True
        chars: list[str] = []
        prev: str | None = None
        while self.peek() is not None and self.peek() != "]":
            ch = self.next()
            if ch == "\\":
                esc = self.next()
                if esc == "w":
                    chars.extend(_WORD)
                    prev = None
                    continue
                if esc == "d":
                    chars.extend(_DIGIT)
                    prev = None
                    continue
                if esc == "s":
                    chars.extend(_SPACE)
                    prev = None
                    continue
                ch = {"n": "\n", "t": "\t", "r": "\r"}.get(esc, esc)
            if ch == "-" and prev is not None and self.peek() not in (None, "]"):
                end = self.next()
                if end == "\\":
                    end = self.next()
                chars.extend(chr(c) for c in range(ord(prev) + 1, ord(end) + 1))
                prev = None
                continue
            chars.append(ch)
            prev = ch
        if self.peek() == "]":
            self.next()
        if negate:
            excluded = set(chars)
            allowed = [c for c in _ANY_PRINTABLE if c not in excluded]
            if not allowed:
                raise RegexSampleError("negated class excludes all sampled chars")
            return "".join(allowed)
        if not chars:
            raise RegexSampleError("empty character class")
        return "".join(chars)

    def parse_quantifier(self) -> tuple[int, int]:
        ch = self.peek()
        if ch == "?":
            self.next()
            return 0, 1
        if ch == "*":
            self.next()
            return 0, _UNBOUNDED_EXTRA
        if ch == "+":
            self.next()
            return 1, 1 + _UNBOUNDED_EXTRA
        if ch == "{":
            j = self.p.find("}", self.i)
            if j == -1:
                return 1, 1
            body = self.p[self.i + 1 : j]
            self.i = j + 1
            if "," in body:
                lo_s, hi_s = body.split(",", 1)
                lo = int(lo_s) if lo_s else 0
                hi = int(hi_s) if hi_s.strip() else lo + _UNBOUNDED_EXTRA
                return lo, hi
            n = int(body)
            return n, n
        return 1, 1


def _sample_seq(seq: list, rng: random.Random) -> str:
    out = []
    for atom, lo, hi in seq:
        reps = rng.randint(lo, hi)
        for _ in range(reps):
            out.append(_sample_atom(atom, rng))
    return "".join(out)


def _sample_atom(atom, rng: random.Random) -> str:
    kind, payload = atom
    if kind == "lit":
        return payload
    if kind == "set" or kind == "class":
        return rng.choice(payload)
    if kind == "alt":
        return _sample_seq(rng.choice(payload), rng)
    raise RegexSampleError(f"unknown atom {kind}")  # pragma: no cover


def regex_sample(pattern: str, rng: random.Random) -> str:
    """Generate a string matching ``pattern`` (best-effort over the supported
    construct subset), deterministically from ``rng``."""
    alts = _Parser(pattern).parse_alternation()
    return _sample_seq(rng.choice(alts), rng)
