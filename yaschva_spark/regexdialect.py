"""ECMAScript-vs-Java regex dialect guard for the typed compiler.

The reference validates patterns with ``new RegExp(p, 'u').test(v)``
(/root/reference/src/validate.ts:81). The typed path hands patterns to
Java's regex via ``rlike``; for the overwhelmingly common subset (literals,
classes, quantifiers, anchors, alternation, groups, ``\\d\\w\\b``,
lookarounds, named groups, ``\\k<name>`` backrefs) the dialects coincide —
an unanchored ``rlike`` search matches ``.test`` semantics. But a handful
of ECMA-u constructs silently diverge or error under Java, so the compiler
must detect them at COMPILE time and route the schema to the dynamic
interpreter path instead of producing a Column with different semantics:

* ``\\u{1F600}`` — ECMA-u codepoint escape; Java spells it ``\\x{...}``
  and errors on ``\\u{``.
* ``\\p{Letter}`` / ``\\p{Script=Greek}`` — ECMA long property / script
  names; Java only shares the short general-category names (``\\p{L}``,
  ``\\p{Lu}``, ...), which are therefore allowed on the typed path.
* ``[]`` / ``[^]`` — valid in ECMA (never-match / any-char); Java syntax
  errors.
* ``\\s`` / ``\\S`` — ECMA whitespace is a fixed Unicode set (NBSP,
  ogham, en-quads, BOM, ...); Java's is ASCII-only. A pattern using them
  silently diverges under ``rlike`` for any non-ASCII whitespace, so it
  routes to the dynamic path. (``\\w``/``\\b`` do NOT route: ECMA defines
  them as exactly ``[A-Za-z0-9_]`` and Java agrees.)

The dynamic path evaluates patterns with Python ``re``, which needs its
own spelling for some shared constructs; :func:`to_python_pattern`
performs that translation (``\\u{...}`` to the literal character,
``(?<name>`` to ``(?P<name>``, ``\\k<name>`` to ``(?P=name)``, ``[]`` to
``(?!)``, ``[^]`` to ``[\\s\\S]``) AND pins Python's Unicode-flavored
shorthands to their exact ECMA definitions: ``\\w``/``\\W`` become the
ASCII class (Python's match Unicode letters), ``\\b``/``\\B`` become
ASCII-word-boundary lookarounds, ``\\s``/``\\S`` become the literal ECMA
whitespace set (Python's includes \\x1c-\\x1f/\\x85 and misses \\ufeff),
and ``.`` becomes ``[^\\n\\r\\u2028\\u2029]`` (Python's dot only
excludes \\n). Long Unicode property names are not translatable (Python
``re`` has no property classes) and raise a clear error rather than
silently diverging.

Known residual divergence (documented, not fixed): Java's ``.`` also
excludes \\u0085 (NEL), which ECMA's matches — the typed path is
stricter than the reference for strings containing NEL; schemas needing
that exactness use the dynamic path.
"""

from __future__ import annotations

# the exact ECMAScript \s set (ES2024 WhiteSpace + LineTerminator)
_ECMA_WS = (
    "\\t\\n\\x0b\\f\\r \\u00a0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff"
)
_ASCII_WORD = "A-Za-z0-9_"
_ECMA_DOT = "[^\\n\\r\\u2028\\u2029]"
_B_BOUND = (
    f"(?:(?<=[{_ASCII_WORD}])(?![{_ASCII_WORD}])"
    f"|(?<![{_ASCII_WORD}])(?=[{_ASCII_WORD}]))"
)
_B_NONBOUND = (
    f"(?:(?<=[{_ASCII_WORD}])(?=[{_ASCII_WORD}])"
    f"|(?<![{_ASCII_WORD}])(?![{_ASCII_WORD}]))"
)

# general-category names with identical meaning in ECMA-u and Java
_SHARED_PROPS = {
    "L", "Lu", "Ll", "Lt", "Lm", "Lo",
    "M", "Mn", "Mc", "Me",
    "N", "Nd", "Nl", "No",
    "P", "Pc", "Pd", "Ps", "Pe", "Pi", "Pf", "Po",
    "S", "Sm", "Sc", "Sk", "So",
    "Z", "Zs", "Zl", "Zp",
    "C", "Cc", "Cf", "Co", "Cn", "Cs",
}


def typed_unsafe(pattern: str) -> list[str]:
    """Reasons this pattern must NOT go through Java ``rlike``; empty list
    means the ECMA and Java interpretations coincide."""
    reasons: list[str] = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt == "u" and i + 2 < n and pattern[i + 2] == "{":
                reasons.append(r"\u{...} codepoint escape (Java errors; use \x{...})")
            elif nxt in "sS":
                reasons.append(
                    r"\s/\S whitespace class (Java is ASCII-only; ECMA is the "
                    "Unicode set incl. NBSP)"
                )
            elif nxt in "pP" and i + 2 < n and pattern[i + 2] == "{":
                end = pattern.find("}", i + 3)
                body = pattern[i + 3 : end] if end != -1 else pattern[i + 3 :]
                if body not in _SHARED_PROPS:
                    reasons.append(
                        rf"\{nxt}{{{body}}} long/script Unicode property (dialects differ)"
                    )
            i += 2
            continue
        if not in_class and c == "[":
            if pattern[i + 1 : i + 2] == "]":
                reasons.append("[] empty class (Java syntax error, ECMA never-match)")
                i += 2
                continue
            if pattern[i + 1 : i + 3] == "^]":
                reasons.append("[^] any-char class (Java syntax error)")
                i += 3
                continue
            in_class = True
        elif in_class and c == "]":
            in_class = False
        i += 1
    return reasons


def to_python_pattern(pattern: str) -> str:
    """Translate an ECMA-u pattern to Python ``re`` spelling. Identity for
    patterns using only the shared subset."""
    out: list[str] = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt == "u" and i + 2 < n and pattern[i + 2] == "{":
                end = pattern.find("}", i + 3)
                if end != -1:
                    cp = int(pattern[i + 3 : end], 16)
                    ch = chr(cp)
                    # escape if it's a regex metacharacter
                    out.append("\\" + ch if ch in r".^$*+?()[]{}|\/" else ch)
                    i = end + 1
                    continue
            if nxt in "pP" and i + 2 < n and pattern[i + 2] == "{":
                end = pattern.find("}", i + 3)
                body = pattern[i + 3 : end] if end != -1 else pattern[i + 3 :]
                if body not in _SHARED_PROPS:
                    raise ValueError(
                        f"Unicode property \\{nxt}{{{body}}} is not supported by the "
                        "dynamic path (Python re has no property classes)"
                    )
                # shared short names are equally unsupported by Python re
                raise ValueError(
                    f"\\{nxt}{{{body}}}: property classes need the typed (Java) path"
                )
            if nxt == "k" and pattern[i + 2 : i + 3] == "<":
                end = pattern.find(">", i + 3)
                if end != -1:
                    out.append(f"(?P={pattern[i + 3:end]})")
                    i = end + 1
                    continue
            # pin Python's Unicode-flavored shorthands to ECMA semantics
            if nxt == "w":
                out.append(f"[{_ASCII_WORD}]" if not in_class else _ASCII_WORD)
                i += 2
                continue
            if nxt == "W":
                if in_class:
                    raise ValueError(r"\W inside a class is not translatable")
                out.append(f"[^{_ASCII_WORD}]")
                i += 2
                continue
            if nxt == "s":
                out.append(f"[{_ECMA_WS}]" if not in_class else _ECMA_WS)
                i += 2
                continue
            if nxt == "S":
                if in_class:
                    raise ValueError(r"\S inside a class is not translatable")
                out.append(f"[^{_ECMA_WS}]")
                i += 2
                continue
            if nxt == "b" and not in_class:  # in-class \b is backspace in both
                out.append(_B_BOUND)
                i += 2
                continue
            if nxt == "B" and not in_class:
                out.append(_B_NONBOUND)
                i += 2
                continue
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if not in_class and c == ".":
            out.append(_ECMA_DOT)
            i += 1
            continue
        if not in_class and pattern[i : i + 3] == "(?<" and pattern[i + 3 : i + 4] not in ("=", "!"):
            out.append("(?P<")
            i += 3
            continue
        if not in_class and c == "[":
            if pattern[i + 1 : i + 2] == "]":
                out.append("(?!)")  # ECMA empty class: matches nothing
                i += 2
                continue
            if pattern[i + 1 : i + 3] == "^]":
                out.append(r"[\s\S]")  # ECMA [^]: any character
                i += 3
                continue
            in_class = True
        elif in_class and c == "]":
            in_class = False
        out.append(c)
        i += 1
    return "".join(out)
