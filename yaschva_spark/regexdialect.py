"""ECMAScript-vs-Java/Python regex dialect guard for both execution paths.

The reference validates patterns with ``new RegExp(p, 'u').test(v)``
(/root/reference/src/validate.ts:81). Neither evaluation engine available
here speaks that dialect natively:

* the **typed path** hands patterns to Java's regex via ``rlike``;
* the **dynamic path** evaluates them with Python ``re``.

For the overwhelmingly common subset (literals, classes, quantifiers,
``^`` anchors, alternation, groups, ``\\d\\w\\b``, lookarounds, named
groups, ``\\k<name>`` backrefs) all three dialects coincide — an
unanchored ``rlike`` / ``re.search`` matches ``.test`` semantics. The
rest is handled by TRANSLATION, one function per target dialect, so that
almost every pattern stays on the fast typed path:

:func:`to_java_pattern` (typed path, verified against live ``rlike``):

* ``$`` (out of class) — ECMA ``$`` without ``m`` asserts END OF INPUT;
  Java's also matches before a trailing line terminator (``'abc\\n'``
  matches ``^abc$``). Translated to ``\\z`` (absolute end).
* ``.`` — Java's dot also excludes \\u0085 (NEL) which ECMA's matches.
  Translated to the explicit ECMA complement ``[^\\n\\r\\u2028\\u2029]``.
* in-class ``&`` / ``[`` — Java operators (``[a&&b]`` is intersection and
  matches nothing; ``x[[]y`` is a PatternSyntaxException), ECMA literals.
  Escaped to ``\\&`` / ``\\[``.
* ``\\u{...}`` — ECMA-u codepoint escape; Java spells it ``\\x{...}``.
* ``\\s`` / ``\\S`` — ECMA whitespace is a fixed Unicode set (NBSP,
  ogham, en-quads, BOM, ...); Java's is ASCII-only. Expanded to the
  literal ECMA set. (``\\w``/``\\W``/``\\b`` do NOT need translation:
  ECMA defines them as exactly ``[A-Za-z0-9_]`` and Java agrees.)
* ``[]`` / ``[^]`` — valid in ECMA (never-match / any-char); Java syntax
  errors. Translated to ``(?!)`` / ``(?s:.)``.

:func:`to_python_pattern` (dynamic path) performs the analogous
translation for Python ``re`` (``\\u{...}`` to the literal character,
``(?<name>`` to ``(?P<name>``, ``\\k<name>`` to ``(?P=name)``, ``[]`` to
``(?!)``, ``[^]`` to ``[\\s\\S]``, out-of-class ``$`` to ``\\Z`` —
Python's ``$`` also matches before a trailing ``\\n``) AND pins Python's
Unicode-flavored shorthands to their exact ECMA definitions:
``\\w``/``\\W`` become the ASCII class (Python's match Unicode letters),
``\\b``/``\\B`` become ASCII-word-boundary lookarounds, ``\\s``/``\\S``
become the literal ECMA whitespace set (Python's includes
\\x1c-\\x1f/\\x85 and misses \\ufeff), and ``.`` becomes
``[^\\n\\r\\u2028\\u2029]`` (Python's dot only excludes \\n).

The residue that no translation covers routes to whichever path can
still evaluate it exactly, via :func:`typed_unsafe`:

* ``\\p{Letter}`` / ``\\p{Script=Greek}`` — ECMA long property / script
  names; Java only shares the short general-category names (``\\p{L}``,
  ``\\p{Lu}``, ...), which therefore stay on the typed path. Python
  ``re`` has no property classes at all, so long names raise a clear
  error rather than silently diverging.
* in-class ``\\S`` / ``\\W`` — a complemented shorthand cannot be
  expanded inside a class; untranslatable for Java (flagged) and Python
  (raises).
"""

from __future__ import annotations

# the exact ECMAScript \s set (ES2024 WhiteSpace + LineTerminator);
# every escape here (\t \n \x0b \f \r \uXXXX) is valid in BOTH Python-re
# and Java-regex character classes with identical meaning
_ECMA_WS = (
    "\\t\\n\\x0b\\f\\r \\u00a0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff"
)
_ASCII_WORD = "A-Za-z0-9_"
# ECMA dot complement: LineTerminator only (\n \r    ) — same
# spelling is valid in Java and Python classes
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
    """Reasons this pattern must NOT go through Java ``rlike`` even after
    :func:`to_java_pattern` translation; empty list means the translated
    pattern evaluates with exact ECMA semantics under Java."""
    reasons: list[str] = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt in "pP" and i + 2 < n and pattern[i + 2] == "{":
                end = pattern.find("}", i + 3)
                body = pattern[i + 3 : end] if end != -1 else pattern[i + 3 :]
                if body not in _SHARED_PROPS:
                    reasons.append(
                        rf"\{nxt}{{{body}}} long/script Unicode property (dialects differ)"
                    )
            elif in_class and nxt in "SW":
                reasons.append(
                    rf"\{nxt} inside a class (complemented shorthand is not "
                    "expandable to the ECMA set)"
                )
            i += 2
            continue
        if not in_class and c == "[":
            if pattern[i + 1 : i + 2] == "]":
                i += 2  # ECMA empty class — translated to (?!)
                continue
            if pattern[i + 1 : i + 3] == "^]":
                i += 3  # ECMA any-char class — translated to (?s:.)
                continue
            in_class = True
        elif in_class and c == "]":
            in_class = False
        i += 1
    return reasons


def to_java_pattern(pattern: str) -> str:
    """Translate an ECMA-u pattern to Java regex spelling with identical
    semantics (see module docstring for the construct-by-construct map).
    Identity for patterns using only the shared subset. Raises
    :class:`ValueError` for the untranslatable residue — callers gate on
    :func:`typed_unsafe` first, so this is a belt-and-braces check."""
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
                    out.append(f"\\x{{{pattern[i + 3:end]}}}")
                    i = end + 1
                    continue
            if nxt in "pP" and i + 2 < n and pattern[i + 2] == "{":
                end = pattern.find("}", i + 3)
                body = pattern[i + 3 : end] if end != -1 else pattern[i + 3 :]
                if body not in _SHARED_PROPS:
                    raise ValueError(
                        f"\\{nxt}{{{body}}}: long/script Unicode property has no "
                        "Java equivalent with ECMA semantics"
                    )
                out.append(pattern[i : (end + 1) if end != -1 else n])
                i = (end + 1) if end != -1 else n
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
            if nxt == "W" and in_class:
                raise ValueError(r"\W inside a class is not translatable")
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if not in_class:
            if c == ".":
                out.append(_ECMA_DOT)
                i += 1
                continue
            if c == "$":
                out.append("\\z")  # ECMA $ (no m flag) = absolute end of input
                i += 1
                continue
            if c == "[":
                if pattern[i + 1 : i + 2] == "]":
                    out.append("(?!)")  # ECMA empty class: matches nothing
                    i += 2
                    continue
                if pattern[i + 1 : i + 3] == "^]":
                    out.append("(?s:.)")  # ECMA [^]: any character
                    i += 3
                    continue
                in_class = True
        else:
            if c == "]":
                in_class = False
            elif c in "&[":
                # Java class operators (intersection / nested class);
                # ECMA literals — escape to restore literal meaning
                out.append("\\" + c)
                i += 1
                continue
        out.append(c)
        i += 1
    return "".join(out)


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
        if not in_class and c == "$":
            # ECMA $ (no m flag) = absolute end; Python's $ also matches
            # before a trailing \n
            out.append("\\Z")
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
        elif in_class and c == "[":
            # literal in ECMA; escape to silence Python's nested-set
            # FutureWarning (same literal meaning)
            out.append("\\[")
            i += 1
            continue
        elif in_class and c == "&":
            # literal in ECMA; unescaped `&&` in a Python class is a
            # FutureWarning (set intersection is planned) — escape now so
            # the future semantics change can't silently break parity
            out.append("\\&")
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)
