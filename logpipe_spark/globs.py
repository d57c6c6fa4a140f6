"""Glob matching with the reference's `IsMatchString` semantics.

The reference routes filenames through include/exclude glob lists
(`src-plugins/logpipe-input-file.c:477-529` — matcher; applied :593-739).
Its dialect supports exactly two metacharacters:

- ``*``  — any run of characters (including empty)
- ``?``  — exactly one character

Everything else is a literal (no ``[...]`` classes, unlike fnmatch).
A pattern must match the WHOLE string (the C matcher requires both the
pattern and the string to be exhausted together).

Two forms are provided: a pure-Python matcher (used by the oracle) and a
glob→regex compiler whose output feeds ``F.col(...).rlike(...)`` so the
predicate stays JVM-side and, when applied to a partition column, prunes
at the scan.
"""

from __future__ import annotations

import re


def _glob_body(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def glob_to_regex(pattern: str) -> str:
    """Compile to a Python-dialect anchored regex.

    The C matcher is byte-oriented: `*`/`?` happily cross newlines, and the
    match must consume the WHOLE string. Plain `^.*$` gets neither right
    (`.` stops at \\n; `$` also matches before a final newline), so: DOTALL
    + absolute anchors. Python's absolute end anchor is ``\\Z``."""
    return r"(?s)\A" + _glob_body(pattern) + r"\Z"


def glob_to_regex_java(pattern: str) -> str:
    """Same semantics for Java regex / RE2 (Spark ``rlike``, DuckDB
    ``regexp_matches``): there the absolute end anchor is ``\\z``
    (Java's ``\\Z`` stops before a final line terminator)."""
    return r"(?s)\A" + _glob_body(pattern) + r"\z"


def is_match(pattern: str, s: str) -> bool:
    """Pure-Python whole-string glob match (oracle-side)."""
    return re.match(glob_to_regex(pattern), s) is not None
