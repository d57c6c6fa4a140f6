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

_SPECIAL = re.escape("\\^$.|?*+()[]{}")


def glob_to_regex(pattern: str) -> str:
    """Compile a `*`/`?` glob to an anchored regex string."""
    out = ["^"]
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    out.append("$")
    return "".join(out)


def is_match(pattern: str, s: str) -> bool:
    """Pure-Python whole-string glob match (oracle-side)."""
    return re.match(glob_to_regex(pattern), s) is not None
