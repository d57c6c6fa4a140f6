"""Property test: the regex-compiled glob matcher agrees with an
independent recursive implementation of the reference algorithm
(`IsMatchString`, src-plugins/logpipe-input-file.c:477-529 — re-derived
from its semantics: `*` = any run incl. empty, `?` = exactly one char,
whole string must be consumed) on arbitrary inputs.

Pure Python — no Spark session — so hypothesis's per-example loop is cheap.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from logpipe_spark.globs import is_match

ALPHABET = "ab*?.[]\\^$ \n模é"


def ref_match(pattern: str, s: str) -> bool:
    """Recursive two-pointer glob match (independent of the regex path)."""
    if not pattern:
        return not s
    head, rest = pattern[0], pattern[1:]
    if head == "*":
        # try consuming 0..len(s) chars
        return any(ref_match(rest, s[i:]) for i in range(len(s) + 1))
    if head == "?":
        return bool(s) and ref_match(rest, s[1:])
    return bool(s) and s[0] == head and ref_match(rest, s[1:])


@settings(max_examples=2000, deadline=None)
@given(
    pattern=st.text(alphabet=ALPHABET, max_size=8),
    s=st.text(alphabet=ALPHABET, max_size=12),
)
def test_regex_glob_equals_recursive_reference(pattern, s):
    assert is_match(pattern, s) == ref_match(pattern, s)


@settings(max_examples=500, deadline=None)
@given(s=st.text(alphabet=ALPHABET, max_size=12))
def test_star_matches_everything(s):
    assert is_match("*", s)


@settings(max_examples=500, deadline=None)
@given(pattern=st.text(alphabet=ALPHABET, max_size=8))
def test_pattern_matches_itself_when_literal(pattern):
    if "*" not in pattern and "?" not in pattern:
        assert is_match(pattern, pattern)
