"""Glob parity with the reference matcher `IsMatchString`
(`src-plugins/logpipe-input-file.c:477-529`): `*`/`?` only, whole-string."""

from logpipe_spark.globs import glob_to_regex, is_match


def test_star():
    assert is_match("*.log", "a.log")
    assert is_match("*.log", ".log")
    assert not is_match("*.log", "a.log.1")
    assert is_match("*", "")
    assert is_match("a*b*c", "aXXbYYc")


def test_question():
    assert is_match("a?.log", "ab.log")
    assert not is_match("a?.log", "a.log")
    assert not is_match("?", "")


def test_literals_not_regex():
    # regex metachars in patterns are literal (unlike raw rlike)
    assert is_match("a.b", "a.b")
    assert not is_match("a.b", "aXb")
    assert is_match("[[sys*", "[[system=x]]")


def test_whole_string_anchoring():
    assert not is_match("ERROR", "ERROR 500 boom")
    assert is_match("ERROR *", "ERROR 500 boom")


def test_regex_compiles():
    import re

    for pat in ["*.log", "a?.log", "[[sys*", "a+b(c)|d"]:
        re.compile(glob_to_regex(pat))


def test_newline_byte_semantics():
    """The C matcher is byte-oriented: wildcards cross newlines and the
    match must consume the absolute end (no $-before-final-\\n quirk)."""
    assert is_match("*", "a\nb")
    assert is_match("a*b", "a\nb")
    assert is_match("?", "\n")
    assert not is_match("*a", "xa\n")   # trailing newline is a real byte
    assert is_match("*a*", "xa\n")
