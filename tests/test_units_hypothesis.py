"""Property tests for config unit parsing (functions/units.py) — the
reference-converter semantics (util.c:525-568) must hold for arbitrary
well-formed inputs, not just the examples."""

from hypothesis import given, strategies as st

from logpipe_spark.functions.units import parse_duration_us, parse_size_bytes

SIZE_UNITS = {"": 1, "b": 1, "kb": 1024, "mb": 1024**2, "gb": 1024**3, "tb": 1024**4}
DUR_UNITS = {"": 1, "us": 1, "ms": 1_000, "s": 1_000_000}


def _casings(u: str) -> list[str]:
    return [u.lower(), u.upper(), u.capitalize()]


@given(
    n=st.integers(min_value=0, max_value=10**6),
    unit=st.sampled_from(sorted(SIZE_UNITS)),
    case=st.integers(min_value=0, max_value=2),
)
def test_size_integer_exact(n, unit, case):
    s = f"{n}{_casings(unit)[case]}"
    assert parse_size_bytes(s) == n * SIZE_UNITS[unit]


@given(
    n=st.integers(min_value=0, max_value=10**8),
    unit=st.sampled_from(sorted(DUR_UNITS)),
    case=st.integers(min_value=0, max_value=2),
)
def test_duration_integer_exact(n, unit, case):
    s = f"{n}{_casings(unit)[case]}"
    assert parse_duration_us(s) == n * DUR_UNITS[unit]


@given(x=st.floats(min_value=0, max_value=1e6, allow_nan=False, allow_infinity=False))
def test_size_float_truncates_like_reference(x):
    # the reference casts (uint64_t)(value*factor) — truncation, not rounding
    assert parse_size_bytes(f"{x!r}kb") == int(x * 1024)


@given(s=st.text(max_size=12))
def test_never_silently_misparses(s):
    """Arbitrary text either parses to a non-negative int or raises
    ValueError — never returns a sentinel or negative (the reference's
    UINT64_MAX-on-error foot-gun, deliberately not reproduced)."""
    for fn in (parse_size_bytes, parse_duration_us):
        try:
            v = fn(s)
        except ValueError:
            continue
        assert isinstance(v, int) and v >= 0
