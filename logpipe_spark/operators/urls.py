"""URL hygiene for web corpora: feature extraction and blocklist filtering.

The first pass every web-scale corpus pipeline runs (C4, RefinedWeb,
Gopher all document one) is URL-level: parse the crawl URL, derive the
registrable domain, and drop documents whose domain — or any parent
domain — is on a blocklist. The reference's closest analogue is its
grep-style per-record match gate (`logpipe-output-es.c:543-560`: match →
keep/drop); this module is that gate generalised to structured URL
semantics at corpus scale.

Design for 100 TB:

- Parsing is a fixed chain of RE2-safe ``regexp_extract`` expressions —
  pure map-side codegen, zero shuffles, and (unlike ``F.parse_url``)
  reproducible bit-for-bit by any engine with POSIX regexes, which is
  what keeps the DuckDB oracle exact.
- Blocklist matching must honour SUFFIX semantics (blocking
  ``tracker.net`` blocks ``ads.tracker.net``). The naive plan — a LIKE
  chain or a theta-join on ``endswith`` — is O(corpus × blocklist).
  Instead each host explodes into its ≤ ``max_labels`` parent-domain
  suffixes and anti-joins the blocklist on EQUALITY: real blocklists
  (10⁵–10⁶ domains) broadcast, so the corpus is never shuffled and the
  match is a hash probe per suffix, not a scan of the list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: scheme://host[:port]/... → host (group 1). RE2-safe: no backrefs.
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"
#: everything from the first '/' after the authority to '?' or '#'.
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)"
#: query string without the leading '?'.
_QUERY_RE = r"\?([^#]*)"

#: second-level suffixes under which the registrable domain needs THREE
#: labels (a pragmatic subset of the public-suffix list — the full list
#: is a data file, not an algorithm change; swap it in via `psl_extra`).
_DEFAULT_PSL_2LD = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tw", "com.sg", "co.za",
)


def _host(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def registered_domain(
    host: Column, psl_extra: tuple[str, ...] = ()
) -> Column:
    """Registrable domain of a lowercased host: the last two labels,
    or the last three when the two-label tail is a known public second-
    level suffix (``example.co.uk`` → ``example.co.uk``, not ``co.uk``).
    Pure string expressions — no UDF."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.slice(parts, n - 1, 2))
    last3 = F.concat_ws(".", F.slice(parts, n - 2, 3))
    is_2ld = F.lit(False)
    for suf in _DEFAULT_PSL_2LD + tuple(psl_extra):
        is_2ld = is_2ld | (last2 == F.lit(suf))
    return (
        F.when(n <= 2, host)
        .when(is_2ld & (n >= 3), last3)
        .otherwise(last2)
    )


def url_features(
    df: DataFrame, url_col: str = "url", psl_extra: tuple[str, ...] = ()
) -> DataFrame:
    """Adds ``host``, ``domain`` (registrable), ``path_depth`` (number of
    non-empty path segments), ``n_params`` (query parameters), and
    ``is_https`` — the feature set URL-quality heuristics key on.
    Map-only; every expression is a shared-subexpression of one regex
    chain that whole-stage codegen fuses into a single pass."""
    url = F.col(url_col)
    host = _host(url)
    path = F.regexp_extract(url, _PATH_RE, 1)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    return df.select(
        "*",
        host.alias("host"),
        registered_domain(host, psl_extra).alias("domain"),
        F.size(
            F.filter(F.split(path, "/"), lambda s: s != F.lit(""))
        ).alias("path_depth"),
        F.when(query == "", F.lit(0))
        .otherwise(F.size(F.split(query, "&")))
        .alias("n_params"),
        F.lower(url).startswith("https://").alias("is_https"),
    )


def host_suffixes(host: Column, max_labels: int = 5) -> Column:
    """All parent-domain suffixes of a host with ≥ 2 labels, deepest
    first, capped at the last ``max_labels`` labels:
    ``a.b.example.com`` → [a.b.example.com, b.example.com, example.com].
    The cap bounds the explode factor (real hosts rarely exceed 5
    meaningful labels; a blocklist entry deeper than that is matched by
    its own full-host suffix anyway)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    lo = F.greatest(F.lit(1), n - max_labels + 1)
    # F.sequence(1, 0) DESCENDS ([1, 0]) rather than yielding [] — a
    # bare-label host must be guarded to an empty suffix list explicitly
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(lo, n - 1),
            lambda i: F.concat_ws(".", F.slice(parts, i, n - i + 1)),
        )
    )


def url_blocklist_filter(
    df: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    max_labels: int = 5,
) -> DataFrame:
    """Drop rows whose URL host equals, or is a subdomain of, any entry
    in ``blocked[domain_col]`` — C4/RefinedWeb-style domain blocklist
    filtering with suffix semantics (blocking ``tracker.net`` also blocks
    ``ads.tracker.net``).

    Plan: one broadcast hash ANTI join per suffix DEPTH — the 2-label
    suffix, the 3-label suffix, … up to ``max_labels`` — each on string
    EQUALITY against the same broadcast blocklist. Every join is
    map-side (broadcast), so the corpus is never shuffled, never
    exploded, and never re-broadcast; a row survives iff none of its ≤
    ``max_labels`` trailing-label suffixes (1-label through the full
    host) is blocked, which is exactly the chained anti-join
    composition. Cost: ~5 hash probes per row against
    an in-memory table — the same order as the single grep gate the
    reference applies per record (`logpipe-output-es.c:543-560`)."""
    bl = F.broadcast(
        blocked.select(
            F.lower(F.col(domain_col)).alias("_blocked_domain")
        ).distinct()
    )
    host = _host(F.col(url_col))
    parts = F.split(host, r"\.")
    n = F.size(parts)
    out = df
    for k in range(1, max_labels + 1):
        # the k-label suffix, NULL when the host is shorter than k labels
        # (a NULL join key never matches → the row survives this probe)
        suffix_k = F.when(
            n >= k, F.concat_ws(".", F.slice(parts, n - k + 1, k))
        )
        out = out.join(bl, suffix_k == F.col("_blocked_domain"), "left_anti")
    return out


#: query parameters that identify click tracking, not content — stripped
#: during canonicalization (utm_* is matched by prefix separately).
_TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ref")


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL for crawl-level dedup — the normalization
    every web pipeline (C4, CCNet, RefinedWeb) applies before URL-keyed
    dedup, since crawls reach the same page as ``HTTP://Example.COM:80/a/``
    and ``http://example.com/a?utm_source=feed``:

    - scheme and host lowercased (scheme and host are case-insensitive
      per RFC 3986 §6.2.2.1; path is NOT — ``/A`` and ``/a`` differ)
    - default ports stripped (``:80`` for http, ``:443`` for https);
      non-default ports kept
    - fragment dropped (never sent to the server)
    - tracking query parameters removed (``utm_*`` by prefix, plus
      ``fbclid``/``gclid``/``msclkid``/``ref``), remaining parameters
      sorted byte-wise so parameter order doesn't split a dedup group
    - one-or-more trailing slashes collapsed; empty path → ``/``

    Pure RE2-safe regexp + array expressions — map-only whole-stage
    codegen, and reproducible bit-for-bit in the DuckDB oracle."""
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = _host(url)
    port = F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]+:(\d+)", 1
    )
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    portpart = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit(""))
        & ~p.startswith("utm_")
        & ~F.split(p, "=").getItem(0).isin(*_TRACKING_PARAMS),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    querypart = F.when(qcanon == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), qcanon)
    )
    return F.concat(scheme, F.lit("://"), host, portpart, path, querypart)


def url_dedup(
    df: DataFrame, url_col: str = "url", key_col: str = "doc_id"
) -> DataFrame:
    """URL-keyed dedup groups over canonical URLs: one row per canonical
    form with the group size and the kept (lowest-key) member. The
    cheapest dedup a crawl pipeline runs — before any text is parsed —
    and at 100 TB the shape is optimal: canonicalization is map-only,
    then ONE hash shuffle on the canonical string with map-side partial
    aggregation; no text column ever moves."""
    return (
        df.select(
            canonical_url(F.col(url_col)).alias("url_canon"),
            F.col(key_col).cast("long").alias("_k"),
        )
        .groupBy("url_canon")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("_k").alias("keep_id"),
        )
    )
