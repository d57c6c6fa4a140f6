"""Engine-portable Bloom filter + Bloom-pruned semi-join.

Why beside ``enrich.matched`` (broadcast left-semi): a semi-join key set
can outgrow a broadcast HASH RELATION long before it outgrows a Bloom
filter — 100M distinct 8-byte keys is gigabytes as a hash table but
~180 MB of Bloom bits at 1% FP, and the bits compress the driver→executor
hop the same way. ``bloom_semi_join`` keeps the big side's shuffle volume
down by discarding non-members map-side, then (by default) finishes with
the exact join so the RESULT is precisely the semi-join — the Bloom only
prunes, it never decides. That's also why the contract oracle is a plain
``WHERE key IN (...)``: approximate plumbing, exact semantics.

Portability: bit positions come from the shared md5 spec — ONE md5 under
salt ``bf:`` split into two 60-bit halves driving Kirsch–Mitzenmacher
double hashing (see ``_positions``) — and words are 32-bit so every mask
stays positive in engines without unsigned 64-bit shifts. Like the
HLL/Count-Min sketches in `operators/sketch.py`, the filter is a TABLE
((word, bits) rows) mergeable by OR — persistable next to the snapshot
ledger and rebuildable bit-for-bit by any engine.

Spark has a builtin Bloom join (runtime row-group filtering); this one
exists where that can't go: cross-engine reproducibility, explicit
persistence, and filters built ONCE and reused across many jobs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: refuse to build filters the driver shouldn't hold (64 MB of words).
MAX_BLOOM_BITS = 1 << 29


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """Kirsch–Mitzenmacher double hashing: ONE md5 yields two independent
    60-bit halves (hex chars 1-15 and 16-30), and position i is
    (h1 + i·h2') mod m with h2' = (2·h2 + 1) mod m — the odd stride keeps
    the probe sequence non-degenerate on power-of-two m. Same FP behavior
    as k independent hashes (Kirsch & Mitzenmacher, ESA'06) at 1/k the
    hash cost; overflow-safe because both operands are reduced mod
    m ≤ 2^29 before the multiply. Engine-portable: any SQL engine
    reproduces it from md5/substr/CAST."""
    hx = F.md5(F.concat(F.lit("bf:"), col.cast("string")))
    h1 = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long") % m_bits
    h2 = (
        F.conv(F.substring(hx, 16, 15), 16, 10).cast("long") * 2 + 1
    ) % m_bits
    return [(h1 + i * h2) % m_bits for i in range(k)]


def build_bloom(
    df: DataFrame, col: str, m_bits: int = 1 << 17, k: int = 5
) -> DataFrame:
    """Bloom filter of a key column as a (word, bits) table —
    ceil(m_bits/32) rows of 32-bit masks in a BIGINT. One map-side
    explode of k positions, distinct, then a partial+final BIT_OR — the
    exchange carries ≤ m_bits/32 rows per partition. Merge two filters
    over the same (m_bits, k) spec by BIT_OR on word."""
    if m_bits % 32 != 0 or not 32 <= m_bits <= MAX_BLOOM_BITS:
        raise ValueError(f"m_bits must be a multiple of 32 in [32, 2^29]: {m_bits}")
    if not 1 <= k <= 16:
        raise ValueError(f"k out of range: {k}")
    pos = F.explode(F.array(*_positions(F.col(col), m_bits, k))).alias("pos")
    return (
        df.select(pos)
        .distinct()
        .select(
            (F.col("pos") / 32).cast("int").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_might_contain(
    words: list[int], col: Column, m_bits: int, k: int
) -> Column:
    """Membership predicate against a DENSE word list (index = word id,
    built by :func:`bloom_words`). Pure map-side JVM expressions — the
    filter rides into every task as one array literal."""
    arr = F.lit(words)
    # 32-entry mask lookup instead of shiftleft-by-column (pyspark's
    # shiftleft insists on a Python-int shift; a literal array is just as
    # codegen-friendly)
    masks = F.lit([1 << b for b in range(32)])
    cond = None
    for p in _positions(col, m_bits, k):
        word = F.element_at(arr, (p / 32).cast("int") + 1)
        mask = F.element_at(masks, (p % 32).cast("int") + 1)
        hit = word.bitwiseAND(mask) != 0
        cond = hit if cond is None else (cond & hit)
    return cond


def bloom_words(bloom: DataFrame, m_bits: int) -> list[int]:
    """Densify a (word, bits) filter table into a word-indexed list.
    The ONE driver collect in this module, bounded by construction to
    m_bits/32 longs (MAX_BLOOM_BITS caps it at 16M words) — the same
    bounded-metadata exception as mix_sample's per-group counts."""
    n_words = m_bits // 32
    dense = [0] * n_words
    for row in bloom.collect():
        dense[row["word"]] = row["bits"]
    return dense


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    m_bits: int = 1 << 17,
    k: int = 5,
    exact: bool = True,
) -> DataFrame:
    """``big ⋉ small`` with a Bloom prefilter on the big side.

    The filter is built from ``small``'s keys, densified, and applied
    map-side to ``big`` BEFORE any join — only probable members reach
    the exact left-semi join's exchange (false-positive rate, not data
    size, bounds the overshoot). With ``exact=False`` the join is
    skipped and the result may keep Bloom false positives — the mode
    for pre-shuffle pruning inside a larger plan where a later stage
    re-verifies anyway."""
    words = bloom_words(build_bloom(small, small_key, m_bits, k), m_bits)
    pruned = big.where(
        bloom_might_contain(words, F.col(big_key), m_bits, k)
    )
    if not exact:
        return pruned
    return pruned.join(
        small.select(F.col(small_key).alias(big_key)).distinct(),
        on=big_key,
        how="left_semi",
    )
