"""Z-order (Morton) clustering — multi-dimensional data skipping for
parquet layouts.

A table range-partitioned and sorted on ONE key skips beautifully for
that key and not at all for any other. Interleaving the bits of two
keys (the Morton curve) makes every file/row-group cover a locality
RECTANGLE in (a, b) space, so min/max footer statistics prune scans
for predicates on EITHER dimension — the technique behind
Delta/Iceberg `ZORDER BY`, here as plain column expressions plus the
writer that exploits them.

Scale shape: the z-key is pure integer bit-math (map-side, codegen);
the layout pays ONE range shuffle at write (`repartitionByRange` on the
z-key — Spark samples the key distribution, so the curve need not be
uniform) and a within-partition sort that tightens row-group stats.
Readers pay nothing: parquet min/max pruning and Spark's scan-level
filter pushdown do the skipping with no index structure to maintain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: classic 16→32 bit spread constants (insert a zero between every bit)
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(v: Column) -> Column:
    """Spread the low 16 bits of ``v`` so bit i lands at position 2i —
    the standard magic-number interleave, constant shifts only."""
    out = v.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        out = (
            out.bitwiseOR(F.shiftleft(out, shift)).bitwiseAND(F.lit(mask))
        )
    return out


def morton_key(a: Column, b: Column) -> Column:
    """32-bit Morton code of two dimensions, each clamped to its low
    16 bits (callers with wider domains should pre-bucket — e.g.
    ``F.ntile``-free quantile bucketing via `quantile_buckets` — since
    the curve only needs RANK locality, not exact values). ``a``
    occupies the even bit positions, ``b`` the odd ones."""
    return _spread16(a.cast("long")).bitwiseOR(
        F.shiftleft(_spread16(b.cast("long")), 1)
    )


def zorder_write(
    df: DataFrame,
    path: str,
    a_col: str,
    b_col: str,
    num_files: int = 16,
    z_col: str = "_z",
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve of
    (``a_col``, ``b_col``): one range shuffle on the z-key (sampled
    ranges — skew-tolerant), a within-partition sort to tighten every
    row group's min/max stats, then drop the key. Point/box predicates
    on either column now prune files and row groups through ordinary
    footer statistics (`tests/test_zorder.py` measures the skip rate
    against a single-column sort)."""
    (
        df.withColumn(z_col, morton_key(F.col(a_col), F.col(b_col)))
        .repartitionByRange(num_files, z_col)
        .sortWithinPartitions(z_col)
        .drop(z_col)
        .write.mode("overwrite")
        .parquet(path)
    )
