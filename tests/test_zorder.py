"""Z-order clustering (sources/zorder.py): Morton bit math, and the
actual data-skipping payoff measured from parquet footer statistics."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from logpipe_spark.sources.zorder import morton_key, zorder_write


class TestMortonKey:
    def test_bit_interleave_matches_python(self, spark):
        def py_morton(a, b):
            z = 0
            for i in range(16):
                z |= ((a >> i) & 1) << (2 * i)
                z |= ((b >> i) & 1) << (2 * i + 1)
            return z

        rows = [(a, b) for a in (0, 1, 5, 255, 65535)
                for b in (0, 2, 7, 1024, 65535)]
        df = spark.createDataFrame(rows, "a long, b long")
        got = df.select(
            "a", "b", morton_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
        for r in got:
            assert r["z"] == py_morton(r["a"], r["b"]), (r["a"], r["b"])

    def test_clamps_to_low_16_bits(self, spark):
        df = spark.createDataFrame([(1 << 20, 0)], "a long, b long")
        z = df.select(morton_key(F.col("a"), F.col("b")).alias("z")).collect()
        assert z[0]["z"] == 0  # high bits ignored, low 16 are zero


def _overlapping_row_groups(path, col, lo, hi):
    """Row groups whose [min,max] stats intersect [lo,hi] — what a
    stats-pruning reader must read."""
    total = overlap = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i
               for i in range(meta.num_columns)}[col]
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            total += 1
            if st.min <= hi and st.max >= lo:
                overlap += 1
    return overlap, total


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    """A 256×256 grid written z-ordered: a narrow band predicate on
    EITHER dimension overlaps only a minority of row groups, while the
    single-column-sorted layout cannot skip at all on its second
    dimension. This is the property 100 TB data skipping rests on."""
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("a"),
        (F.col("id") / 256).cast("long").alias("b"),
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    zorder_write(grid, zpath, "a", "b", num_files=16)
    # control: classic single-key layout (range-partition + sort on a)
    (grid.repartitionByRange(16, "a").sortWithinPartitions("a")
     .write.mode("overwrite").parquet(spath))

    # narrow band on a: both layouts skip
    za, ta = _overlapping_row_groups(zpath, "a", 10, 20)
    sa, _ = _overlapping_row_groups(spath, "a", 10, 20)
    assert za < ta / 2 and sa < ta / 2
    # narrow band on b: z-order still skips, single-key layout reads ALL
    zb, tb = _overlapping_row_groups(zpath, "b", 10, 20)
    sb, tsb = _overlapping_row_groups(spath, "b", 10, 20)
    assert sb == tsb            # control cannot prune on b
    assert zb <= tb / 2         # the curve prunes b too
    # round-trip integrity
    assert spark.read.parquet(zpath).count() == 256 * 256
