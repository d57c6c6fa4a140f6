#!/usr/bin/env python
"""Cross-SF robustness sweep: every __spark_entry__ contract query vs its
DuckDB oracle at every testdata scale factor (the driver gates at sf0.01
only — this catches oracles that pass by fixture coincidence).

Usage: python scripts/cross_sf_check.py [sf0.001 sf0.01 sf0.1]
Exit code 0 iff every (sf, query) comparison matches rows + columns +
values (same normalization as tests/test_entry_contract.py).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf[sorted(pdf.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].round(9)
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
        else:
            out[c] = out[c].astype(object).where(pd.notna(out[c]), None)
    return out.sort_values(by=list(out.columns), na_position="first").reset_index(
        drop=True
    )


def main(sfs: list[str]) -> int:
    import __spark_entry__ as entry_mod
    from logpipe_spark.session import get_spark

    spark = get_spark()
    failures = []
    for sf in sfs:
        d = f"/root/testdata/{sf}"
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
        only = {q for q in os.environ.get("LOGPIPE_CHECK_ONLY", "").split(",") if q}
        for name, fn in entry_mod.queries().items():
            if only and name not in only:
                continue
            try:
                got = normalize(fn(spark, d).toPandas())
                exp = normalize(con.execute(entry_mod.oracle_sql()[name]).fetchdf())
                if len(got) != len(exp):
                    raise AssertionError(f"rowcount {len(got)} != {len(exp)}")
                pd.testing.assert_frame_equal(
                    got, exp, check_dtype=False, check_exact=False,
                    rtol=1e-9, atol=1e-12,
                )
                print(f"ok   {sf} {name} ({len(got)} rows)")
            except Exception as ex:  # noqa: BLE001 — report every query
                failures.append((sf, name, str(ex).splitlines()[0][:160]))
                print(f"FAIL {sf} {name}: {failures[-1][2]}")
    spark.stop()
    print(f"\n{len(failures)} failures" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or ["sf0.001", "sf0.01", "sf0.1"]))
