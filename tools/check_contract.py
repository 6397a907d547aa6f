"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and (where present) its
``oracle_sql()`` twin on DuckDB over the same parquet tables, comparing
row count, column names/order-insensitive values.  Usage:

    python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from ocr_spark.driver_contract import TABLES, registry  # noqa: E402
from ocr_spark.session import get_spark  # noqa: E402


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("contract-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, (fn, sql) in registry().items():
        if only and name not in only:
            continue
        # several dedup/similarity/textstats queries persist sketch or
        # explode tables internally (session-lifetime entries); a full
        # 50-query run would otherwise accumulate them monotonically,
        # evicting blocks and slowing later queries
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        if sql is None:
            print(f"ok   {name}: rows-only, {len(sdf)} rows "
                  f"({time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            ddf = con.sql(sql).df()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rowcount spark={len(sdf)} duck={len(ddf)}")
            failures.append(name)
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} "
                  f"duck={sorted(ddf.columns)}")
            failures.append(name)
            continue
        a, b = _canon(sdf), _canon(ddf)
        if not a.equals(b):
            diff = (a != b) & ~(a.isna() & b.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(a)} rows differ")
            with pd.option_context("display.width", 200):
                print("  spark:", a[bad].head(3).to_dict("records"))
                print("  duck :", b[bad].head(3).to_dict("records"))
            failures.append(name)
            continue
        print(f"PASS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
