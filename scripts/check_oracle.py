"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at the same sf, compare row count,
column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

# pin the PROCESS timezone before any Spark/DuckDB work: PySpark's
# collect() materializes TimestampType through Python's fromtimestamp,
# which uses the OS timezone — on a non-UTC host every timestamp cell
# would shift by the UTC offset relative to DuckDB's naive rendering and
# all timestamp entries would "fail" (harness artifact, not a query bug;
# the session timezone pinned inside __spark_entry__._read does not reach
# the collect conversion). The driver's gate runs on a UTC host.
os.environ["TZ"] = "UTC"
time.tzset()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    """Normalize a cell for comparison, TYPE-AWARE.

    int vs float are deliberately kept distinct (tagged tuples) even though
    Python's 123 == 123.0: the driver hashes each engine's native value
    representation, so a DuckDB HUGEINT (arrow-exported as float64) against
    a Spark long is a real mismatch that fetchall()-based comparison hides.
    """
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        # FULL precision: the driver hashes each engine's exact value, so
        # any normalization here makes the local gate laxer than the real
        # one — a round(v, 9) masked the round-3 fourier hash failure.
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            sdata = sorted(
                (tuple(norm(r[c]) for c in scols) for r in srows),
                key=lambda t: tuple(str(x) for x in t),
            )
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            # rows-only entries (ivf_ann_topk, describe — see
            # tests/test_entry_contract.py) must at least return rows
            print(f"ok?   {name}: rows-only ({len(srows)} rows)")
            if len(srows) == 0:
                failures.append((name, "0 rows (rows-only check)"))
            continue
        try:
            # Fetch via Arrow, not fetchall(): the driver reads the oracle's
            # arrow-native types, where e.g. DuckDB HUGEINT (sum of BIGINT)
            # exports as float64 — fetchall() hides that as a Python int.
            tbl = con.execute(oracles[name]).fetch_arrow_table()
            ocols_raw = tbl.column_names
            orows = tbl.to_pylist()
            ocols = sorted(ocols_raw)
            odata = sorted(
                (tuple(norm(r[c]) for c in ocols) for r in orows),
                key=lambda t: tuple(str(x) for x in t),
            )
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        if scols != ocols:
            failures.append((name, f"schema mismatch: {scols} vs {ocols}"))
            print(f"FAIL  {name}: schema {scols} vs {ocols}")
            continue
        if len(sdata) != len(odata):
            failures.append((name, f"rowcount {len(sdata)} vs {len(odata)}"))
            print(f"FAIL  {name}: rowcount {len(sdata)} vs {len(odata)}")
            continue
        mism = [
            (a, b) for a, b in zip(sdata, odata) if a != b
        ]
        if mism:
            failures.append((name, f"{len(mism)} value mismatches"))
            print(f"FAIL  {name}: {len(mism)}/{len(sdata)} rows differ")
            for a, b in mism[:3]:
                print(f"      spark : {a}")
                print(f"      duckdb: {b}")
        else:
            print(f"PASS  {name} ({len(sdata)} rows)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("all queries pass")


if __name__ == "__main__":
    main()
