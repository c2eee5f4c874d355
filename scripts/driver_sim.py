"""Driver simulation: what the external harness does to this repo.

Builds a plain SparkSession (default configs — deliberately NOT our
session factory), smoke-runs ``entry``, then runs every ``queries()``
entry at sf0.01 and diffs it against ``oracle_sql()`` via DuckDB
(column names, row count, order-insensitive canonicalized values).

Exit code 0 iff everything matches. Used by .claude/skills/verify.
"""

from __future__ import annotations

import datetime
import decimal
import importlib
import math
import os
import sys
from pathlib import Path

import duckdb
from pyspark.sql import SparkSession

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        return None if math.isnan(v) else round(v, 9)
    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    mod = importlib.import_module("__spark_entry__")

    df = mod.entry(spark)
    rows = df.collect()
    print(f"ENTRY rows: {len(rows)} schema: {df.schema.simpleString()}")
    failures = 0 if len(rows) > 0 else 1

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = mod.queries(), mod.oracle_sql()
    for name, fn in qs.items():
        try:
            sdf = fn(spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only, {len(srows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0].lower() for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {exc}")
            failures += 1
            continue
        scols = [c.lower() for c in sdf.columns]
        sidx = sorted(range(len(scols)), key=lambda i: scols[i])
        oidx = sorted(range(len(ocols)), key=lambda i: ocols[i])
        sset = sorted([tuple(canon(r[i]) for i in sidx) for r in srows], key=repr)
        oset = sorted([tuple(canon(r[i]) for i in oidx) for r in orows], key=repr)
        ok = sorted(scols) == sorted(ocols) and len(srows) == len(orows) and sset == oset
        print(f"{name}: {'MATCH' if ok else 'MISMATCH'} ({len(srows)} rows)")
        if not ok:
            failures += 1
            print("  cols", sorted(scols), "vs", sorted(ocols))
            print("  spark-only", [r for r in sset if r not in oset][:3])
            print("  oracle-only", [r for r in oset if r not in sset][:3])
    spark.stop()
    print("RESULT:", "OK" if failures == 0 else f"{failures} FAILURES")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
