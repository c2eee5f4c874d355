"""Table catalog: parquet-backed DataFrames over the driver test tables.

The reference's tables were three MySQL InnoDB tables written row-at-a-time
(reference ``static/init.sql:8-32``, ``src/mining/utils/transform.py:43-46``).
Here every table is a columnar parquet scan: Catalyst prunes columns and
pushes predicates into the scan, which is the whole game at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. Plain `spark.read.parquet` — no caching, no
    collect; the scan stays lazy so downstream filters/projections reach
    the parquet reader (PushedFilters / ReadSchema).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read it as long (legacy conf, runtime
    settable) and convert ns -> µs with integer `div` (a double division
    would lose precision above 2^53 ns)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = _read(spark, os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _read(spark: SparkSession, path: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so operators can use spark.sql."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def events_in_range(spark: SparkSession, sf_dir: str, lo: str, hi: str) -> DataFrame:
    """events rows with ts in the CLOSED interval [lo, hi] (R7 BETWEEN
    semantics, reference data_model.py:29-30) — with the range predicate
    applied to the RAW nanosecond long column BEFORE the ns→µs
    conversion.

    A filter on the *derived* timestamp cannot push down (the scan only
    sees IsNotNull); filtering the physical long column turns the range
    into PushedFilters, so parquet row groups outside [lo, hi] are
    skipped via min/max stats — at 100 TB the difference between reading
    a time slice and reading the table. Bounds are chosen so the result
    is bit-identical to `ts BETWEEN lo AND hi` on the derived column:
    derived ts = floor(ns/1000) µs, hence ns ∈ [lo_µs·1000, hi_µs·1000+999].

    lo/hi: 'yyyy-MM-dd HH:mm:ss' strings, interpreted in UTC (the session
    timezone)."""
    import calendar
    import datetime as dt

    def _ns(s: str) -> int:
        t = dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S")
        return calendar.timegm(t.timetuple()) * 1_000_000_000

    raw = _read(spark, os.path.join(sf_dir, "events.parquet"))
    return (
        raw.filter((F.col("ts") >= _ns(lo)) & (F.col("ts") <= _ns(hi) + 999))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
