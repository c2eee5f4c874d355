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

    ``events.ts`` is schema-adaptive: depending on the fixture vintage it
    is either parquet TIMESTAMP(NANOS) — which Spark's vectorized reader
    surfaces as a nanosecond *long* under the legacy conf — or a plain
    TIMESTAMP(MICROS)/NTZ column. We branch on the dtype Spark actually
    reads, never on an assumed file encoding: longs are converted ns→µs
    with integer `div` (double division loses precision above 2^53 ns),
    timestamps are cast to the session-zoned TIMESTAMP type so every
    downstream operator sees one canonical type (session tz is UTC, so
    NTZ→TZ is instant-preserving)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = _read(spark, os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _canonical_ts(df)
    return df


def _canonical_ts(df: DataFrame) -> DataFrame:
    """Normalize ``ts`` to TimestampType regardless of fixture encoding."""
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dtype != "timestamp":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _read(spark: SparkSession, path: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Read naive parquet TIMESTAMP(MICROS) as session-zoned TimestampType at
    # the SCAN (session tz is UTC, so the instant is unchanged) instead of
    # NTZ + a post-scan cast — a cast above the scan would strip ts range
    # predicates out of PushedFilters and force full-table reads at 100 TB.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so operators can use spark.sql."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def events_in_range(spark: SparkSession, sf_dir: str, lo: str, hi: str) -> DataFrame:
    """events rows with ts in the CLOSED interval [lo, hi] (R7 BETWEEN
    semantics, reference data_model.py:29-30) — with the range predicate
    applied to the RAW scan column BEFORE any type rewrite, so the range
    lands in PushedFilters and parquet row groups outside [lo, hi] are
    skipped via min/max stats. At 100 TB that is the difference between
    reading a time slice and reading the table.

    Schema-adaptive like `table()`: on a nanos-as-long fixture the bounds
    are integer ns chosen so the result is bit-identical to
    `ts BETWEEN lo AND hi` on the derived µs column (derived
    ts = floor(ns/1000), hence ns ∈ [lo_µs·1000, hi_µs·1000+999]); on a
    native timestamp fixture a plain timestamp BETWEEN pushes down as-is
    (parquet keeps min/max stats on timestamp columns natively).

    lo/hi: 'yyyy-MM-dd HH:mm:ss' strings, interpreted in UTC (the session
    timezone)."""
    import calendar
    import datetime as dt

    def _ns(s: str) -> int:
        t = dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S")
        return calendar.timegm(t.timetuple()) * 1_000_000_000

    raw = _read(spark, os.path.join(sf_dir, "events.parquet"))
    if dict(raw.dtypes).get("ts") == "bigint":
        return (
            raw.filter((F.col("ts") >= _ns(lo)) & (F.col("ts") <= _ns(hi) + 999))
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    raw = _canonical_ts(raw)
    return raw.filter(
        F.col("ts").between(F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp"))
    )
