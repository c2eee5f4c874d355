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
