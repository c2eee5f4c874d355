"""Interchange formats beyond parquet: CSV and ORC round-trips, and the
JDBC sink configuration matching the reference's MySQL append (R6,
src/mining/utils/transform.py:34-46 + static/init.sql).

Policy: parquet is the engine's at-rest format (columnar, statistics,
pushdown); CSV exists for interchange with non-columnar producers, ORC
for ecosystems standardized on it. Both read with an EXPLICIT schema and
FAILFAST — schema inference samples the input (an extra scan at 100 TB)
and silently coerces bad rows; an ingest layer should fail loudly
instead (the reference swallows errors to None at extract.py:13-20 — a
behavior we deliberately do not reproduce for sinks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_csv(df: DataFrame, path: str) -> None:
    """CSV append sink with a header; one file per partition — the same
    no-coordination write path as parquet."""
    df.write.mode("overwrite").option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-first CSV scan: no inference pass, malformed rows raise
    (FAILFAST) instead of silently becoming nulls (PERMISSIVE default)."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar like parquet: column pruning and predicate
    pushdown work the same way (min/max stripe statistics)."""
    return spark.read.orc(path)


def jdbc_append_options(
    url: str, table: str, user: str, password: str, batchsize: int = 1000
) -> dict[str, str]:
    """The R6 parity sink: options for `df.write.format("jdbc")
    .options(**...).mode("append")` against the reference's MySQL schema
    (static/init.sql). Differences from the reference's writer
    (transform.py:43-45: one cursor.execute per row, one commit):
    executors write partitions concurrently with `batchsize`-row batched
    inserts, and `isolationLevel=READ_COMMITTED` keeps each partition's
    batch atomic without serializing writers. No live database exists in
    the test environment, so this returns the configuration (unit-tested)
    rather than performing IO."""
    return {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "batchsize": str(batchsize),
        "isolationLevel": "READ_COMMITTED",
    }
