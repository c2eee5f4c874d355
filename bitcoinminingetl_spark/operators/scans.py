"""Scan-layer operators: projection pruning and predicate pushdown.

The reference pushes its column list and time predicate into hand-written
MySQL SQL (reference data_model.py:29-30,55-56). Here the same effect is
free: Catalyst prunes ReadSchema to the selected columns and pushes
filters into the parquet scan (visible as PushedFilters in .explain).
tests/test_plans.py asserts both properties on the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoinminingetl_spark.catalog import table
from bitcoinminingetl_spark.registry import query


@query(
    "q_scan_project",
    oracle="SELECT l_orderkey, l_extendedprice, l_shipdate FROM lineitem",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan: ReadSchema carries exactly three of lineitem's
    eleven columns — at 100 TB this is the difference between reading
    ~27% of the table's bytes and all of them."""
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_shipdate"
    )


@query(
    "q_scan_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_quantity > 45
    """,
)
def q_scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-pushdown scan: both conjuncts reach the parquet reader as
    PushedFilters, so row groups whose min/max stats exclude the range are
    skipped without decoding."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_quantity") > 45)
        )
        .select("l_orderkey", "l_quantity", "l_shipdate")
    )


@query(
    "q_scan_count",
    oracle="SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem",
)
def q_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-star: parquet footer row counts satisfy this without reading
    data pages (Spark's optimized metadata-only count)."""
    return table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))
