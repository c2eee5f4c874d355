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
from bitcoinminingetl_spark.functions.numeric import dsum, dsum_sql
from bitcoinminingetl_spark.functions.state import workdir
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


_PARTITIONED_LAYOUTS: dict[str, str] = {}


def _partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Write-once date-partitioned copy of events (ds=yyyy-MM-dd directory
    per day — the sink layout policy from sources/sink.py). Cached per
    process so the query itself only measures the pruned read."""
    if sf_dir not in _PARTITIONED_LAYOUTS:
        path = workdir("bmetl_part_") + "/events_by_day"
        (
            table(spark, sf_dir, "events")
            .withColumn("ds", F.date_format("ts", "yyyy-MM-dd"))
            .write.partitionBy("ds")
            .parquet(path)
        )
        _PARTITIONED_LAYOUTS[sf_dir] = path
    return _PARTITIONED_LAYOUTS[sf_dir]


@query(
    "q_scan_partition_pruning",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           {dsum_sql('value')} AS sum_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-11 00:00:00'
    """,
)
def q_scan_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition pruning on a date-partitioned layout: events are laid out
    as ds=yyyy-MM-dd directories (the R7 every-query-filters-on-time
    pattern as directory structure); a filter on the partition column
    becomes PartitionFilters — whole days are skipped before ANY file IO.
    At 100 TB this is the first and biggest lever: a one-day query on a
    30-day table reads ~3% of the bytes. The oracle runs the equivalent
    ts-range predicate on the unpartitioned table."""
    path = _partitioned_events(spark, sf_dir)
    return (
        spark.read.parquet(path)
        .filter(F.col("ds") == "2024-01-10")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("value")).alias("sum_value"),
        )
    )


@query(
    "q_dq_profile",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(value) AS BIGINT) AS null_value,
           CAST(count(*) - count(ts) AS BIGINT) AS null_ts,
           CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS neg_value,
           CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS dup_ids,
           CAST(sum(CASE WHEN event_type NOT IN
               ('click','view','purchase','signup','error') THEN 1 ELSE 0 END)
               AS BIGINT) AS bad_enum,
           {dsum_sql('value')} AS sum_value
    FROM events
    """,
)
def q_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile: the constraint sweep an ingest gate runs
    before data enters the corpus — null counts, domain violations
    (negative metric, unknown enum), duplicate-key count, and a control
    total. ONE pass over the table: every check is a conditional
    aggregate in the same hash-aggregate, so profiling cost is one scan
    regardless of how many constraints are added."""
    ev = table(spark, sf_dir, "events")
    known = ("click", "view", "purchase", "signup", "error")
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("value")).alias("null_value"),
        (F.count(F.lit(1)) - F.count("ts")).alias("null_ts"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("neg_value"),
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("dup_ids"),
        F.sum(F.when(~F.col("event_type").isin(*known), 1).otherwise(0)).alias(
            "bad_enum"
        ),
        dsum(F.col("value")).alias("sum_value"),
    )


@query("q_skew_metrics")  # rows-only: partition layout is engine-side state
def q_skew_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-skew diagnostic: per-partition row counts of the
    post-shuffle layout for a grouped aggregation keyed on event_type —
    the readout an operator checks BEFORE deciding to salt a key
    (q_join_salted / q_agg_salted_distinct are the remedies; this is the
    instrument). Output: one row per non-empty shuffle partition with
    its row count, plus max/mean ratio columns repeated for easy
    thresholding; a healthy layout has ratio near 1, a hot key shows a
    single dominant partition.

    Plan: spark_partition_id() is evaluated AFTER the exchange (the
    repartition by key is explicit, so the measured layout is the
    grouped agg's real layout); the per-partition count is a 2-column
    aggregate; the global stats attach as a 1-row broadcast. Cost: one
    extra count over data already shuffled — cheap enough to run inline
    in any pipeline as a guardrail."""
    e = table(spark, sf_dir, "events").repartition(8, "event_type")
    per_part = (
        e.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    stats = per_part.agg(
        F.max("n_rows").alias("max_rows"),
        F.avg("n_rows").alias("mean_rows"),
    )
    return (
        per_part.join(F.broadcast(stats))
        .select(
            "pid",
            "n_rows",
            F.round(F.col("n_rows") / F.col("mean_rows"), 4).alias(
                "vs_mean"
            ),
            F.round(F.col("max_rows") / F.col("mean_rows"), 4).alias(
                "skew_ratio"
            ),
        )
        .orderBy(F.col("n_rows").desc(), "pid")
    )
