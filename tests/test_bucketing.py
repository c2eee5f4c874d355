"""Bucketed-table co-located join: the layout-level shuffle eliminator
(SURVEY §4.2 / the 100 TB posture). Both sides are written bucketed by
the join key into the same bucket count; the sort-merge join then reads
matching buckets directly — the physical plan must contain NO shuffle
exchange on either join input.

Test-only artifact (no `queries()` entry): bucketing is a property of a
*written layout* plus the session catalog, not of a query plan over the
driver's plain parquet files."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bitcoinminingetl_spark.catalog import table

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("bucketed")
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            table(spark, sf_dir, name)
            .write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", str(warehouse / name))
            .mode("overwrite")
            .saveAsTable(f"bkt_{name}")
        )
    yield "bkt_orders", "bkt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    orders, lineitem = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(lineitem)
            .join(
                spark.table(orders),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join inputs scan bucketed files directly: no hash exchange
        # below the join (the only exchange allowed is the groupBy's)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "SelectedBucketsCount" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    orders, lineitem = bucketed_tables
    bucketed = (
        spark.table(lineitem)
        .join(spark.table(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    plain = (
        table(spark, sf_dir, "lineitem")
        .join(
            table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert bucketed == plain
