"""Engine observability: df.observe() metric accumulators — the
per-action data-quality counters a production pipeline attaches to every
load (rows written, nulls routed, revenue checksum) without a second
scan. The reference's equivalent is its row-count logging after each
MySQL load (src/mining/utils/load.py); observe() is the Spark-native
form: metrics ride the SAME job, cost zero extra passes, and arrive on
the driver atomically with the action."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from bitcoinminingetl_spark.catalog import table


def test_observe_metrics_ride_the_action(spark, sf_dir):
    obs = Observation("load_audit")
    df = (
        table(spark, sf_dir, "orders")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("o_totalprice").isNull()).alias("n_null_price"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue_checksum"),
        )
        .filter(F.col("o_orderpriority") == "1-URGENT")
    )
    urgent = df.count()

    # metrics describe the observed point (BEFORE the filter) — the whole
    # point: audit the load, not the downstream query
    m = obs.get
    exact = table(spark, sf_dir, "orders")
    assert m["n_rows"] == exact.count()
    assert m["n_rows"] > urgent  # filter really ran downstream of the probe
    assert m["n_null_price"] == 0
    expected_rev = exact.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double")
    ).collect()[0][0]
    assert abs(m["revenue_checksum"] - expected_rev) < 1e-6
