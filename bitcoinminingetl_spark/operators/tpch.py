"""Classic warehouse analytics in their TPC-H shapes (Q3 / Q5 / Q18),
plus a referential-integrity audit — the multi-join plans a user migrating
an OLAP workload onto this engine runs first.

Why these three shapes (beyond q_sql_pricing_summary's Q1 and
q_star_join's 4-table star):
- Q3  = selective dim filter + 3-table join + top-k: tests that Catalyst
  pushes both date predicates into the scans and that the top-k is a
  TakeOrdered, not a global sort.
- Q5  = 6-table snowflake with a cycle (customer and supplier must share
  a nation): the join-ordering stress test; all four dims broadcast, the
  two fact joins are the only shuffles.
- Q18 = aggregate-then-semijoin (HAVING subquery): tests that the group
  filter happens BEFORE the fact join, so the join input is 10^2 orders
  not 10^4.

Scale notes are per-query; none of these plans change shape at 100 TB —
dims stay broadcast-able (region/nation are KBs at any SF; customer/
supplier grow linearly but stay 1-2 orders below lineitem), and every
fact-side shuffle is on the join key AQE already handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoinminingetl_spark.catalog import table
from bitcoinminingetl_spark.functions.numeric import dsum, dsum_sql
from bitcoinminingetl_spark.registry import query

_Q3_SEGMENT = "BUILDING"
_Q3_DATE = "1997-06-01 00:00:00"


@query(
    "q_tpch_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey AS o_orderkey,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
      AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
      AND l.l_shipdate > TIMESTAMP '{_Q3_DATE}'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q_tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 highest-revenue orders not yet shipped at a
    cutoff date, for one market segment. (The fixture has no
    o_shippriority column; o_orderpriority stands in.)

    Plan intent: both date predicates and the segment equality reach
    their parquet scans (PushedFilters); customer, filtered to one
    segment, broadcasts onto orders; the limit compiles to
    TakeOrderedAndProject — no global sort of the aggregate. Ties broken
    by o_orderkey so the top-10 is deterministic for the oracle hash."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == _Q3_SEGMENT)
        .select("c_custkey")
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("o_orderkey"),
            "o_orderdate",
            "o_orderpriority",
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


_Q5_REGION = "ASIA"
_Q5_LO = "1996-01-01 00:00:00"
_Q5_HI = "1998-01-01 00:00:00"


@query(
    "q_tpch_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = '{_Q5_REGION}'
      AND o.o_orderdate >= TIMESTAMP '{_Q5_LO}'
      AND o.o_orderdate < TIMESTAMP '{_Q5_HI}'
    GROUP BY n.n_name
    """,
)
def q_tpch_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the customer and the
    supplier sit in the SAME nation of one region — the 6-table
    snowflake with a join cycle.

    Plan intent: region→nation prunes to one region's nations before
    anything touches a fact table; supplier/nation/region and the pruned
    customer side broadcast; the only shuffles are lineitem ⋈ orders
    (orderkey) and the date filter prunes orders at the scan. The
    c_nationkey = s_nationkey cycle closes as a broadcast-side equality,
    not an extra shuffle."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == _Q5_REGION)
    n = table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q5_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q5_HI).cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


_Q18_MIN_QTY = 250


@query(
    "q_tpch_large_orders",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey, {dsum_sql('l_quantity')} AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > {_Q18_MIN_QTY}
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, big.sum_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q_tpch_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose lineitems sum past a quantity
    threshold, with their customer — the HAVING-subquery-then-join
    pattern.

    Plan intent: the quantity aggregate + HAVING collapses lineitem to
    ~10^2 surviving orderkeys BEFORE any join; that tiny relation then
    broadcasts onto orders, and the order/customer join is again
    broadcast — so a 6M-row (or 6B-row) lineitem contributes exactly one
    partial-aggregated shuffle to the whole query."""
    big = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > _Q18_MIN_QTY)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


@query(
    "q_ri_orphans",
    oracle="""
    SELECT 'lineitem->orders' AS fk, CAST(count(*) AS BIGINT) AS n_orphans
    FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem->part', CAST(count(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'lineitem->supplier', CAST(count(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
    UNION ALL
    SELECT 'orders->customer', CAST(count(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer->nation', CAST(count(*) AS BIGINT)
    FROM customer c WHERE NOT EXISTS
        (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    """,
)
def q_ri_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every foreign key in
    the warehouse schema (the check a pipeline runs after each load; the
    reference's MySQL schema declares no FK constraints at all —
    init.sql:8-32 — so integrity is the loader's problem, as it is in
    every lakehouse).

    Scale shape: each check is a LEFT ANTI join of fact against the
    parent's key column only. Parent key relations are 1-2 orders of
    magnitude smaller than facts, so every anti join broadcasts (or
    bloom-filters at extreme SF) — no fact-sized shuffle anywhere; the
    five counts run as independent plan branches under one union."""

    def orphans(child: DataFrame, ckey: str, parent: DataFrame, pkey: str,
                label: str) -> DataFrame:
        return (
            child.select(ckey)
            .join(
                F.broadcast(parent.select(pkey)),
                child[ckey] == parent[pkey],
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        orphans(l, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionAll(
            orphans(
                l, "l_partkey", table(spark, sf_dir, "part"), "p_partkey",
                "lineitem->part",
            )
        )
        .unionAll(
            orphans(
                l, "l_suppkey", table(spark, sf_dir, "supplier"), "s_suppkey",
                "lineitem->supplier",
            )
        )
        .unionAll(orphans(o, "o_custkey", c, "c_custkey", "orders->customer"))
        .unionAll(
            orphans(
                c, "c_nationkey", table(spark, sf_dir, "nation"), "n_nationkey",
                "customer->nation",
            )
        )
    )
